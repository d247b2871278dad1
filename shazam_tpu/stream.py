"""Streaming recognition: fixed-size chunk feed + optional mic capture.

The reference records CHUNK=8192-sample pyaudio buffers into channel
lists and fingerprints after RECORD_SECONDS (``recognizer.py:355-382``).
This module keeps that contract but makes the chunk source pluggable:
``StreamRecognizer.feed(chunk)`` consumes interleaved int16 chunks from
any producer (microphone, socket, file reader) into a bounded ring, and
``recognize()`` fingerprints the current window through the HBM index.

Mic capture itself stays host-side and optional: ``mic_chunks`` yields
chunks via pyaudio when (and only when) that package exists — CI and
benches use the file path (SURVEY.md §4/§7: the mic cannot be the
correctness oracle).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from .api import SIA

CHUNK = 8192  # samples per chunk per channel (recognizer.py:25)


class StreamRecognizer:
    """Bounded rolling window of interleaved audio chunks + recognition."""

    def __init__(self, sia: SIA, channels: int = 2,
                 window_seconds: float = 15.0):
        self.sia = sia
        self.channels = channels
        self.window_samples = int(window_seconds * sia.config.sample_rate)
        self._buffers = [np.zeros(0, np.int16) for _ in range(channels)]

    def feed(self, chunk: np.ndarray) -> None:
        """Consume one interleaved int16 chunk (len = CHUNK * channels)."""
        chunk = np.asarray(chunk, np.int16)
        for c in range(self.channels):
            ch = chunk[c :: self.channels]
            buf = np.concatenate([self._buffers[c], ch])
            if len(buf) > self.window_samples:
                buf = buf[-self.window_samples :]
            self._buffers[c] = buf

    @property
    def buffered_seconds(self) -> float:
        return len(self._buffers[0]) / self.sia.config.sample_rate

    def recognize(self, topn: Optional[int] = None) -> Dict:
        """Recognize the current window (channel set-union, like the ref)."""
        return self.sia.recognize_samples(
            [b for b in self._buffers if len(b)], topn=topn
        )

    def reset(self) -> None:
        self._buffers = [np.zeros(0, np.int16) for _ in range(self.channels)]


def mic_chunks(seconds: float, channels: int = 2, rate: int = 44100,
               chunk: int = CHUNK) -> Iterator[np.ndarray]:
    """Yield interleaved int16 mic chunks via pyaudio (if installed).

    Mirrors the capture loop at ``recognizer.py:357-374``. Raises a clear
    error when pyaudio is unavailable (this container has no audio I/O).
    """
    try:
        import pyaudio
    except ImportError as exc:
        raise RuntimeError(
            "microphone capture requires pyaudio, which is not installed; "
            "use StreamRecognizer.feed() with your own chunk source"
        ) from exc

    pa = pyaudio.PyAudio()
    stream = pa.open(format=pyaudio.paInt16, channels=channels, rate=rate,
                     input=True, frames_per_buffer=chunk)
    try:
        for _ in range(int(rate / chunk * seconds)):
            data = stream.read(chunk, exception_on_overflow=False)
            yield np.frombuffer(data, np.int16)
    finally:
        stream.stop_stream()
        stream.close()
        pa.terminate()


def recognize_from_mic(sia: SIA, seconds: float = 5.0, channels: int = 2,
                       topn: Optional[int] = None) -> Dict:
    """One-shot mic recognition (the reference's recognizer.py main path)."""
    rec = StreamRecognizer(sia, channels=channels,
                           window_seconds=max(seconds, 1.0))
    for chunk in mic_chunks(seconds, channels=channels,
                            rate=sia.config.sample_rate):
        rec.feed(chunk)
    return rec.recognize(topn=topn)
