"""Spectrogram + constellation visualizer.

Reproduces the plotting path of the reference (``get_2D_peaks(plot=True)``
at ``__init__.py:166-175`` and the full-song render of
``recognizer_plot.py:468-477``) as a headless PNG writer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def plot_constellation(samples, out_path: str, fs: int = 44100,
                       amp_min: float = 10.0, radius: int = 10,
                       title: Optional[str] = None) -> str:
    """Render the dB spectrogram with peak scatter to a PNG; returns path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..ops.spectrogram import spectrogram_db
    from ..ops.peaks import peak_mask

    spec = np.asarray(spectrogram_db(np.asarray(samples), fs=fs))
    mask = np.asarray(peak_mask(spec, amp_min, radius=radius))
    freqs, times = np.nonzero(mask)

    fig, ax = plt.subplots(figsize=(12, 6))
    ax.imshow(spec, origin="lower", aspect="auto", cmap="magma")
    ax.scatter(times, freqs, s=4, c="cyan")
    ax.set_xlabel("Time (frames)")
    ax.set_ylabel("Frequency (bins)")
    ax.set_title(title or "Spectrogram")
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
