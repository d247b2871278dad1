from .oracle import (
    oracle_spectrogram,
    oracle_peaks,
    oracle_hashes,
    oracle_fingerprint,
    oracle_align,
)

__all__ = [
    "oracle_spectrogram",
    "oracle_peaks",
    "oracle_hashes",
    "oracle_fingerprint",
    "oracle_align",
]
