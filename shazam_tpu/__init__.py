"""shazam-tpu: a TPU-native audio-fingerprinting framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
CarlosArturoMe/shazam ("SIA"): Shazam-style audio identification with
STFT constellation fingerprints, an HBM-resident hash index, and
offset-histogram matching — designed for TPU meshes instead of a SQL
server.
"""

from .config import FingerprintConfig, DEFAULT_CONFIG
from .api import SIA

__version__ = "0.1.0"

__all__ = ["SIA", "FingerprintConfig", "DEFAULT_CONFIG", "__version__"]
