from .io import read, write_wav, find_files, unique_file_hash
from .noise import white_noise_for_snr, scale_noise_to_snr, mix_at_snr, renormalize
from .resample import resample_channel, resample_channels
from .synth import synth_song, synth_corpus

__all__ = [
    "read",
    "resample_channel",
    "resample_channels",
    "write_wav",
    "find_files",
    "unique_file_hash",
    "white_noise_for_snr",
    "scale_noise_to_snr",
    "mix_at_snr",
    "renormalize",
    "synth_song",
    "synth_corpus",
]
