"""Sequence-parallel fingerprint == single-device fingerprint (8-dev mesh)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh():
    import jax
    from shazam_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8
    return make_mesh(8)


def test_sequence_parallel_matches_single(mesh):
    import jax.numpy as jnp
    from shazam_tpu.parallel.sequence import sequence_parallel_fingerprint
    from shazam_tpu.ops.fingerprint import fingerprint_samples
    from shazam_tpu.audio.synth import synth_song

    song = synth_song(4, duration_s=6.0, seed=17).astype(np.float32)
    n_dev, hop = 8, 2048
    blen = -(-len(song) // (n_dev * hop)) * (n_dev * hop)
    padded = np.zeros(blen, np.float32)
    padded[: len(song)] = song

    seq = sequence_parallel_fingerprint(
        mesh, jnp.asarray(padded), len(song), peak_capacity=4096
    )
    ref = fingerprint_samples(
        jnp.asarray(padded), jnp.int32(len(song)), peak_capacity=4096
    )

    assert int(seq.n_peaks) == int(ref.n_peaks)
    vs = np.asarray(seq.valid)
    vr = np.asarray(ref.valid)
    got = set(zip(np.asarray(seq.hi)[vs].tolist(), np.asarray(seq.lo)[vs].tolist(),
                  np.asarray(seq.t1)[vs].tolist()))
    exp = set(zip(np.asarray(ref.hi)[vr].tolist(), np.asarray(ref.lo)[vr].tolist(),
                  np.asarray(ref.t1)[vr].tolist()))
    assert got == exp
    assert len(got) > 100


def test_sequence_parallel_peak_overflow_detected(mesh):
    """A temporally dense region that blows one shard's peak quota must
    surface n_peaks > peak_capacity (never a silent drop)."""
    import jax.numpy as jnp
    from shazam_tpu.parallel.sequence import sequence_parallel_fingerprint
    from shazam_tpu.ops.fingerprint import fingerprint_samples

    n_dev, hop = 8, 2048
    rng = np.random.default_rng(3)
    blen = n_dev * hop * 16
    samples = np.zeros(blen, np.float32)
    # loud wideband noise confined to the first shard's chunk
    samples[: blen // n_dev] = rng.normal(0, 8000, blen // n_dev)

    cap = 64  # cap_shard = 8 per device
    seq = sequence_parallel_fingerprint(
        mesh, jnp.asarray(samples), blen, peak_capacity=cap
    )
    ref = fingerprint_samples(
        jnp.asarray(samples), jnp.int32(blen), peak_capacity=16384
    )
    assert int(ref.n_peaks) > cap  # the signal really is dense
    assert int(seq.n_peaks) > cap  # ...and the sharded path says so


def test_sequence_parallel_short_input_raises(mesh):
    """Chunks shorter than the exchanged halo would silently truncate
    it, breaking the bit-exactness promise — must raise instead."""
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from shazam_tpu.parallel.sequence import sequence_parallel_fingerprint

    n_dev = mesh.devices.size
    n = n_dev * 2048 * 9  # chunk = 18432 < halo_r = 22528 at defaults
    samples = jnp.zeros(n, jnp.float32)
    with pytest.raises(ValueError, match="too short"):
        sequence_parallel_fingerprint(mesh, samples, np.int32(n))
