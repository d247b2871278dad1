"""Song-sharded catalog matching == single-device matching (8-dev mesh)."""

import numpy as np
import pytest

from tests.test_match import (
    _build_db, _index_from_rows, _query_from_pairs, _random_hex,
)


@pytest.fixture(scope="module")
def mesh():
    import jax
    from shazam_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8
    return make_mesh(8)


@pytest.mark.parametrize("seed", [1, 4])
def test_song_sharded_matches_single(mesh, seed):
    import jax.numpy as jnp
    from shazam_tpu.match.lookup import match_query
    from shazam_tpu.parallel.bigcatalog import (
        shard_index_by_song, sharded_match_by_song,
    )

    rng = np.random.default_rng(seed)
    rows = _build_db(rng, n_songs=24, rows_per_song=200)
    index = _index_from_rows(rows)

    true_sid = 13
    song_rows = [r for r in rows if r[1] == true_sid]
    q_pairs = sorted(
        {(h, max(off - 9, 0)) for h, _s, off in song_rows[:100]}
        | {(h, int(rng.integers(0, 200))) for h in _random_hex(rng, 30)}
    )
    q = _query_from_pairs(q_pairs)
    delta_min = -(index.max_offset + 100)
    delta_range = 2 * (index.max_offset + 100)
    qargs = tuple(jnp.asarray(a)
                  for a in (q.hi, q.lo, q.ex, q.t, q.valid, q.first))

    single = match_query(
        index.device_arrays(), *qargs,
        n_songs=index.n_songs, delta_min=delta_min, delta_range=delta_range,
        match_capacity=65536, topn=4, offset_stride=index.offset_stride,
    )

    stacked, n_local, stride = shard_index_by_song(index, 8)
    sharded = sharded_match_by_song(
        mesh, stacked, n_local, stride, *qargs,
        delta_min=delta_min, delta_range=delta_range,
        match_capacity=65536, topn=4,
    )

    n = min(4, int(single.n_ranked))
    got = [(int(sharded.top_songs[i]), int(sharded.top_deltas[i]),
            int(sharded.top_votes[i]), int(sharded.row_counts[i]))
           for i in range(n)]
    ref = [(int(single.top_songs[i]), int(single.top_deltas[i]),
            int(single.top_votes[i]), int(single.row_counts[i]))
           for i in range(n)]
    assert got == ref
    assert int(sharded.total_rows) == int(single.total_rows)
    assert int(sharded.n_ranked) == int(single.n_ranked)
