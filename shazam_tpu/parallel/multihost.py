"""Multi-host catalog spanning: song shards across processes over DCN.

The reference's only scale-out knob was an Elasticsearch shard count it
pinned to 1 (``elastic_database.py:42,80``) — one external server, one
host. Here a catalog larger than a slice's HBM spans *processes*:

- ``init_multihost`` brings up ``jax.distributed`` (the JAX runtime's
  process-spanning rendezvous; collectives ride ICI within a slice and
  DCN across slices — on CPU test rigs, Gloo).
- ``SpannedCatalog`` places the by-song regime (``bigcatalog.py``) on a
  global mesh whose devices span every process. Each process
  materializes ONLY its own devices' song shards; the one collective per
  query is the tiny (topn x n_shards) candidate all_gather, which a
  DCN-latency hop absorbs easily (the histograms and binary searches are
  all shard-local).

Deterministic layout contract: global song s lives on shard
``s % n_shards`` as local id ``s // n_shards`` — every process derives
the same layout from the same catalog metadata, no coordination needed.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..index.store import FingerprintIndex
from ..match.align import align_results, MatchResult
from ..match.prepare import QueryPairs
from .bigcatalog import shard_index_by_song, sharded_match_by_song


def init_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_count: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime for catalog spanning.

    :param coordinator_address: "host:port" of process 0.
    :param local_device_count: on CPU rigs, fake this many local devices
        per process (must be set before the backend initializes).
    """
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={local_device_count}"
            ).strip()
    import jax

    # NB: must not touch the backend before initialize(); read the
    # *configured* platform rather than jax.default_backend()
    platforms = jax.config.jax_platforms or ""
    if "cpu" in platforms or platforms == "":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax: CPU collectives default works or raises later
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh():
    """One-axis mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("shard",))


class SpannedCatalog:
    """A by-song sharded catalog whose shards span host processes."""

    def __init__(self, index_meta, mesh=None):
        """index_meta: (n_songs, max_offset, offset_stride) — identical on
        every process (derived from the same catalog metadata)."""
        import jax

        self.mesh = mesh or global_mesh()
        self.n_songs, self.max_offset, self._stride = index_meta
        self.n_shards = self.mesh.devices.size
        self.n_local_songs = -(-max(self.n_songs, 1) // self.n_shards)
        self._arrays = None

    @classmethod
    def from_full_index(cls, index: FingerprintIndex, mesh=None):
        """Every process holds the full index (small catalogs / tests):
        each keeps only the rows of its own addressable shards."""
        cat = cls((index.n_songs, index.max_offset, index.offset_stride),
                  mesh=mesh)
        stacked, n_local, stride = shard_index_by_song(index, cat.n_shards)
        assert n_local == cat.n_local_songs and stride == cat._stride
        cat._place(stacked)
        return cat

    def _my_shard_ids(self) -> Sequence[int]:
        devs = list(self.mesh.devices.reshape(-1))
        import jax

        return [i for i, d in enumerate(devs) if d.process_index
                == jax.process_index()]

    def _place(self, stacked) -> None:
        """Build global arrays from process-local shard rows."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        mine = self._my_shard_ids()
        sharding = NamedSharding(self.mesh, P("shard", None))
        self._arrays = tuple(
            jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(a[mine]),
                (self.n_shards,) + a.shape[1:],
            )
            for a in stacked
        )

    def _replicate(self, a: np.ndarray):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, P()), np.asarray(a), a.shape
        )

    def match(self, q: QueryPairs, *, topn: int = 2,
              match_capacity: int = 65536, q_frames: int = 1024,
              catalog=None, config=None) -> MatchResult:
        """Match prepared query pairs across every process's shards."""
        from ..config import DEFAULT_CONFIG

        delta_min = -q_frames
        delta_range = self.max_offset + 2 * q_frames
        args = tuple(
            self._replicate(a)
            for a in (q.hi, q.lo, q.ex, q.t, q.valid, q.first)
        )
        raw = sharded_match_by_song(
            self.mesh, self._arrays, self.n_local_songs, self._stride,
            *args,
            delta_min=delta_min, delta_range=delta_range,
            match_capacity=match_capacity, topn=topn,
        )
        import jax

        raw = jax.device_get(raw)
        return align_results(raw, q.n_pairs, catalog=catalog,
                             config=config or DEFAULT_CONFIG)
