"""Distributed serving: a sharded catalog engine over a device mesh.

Glue that turns the raw sharded matchers into the multi-chip analog of
``SIA``: pick a sharding regime by catalog size, hold the device shards,
and answer queries prepared by ``match.prepare`` — the pod-scale serving
story the reference delegated to its external DB server.

Regime selection:
- catalogs whose dense vote histogram fits per-chip HBM replicated
  (n_songs * delta_range * 4B <= dense_limit) use key-range shards with a
  psum vote combine (balanced searches);
- larger catalogs (the 1M-track configuration) use song shards with
  local voting + an all_gather candidate merge (see bigcatalog.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

import jax

from ..config import FingerprintConfig, DEFAULT_CONFIG
from ..index.search import build_head, stacked_head_bits
from ..index.store import FingerprintIndex
from ..match.prepare import QueryPairs
from ..match.align import align_results, MatchResult
from .mesh import make_mesh, shard_index_arrays
from .sharded import sharded_match_query
from .bigcatalog import shard_index_by_song, sharded_match_by_song


class ShardedCatalog:
    """A fingerprint index sharded across every device of a mesh."""

    def __init__(
        self,
        index: FingerprintIndex,
        mesh=None,
        config: FingerprintConfig = DEFAULT_CONFIG,
        catalog=None,
        dense_limit_bytes: int = 64 << 20,
        max_q_frames: int = 4096,
    ):
        self.mesh = mesh or make_mesh()
        self.config = config
        self.catalog = catalog
        # keep only the scalars: pinning the full host FingerprintIndex
        # here would hold every key/payload column in host RAM for the
        # catalog's lifetime alongside the device shards (match/stats
        # need three ints)
        self.n_songs = index.n_songs
        self.n_hashes = index.n_hashes
        self.max_offset = index.max_offset
        n_dev = self.mesh.devices.size

        self._max_off = ((index.max_offset // 4096) + 1) * 4096

        # the key-range regime psums a dense (n_songs, delta_range) vote
        # histogram across the mesh — ~500 MB per device per query at
        # 12K songs. Past `dense_limit_bytes` the by-song regime (local
        # voting over n_songs/n_dev songs + one tiny all_gather) is
        # strictly cheaper, long before its 1M-song design point.
        # Budget at max_q_frames, not the 1024 floor: match() escalates
        # q_frames per query (clips up to ~190 s at the 4096 default),
        # and the regime must hold the budget for the LONGEST accepted
        # clip, not just the shortest.
        self.max_q_frames = max_q_frames
        dense_bytes = (max(index.n_songs, 1)
                       * self._delta_range_for(max_q_frames) * 4)
        self.regime = "key_range" if dense_bytes <= dense_limit_bytes else "by_song"

        # place shards ON the mesh: a bare jnp.asarray would park the
        # full (n_shards, rows) stack in device 0's HBM (OOM at the
        # catalog sizes this regime exists for) and re-transfer it into
        # the shard_map on every query
        axis = self.mesh.axis_names[0]
        row_sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(axis, None))

        def place(a):
            return jax.device_put(jnp.asarray(a), row_sharding)

        if self.regime == "key_range":
            self._shards = tuple(
                place(a) for a in shard_index_arrays(index, n_dev)
            )
            self._stride = index.offset_stride
        else:
            stacked, self._n_local, self._stride = shard_index_by_song(
                index, n_dev
            )
            self._shards = tuple(place(a) for a in stacked)
        # per-shard bucket-CDF heads: exact search windows regardless of
        # the key distribution (hot hash runs defeat interpolation)
        bits = stacked_head_bits(self._shards[0].shape[1])
        if bits is not None:
            # ONE jitted program laid out on the mesh (multihost.py uses
            # the same form): an eager vmap would dispatch per-primitive
            # and the result would need a resharding device_put after
            import functools

            self._head = jax.jit(
                jax.vmap(functools.partial(build_head, bits=bits)),
                out_shardings=row_sharding,
            )(self._shards[0])
        else:
            self._head = None

    def _delta_range_for(self, q_frames: int) -> int:
        return self._max_off + 2 * q_frames

    def _q_frames_for(self, q: QueryPairs) -> int:
        """Power-of-two window covering the query's max frame offset —
        long queries must not silently drop low deltas (the reference
        handles any clip length, ``recognizer.py:289-338``)."""
        from ..match.prepare import q_frames_for_max_offset

        max_t = int(np.max(q.t[: q.n_pairs])) if q.n_pairs else 0
        return q_frames_for_max_offset(max_t)

    def match(self, q: QueryPairs, topn: Optional[int] = None) -> MatchResult:
        """Match prepared query pairs; returns reference-shaped results.

        Match capacity escalates x4 up to ``config.match_capacity_max``
        when a tier overflows (hyper-common hashes own 10K-70K rows at
        reference scale and EVERY row must vote — same policy as the
        single-device ``SIA._match_prepared``); the jitted program per
        tier is cached, so steady-state queries stay one dispatch.
        """
        args = tuple(
            jnp.asarray(a) for a in (q.hi, q.lo, q.ex, q.t, q.valid, q.first)
        )
        topn = topn or self.config.topn
        q_frames = self._q_frames_for(q)
        if q_frames > self.max_q_frames:
            raise ValueError(
                f"query needs q_frames={q_frames} > max_q_frames="
                f"{self.max_q_frames}: the dense-histogram HBM budget was "
                "sized at construction — raise max_q_frames there")
        delta_min = -q_frames
        delta_range = self._delta_range_for(q_frames)

        cap = self.config.match_capacity
        cap_max = self.config.match_capacity_max
        while True:
            raw = self._match_once(args, topn, delta_min, delta_range, cap)
            total = int(raw.total_rows)
            # judge against the regime's EFFECTIVE bound (per-shard caps
            # summed): a psum'd total above the nominal cap with every
            # shard under its own cap is exact, not an overflow
            if total <= self._effective_cap(cap) or cap >= cap_max:
                break
            if (self.config.decision_escalation
                    and int(raw.top_votes[0]) - int(raw.runner_votes)
                    > int(raw.n_dropped)):
                # provably-exact early accept (api.SIA._decided): the
                # escalated tier cannot change the top-1 song or offset.
                # Key-range ranks from the psum'd global histogram so
                # runner_votes is sound; the by-song regime reports a
                # zero margin by construction and always escalates.
                return align_results(
                    raw, q.n_pairs, catalog=self.catalog,
                    config=self.config,
                    match_capacity=max(total, self._effective_cap(cap)))
            while self._effective_cap(cap) < total and cap < cap_max:
                cap *= 4
            cap = min(cap, cap_max)
        return align_results(raw, q.n_pairs, catalog=self.catalog,
                             config=self.config,
                             match_capacity=self._effective_cap(cap))

    def match_apriori(self, q: QueryPairs, topn: Optional[int] = None,
                      batch_size: int = 1024) -> MatchResult:
        """Partial-scan match with the reference's 2x-leader early exit
        (``recognizer_apriori.py:245-310``) on the KEY-RANGE regime:
        each round is one shard_map dispatch (per-shard search + one
        hist psum) and the exit skips every later round's search AND
        psum — see ``sharded.sharded_match_apriori`` for the cost
        model.  The by-song regime has no per-round psum to save (its
        merge is a tiny all_gather) and falls back to the full match.
        """
        from .sharded import sharded_match_apriori

        if self.regime != "key_range":
            return self.match(q, topn=topn)
        topn = topn or self.config.topn
        q_frames = self._q_frames_for(q)
        if q_frames > self.max_q_frames:
            raise ValueError(
                f"query needs q_frames={q_frames} > max_q_frames="
                f"{self.max_q_frames}")
        delta_min = -q_frames
        delta_range = self._delta_range_for(q_frames)
        cap = self.config.match_capacity
        raw, used, clamped = sharded_match_apriori(
            self.mesh, self._shards, q,
            n_songs=max(self.n_songs, 1),
            delta_min=delta_min, delta_range=delta_range,
            match_capacity=cap, topn=topn, batch_size=batch_size,
            offset_stride=self._stride, sharded_head=self._head,
        )
        # clamped: a shard's expansion overflowed -> full-match escalate
        # (partial counts must come from complete rounds, like SIA's
        # apriori fallback). total legitimately exceeds one round's cap
        # on multi-round scans, so overflow is the per-shard signal.
        if clamped:
            return self.match(q, topn=topn)
        return align_results(
            raw, q.n_pairs, catalog=self.catalog, config=self.config,
            match_capacity=max(int(raw.total_rows),
                               self._effective_cap(cap)))

    def _effective_cap(self, match_capacity: int) -> int:
        from .bigcatalog import (
            effective_match_capacity as by_song_cap,
        )
        from .sharded import effective_match_capacity as key_range_cap

        n_dev = self.mesh.devices.size
        return (key_range_cap(match_capacity, n_dev)
                if self.regime == "key_range"
                else by_song_cap(match_capacity, n_dev))

    def _match_once(self, args, topn, delta_min, delta_range, cap) -> "RawMatch":
        if self.regime == "key_range":
            return sharded_match_query(
                self.mesh, self._shards, *args,
                n_songs=max(self.n_songs, 1),
                delta_min=delta_min, delta_range=delta_range,
                match_capacity=cap,
                topn=topn, offset_stride=self._stride,
                sharded_head=self._head,
            )
        return sharded_match_by_song(
            self.mesh, self._shards, self._n_local, self._stride, *args,
            delta_min=delta_min, delta_range=delta_range,
            match_capacity=cap, topn=topn,
            sharded_head=self._head,
        )

    def stats(self) -> Dict:
        return {
            "regime": self.regime,
            "n_devices": int(self.mesh.devices.size),
            "n_songs": self.n_songs,
            "n_hashes": self.n_hashes,
            "delta_range": self._delta_range_for(1024),
        }


class ShardedRecognizer:
    """SIA-shaped recognition over a ``ShardedCatalog``.

    The duck type ``serve.RecognitionServer`` consumes (``recognize_
    samples`` / ``recognize_batch`` / ``get_metadata`` / ``config`` /
    ``catalog``), so the HTTP daemon can front a mesh-sharded catalog:
    fingerprinting runs the standard single-device pipeline (an internal
    index-less ``SIA`` supplies the fused path + exact fallback), and
    every match already spans the mesh — per-query parallelism is ACROSS
    shards, so ``recognize_batch`` is a loop rather than a vmap (the
    chips are busy either way).
    """

    def __init__(self, cat: ShardedCatalog):
        from ..api import SIA  # lazy: api is a higher layer

        self.cat = cat
        self.config = cat.config
        self.catalog = cat.catalog
        self._fp = SIA(config=cat.config)  # fingerprint-only engine

    # ---- the serve.RecognitionServer engine surface --------------------
    def _live_n_hashes(self) -> int:
        return self.cat.n_hashes

    def get_metadata(self, track_id: int):
        return self.catalog.get_metadata(track_id) if self.catalog else None

    def recognize_samples(self, channels, topn: Optional[int] = None,
                          early_exit: bool = False,
                          q_pad_to: Optional[int] = None) -> Dict:
        import time

        from ..match.prepare import prepare_query

        if early_exit and self.cat.regime != "key_range":
            # loud fallback (matches SIA): the by-song regime has no
            # partial-scan mode — silently dropping the kwarg would let
            # the caller believe a partial scan ran
            import warnings

            warnings.warn(
                "early_exit needs the key-range regime; running a "
                "full match (identical top-1, full-scan vote counts)",
                stacklevel=2)
            early_exit = False
        t0 = time.time()
        channels = [np.asarray(ch) for ch in channels if len(ch)]
        if not channels:
            return {
                "results": [], "total_matches": 0, "overflowed": False,
                "partial_counts": False,
                "input_hashes": 0, "fingerprint_time": 0.0,
                "query_time": 0.0, "align_time": 0.0, "total_time": 0.0,
            }
        fps = [self._fp._fingerprint_channel(ch) for ch in channels]
        q = prepare_query(fps)
        if q_pad_to is not None and q_pad_to > len(q.hi):
            # serve.warmup's pair-bucket knob (the match program's shape
            # is the pow2 pair bucket) — results identical at any
            # padding; extend the existing pads (zeros, valid=False)
            # rather than re-running the whole dedup/sort preparation
            pad = q_pad_to - len(q.hi)
            q = QueryPairs(
                *(np.pad(a, (0, pad)) for a in
                  (q.hi, q.lo, q.ex, q.t, q.valid, q.first)),
                n_pairs=q.n_pairs,
            )
        jax.block_until_ready(fps[-1].hi)
        fingerprint_time = time.time() - t0

        t0 = time.time()
        matched = (self.cat.match_apriori(q, topn=topn) if early_exit
                   else self.cat.match(q, topn=topn))  # align included
        query_time = time.time() - t0
        return {
            "results": matched.results,
            "total_matches": matched.total_matches,
            "overflowed": matched.overflowed,
            "partial_counts": matched.partial_counts,
            "input_hashes": q.n_pairs,
            "fingerprint_time": fingerprint_time,
            "query_time": query_time,
            "align_time": 0.0,
            "total_time": fingerprint_time + query_time,
        }

    def recognize_batch(self, clips, topn: Optional[int] = None,
                        pad_to_pow2: bool = False,
                        q_pad_to: Optional[int] = None):
        return [self.recognize_samples([c], topn=topn, q_pad_to=q_pad_to)
                for c in clips]

    def match_prepared(self, q, topn: Optional[int] = None):
        """Aligned match of an externally prepared query — the hook
        ``stream.StreamRecognizer`` uses, so continuous-listening
        sessions (incremental host-side fingerprinting) can front a
        mesh-sharded catalog like one-shot recognition does."""
        return self.cat.match(q, topn=topn)
