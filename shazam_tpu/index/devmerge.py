"""Device-resident fingerprint index with on-device sorted merges.

Host ``merge_into`` (store.py) is a linear two-run merge at host memory
bandwidth, plus a full re-upload of the index to HBM after every merge
(``SIA._device_index = None``).  Past ~100M hashes both costs dominate
ingest.  This module keeps the index *on the device* and absorbs each
sorted addition run with a lane-parallel merge that never leaves HBM:

- every base row binary-searches the (small, cache-resident) addition
  for its rank shift; every addition row binary-searches the base;
- one scatter per column places all rows at their merged positions.

Work per merge is O((B + A) log) with zero host<->device index traffic.
The reference pays a SQL INSERT per row (``mysql_database.py:46-59``)
and never merges at all — this is the TPU-shaped equivalent of its
always-online inverted index.

Two absorption strategies:

- ``merge`` / ``merge_device_run`` — scatter merge, queryable after
  every addition.  NB: TPU scatters/gathers are row-serial; on the
  current tunnel worker this path measures ~1.7 s per M base rows (and
  the worker kills programs past tens of seconds, so >~16M-row scatter
  merges die).  Right for incremental serving-time additions on modest
  indexes.
- ``append_run`` + ``finalize`` — memcpy-class tail appends and ONE
  global stable sort on first query/save (seconds even at 33M rows).
  Right for bulk ingest; element-identical result (tested).

Compile stability (the axon tunnel costs minutes per program): arrays
live in power-of-two *capacity* buffers padded with all-ones sentinel
rows.  Sentinel keys sort strictly after every real row (real ``ex`` is
16-bit, sentinel ex is 2^32-1), so merges and the query binary search
are correct without masking; the valid count is host-side metadata.
Each merge reuses the base capacity until it fills (scatter drops the
sentinel overflow), so the merge program compiles once per capacity
doubling — O(log N) programs for a whole ingest.

Layouts mirror ``FingerprintIndex.device_arrays()``: 4 columns
(hi, lo, ex, song*stride+offset) when the packed payload fits in
uint32, else 5 (hi, lo, ex, song, offset).  Packed-payload order equals
(song, offset) order, so the full column tuple IS the sort key in both
layouts and the merge is layout-generic.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .store import FingerprintIndex

SENTINEL = np.uint32(0xFFFFFFFF)
MIN_CAPACITY = 1 << 16


def _tuple_lt(a: Tuple, b: Tuple):
    """Lexicographic a < b over equal-length tuples of uint32 arrays."""
    out = a[-1] < b[-1]
    for x, y in zip(reversed(a[:-1]), reversed(b[:-1])):
        out = (x < y) | ((x == y) & out)
    return out


def _rank_search(keys: Tuple, queries: Tuple, go_right_on):
    """Per-lane binary search of `queries` into sorted `keys`."""
    n = keys[0].shape[0]
    shape = queries[0].shape
    lo = jnp.zeros(shape, jnp.int32)
    hi = jnp.full(shape, n, jnp.int32)
    steps = max(1, (n - 1).bit_length() if n > 1 else 1) + 1

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        mids = tuple(jnp.take(k, mid) for k in keys)
        right = go_right_on(mids, queries) & (lo < hi)
        return (
            jnp.where(right, mid + 1, lo),
            jnp.where(right | (lo >= hi), hi, mid),
        )

    lo, _hi = lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _lower_rank(keys, queries):
    """#elements of `keys` strictly below each query (lower bound)."""
    return _rank_search(keys, queries, lambda m, q: _tuple_lt(m, q))


def _upper_rank(keys, queries):
    """#elements of `keys` at or below each query (upper bound)."""
    return _rank_search(keys, queries, lambda m, q: ~_tuple_lt(q, m))


@jax.jit
def merge_runs(base_cols: Tuple, add_cols: Tuple) -> Tuple:
    """Stable merge of two sorted runs on the full column tuple.

    Output length = len(base); rows whose merged position overflows the
    base capacity are dropped (by construction only sentinel rows can,
    while n_valid_total <= capacity).  Equal keys keep base rows first —
    element-identical to ``merge_into`` on the valid prefix.
    """
    nb = base_cols[0].shape[0]
    na = add_cols[0].shape[0]
    pos_b = jnp.arange(nb, dtype=jnp.int32) + _lower_rank(add_cols, base_cols)
    pos_a = jnp.arange(na, dtype=jnp.int32) + _upper_rank(base_cols, add_cols)
    out = []
    for cb, ca in zip(base_cols, add_cols):
        o = jnp.full(nb, SENTINEL, cb.dtype)
        o = o.at[pos_b].set(cb, mode="drop", unique_indices=True)
        o = o.at[pos_a].set(ca, mode="drop", unique_indices=True)
        out.append(o)
    return tuple(out)


@jax.jit
def _grow(cols: Tuple) -> Tuple:
    """Double capacity: append a sentinel tail of equal length."""
    return tuple(
        jnp.concatenate([c, jnp.full(c.shape[0], SENTINEL, c.dtype)])
        for c in cols
    )


@functools.partial(jax.jit, static_argnames=("old_stride", "new_stride"))
def _repack(cols: Tuple, n_valid, old_stride: int, new_stride: int) -> Tuple:
    """Rewrite packed payload p = sid*old + off as sid*new + off."""
    hi, lo, ex, p = cols
    sid = p // np.uint32(old_stride)
    off = p & np.uint32(old_stride - 1)
    newp = sid * np.uint32(new_stride) + off
    mask = jnp.arange(p.shape[0]) < n_valid
    return hi, lo, ex, jnp.where(mask, newp, SENTINEL)


@functools.partial(jax.jit, static_argnames=("old_stride",))
def _unpack(cols: Tuple, n_valid, old_stride: int) -> Tuple:
    """Packed 4-column layout -> unpacked 5-column layout."""
    hi, lo, ex, p = cols
    mask = jnp.arange(p.shape[0]) < n_valid
    sid = jnp.where(mask, p // np.uint32(old_stride), SENTINEL)
    off = jnp.where(mask, p & np.uint32(old_stride - 1), SENTINEL)
    return hi, lo, ex, sid, off


@functools.partial(jax.jit, static_argnames=("length",))
def _fetch_chunk(col, start, length: int):
    return jax.lax.dynamic_slice_in_dim(col, start, length)


def _capacity(n: int) -> int:
    c = MIN_CAPACITY
    while c < n:
        c <<= 1
    return c


def _stride_for(max_offset: int, n_songs: int) -> int:
    """Packing stride, same rule as ``FingerprintIndex.offset_stride``."""
    stride = 1
    while stride <= max_offset:
        stride <<= 1
    if max(n_songs, 1) * stride <= (1 << 32):
        return stride
    return 0


class DeviceIndex:
    """HBM-resident sorted index absorbing additions on the device.

    The authoritative store during device-resident ingest; ``to_host``
    materializes a ``FingerprintIndex`` for persistence/stats.  Query
    code consumes ``query_cols()`` + ``stride`` directly — the column
    tuple already matches ``FingerprintIndex.device_arrays()`` (sentinel
    tail rows are inert: no real 80-bit key compares equal to them).
    """

    def __init__(self, cols: Tuple, n_valid: int, n_songs: int,
                 max_offset: int, stride: int):
        self.cols = cols
        self.n_valid = int(n_valid)
        self.n_songs = int(n_songs)
        self.max_offset = int(max_offset)
        self.stride = int(stride)  # 0 => 5-column unpacked layout
        self._unsorted = False     # deferred-sort appends pending

    # ---- construction -------------------------------------------------
    @classmethod
    def from_host(cls, ix: FingerprintIndex,
                  reserve: int = 0) -> "DeviceIndex":
        """Upload a host index; ``reserve`` preallocates capacity so a
        large ingest compiles ONE merge program instead of one per
        capacity doubling (each remote compile costs minutes here)."""
        cap = _capacity(max(ix.n_hashes, reserve, 1))
        stride = ix.offset_stride
        pad = cap - ix.n_hashes

        def up(a):
            return jnp.asarray(np.concatenate(
                [a.astype(np.uint32), np.full(pad, SENTINEL, np.uint32)]
            ))

        if stride:
            packed = (
                ix.song_id.astype(np.uint32) * np.uint32(stride)
                + ix.offset.astype(np.uint32)
            )
            cols = (up(ix.key_hi), up(ix.key_lo), up(ix.key_ex), up(packed))
        else:
            cols = (up(ix.key_hi), up(ix.key_lo), up(ix.key_ex),
                    up(ix.song_id), up(ix.offset))
        return cls(cols, ix.n_hashes, ix.n_songs, ix.max_offset, stride)

    # ---- merge --------------------------------------------------------
    def _ensure_layout(self, n_songs: int, max_offset: int) -> None:
        """Repack/unpack the base if catalog growth changes the stride."""
        new_stride = _stride_for(max_offset, n_songs)
        if self.stride == new_stride:
            return
        if self.stride and new_stride:
            self.cols = _repack(self.cols, jnp.int32(self.n_valid),
                                old_stride=self.stride,
                                new_stride=new_stride)
        elif self.stride and not new_stride:
            self.cols = _unpack(self.cols, jnp.int32(self.n_valid),
                                old_stride=self.stride)
        # (unpacked -> packed never happens: strides only grow)
        self.stride = new_stride

    def merge(self, addition: FingerprintIndex) -> None:
        """Absorb a sorted addition run entirely on the device."""
        if addition.n_hashes == 0:
            return
        self.finalize()
        n_songs = max(self.n_songs, addition.n_songs)
        max_off = max(self.max_offset, addition.max_offset)
        self._ensure_layout(n_songs, max_off)
        new_valid = self.n_valid + addition.n_hashes
        while self.cols[0].shape[0] < new_valid:
            self.cols = _grow(self.cols)

        a_cap = _capacity(addition.n_hashes)
        pad = a_cap - addition.n_hashes

        def up(a):
            return jnp.asarray(np.concatenate(
                [a.astype(np.uint32), np.full(pad, SENTINEL, np.uint32)]
            ))

        if self.stride:
            packed = (
                addition.song_id.astype(np.uint32) * np.uint32(self.stride)
                + addition.offset.astype(np.uint32)
            )
            add_cols = (up(addition.key_hi), up(addition.key_lo),
                        up(addition.key_ex), up(packed))
        else:
            add_cols = (up(addition.key_hi), up(addition.key_lo),
                        up(addition.key_ex), up(addition.song_id),
                        up(addition.offset))
        self.cols = merge_runs(self.cols, add_cols)
        self.n_valid = new_valid
        self.n_songs = n_songs
        self.max_offset = max_off

    def merge_device_run(self, add_cols: Tuple, n_add: int,
                         n_songs: int, max_offset: int) -> None:
        """Absorb an addition that already lives on the device.

        ``add_cols`` must be a sentinel-padded sorted run in this
        index's CURRENT layout — callers run ``_ensure_layout`` first
        and build payloads with ``self.stride`` (index/devingest.py
        does).  No host<->device traffic at all.
        """
        if n_add == 0:
            return
        if self.stride == 0 or len(add_cols) != len(self.cols):
            raise ValueError(
                "device-run merge requires the packed 4-column layout; "
                "use the host ingest path for unpacked catalogs"
            )
        self.finalize()
        new_valid = self.n_valid + n_add
        while self.cols[0].shape[0] < new_valid:
            self.cols = _grow(self.cols)
        self.cols = merge_runs(self.cols, add_cols)
        self.n_valid = new_valid
        self.n_songs = max(self.n_songs, n_songs)
        self.max_offset = max(self.max_offset, max_offset)

    def append_run(self, add_cols: Tuple, n_add: int,
                   n_songs: int, max_offset: int) -> None:
        """Deferred-sort ingest: write the run at the tail, sort later.

        The lane-parallel scatter merge costs O(base) per call —
        pathological for bulk ingest (and some TPU tunnel workers kill
        programs running past tens of seconds, which a >30M-row scatter
        exceeds).  Appends are memcpy-class dynamic-slice writes; one
        global stable sort at :meth:`finalize` costs seconds and yields
        the identical index (equal full-column rows are interchangeable,
        so the merge tie rule is unobservable).  Layout rules match
        ``merge_device_run``.
        """
        if n_add == 0:
            return
        if self.stride == 0 or len(add_cols) != len(self.cols):
            raise ValueError(
                "device-run append requires the packed 4-column layout; "
                "use the host ingest path for unpacked catalogs"
            )
        add_len = add_cols[0].shape[0]
        while self.cols[0].shape[0] < self.n_valid + add_len:
            self.cols = _grow(self.cols)  # full padded run must fit
        start = jnp.int32(self.n_valid)
        self.cols = tuple(
            jax.lax.dynamic_update_slice(c, a, (start,))
            for c, a in zip(self.cols, add_cols)
        )
        self.n_valid += n_add
        self.n_songs = max(self.n_songs, n_songs)
        self.max_offset = max(self.max_offset, max_offset)
        self._unsorted = True

    def finalize(self) -> None:
        """Sort pending appended runs into place (no-op when sorted).

        The tail beyond each appended run's valid rows is sentinel, so
        the single stable sort moves every real row into global order
        and all padding to the end — element-identical to a sequence of
        scatter merges.
        """
        if self._unsorted:
            self.cols = lax.sort(self.cols, num_keys=len(self.cols))
            self._unsorted = False

    _DOWNLOAD_CHUNK = 1 << 24  # rows (64 MB) per device->host transfer

    def _download(self, col) -> np.ndarray:
        """Fetch the valid prefix of a column in bounded transfers.

        The axon tunnel occasionally faults on multi-hundred-MB single
        transfers (seen at 256 MB in benchmarks/devmerge_scale.py); one
        jitted dynamic_slice per column shape keeps every transfer at
        64 MB with O(log) compiled programs.
        """
        n = self.n_valid
        chunk = self._DOWNLOAD_CHUNK
        if n <= chunk:
            return np.asarray(col[:n] if n < col.shape[0] else col)
        parts = []
        start = 0
        while start < n:
            s = min(start, n - chunk)   # last chunk backs up to cover n
            part = np.asarray(_fetch_chunk(col, jnp.int32(s), chunk))
            parts.append(part[start - s:])
            start = s + chunk
        return np.concatenate(parts)[:n]

    # ---- consumption --------------------------------------------------
    def query_cols(self) -> Tuple:
        """Device arrays in the shape ``match_query`` expects."""
        self.finalize()
        return self.cols

    def to_host(self) -> FingerprintIndex:
        self.finalize()
        cols = [self._download(c) for c in self.cols]
        if self.stride:
            hi, lo, ex, p = cols
            sid = (p // np.uint32(self.stride)).astype(np.uint32)
            off = (p & np.uint32(self.stride - 1)).astype(np.uint32)
        else:
            hi, lo, ex, sid, off = cols
        return FingerprintIndex(hi, lo, ex, sid, off,
                                n_songs=self.n_songs,
                                max_offset=self.max_offset)
