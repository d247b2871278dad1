"""Query preparation: channel fingerprints -> padded device query arrays.

The reference builds a Python set of (hash, offset) pairs across channels
(``recognizer.py:378-382``) and a hash -> offsets mapper
(``recognizer.py:237-242``). Here that becomes: dedup on host (numpy
sort-unique over the 80-bit keys + offset), flag the first pair of every
distinct hash (the dedup-row-count unit), and pad to a bucketed static
length so XLA reuses compiled programs across queries.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

from ..ops.fingerprint import Fingerprints


class QueryPairs(NamedTuple):
    hi: np.ndarray      # uint32 (Q,)
    lo: np.ndarray      # uint32 (Q,)
    ex: np.ndarray      # uint32 (Q,)
    t: np.ndarray       # uint32 (Q,)
    valid: np.ndarray   # bool   (Q,)
    first: np.ndarray   # bool   (Q,) first pair of its distinct hash
    n_pairs: int        # true unique pair count


def _bucket(n: int, minimum: int = 1024) -> int:
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


def prepare_query(fps: Sequence[Fingerprints], pad_to: int | None = None) -> QueryPairs:
    """Dedup + pad fingerprints from one or more channels."""
    his, los, exs, ts = [], [], [], []
    for fp in fps:
        valid = np.asarray(fp.valid)
        his.append(np.asarray(fp.hi)[valid])
        los.append(np.asarray(fp.lo)[valid])
        exs.append(np.asarray(fp.ex)[valid])
        ts.append(np.asarray(fp.t1)[valid])
    hi = np.concatenate(his) if his else np.zeros(0, np.uint32)
    lo = np.concatenate(los) if los else np.zeros(0, np.uint32)
    ex = np.concatenate(exs) if exs else np.zeros(0, np.uint32)
    t = np.concatenate(ts) if ts else np.zeros(0, np.uint32)

    if hi.size:
        stacked = np.stack(
            [hi.astype(np.uint64), lo.astype(np.uint64),
             ex.astype(np.uint64), t.astype(np.uint64)],
            axis=1,
        )
        stacked = np.unique(stacked, axis=0)  # sorted by (hi, lo, ex, t)
        hi, lo, ex, t = (stacked[:, i].astype(np.uint32) for i in range(4))
        same_as_prev = np.zeros(len(hi), bool)
        same_as_prev[1:] = (
            (hi[1:] == hi[:-1]) & (lo[1:] == lo[:-1]) & (ex[1:] == ex[:-1])
        )
        first = ~same_as_prev
    else:
        first = np.zeros(0, bool)

    n = len(hi)
    cap = pad_to if pad_to is not None else _bucket(max(n, 1))
    if n > cap:
        raise ValueError(f"query has {n} pairs > pad_to={cap}")
    pad = cap - n
    out = QueryPairs(
        hi=np.pad(hi, (0, pad)),
        lo=np.pad(lo, (0, pad)),
        ex=np.pad(ex, (0, pad)),
        t=np.pad(t, (0, pad)),
        valid=np.pad(np.ones(n, bool), (0, pad)),
        first=np.pad(first, (0, pad)),
        n_pairs=n,
    )
    return out


def q_frames_for_max_offset(max_offset: int, floor: int = 1024) -> int:
    """Smallest power-of-two delta window strictly covering a query's
    max frame offset (>= floor).

    THE one sizing rule for the vote-histogram window — shared by
    ``SIA``, ``ShardedCatalog`` and ``SpannedCatalog`` so compiled-shape
    buckets and delta windows can never drift between the single-device
    and mesh paths (the reference handles any clip length,
    ``recognizer.py:289-338``; a fixed window silently drops votes with
    deltas below its floor).
    """
    frames = floor
    while frames <= max_offset:
        frames *= 2
    return frames
