"""Stage split of the single-dispatch recognize program at 95M rows.

catalog_full measured recognize_clip ~27 ms vs the 95.3M-hash production
index while the component benches (bounds 4.8, sparse match 8.5, small
fingerprint) predict ~12 — this experiment decomposes the full program
on a synthetic index with the production's two key features: uniform
SHA-1 keys AND hyper-common hash runs implanted on hashes the clip
actually queries (32K duplicate rows each, the escalation-tier driver).

Programs timed (chained fori_loop with a DYNAMIC trip count so each
stage compiles once; every output leaf feeds the carry):
  fp        — fused fingerprint only
  dedup     — + query compaction + dedup sort + masks
  expand    — + lexi_bounds + row expansion sums (no vote sort)
  full      — recognize_on_device (sparse matcher), hot-run index
  full_cold — same compiled program vs the index WITHOUT hot runs
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from shazam_tpu.audio.synth import synth_song
from shazam_tpu.match.ondevice import recognize_on_device
from shazam_tpu.match.lookup import _expand
from shazam_tpu.ops.fingerprint import fingerprint_batch_fused, \
    fingerprint_batch

USE_FUSED = os.environ.get("FUSED", "1") != "0"   # 0: CPU logic check
_fp_batch = fingerprint_batch_fused if USE_FUSED else fingerprint_batch

N = int(os.environ.get("SEARCH_ROWS", 95_000_000))
N_SONGS, STRIDE = 12288, 8192
FS = 44100
CLIP_S = 15.0
KW = dict(
    n_songs=N_SONGS, delta_min=-1024, delta_range=8192,
    match_capacity=16384, topn=2, offset_stride=STRIDE,
    peak_capacity=8192, query_capacity=4096, use_fused=USE_FUSED,
)
N_HOT = 32
HOT_LEN = 32768
# pad the index to the next power of two with 0xFFFFFFFF sentinel rows —
# the device-resident production layout (95.3M valid in 134M capacity).
# Invalid query lanes' sort keys land in the sentinel bucket; without
# zero-width spans for them the head descent pays ~26 rounds per batch.
SENTINEL_PAD = os.environ.get("SENTINEL_PAD", "0") != "0"


def build_index(key, hot_hi, hot_lo, hot_ex):
    """Uniform sorted 4-col index; first N_HOT*HOT_LEN rows get the hot
    keys (the sort spreads them to their proper buckets as giant runs)."""
    k1, k2, k3, k4, k5 = random.split(key, 5)
    hi = random.bits(k1, (N,), jnp.uint32)
    lo = random.bits(k2, (N,), jnp.uint32)
    ex = random.bits(k3, (N,), jnp.uint32) >> 16
    if hot_hi is not None:
        tot = N_HOT * HOT_LEN
        hi = hi.at[:tot].set(jnp.repeat(hot_hi, HOT_LEN,
                                        total_repeat_length=tot))
        lo = lo.at[:tot].set(jnp.repeat(hot_lo, HOT_LEN,
                                        total_repeat_length=tot))
        ex = ex.at[:tot].set(jnp.repeat(hot_ex, HOT_LEN,
                                        total_repeat_length=tot))
    pay = (random.randint(k4, (N,), 0, N_SONGS, jnp.int32).astype(jnp.uint32)
           * jnp.uint32(STRIDE)
           + random.randint(k5, (N,), 0, 4500, jnp.int32).astype(jnp.uint32))
    hi, lo, ex, pay = lax.sort((hi, lo, ex, pay), num_keys=3)
    if SENTINEL_PAD:
        cap = 1 << max(int(np.ceil(np.log2(N))), 1)
        pad = cap - N
        hi, lo, ex, pay = (
            jnp.concatenate([a, jnp.full(pad, 0xFFFFFFFF, jnp.uint32)])
            for a in (hi, lo, ex, pay))
    return hi, lo, ex, pay


def make_clip():
    song = synth_song(7, duration_s=30.0, seed=77)
    clip = song[FS * 5: FS * 5 + int(CLIP_S * FS)].astype(np.float32)
    cblen = -(-len(clip) // (1 << 18)) * (1 << 18)
    padded = np.zeros(cblen, np.float32)
    padded[: len(clip)] = clip
    return (jnp.asarray(padded)[None, :],
            jnp.asarray([len(clip)], np.int32))


FP_KW = dict(fs=FS, wsize=4096, hop=2048, amp_min=10.0, radius=10,
             fan_value=5, min_dt=0, max_dt=200,
             peak_capacity=KW["peak_capacity"])


def fp_stage(x, nv):
    fp = _fp_batch(x, nv, **FP_KW)
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(fp))


def _dedup(x, nv):
    fp = _fp_batch(x, nv, **FP_KW)
    hi, lo, ex, t1, valid = fp.hi[0], fp.lo[0], fp.ex[0], fp.t1[0], fp.valid[0]
    n_lanes = hi.shape[0]
    cap = min(KW["query_capacity"], n_lanes)
    score = jnp.where(valid, n_lanes - jnp.arange(n_lanes, dtype=jnp.int32), 0)
    vals, idx = jax.lax.top_k(score, cap)
    ok = vals > 0
    safe = jnp.where(ok, idx, 0)
    hi, lo, ex, t1 = (jnp.take(a, safe) for a in (hi, lo, ex, t1))
    valid = ok
    sort_hi = jnp.where(valid, hi, jnp.uint32(0xFFFFFFFF))
    ex_t1 = (ex << jnp.uint32(16)) | (t1 & jnp.uint32(0xFFFF))
    sort_hi, lo, ex_t1, valid = jax.lax.sort(
        (sort_hi, lo, ex_t1, valid), num_keys=3)
    ex = ex_t1 >> jnp.uint32(16)
    t1 = ex_t1 & jnp.uint32(0xFFFF)
    same_hash = jnp.concatenate([
        jnp.zeros(1, bool),
        (sort_hi[1:] == sort_hi[:-1]) & (lo[1:] == lo[:-1])
        & (ex[1:] == ex[:-1])])
    same_pair = same_hash & jnp.concatenate(
        [jnp.zeros(1, bool), t1[1:] == t1[:-1]])
    q_valid = valid & ~same_pair
    q_first = q_valid & ~same_hash
    return sort_hi, lo, ex, t1, q_valid, q_first


def dedup_stage(x, nv):
    return sum(jnp.sum(o.astype(jnp.float32)) for o in _dedup(x, nv))


def expand_stage(x, nv, cols):
    sort_hi, lo, ex, t1, q_valid, q_first = _dedup(x, nv)
    sid, delta, p, valid, total = _expand(
        cols, sort_hi, lo, ex, t1, q_valid,
        match_capacity=KW["match_capacity"],
        offset_stride=KW["offset_stride"])
    return (jnp.sum(sid.astype(jnp.float32))
            + jnp.sum(delta.astype(jnp.float32))
            + jnp.sum(valid.astype(jnp.float32))
            + total.astype(jnp.float32))


def full_stage(x, nv, cols):
    out = recognize_on_device(x, nv, cols, **KW)
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(out))


def full_head_stage(x, nv, cols_and_head):
    cols, head = cols_and_head[:-1], cols_and_head[-1]
    out = recognize_on_device(x, nv, cols, head=head, **KW)
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(out))


def make_loop(fn, with_cols):
    if with_cols:
        @jax.jit
        def loop(x, nv, cols, k):
            def body(i, acc):
                return acc + fn(x + acc * 1e-30, nv, cols)
            return lax.fori_loop(0, k, body, jnp.float32(0))
    else:
        @jax.jit
        def loop(x, nv, k):
            def body(i, acc):
                return acc + fn(x + acc * 1e-30, nv)
            return lax.fori_loop(0, k, body, jnp.float32(0))
    return loop


def time_loop(loop, args, tag, k_hi=9):
    res = {}
    for k in (1, k_hi):
        kk = jnp.int32(k)
        float(loop(*args, kk))
        best = []
        for _ in range(3):
            t0 = time.time()
            float(loop(*args, kk))
            best.append(time.time() - t0)
        res[k] = min(best)
    ms = (res[k_hi] - res[1]) / (k_hi - 1) * 1000
    print(f"{tag}: {ms:.2f} ms", flush=True)
    return ms


def main():
    x, nv = make_clip()

    fp = _fp_batch(x, nv, **FP_KW)
    hi = np.asarray(fp.hi[0])
    lo = np.asarray(fp.lo[0])
    ex = np.asarray(fp.ex[0])
    vmask = np.asarray(fp.valid[0])
    pick = np.flatnonzero(vmask)[:: max(1, int(vmask.sum()) // N_HOT)][:N_HOT]
    hot = (jnp.asarray(hi[pick]), jnp.asarray(lo[pick]),
           jnp.asarray(ex[pick]))
    print(f"clip hashes: {int(vmask.sum())}, implanting {len(pick)} "
          f"hot runs x {HOT_LEN}", flush=True)

    cols_hot = jax.jit(build_index)(random.PRNGKey(0), *hot)
    jax.block_until_ready(cols_hot)
    print("hot index ready", flush=True)

    fp_loop = make_loop(fp_stage, False)
    dedup_loop = make_loop(dedup_stage, False)
    expand_loop = make_loop(expand_stage, True)
    full_loop = make_loop(full_stage, True)

    fhead_loop = make_loop(full_head_stage, True)

    time_loop(fp_loop, (x, nv), "fp       ")
    time_loop(dedup_loop, (x, nv), "dedup    ")
    time_loop(expand_loop, (x, nv, cols_hot), "expand   ")
    time_loop(full_loop, (x, nv, cols_hot), "full_hot ")

    from shazam_tpu.index.search import maybe_build_head
    t0 = time.time()
    head = maybe_build_head(cols_hot[0])
    jax.block_until_ready(head)
    print(f"head built in {time.time() - t0:.1f} s", flush=True)
    time_loop(fhead_loop, (x, nv, cols_hot + (head,)), "full_head")

    cols_cold = jax.jit(build_index)(random.PRNGKey(0), None, None, None)
    jax.block_until_ready(cols_cold)
    print("cold index ready", flush=True)
    time_loop(full_loop, (x, nv, cols_cold), "full_cold")
    head_c = maybe_build_head(cols_cold[0])
    jax.block_until_ready(head_c)
    time_loop(fhead_loop, (x, nv, cols_cold + (head_c,)), "fhead_cold")


if __name__ == "__main__":
    main()
