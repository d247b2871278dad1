"""CPU repro of the exp_scan parity failure (pack 0, prod12288).

Isolates which variant diverges from scalar+sort and which RawMatch
field differs: scalar+scan, block+sort, block+scan.
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from shazam_tpu.index.store import FingerprintIndex            # noqa: E402
from shazam_tpu.index.search import build_unique_view          # noqa: E402
from shazam_tpu.match.lookup import match_query_sparse         # noqa: E402
from shazam_tpu.match.prepare import q_frames_for_max_offset   # noqa: E402

PREFIX = os.environ.get("ESC_DB", "/root/repo/.data/prod12288")
PACK = int(os.environ.get("PACK", "0"))
FIT = int(os.environ.get("FIT", str(1 << 20)))


def main():
    index = FingerprintIndex.load(PREFIX + ".idx.npz")
    qz = np.load(PREFIX + ".queries.npz")
    n_songs = int(qz["n_songs"])
    dev = index.device_arrays()
    uview, usteps = build_unique_view(index.key_hi, index.key_lo,
                                      index.key_ex)
    q = tuple(jnp.asarray(qz[k][PACK]) for k in
              ("hi", "lo", "ex", "t", "valid", "first"))
    clip_frames = int(qz["clip_samples"]) // 2048 + 1
    kw = dict(
        n_songs=n_songs,
        delta_min=-q_frames_for_max_offset(clip_frames),
        delta_range=((index.max_offset // 4096) + 1) * 4096
        + q_frames_for_max_offset(clip_frames),
        topn=2, offset_stride=index.offset_stride,
        match_capacity=FIT, u_steps=usteps)
    print("kw:", {k: v for k, v in kw.items() if isinstance(v, int)},
          flush=True)

    def run(blk, rank):
        f = jax.jit(functools.partial(
            match_query_sparse, expand_block=blk, vote_rank=rank, **kw))
        return jax.device_get(f(dev, *q, head=None, uview=uview))

    want = run(0, "sort")
    print("ref (scalar+sort):", {f: np.asarray(getattr(want, f)).tolist()
                                 for f in want._fields}, flush=True)
    for blk, rank in ((0, "scan"), (128, "sort"), (128, "scan")):
        got = run(blk, rank)
        bad = [f for f in want._fields
               if not np.array_equal(np.asarray(getattr(got, f)),
                                     np.asarray(getattr(want, f)))]
        tag = f"blk={blk} rank={rank}"
        if bad:
            print(f"{tag}: DIFFERS in {bad}")
            for f in bad:
                print(f"  {f}: got {np.asarray(getattr(got, f)).tolist()} "
                      f"want {np.asarray(getattr(want, f)).tolist()}")
        else:
            print(f"{tag}: identical")


if __name__ == "__main__":
    main()
