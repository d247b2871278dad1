"""Ground-truth n_ranked on the expanded stream (numpy) for pack 0."""

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
from shazam_tpu.match.lookup import _expand                    # noqa: E402
from shazam_tpu.match.prepare import q_frames_for_max_offset   # noqa: E402

PREFIX = os.environ.get("ESC_DB", "/root/repo/.data/prod12288")
PACK = int(os.environ.get("PACK", "0"))
FIT = int(os.environ.get("FIT", str(1 << 20)))

index = FingerprintIndex.load(PREFIX + ".idx.npz")
qz = np.load(PREFIX + ".queries.npz")
n_songs = int(qz["n_songs"])
dev = index.device_arrays()
uview, usteps = build_unique_view(index.key_hi, index.key_lo,
                                  index.key_ex)
q = tuple(jnp.asarray(qz[k][PACK]) for k in
          ("hi", "lo", "ex", "t", "valid", "first"))
clip_frames = int(qz["clip_samples"]) // 2048 + 1
delta_min = -q_frames_for_max_offset(clip_frames)
delta_range = (((index.max_offset // 4096) + 1) * 4096
               + q_frames_for_max_offset(clip_frames))

f = jax.jit(functools.partial(
    _expand, match_capacity=FIT, offset_stride=index.offset_stride,
    u_steps=usteps, expand_block=0))
sid, delta, p, valid, total, n_dropped = jax.device_get(
    f(dev, *q[:5], head=None, uview=uview))

sid = np.asarray(sid)
delta = np.asarray(delta)
valid = np.asarray(valid)
dbin = delta - delta_min
in_range = (dbin >= 0) & (dbin < delta_range)
vote_ok = valid & in_range
live_songs = np.unique(sid[vote_ok])
print("total:", int(total), "n_dropped:", int(n_dropped))
print("distinct songs with >=1 in-range vote:", live_songs.size)
print("sid range over vote_ok:", live_songs.min(), live_songs.max())
print("any sid >= n_songs among vote_ok:",
      bool((live_songs >= n_songs).any()), "n_songs:", n_songs)
print("valid-but-out-of-range rows:", int((valid & ~in_range).sum()))
print("distinct songs among valid (any range):",
      np.unique(sid[valid]).size)
# key-space sanity
key = sid[vote_ok].astype(np.int64) * delta_range + dbin[vote_ok]
print("max key:", key.max(), "int32 max:", 2**31 - 1,
      "SENT collision:", bool((key == 0x7FFFFFFF).any()))
