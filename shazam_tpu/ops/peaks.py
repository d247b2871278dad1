"""Constellation peak picking: 2-D local maxima with fixed-capacity output.

Matches reference ``get_2D_peaks`` (``__init__.py:116-177``):

- local maxima under a (2n+1)x(2n+1) full-square footprint
  (``iterate_structure(generate_binary_structure(2, 2), n)``) using
  scipy ``maximum_filter`` plateau semantics (every element equal to the
  window max is marked),
- XOR against the binary-eroded zero background (border_value=1) to kill
  the all-zero silence plateau,
- strict ``amp > amp_min`` threshold.

TPU-first design:
- The square footprint makes both the max filter and the erosion
  *separable*: two 1-D ``reduce_window`` passes (freq axis then time
  axis) instead of a 441-tap 2-D window. XLA lowers these to fast VPU
  sliding reductions.
- scipy's default 'reflect' boundary duplicates in-window values only
  (a reflected cell at distance d < n from the edge maps back inside the
  window), so padding with -inf / True is exactly equivalent.
- Dynamic peak counts become a fixed capacity: peaks are compacted in
  (time, freq) row-major order — precisely the reference's
  ``peaks.sort(key=time)`` order incl. tie-breaks, since np.where yields
  freq-major order and Python's sort is stable — via one ``top_k`` over
  flat indices. Overflow is reported, never silent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_NEG_INF = np.float32(-np.inf)


def _separable_window(x: jnp.ndarray, radius: int, op, init) -> jnp.ndarray:
    """Apply a (2r+1)x(2r+1) square sliding `op` with `init` padding."""
    r = radius
    y = lax.reduce_window(
        x, init, op, window_dimensions=(2 * r + 1, 1),
        window_strides=(1, 1), padding=((r, r), (0, 0)),
    )
    return lax.reduce_window(
        y, init, op, window_dimensions=(1, 2 * r + 1),
        window_strides=(1, 1), padding=((0, 0), (r, r)),
    )


def local_max_mask(db_spec: jnp.ndarray, radius: int) -> jnp.ndarray:
    """maximum_filter(footprint=square) == arr, scipy plateau semantics."""
    filt = _separable_window(db_spec, radius, lax.max, _NEG_INF)
    return filt == db_spec


def eroded_background_mask(db_spec: jnp.ndarray, radius: int) -> jnp.ndarray:
    """binary_erosion(arr == 0, square structure, border_value=1)."""
    background = db_spec == 0
    return _separable_window(background, radius, jnp.logical_and, True)


@functools.partial(jax.jit, static_argnames=("radius",))
def peak_mask(db_spec: jnp.ndarray, amp_min: float, radius: int = 10) -> jnp.ndarray:
    """Boolean (n_freqs, n_frames) constellation mask."""
    detected = local_max_mask(db_spec, radius) != eroded_background_mask(db_spec, radius)
    return detected & (db_spec > amp_min)


@functools.partial(jax.jit, static_argnames=("radius", "capacity"))
def extract_peaks(db_spec: jnp.ndarray, amp_min: float,
                  radius: int = 10, capacity: int = 8192):
    """Compact the peak mask into fixed-size (time, freq) index arrays.

    Returns (times, freqs, n_peaks): uint32 arrays of shape (capacity,) in
    (time, freq)-lexicographic order — the reference's hash-pairing order —
    and the true peak count (may exceed capacity; callers must check).
    Slots >= min(n_peaks, capacity) are filled with zeros and must be
    masked by the caller.
    """
    mask = peak_mask(db_spec, amp_min, radius)
    n_freqs, n_frames = mask.shape
    flat = mask.T.reshape(-1)  # (time-major) => row-major == (t, f) lex order
    n = flat.shape[0]
    n_peaks = jnp.sum(flat.astype(jnp.uint32))
    # top_k over (N - flat_index) for valid cells: descending values =
    # ascending flat indices = first `capacity` peaks in (t, f) order.
    score = jnp.where(flat, n - lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0], 0)
    vals, _ = lax.top_k(score, min(capacity, n))
    if capacity > n:
        vals = jnp.pad(vals, (0, capacity - n))
    valid = vals > 0
    flat_idx = jnp.where(valid, n - vals, 0).astype(jnp.uint32)
    times = flat_idx // jnp.uint32(n_freqs)
    freqs = flat_idx % jnp.uint32(n_freqs)
    return times, freqs, n_peaks
