"""Bit-exactness of the JAX SHA-1 against hashlib (reference hash function)."""

import hashlib

import numpy as np
import pytest

from shazam_tpu.ops.sha1 import sha1_fingerprint_keys, keys_to_hex


def _expected_hex(f1, f2, dt, reduction=20):
    return [
        hashlib.sha1(f"{a}|{b}|{c}".encode("utf-8")).hexdigest()[:reduction]
        for a, b, c in zip(f1, f2, dt)
    ]


@pytest.mark.parametrize("n", [1, 7, 1024])
def test_random_triples_bit_exact(n, rng):
    f1 = rng.integers(0, 2049, n).astype(np.uint32)
    f2 = rng.integers(0, 2049, n).astype(np.uint32)
    dt = rng.integers(0, 201, n).astype(np.uint32)
    hi, lo, ex = sha1_fingerprint_keys(f1, f2, dt)
    assert keys_to_hex(hi, lo, ex) == _expected_hex(f1, f2, dt)


def test_digit_count_boundaries():
    """Exercise every digit-count combination incl. 4-digit values and 0."""
    vals = [0, 1, 9, 10, 99, 100, 999, 1000, 2048, 4095, 9999]
    f1, f2, dt = [], [], []
    for a in vals:
        for b in vals:
            for c in [0, 1, 9, 10, 100, 200, 999]:
                f1.append(a)
                f2.append(b)
                dt.append(c)
    f1 = np.array(f1, np.uint32)
    f2 = np.array(f2, np.uint32)
    dt = np.array(dt, np.uint32)
    hi, lo, ex = sha1_fingerprint_keys(f1, f2, dt)
    assert keys_to_hex(hi, lo, ex) == _expected_hex(f1, f2, dt)


def test_large_batch(rng):
    n = 200_000
    f1 = rng.integers(0, 2049, n).astype(np.uint32)
    f2 = rng.integers(0, 2049, n).astype(np.uint32)
    dt = rng.integers(0, 201, n).astype(np.uint32)
    hi, lo, ex = sha1_fingerprint_keys(f1, f2, dt)
    # spot-check a random subset against hashlib
    idx = rng.integers(0, n, 500)
    got = np.asarray(hi)[idx], np.asarray(lo)[idx], np.asarray(ex)[idx]
    assert keys_to_hex(*got) == _expected_hex(f1[idx], f2[idx], dt[idx])
