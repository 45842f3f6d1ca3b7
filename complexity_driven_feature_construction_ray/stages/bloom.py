"""Vectorized Bloom filter for broadcast join pre-filtering.

At 100 TB the broadcast-semi-join key set itself can stop fitting
comfortably in every worker's heap (10^9 int64 keys = 8 GB). A Bloom
filter at ~10 bits/key (fp ~1%) is 10-60x smaller than the sorted key
array, so the bits ship to every task cheaply and the EXACT
verification (sorted-array searchsorted) only runs on the tiny
bloom-positive subset — or on a second, smaller broadcast. Classic
Bloom-join (Mackert & Lohman 1986); double hashing per Kirsch &
Mitzenmacher 2006 (g_i = h1 + i*h2 is as good as k independent
hashes).

Everything is numpy-vectorized: k probe positions computed for the
whole batch at once, membership via uint8 bit tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_KEY = "0123456789123456"


def _h1h2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h = pd.util.hash_array(np.asarray(keys).astype(object), hash_key=_HASH_KEY).astype(
        np.uint64
    )
    # splitmix64 finalizer for the second hash stream
    z = h + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h2 = z ^ (z >> np.uint64(31))
    return h, h2 | np.uint64(1)  # odd h2 => full-period stride


class BloomFilter:
    """Bit-array Bloom filter; `bits` is a uint8 numpy array suitable
    for ray.put (zero-copy to readers)."""

    __slots__ = ("bits", "m", "k")

    def __init__(self, bits: np.ndarray, m: int, k: int):
        self.bits, self.m, self.k = bits, m, k

    @classmethod
    def build(cls, keys: np.ndarray, *, bits_per_key: int = 10) -> "BloomFilter":
        n = max(len(keys), 1)
        m = int(n * bits_per_key)
        m += (-m) % 8 or 8  # round up to bytes, never 0
        k = max(1, int(round(0.6931 * bits_per_key)))  # ln2 * m/n
        bits = np.zeros(m // 8, dtype=np.uint8)
        h1, h2 = _h1h2(keys)
        mm = np.uint64(m)
        for i in range(k):
            pos = ((h1 + np.uint64(i) * h2) % mm).astype(np.int64)
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return cls(bits, m, k)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership test: True = maybe present (fp ~
        (1-e^{-kn/m})^k), False = definitely absent."""
        h1, h2 = _h1h2(keys)
        mm = np.uint64(self.m)
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            pos = ((h1 + np.uint64(i) * h2) % mm).astype(np.int64)
            out &= (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 != 0
        return out
