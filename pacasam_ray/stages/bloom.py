"""Bloom-filter membership for shuffle-free semi/anti joins.

At 100 TB the dominant cost of a key-membership join is moving the BIG
side through a hash shuffle. When the probe side is large and the build
side's keys don't fit a plain broadcast set, the standard fix (used by
every warehouse engine as a "bloom join") is:

1. fold the build side's keys into an m-bit Bloom filter — a few hundred
   KB regardless of key count — with a per-block partial-OR combiner and
   a tree reduce, so no node ever sees all keys;
2. broadcast the filter once (``ray.put``) and probe it per batch on the
   big side: Bloom NEGATIVES are definite ("key absent"), so for an
   anti join they pass through with zero further work, and for a semi
   join they drop immediately;
3. only the maybe-positive survivors (the small false-positive tail plus
   true members) go through an exact membership check — here a broadcast
   sorted-key probe; at corpus scale, a hash join of the survivors
   against the build side (the survivors are shuffle-affordable by
   construction).

Engine counterpart: the reference's membership filters are pandas
``isin`` over an in-memory frame (src/pacasam/samplers/base.py); this
module is the bounded-memory distributed replacement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import hmix

# Two independent 31-bit mixes drive k bit positions via double hashing
# (Kirsch–Mitzenmacher): pos_i = (h1 + i*h2) mod m. Salts are arbitrary
# fixed constants — determinism, not secrecy.
_SALT_H1 = 0x5B10
_SALT_H2 = 0x7E55

DEFAULT_M_BITS = 1 << 20  # 128 KiB of filter per 2^20 bits
DEFAULT_K = 4


def _bit_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions for int64 keys."""
    h1 = hmix(keys, _SALT_H1)
    h2 = hmix(keys, _SALT_H2) | np.int64(1)  # odd => full-period stride
    i = np.arange(k, dtype=np.int64)[None, :]
    return (h1[:, None] + i * h2[:, None]) % np.int64(m_bits)


def build_bloom_bits(ds, col: str, m_bits: int = DEFAULT_M_BITS,
                     k: int = DEFAULT_K) -> np.ndarray:
    """Fold ``ds[col]`` (int64 keys) into an m-bit Bloom filter.

    Per-block combiner emits ONE dense uint64 mask row; a repartition
    level ORs masks 16-to-1 before the driver touches anything, so the
    driver pull is O(16 * m_bits/8) bytes no matter how many input blocks
    (the same tree-reduce shape as samplers/algos.smallest_n).
    """
    n_words = m_bits // 64

    def _partial(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        keys = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys):
            pos = _bit_positions(keys, m_bits, k).ravel()
            np.bitwise_or.at(words, pos >> 6,
                             np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
        return pa.table({"mask": pa.array([words.tobytes()], type=pa.binary())})

    def _combine(t: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, dtype=np.uint64)
        for buf in t["mask"].to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint64)
        return pa.table({"mask": pa.array([acc.tobytes()], type=pa.binary())})

    partials = ds.map_batches(_partial, batch_format="pyarrow") \
                 .repartition(16) \
                 .map_batches(_combine, batch_format="pyarrow")

    out = np.zeros(n_words, dtype=np.uint64)
    for row in partials.take_all():
        out |= np.frombuffer(row["mask"], dtype=np.uint64)
    return out


def bloom_maybe_member(keys: np.ndarray, words: np.ndarray, m_bits: int,
                       k: int) -> np.ndarray:
    """Boolean mask: True where the filter MAY contain the key (definite
    membership requires the exact check); False is a guaranteed miss."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bit_positions(keys.astype(np.int64), m_bits, k)
    bit = (words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
    return bit.astype(bool).all(axis=1)


def bloom_anti_join(left, left_col: str, right, right_col: str,
                    m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K):
    """left rows whose ``left_col`` does NOT appear in ``right[right_col]``.

    Exact result (the Bloom filter only PREFILTERS): negatives are kept
    outright, maybe-positives are re-checked against the sorted exact key
    array. The exact array is driver-collected here because the build side
    of an anti join is small by contract (same contract as
    stages/filters.exclude_ids); the filter's value is that at scale the
    big side never shuffles and the exact check touches only the survivor
    tail. The false-positive tail itself is asserted small by pytest via
    :func:`bloom_maybe_member` directly.
    """
    import ray as _ray

    words = build_bloom_bits(right, right_col, m_bits, k)
    exact = np.sort(
        right.select_columns([right_col]).to_pandas()[right_col]
        .to_numpy().astype(np.int64)
    )
    words_ref, exact_ref = _ray.put(words), _ray.put(exact)

    def _filter(t: pa.Table) -> pa.Table:
        w = _ray.get(words_ref)
        keys = t[left_col].to_numpy(zero_copy_only=False).astype(np.int64)
        maybe = bloom_maybe_member(keys, w, m_bits, k)
        keep = ~maybe
        if maybe.any():  # exact re-check of the survivor tail only
            ex = _ray.get(exact_ref)
            idx = np.flatnonzero(maybe)
            pos = np.searchsorted(ex, keys[idx])
            hit = (pos < len(ex)) & (ex[np.minimum(pos, len(ex) - 1)] == keys[idx])
            keep[idx[~hit]] = True
        return t.filter(pa.array(keep))

    return left.map_batches(_filter, batch_format="pyarrow")
