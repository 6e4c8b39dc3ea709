"""Deterministic, SQL-expressible integer hashing.

The reference (pacasam) gets determinism from a single fixed seed plus
single-threaded pandas row order (src/pacasam/samplers/algos.py:12-20).
That cannot be reproduced under distributed execution, so this engine
defines its own documented determinism: every pseudo-random quantity is a
pure function of a row key (int64) and a salt, computed with two rounds of
multiplicative mixing mod 2**31. The same expression is emitted as ANSI
SQL so DuckDB oracles can reproduce results bit-for-bit.

Properties:
- partition-count invariant (pure per-row function, no RNG state);
- int64-safe: every intermediate fits in signed 64-bit
  (max product = 2**31 * 2246822519 < 2**62.1);
- identical in numpy int64 arithmetic and DuckDB BIGINT arithmetic.
"""

from __future__ import annotations

import numpy as np

M31 = 2_147_483_648  # 2**31
_A1 = 2_654_435_761  # Knuth multiplicative constant (2**32 / phi)
_A2 = 2_246_822_519  # xxhash prime 2
_B2 = 3_266_489_917  # xxhash prime 3


def hmix(key, salt: int) -> np.ndarray:
    """Multiply–xorshift–multiply mix of ``key`` (int64 array-like) with ``salt``.

    Returns int64 values uniform in [0, 2**31). The xor-shift rounds are
    essential: a purely multiplicative/modular chain is AFFINE mod 2**31, so
    consecutive keys (and sibling salts) would land on correlated lattices.
    """
    k = np.asarray(key, dtype=np.int64)
    h = ((k + np.int64(salt)) % M31) * np.int64(_A1) % M31
    h = h ^ (h >> np.int64(15))
    h = (h * np.int64(_A2) + np.int64(_B2)) % M31
    h = h ^ (h >> np.int64(13))
    h = h * np.int64(_A1) % M31
    return h


def hmix_sql(expr: str, salt: int) -> str:
    """The exact SQL equivalent of :func:`hmix` for a BIGINT expression."""
    h1 = f"(((({expr}) + {salt}) % {M31}) * {_A1}) % {M31}"
    h2 = f"xor(({h1}), ({h1}) >> 15)"
    h3 = f"((({h2}) * {_A2} + {_B2}) % {M31})"
    h4 = f"xor({h3}, ({h3}) >> 13)"
    return f"((({h4}) * {_A1}) % {M31})"


def hash_uniform(key, salt: int) -> np.ndarray:
    """Deterministic uniform float64 in [0, 1) from (key, salt)."""
    return hmix(key, salt).astype(np.float64) / float(M31)


def hash_uniform_sql(expr: str, salt: int) -> str:
    return f"(({hmix_sql(expr, salt)}) / {float(M31)!r})"


def rank_key(key, salt: int) -> np.ndarray:
    """Sampling rank: rows with the smallest ranks are 'sampled first'.

    Replaces pandas ``df.sample(random_state=0)`` (reference
    src/pacasam/samplers/algos.py:17-20) with an order-invariant rank.
    """
    return hmix(key, salt)
