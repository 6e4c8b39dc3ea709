"""Exact distributed order statistics (k-th smallest value / percentile).

A median over 10^12 rows cannot go through a global sort (all-to-all
shuffle) or a top-k prune (k itself is 5·10^11). Instead: iterative
histogram refinement — each round is ONE streaming count pass with a
broadcast [lo, hi] bucket grid (no shuffle at all), narrowing the range
containing the k-th value until few enough values remain in range to
collect and sort on the driver. Rounds needed ≈ log_B(n) (B = bucket
count), so ~3 passes cover 10^12 rows at B = 4096.

Float-boundary safety: ``k`` stays GLOBAL throughout — every pass
recounts ``below = #(v < lo)`` under the current bounds, so the cumulative
positions are exact regardless of how edge values rounded into buckets in
earlier rounds; the narrowed range keeps one full bucket of slack on each
side, dwarfing any ulp-level drift. The final step collects every value in
the candidate range and indexes it by ``k − below`` — the value at a
sorted position is well-defined under ties, so the result equals the SQL
``ORDER BY col LIMIT 1 OFFSET k−1``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

NUM_BUCKETS = 4096
COLLECT_LIMIT = 100_000  # values; final driver sort stays tiny


def _below_and_counts(ds, col: str, lo: float, hi: float):
    """One streaming pass: (#values < lo, bucket histogram of [lo, hi])."""

    def _partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        below = int((v < lo).sum())
        vin = v[(v >= lo) & (v <= hi)]
        if hi > lo:
            b = np.clip(((vin - lo) / (hi - lo) * NUM_BUCKETS).astype(np.int64),
                        0, NUM_BUCKETS - 1)
            counts = np.bincount(b, minlength=NUM_BUCKETS)
        else:
            counts = np.zeros(NUM_BUCKETS, dtype=np.int64)
            counts[0] = len(vin)
        out = np.empty(NUM_BUCKETS + 1, dtype=np.int64)
        out[0] = below
        out[1:] = counts
        return pa.table({"c": out})

    acc = np.zeros(NUM_BUCKETS + 1, dtype=np.int64)
    stream = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    for part in stream.iter_batches(batch_format="numpy", batch_size=None):
        acc += part["c"].reshape(-1, NUM_BUCKETS + 1).sum(axis=0)
    return int(acc[0]), acc[1:]


def kth_smallest_value(ds, col: str, k: int, max_rounds: int = 64) -> float:
    """The value at (1-based) sorted position ``k`` of ``ds[col]``."""
    from ray.data.aggregate import Count, Max, Min

    agg = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"),
                       Count(alias_name="n"))
    lo, hi, n = float(agg["lo"]), float(agg["hi"]), int(agg["n"])
    if not 1 <= k <= n:
        raise ValueError(f"k={k} out of range for {n} rows")

    for _ in range(max_rounds):
        below, counts = _below_and_counts(ds, col, lo, hi)
        if lo == hi or counts.sum() <= COLLECT_LIMIT:
            break
        cum = below + np.cumsum(counts)
        b = int(np.searchsorted(cum, k))  # first bucket with cum >= k
        width = (hi - lo) / NUM_BUCKETS
        # one-bucket slack each side: ulp-scale edge drift cannot escape it
        cand_lo = max(lo, lo + (b - 1) * width)
        cand_hi = min(hi, lo + (b + 2) * width)
        if cand_lo == lo and cand_hi == hi:
            break  # range no longer shrinks (dense ties); collect
        lo, hi = cand_lo, cand_hi

    def _collect(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        below = int((v < lo).sum())
        vin = v[(v >= lo) & (v <= hi)]
        return pa.table({"below": [below], "v": [vin]})

    total_below = 0
    chunks = []
    for part in ds.map_batches(
        _collect, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        total_below += int(pa.compute.sum(part["below"]).as_py() or 0)
        for lst in part["v"].to_pylist():
            chunks.append(np.asarray(lst, dtype=np.float64))
    vals = np.concatenate(chunks) if chunks else np.array([], dtype=np.float64)
    vals.sort(kind="stable")
    idx = k - total_below - 1
    if not 0 <= idx < len(vals):
        raise RuntimeError("order-statistic refinement lost the k-th value")
    return float(vals[idx])


def percentile_disc(ds, col: str, q: float) -> pd.DataFrame:
    """SQL-twin discrete percentile: the value at 1-based position
    floor((n−1)·q) + 1 — identical to ``ORDER BY col LIMIT 1 OFFSET
    (n−1)·q`` in DuckDB."""
    n = ds.count()
    k = int((n - 1) * q) + 1
    return pd.DataFrame({f"p{int(q * 100)}": [kth_smallest_value(ds, col, k)]})


COARSE_WIDTH = 1024  # integer pre-bucket width for the grouped variant


def grouped_int_kth(ds, group_col: str, value_col: str,
                    ks_of: "dict[object, list[int]]") -> "dict[tuple, int]":
    """Exact k-th smallest INTEGER value per group, for a BOUNDED group
    key space (languages, quality tiers, shard classes — not user ids).

    Two streaming count passes, no shuffle: pass 1 pulls a per-(group,
    coarse-bucket) histogram (bucket = value // COARSE_WIDTH, so the pull
    is ≤ groups × value_range/COARSE_WIDTH rows regardless of corpus
    size); the boundary bucket of each requested k is then resolved with
    pass 2's exact per-value histogram restricted to those boundary
    buckets only (≤ COARSE_WIDTH × #ks rows). Returns {(group, k): value}
    with value = the k-th smallest (1-based, ties well-defined) —
    identical to SQL ``ORDER BY v LIMIT 1 OFFSET k-1`` within the group.
    """

    def _coarse(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t[group_col].to_pandas(),
            "b": t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
                 // COARSE_WIDTH,
            "c": np.int64(1)})
        out = df.groupby(["g", "b"], sort=False, as_index=False)["c"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    acc: dict = {}
    for part in ds.map_batches(_coarse, batch_format="pyarrow") \
                  .iter_batches(batch_format="pandas", batch_size=None):
        for g, b, c in zip(part["g"], part["b"], part["c"]):
            acc[(g, int(b))] = acc.get((g, int(b)), 0) + int(c)

    # per group: sorted coarse buckets + cumulative counts -> boundary bucket
    per_group: dict = {}
    for (g, b), c in acc.items():
        per_group.setdefault(g, []).append((b, c))
    need: dict = {}   # (g, k) -> (boundary bucket, #values below bucket)
    for g, ks in ks_of.items():
        bl = sorted(per_group.get(g, []))
        bs = np.array([b for b, _ in bl], dtype=np.int64)
        cum = np.cumsum([c for _, c in bl])
        for k in ks:
            i = int(np.searchsorted(cum, k))
            if i >= len(bs):
                raise ValueError(f"k={k} exceeds group {g!r} size")
            need[(g, int(k))] = (int(bs[i]), int(cum[i - 1]) if i else 0)

    wanted: dict = {}  # g -> set of boundary buckets
    for (g, _), (b, _) in need.items():
        wanted.setdefault(g, set()).add(b)
    wanted_sorted = {g: np.array(sorted(bs), dtype=np.int64)
                     for g, bs in wanted.items()}

    def _exact(t: pa.Table) -> pa.Table:
        gg = t[group_col].to_pandas().to_numpy()
        vv = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = vv // COARSE_WIDTH
        keep = np.zeros(len(vv), dtype=bool)
        for g, bs in wanted_sorted.items():
            gm = gg == g
            if gm.any():
                keep[gm] = np.isin(bb[gm], bs)
        df = pd.DataFrame({"g": gg[keep], "v": vv[keep], "c": np.int64(1)})
        out = df.groupby(["g", "v"], sort=False, as_index=False)["c"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    fine: dict = {}
    for part in ds.map_batches(_exact, batch_format="pyarrow") \
                  .iter_batches(batch_format="pandas", batch_size=None):
        for g, v, c in zip(part["g"], part["v"], part["c"]):
            fine[(g, int(v))] = fine.get((g, int(v)), 0) + int(c)

    per_group_fine: dict = {}
    for (g, v), c in fine.items():
        per_group_fine.setdefault(g, []).append((v, c))

    out: dict = {}
    for (g, k), (b, below) in need.items():
        vals = sorted((v, c) for v, c in per_group_fine.get(g, [])
                      if v // COARSE_WIDTH == b)
        cum = below
        for v, c in vals:
            cum += c
            if cum >= k:
                out[(g, k)] = v
                break
        else:
            raise RuntimeError(f"lost k={k} for group {g!r}")
    return out
