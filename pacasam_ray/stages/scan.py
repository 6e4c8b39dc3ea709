"""Distributed grouped prefix sum (the parallel-scan primitive).

Cumulative aggregates over a global order are the one classic shape the
Dataset API has no operator for — window `SUM ... ROWS UNBOUNDED
PRECEDING` in SQL. The textbook two-pass scan maps onto Ray Data
directly:

1. **Partial pass** (shuffle-free): bucket every row by a RANGE of the
   order column (``order // span`` — contiguous ranges, unlike a hash,
   so bucket order == value order), and reduce per-(group, bucket) sums
   with a per-batch combiner. The driver sees one row per (group,
   bucket) — O(groups × buckets), tiny relative to the data — and turns
   them into EXCLUSIVE per-bucket offsets by cumulating within each
   group along bucket order.
2. **Apply pass** (one hash shuffle): co-locate each (group, bucket) via
   `grouped_batch_map`, sort by the order column inside the bucket,
   local cumsum + the broadcast bucket offset.

Every row's result is exact (offsets are integer partial sums), any
group can span many buckets (so a single hot group never lands on one
reducer — the skew story hash-grouped scans lack), and no stage ever
materializes the data on the driver.

Driver state is O(groups × buckets); ``span`` is derived from the order
column's observed range so buckets stay ~``target_buckets`` regardless
of id density. Reference analog: pacasam orders patches globally and
assigns cumulative positions (src/pacasam/samplers/diversity.py) — this
generalizes that positions pass to arbitrary additive values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .partitioning import estimated_size_bytes, grouped_batch_map, pick_partitions


def grouped_prefix_sum(ds, group_col: str, order_col: str, value_col: str,
                       out_col: str = "prefix",
                       target_buckets: int = 256):
    """Exclusive prefix sum of ``value_col`` per ``group_col`` along
    ``order_col``: each row gets the sum of values over SAME-GROUP rows
    with a strictly smaller order key. ``order_col`` must be integral and
    unique within each group; ``value_col`` must be integral (exactness
    contract — float scans would be partition-order dependent).
    """
    # --- span: one cheap metadata-ish pass over just the order column ----
    lohi = ds.select_columns([order_col]).map_batches(
        lambda t: pa.table({
            "lo": pa.array([int(np.min(t[order_col].to_numpy(zero_copy_only=False)))]
                           if t.num_rows else [np.iinfo(np.int64).max], pa.int64()),
            "hi": pa.array([int(np.max(t[order_col].to_numpy(zero_copy_only=False)))]
                           if t.num_rows else [np.iinfo(np.int64).min], pa.int64()),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    if len(lohi) == 0 or lohi["lo"].min() > lohi["hi"].max():
        return ds.map_batches(
            lambda t: t.append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    lo, hi = int(lohi["lo"].min()), int(lohi["hi"].max())
    span = max(1, (hi - lo + 1 + target_buckets - 1) // target_buckets)

    # --- pass 1: per-(group, bucket) partial sums, combiner-first ---------
    def _partials(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "g": t[group_col].to_numpy(zero_copy_only=False),
            "b": (o - lo) // span,
            "s": v,
        })
        return pa.Table.from_pandas(
            df.groupby(["g", "b"], sort=False, as_index=False).sum(),
            preserve_index=False)

    parts_ds = ds.map_batches(_partials, batch_format="pyarrow")
    est = estimated_size_bytes(parts_ds)
    if est is not None and est > 64 * 1024 * 1024:
        # corpus-scale inputs: reduce the (group, bucket) partials with a
        # distributed Sum shuffle first so the driver pull is exactly
        # O(groups × buckets) rows, not O(blocks × groups-per-block)
        from ray.data.aggregate import Sum

        parts_ds = parts_ds.groupby(["g", "b"],
                                    num_partitions=pick_partitions(parts_ds)) \
                           .aggregate(Sum("s", alias_name="s"))
    parts = parts_ds.to_pandas()
    parts = parts.groupby(["g", "b"], as_index=False)["s"].sum()
    parts = parts.sort_values(["g", "b"], kind="mergesort")
    # exclusive per-bucket offset: cumsum within group, shifted by one bucket
    parts["off"] = (parts.groupby("g", sort=False)["s"].cumsum()
                    - parts["s"]).astype(np.int64)
    offsets_ref = ray.put(parts[["g", "b", "off"]].reset_index(drop=True))

    # --- pass 2: co-locate (group, bucket), sort, local cumsum + offset ---
    def _bucket(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__scan_b", pa.array((o - lo) // span))

    def _apply(df: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        df = df.sort_values([group_col, "__scan_b", order_col], kind="mergesort")
        v = df[value_col].to_numpy().astype(np.int64)
        grp = df.groupby([group_col, "__scan_b"], sort=False)
        # exclusive cumsum within (group, bucket): inclusive cumsum - value
        local = grp[value_col].cumsum().to_numpy().astype(np.int64) - v
        m = df.merge(offs, how="left",
                     left_on=[group_col, "__scan_b"], right_on=["g", "b"])
        df = df.drop(columns="__scan_b")
        df[out_col] = local + m["off"].to_numpy().astype(np.int64)
        return df

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow")
    return grouped_batch_map(
        bucketed, [group_col, "__scan_b"], _apply,
        nparts=pick_partitions(ds),
    )
