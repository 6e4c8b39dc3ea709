"""Distributed as-of (backward inner) join.

Reference analog: the closest-year ortho matching (J4,
configs/Lipac_query.sql:121-132) is an as-of-style grouped top-1; this stage
generalizes it to the canonical streaming as-of join a web-scale pipeline
needs (e.g. "latest purchase at or before each click").

Plan (scale path): tag each side, align schemas, union, hash-shuffle ONCE on
the equi-key (`by`), then inside each group sort the right side by the order
key and match every left row to its predecessor with one vectorized
``np.searchsorted`` — no per-row loop, no second shuffle. Skewed `by` keys
are the caller's concern (salt upstream if one key dominates).

Determinism: ties on (by, on) in the right side are resolved BEFORE the
match by keeping the smallest right id (mirrors the SQL oracle's
``GROUP BY .. MIN(id)`` pre-dedup), so the join is reproducible under any
partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join_backward_ds(
    left_ds,
    right_ds,
    *,
    by: str,
    on: str,
    left_id: str,
    right_id: str,
    out_right_id: str,
    out_delta_us: str | None = None,
    num_partitions: int | None = None,
    tolerance_us: int | None = None,
):
    """Inner backward as-of join as a streaming Dataset of (left_id, by,
    out_right_id [, out_delta_us]) — one row per matched left row, never
    materialized on the driver. This is the scale entry point; the
    DataFrame wrapper below is for small results/oracle comparison.

    ``tolerance_us``: maximum backward gap (µs for datetime keys, key
    units otherwise); a left row whose nearest predecessor is further
    back than this is unmatched (dropped, inner semantics) — equivalent
    to filtering the unbounded join on ``delta <= tolerance`` because
    the backward join only ever considers the nearest predecessor."""

    def _tag(side: int, id_col: str):
        def _f(batch: pa.Table) -> pa.Table:
            return pa.table({
                by: batch[by],
                on: batch[on],
                "__id": batch[id_col],
                "__side": pa.array(np.full(batch.num_rows, side, dtype=np.int8)),
            })
        return _f

    combined = left_ds.map_batches(
        _tag(0, left_id), batch_format="pyarrow", zero_copy_batch=True
    ).union(right_ds.map_batches(
        _tag(1, right_id), batch_format="pyarrow", zero_copy_batch=True
    ))

    def _match(bucket: pd.DataFrame) -> pd.DataFrame:
        """One callback per HASH BUCKET of `by` keys (not per key): the
        match itself is pandas `merge_asof(by=...)` — a single C kernel
        vectorized across every group in the bucket, so 10^8 keys cost
        ~blocks dispatches, not 10^8 (~50 µs each, see stages/dedup.py)."""
        l = bucket[bucket["__side"] == 0]
        r = bucket[bucket["__side"] == 1]
        if l.empty or r.empty:
            return pd.DataFrame({
                left_id: pd.Series([], dtype="int64"),
                by: pd.Series([], dtype=bucket[by].dtype),
                out_right_id: pd.Series([], dtype="int64"),
                "__delta_us": pd.Series([], dtype="int64"),
            })
        # deterministic right side: smallest id per (by, on) tie group
        r = r.sort_values([on, "__id"], kind="mergesort").drop_duplicates(
            subset=[by, on], keep="first"
        )
        l = l.sort_values([on, "__id"], kind="mergesort")
        tol = None
        if tolerance_us is not None:
            tol = (pd.Timedelta(tolerance_us, unit="us")
                   if np.issubdtype(l[on].dtype, np.datetime64)
                   else tolerance_us)
        m = pd.merge_asof(
            l[[by, on, "__id"]].rename(columns={"__id": "__lid"}),
            r[[by, on, "__id"]].rename(columns={"__id": "__rid",
                                                 on: "__ron"}),
            left_on=on, right_on="__ron", by=by,
            direction="backward", allow_exact_matches=True,
            tolerance=tol,
        )
        m = m[m["__rid"].notna()]
        lon, ron = m[on].to_numpy(), m["__ron"].to_numpy()
        delta = (
            lon.astype("datetime64[us]").astype(np.int64)
            - ron.astype("datetime64[us]").astype(np.int64)
        ) if np.issubdtype(l[on].dtype, np.datetime64) else (
            lon.astype(np.int64) - ron.astype(np.int64)
        )
        return pd.DataFrame({
            left_id: m["__lid"].to_numpy().astype(np.int64),
            by: m[by].to_numpy(),
            out_right_id: m["__rid"].to_numpy().astype(np.int64),
            "__delta_us": delta,
        })

    from .partitioning import grouped_batch_map, pick_partitions

    if num_partitions is None:
        num_partitions = pick_partitions(combined)
    matched = grouped_batch_map(combined, [by], _match,
                                nparts=num_partitions)
    if out_delta_us:
        return matched.map_batches(
            lambda df: df.rename(columns={"__delta_us": out_delta_us}),
            batch_format="pandas",
        )
    return matched.map_batches(
        lambda df: df.drop(columns="__delta_us"), batch_format="pandas"
    )


def asof_join_backward(left_ds, right_ds, **kw) -> pd.DataFrame:
    """Driver-side convenience wrapper: materializes the streaming join and
    sorts by the left id for stable presentation. Use
    :func:`asof_join_backward_ds` when the result is itself big data."""
    out = asof_join_backward_ds(left_ds, right_ds, **kw).to_pandas()
    if kw["left_id"] not in out.columns:
        # fully-empty result: Ray 2.49 to_pandas() drops the schema when
        # every block is zero-row (the documented empty-block class) —
        # rebuild the typed empty from the left side's arrow schema
        by = kw["by"]
        by_dtype = left_ds.schema().base_schema.field(by).type.to_pandas_dtype()
        cols = {kw["left_id"]: pd.Series(dtype="int64"),
                by: pd.Series(dtype=by_dtype),
                kw["out_right_id"]: pd.Series(dtype="int64")}
        if kw.get("out_delta_us"):
            cols[kw["out_delta_us"]] = pd.Series(dtype="int64")
        return pd.DataFrame(cols)
    return out.sort_values([kw["left_id"]], kind="mergesort").reset_index(drop=True)
