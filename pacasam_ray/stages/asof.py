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
):
    """Inner backward as-of join as a streaming Dataset of (left_id, by,
    out_right_id [, out_delta_us]) — one row per matched left row, never
    materialized on the driver. This is the scale entry point; the
    DataFrame wrapper below is for small results/oracle comparison."""

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

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0]
        r = group[group["__side"] == 1]
        if l.empty or r.empty:
            return pd.DataFrame({
                left_id: pd.Series([], dtype="int64"),
                by: pd.Series([], dtype=group[by].dtype),
                out_right_id: pd.Series([], dtype="int64"),
                "__delta_us": pd.Series([], dtype="int64"),
            })
        # deterministic right side: smallest id per (by, on) tie group
        r = r.sort_values([on, "__id"], kind="mergesort").drop_duplicates(
            subset=[on], keep="first"
        )
        l = l.sort_values([on, "__id"], kind="mergesort")
        r_on = r[on].to_numpy()
        idx = np.searchsorted(r_on, l[on].to_numpy(), side="right") - 1
        hit = idx >= 0
        lm, rm = l[hit], r.iloc[idx[hit]]
        delta = (
            lm[on].to_numpy().astype("datetime64[us]").astype(np.int64)
            - rm[on].to_numpy().astype("datetime64[us]").astype(np.int64)
        ) if np.issubdtype(l[on].dtype, np.datetime64) else (
            lm[on].to_numpy().astype(np.int64) - rm[on].to_numpy().astype(np.int64)
        )
        return pd.DataFrame({
            left_id: lm["__id"].to_numpy(),
            by: lm[by].to_numpy(),
            out_right_id: rm["__id"].to_numpy(),
            "__delta_us": delta,
        })

    if num_partitions is None:
        from .partitioning import pick_partitions

        num_partitions = pick_partitions(combined)
    matched = combined.groupby(by, num_partitions=num_partitions).map_groups(
        _match, batch_format="pandas"
    )
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
    return out.sort_values([kw["left_id"]], kind="mergesort").reset_index(drop=True)
