"""Grouped top-k — per-group top-k rows by a sort column (the window-rank
QUALIFY ROW_NUMBER() <= k pattern, J4's grouped-top-1 generalized).

Plan: a per-batch COMBINER keeps at most k rows per group per block (top-k
is associative per group, so pruning before the shuffle is lossless), then
the reduce side co-locates whole groups by KEY-HASH BUCKET
(`grouped_batch_map`) and applies ONE vectorized sort + ``groupby.head(k)``
per ~256 MiB partition — never a Python callback per group, so 10^8-group
inputs pay ~blocks callbacks, not 10^8 dispatches.
"""

from __future__ import annotations

import pandas as pd

from .partitioning import grouped_batch_map


def grouped_topk(ds, group_cols: list[str], sort_col: str, k: int,
                 descending: bool = True, tiebreak: list[str] | None = None):
    """Top-``k`` rows per group by (sort_col, *tiebreak). Deterministic when
    (sort_col, *tiebreak) is a total order within each group."""
    tiebreak = tiebreak or []
    by = [*group_cols, sort_col, *tiebreak]
    asc = [True] * len(group_cols) + [not descending] + [True] * len(tiebreak)

    def _prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(by, ascending=asc, kind="mergesort")
        return df.groupby(group_cols, sort=False).head(k)

    local = ds.map_batches(_prune, batch_format="pandas")
    return grouped_batch_map(local, group_cols, _prune)
