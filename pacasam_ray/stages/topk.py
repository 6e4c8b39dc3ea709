"""Grouped top-k — per-group top-k rows by a sort column (the window-rank
QUALIFY ROW_NUMBER() <= k pattern, J4's grouped-top-1 generalized).

Plan: a per-batch COMBINER keeps at most k rows per group per block (top-k
is associative per group, so pruning before the shuffle is lossless), then
a hash-shuffle groupby applies the same prune per whole group. The shuffle
therefore moves ≤ k rows per (group, block) — never the full table. The
final per-group apply is a pandas ``head`` after one vectorized sort; for
extreme group cardinalities (10^8+ groups) the same combiner feeds a
sort-based window instead, but at that point the output itself is of
corpus scale.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


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
    return local.groupby(group_cols).map_groups(_prune, batch_format="pandas")
