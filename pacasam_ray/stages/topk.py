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


def merge_local_topk(parts, k: int, sort_cols: list[str], ascending: list[bool],
                     group_col: str = "query_id", source=None,
                     force_tree: bool | None = None) -> pd.DataFrame:
    """Bounded merge for per-query top-k partials (ann_topk / knn patterns).

    ``parts`` holds ≤ k rows per (query, input block); collecting that raw
    is a k·Q·blocks driver pull — multi-GB at 100× block counts. Mirrors
    ``samplers.algos.smallest_n`` (per-query top-k is associative):

    1. for many-block inputs, a tree level: coalesce to TREE_FANIN blocks
       (plain repartition, no hash shuffle) and re-prune per block;
    2. a bounded-buffer streaming merge on the driver — the buffer is
       re-pruned whenever it exceeds 4·k rows per group seen, so driver
       memory stays O(k·Q), never O(k·Q·blocks).

    ``source`` (the pre-prune input Dataset) supplies the metadata-only
    size estimate that decides whether the tree level pays for itself.
    """
    from ..samplers.algos import TREE_FANIN
    from .partitioning import estimated_size_bytes

    def _prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return df.groupby(group_col, sort=False).head(k)

    import ray.data as _rd

    est = estimated_size_bytes(source if source is not None else parts)
    target_block = _rd.DataContext.get_current().target_max_block_size or (
        128 * 1024 * 1024
    )
    tree = force_tree if force_tree is not None else (
        est is not None and est // target_block > TREE_FANIN
    )
    if tree:
        parts = parts.repartition(TREE_FANIN).map_batches(
            _prune, batch_format="pandas"
        )

    buf: pd.DataFrame | None = None
    for part in parts.iter_batches(batch_format="pandas", batch_size=None):
        buf = part if buf is None else pd.concat([buf, part], ignore_index=True)
        if len(buf) > 4 * k * max(1, buf[group_col].nunique()):
            buf = _prune(buf)
    if buf is None:
        buf = parts.limit(0).to_pandas()
    return _prune(buf).reset_index(drop=True)
