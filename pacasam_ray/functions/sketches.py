"""Bounded-memory frequency sketches.

`top_terms` (queries.py) is EXACT — its combiner emits one row per
distinct term per block, which is the right plan while the distinct-term
universe fits a shuffle. At adversarial cardinalities (URLs, shingles,
user agents at 100 TB) even the combined rows blow up; the Misra-Gries
summary bounds every stage at k counters with the classic guarantee

    est(t)  <=  true(t)  <=  est(t) + err_total

so any term with true frequency above ``err_total`` is present in the
merged summary (heavy hitters cannot be lost). Error decrements are
tracked EXPLICITLY and returned with the result, so callers get a
certificate instead of a silent approximation.

Merging is one commutative Sum-groupby of the per-block summaries
followed by a single final prune: estimates depend on block boundaries
(inherent to MG), but the error bound and the heavy-hitter guarantee
hold for ANY partitioning — that invariant is what the tests pin down.

Reference: Misra & Gries, "Finding repeated elements" (1982); the
merge-by-addition form follows Agarwal et al., "Mergeable summaries"
(PODS 2012). No counterpart exists in /root/reference — engine addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _prune(counts: pd.DataFrame, k: int) -> tuple[pd.DataFrame, int]:
    """Keep <= k counters: subtract the (k+1)-th largest count from the
    top k (ties broken by term for determinism) and drop non-positives.
    Returns (pruned counters, decrement applied)."""
    if len(counts) <= k:
        return counts, 0
    counts = counts.sort_values(["cnt", "term"], ascending=[False, True],
                                kind="mergesort").reset_index(drop=True)
    dec = int(counts["cnt"].iloc[k])
    kept = counts.iloc[:k].copy()
    kept["cnt"] = kept["cnt"] - dec
    kept = kept[kept["cnt"] > 0]
    return kept, dec


def misra_gries_terms(ds, k: int = 64, text_col: str = "text"):
    """Heavy-hitter terms of a document Dataset under a k-counter budget.

    Per-block combiner: exact local counts pruned to k counters (the
    shuffle then moves <= k rows + 1 error row per block no matter how
    many distinct terms the block holds). Reduce: one Sum groupby (the
    mergeable-summaries addition) + a final prune.

    Returns ``(summary_df, err_total)`` where ``summary_df`` has columns
    (term, cnt) sorted by (cnt desc, term) and every term with true
    frequency > ``err_total`` is guaranteed present.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.partitioning import pick_partitions

    def _local(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        vc = pa.TableGroupBy(pa.table({"term": toks}), "term").aggregate(
            [([], "count_all")])
        df = pd.DataFrame({"term": vc["term"].to_numpy(zero_copy_only=False),
                           "cnt": vc["count_all"].to_numpy(zero_copy_only=False)})
        kept, dec = _prune(df, k)
        kept = pd.concat(
            [kept, pd.DataFrame({"term": ["\x00__mg_err__"], "cnt": [dec]})],
            ignore_index=True)
        return pa.Table.from_pandas(kept, preserve_index=False)

    def _prune_block(t: pa.Table) -> pa.Table:
        """Post-shuffle per-partition re-prune: MG summaries stay valid
        under pruning (err accumulates), so bounding each reduce partition
        to k counters + its own error row caps the driver pull at
        nparts·(k+1) rows — without it the pull is every distinct term
        that survived a block prune (O(blocks·k) at corpus scale)."""
        df = pd.DataFrame({
            "term": t["term"].to_numpy(zero_copy_only=False),
            "cnt": t["cnt"].to_numpy(zero_copy_only=False),
        })
        err_rows = df["term"] == "\x00__mg_err__"
        carried = int(df.loc[err_rows, "cnt"].sum())
        kept, dec = _prune(df.loc[~err_rows].reset_index(drop=True), k)
        kept = pd.concat(
            [kept, pd.DataFrame({"term": ["\x00__mg_err__"],
                                 "cnt": [carried + dec]})],
            ignore_index=True)
        return pa.Table.from_pandas(kept, preserve_index=False)

    raw = ds.map_batches(_local, batch_format="pyarrow")
    merged = (
        raw.groupby("term", num_partitions=pick_partitions(raw))
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(_prune_block, batch_format="pyarrow")
        .to_pandas()
    )
    err_rows = merged["term"] == "\x00__mg_err__"
    err_total = int(merged.loc[err_rows, "cnt"].sum())
    counters = merged.loc[~err_rows].reset_index(drop=True)
    final, dec = _prune(counters, k)
    err_total += dec
    final = final.sort_values(["cnt", "term"], ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
    return final.astype({"cnt": "int64"}), err_total
