"""Exact deduplication — the engine's hash-shuffle dedup (M9/S1 at scale).

Reference dedups driver-side with ``drop_duplicates(subset=patch_id)``
(src/pacasam/connectors/lipac.py:91, src/pacasam/samplers/sampler.py:46).
At 10^12 rows dedup is an all-to-all exchange: hash-partition on the key and
keep one deterministic representative per group (lowest tiebreak value —
NOT "first seen", which is partition-order dependent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def dedup_exact(ds, key: str, tiebreak: str | None = None):
    """groupby(key) → keep the row with the smallest tiebreak (default: the
    key itself ⇒ arbitrary-but-deterministic single representative)."""
    tb = tiebreak or key

    def _first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(tb, kind="mergesort").head(1)

    return ds.groupby(key).map_groups(_first, batch_format="pandas")


def dedup_exact_prehashed(ds, key: str, tiebreak: str):
    """Scale path: per-batch partial dedup BEFORE the shuffle (combiner), then
    the grouped final dedup — the shuffle moves at most one row per key per
    input block instead of every duplicate."""

    def _local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values([key, tiebreak], kind="mergesort").drop_duplicates(subset=[key])
        return pa.Table.from_pandas(df, preserve_index=False)

    return dedup_exact(ds.map_batches(_local, batch_format="pyarrow"), key, tiebreak)
