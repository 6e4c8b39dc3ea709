"""Skew-aware aggregation: salted two-phase groupby for hot keys.

North rule: "partitioning / shuffle / skew handled explicitly ...
skew-aware repartitioning of hot tiles". A plain ``groupby(key)`` sends
every row of a hot key (a dense tile / a giant domain) to ONE reducer; at
10^12 rows a single hot cell can hold billions of rows and the reducer
becomes the job's critical path.

Two complementary techniques, both semantics-preserving for algebraic
(commutative + associative) aggregates:

1. :func:`presum_batches` — per-batch partial aggregation (combiner): each
   input block ships at most one row per key it contains, so the shuffle
   volume is O(blocks × distinct-keys-per-block), independent of row skew.
   This alone removes row-level skew for sum/count/min/max.
2. :func:`salted_groupby_sum` — for completeness when the DISTINCT-KEY
   space itself is skewed across reducers (or the aggregate state per key
   is large): phase 1 groups on (key, salt = row_hash % k) spreading each
   hot key over k reducers; phase 2 re-groups the k partials per key.

The reference never needs this (everything fits one pandas process); the
engine makes the strategy explicit and oracle-checkable: the salted plan's
result is bit-identical to the naive ``groupby`` (integer sums are exact
in any combination order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import hmix
from .partitioning import pick_partitions

SALT_SKEW = 31337


def presum_batches(ds, key: str, sum_cols: list[str]):
    """Per-batch combiner: partial (sum, count) per key inside each block.
    Emits ≤ one row per (block, key) — the shuffle after this moves
    combiner output, never raw rows."""

    def _partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: np.asarray(t[key]).astype(object)})
        for c in sum_cols:
            df[c] = t[c].to_numpy(zero_copy_only=False)
        g = df.groupby(key, sort=False).agg(
            {**{c: "sum" for c in sum_cols}}
        )
        g["__n"] = df.groupby(key, sort=False).size()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    return ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)


def salted_groupby_sum(ds, key: str, sum_cols: list[str], salt_k: int = 16,
                       id_col: str = "patch_id"):
    """Two-phase skew-spread aggregation:

    phase 0: per-batch combiner (presum);
    phase 1: groupby (key, salt) — each hot key spreads over ``salt_k``
             reducers; salt is a deterministic row-hash so the plan is
             partition-count invariant;
    phase 2: groupby key over the ≤ salt_k partials per key.

    Returns (key, num_rows, sum_<c>...) — bit-identical to the naive
    single-phase groupby for integer inputs.
    """
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        s = hmix(t[id_col].to_numpy(zero_copy_only=False), SALT_SKEW) % salt_k
        df = pd.DataFrame({key: np.asarray(t[key]).astype(object), "__salt": s})
        for c in sum_cols:
            df[c] = t[c].to_numpy(zero_copy_only=False)
        g = df.groupby([key, "__salt"], sort=False).agg(
            {**{c: "sum" for c in sum_cols}}
        )
        g["__n"] = df.groupby([key, "__salt"], sort=False).size()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    phase1 = (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, "__salt"], num_partitions=pick_partitions(ds))
        .aggregate(
            Sum("__n", alias_name="num_rows"),
            *[Sum(c, alias_name=f"sum_{c}") for c in sum_cols],
        )
    )
    phase2 = phase1.groupby(key,
                            num_partitions=pick_partitions(phase1)).aggregate(
        Sum("num_rows", alias_name="num_rows"),
        *[Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sum_cols],
    )

    def _cast(t: pa.Table) -> pa.Table:
        for c in ["num_rows"] + [f"sum_{c}" for c in sum_cols]:
            i = t.column_names.index(c)
            t = t.set_column(i, c, pa.compute.cast(t[c], pa.int64()))
        return t

    return phase2.map_batches(_cast, batch_format="pyarrow")
