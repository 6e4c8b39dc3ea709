"""Core sampling algorithms, Ray-Data-first.

Reference semantics (src/pacasam/samplers/algos.py) reimplemented with
deterministic hash-rank randomness (partition-count invariant — see
pacasam_ray.hashing) instead of pandas' order-dependent seeded ``.sample``:

- O1 `sample_randomly` (algos.py:17-20): global uniform n-sample without
  replacement ⇒ rows with the n smallest hash ranks.
- O2 `sample_with_stratification` (algos.py:23-56): per-strata quota sample
  with iterative completion rounds and overshoot trimming.
- O4 `fps` (algos.py:94-140): farthest point sampling, identical greedy
  numpy kernel (it is already a vectorized per-chunk kernel in the
  reference; chunking bounds the O(N·S) cost).

Scale notes: the stratified groupby on the strata key is the engine's
dominant shuffle; inputs are projected to (ids + rank) BEFORE the shuffle so
payload columns never move. Selection outputs are small (≤ sampling target)
and are collected driver-side, mirroring the reference's orchestration.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import rank_key

RANK_COL = "__rank"
MAX_COMPLETION_ROUNDS = 50


def add_rank(ds, salt: int, key: str = "patch_id", columns: list[str] | None = None):
    """Project to ``columns`` (ids/features only — keep payloads out of the
    shuffle) and append the deterministic sampling rank."""

    def _f(batch: pa.Table) -> pa.Table:
        t = batch.select(columns) if columns else batch
        r = rank_key(t[key].to_numpy(zero_copy_only=False), salt)
        return t.append_column(RANK_COL, pa.array(r))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def smallest_n(ds, n: int, col: str = RANK_COL, tiebreak: str = "patch_id") -> pa.Table:
    """Global top-n smallest by (col, tiebreak): per-batch partial top-n
    (np.partition) then a tiny driver-side merge — no full sort/shuffle."""
    if n <= 0:
        return None

    def _local_topn(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= n:
            return batch
        v = batch[col].to_numpy(zero_copy_only=False)
        idx = np.argpartition(v, n - 1)[:n]
        return batch.take(pa.array(np.sort(idx)))

    reduced = ds.map_batches(_local_topn, batch_format="pyarrow", zero_copy_batch=True)
    # The reduced stream holds ≤ n rows per input batch; merge on the driver.
    tbl = reduced.to_pandas()
    tbl = tbl.sort_values([col, tiebreak], kind="mergesort").head(n)
    return pa.Table.from_pandas(tbl.reset_index(drop=True), preserve_index=False)


def sample_randomly(ds, n: int, salt: int, columns: list[str] | None = None) -> pd.DataFrame:
    """O1: uniform n-sample = n smallest hash ranks. n clamped to len (the
    reference clamps too, algos.py:18-19)."""
    ranked = add_rank(ds, salt, columns=columns)
    tbl = smallest_n(ranked, n)
    if tbl is None:
        return pd.DataFrame()
    return tbl.drop_columns(RANK_COL).to_pandas()


def _per_group_take(quota_default: int):
    """map_groups body: keep the ``quota`` lowest-rank rows of the group."""

    def _take(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([RANK_COL, "patch_id"], kind="mergesort")
        return g.head(quota_default)

    return _take


def sample_with_stratification(
    ds,
    n: int,
    salt: int,
    strata: str = "file_id",
    columns: list[str] | None = None,
    max_rounds: int = MAX_COMPLETION_ROUNDS,
) -> pd.DataFrame:
    """O2: stratified sample with iterative completion (algos.py:23-56).

    Round 0: per-strata take ``max(1, n // nunique)`` lowest-rank rows;
    overshoot ⇒ trim globally by rank. While undershoot: exclude already
    selected ids (broadcast anti-join), take 1 more per strata, trim, loop.
    Deterministic: per-row ranks are pure functions of (patch_id, salt, round).
    """
    cols = list(dict.fromkeys((columns or ["patch_id", strata]) + [strata]))
    # The ranked projection is ids + strata + rank only (payloads never enter
    # the shuffle); materialized because the completion loop re-scans it.
    ranked = add_rank(ds, salt, columns=cols).materialize()

    # ONE small groupby-count gives both the total row count (early-return
    # check, reference algos.py:26-27) and the distinct-strata count (A1).
    counts = ranked.groupby(strata).count().to_pandas()
    total = int(counts["count()"].sum())
    nunique = len(counts)
    if nunique == 0 or n <= 0:
        return pd.DataFrame(columns=cols)
    if total <= n:
        return ranked.drop_columns([RANK_COL]).to_pandas()
    quota = max(1, n // nunique)

    selected = (
        ranked.groupby(strata)
        .map_groups(_per_group_take(quota), batch_format="pandas")
        .to_pandas()
    )
    selected = selected.sort_values([RANK_COL, "patch_id"], kind="mergesort").head(n)

    rounds = 0
    while len(selected) < n and rounds < max_rounds:
        rounds += 1
        chosen = set(selected["patch_id"].tolist())
        extra = (
            ranked.map_batches(
                _exclude_batch_fn(chosen),
                batch_format="pandas",
            )
            .groupby(strata)
            .map_groups(_per_group_take(1), batch_format="pandas")
            .to_pandas()
        )
        if extra.empty:
            break
        extra = extra.sort_values([RANK_COL, "patch_id"], kind="mergesort").head(n - len(selected))
        selected = pd.concat([selected, extra], ignore_index=True)

    return selected.drop(columns=[RANK_COL]).reset_index(drop=True)


def _exclude_batch_fn(chosen: set):
    arr = pa.array(list(chosen))

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        mask = pc.is_in(pa.array(batch["patch_id"]), value_set=arr).to_numpy(
            zero_copy_only=False
        )
        return batch[~mask]

    return _f


def yield_chunks(df: pd.DataFrame, max_chunk_size: int):
    """O3: consecutive fixed-size chunks, order preserving (algos.py:59-62)."""
    for start in range(0, len(df), max_chunk_size):
        yield df.iloc[start : start + max_chunk_size]


def fps(arr: np.ndarray, num_to_sample: int) -> np.ndarray:
    """O4: farthest point sampling (algos.py:94-140), identical greedy kernel.

    Returns indices of sampled rows *in selection order*; starts at index 0.
    O(N·S); callers bound N by chunking (reference chunk = 20k patches,
    configs/Lipac.yml:28).
    """
    n = len(arr)
    if num_to_sample >= n:
        return np.arange(n)
    if num_to_sample <= 0:
        return np.array([], dtype=np.int64)
    selected = np.zeros(num_to_sample, dtype=np.int64)
    min_d = ((arr - arr[0]) ** 2).sum(axis=-1)
    min_d[0] = -1.0  # mark selected so argmax can never re-pick them
    for i in range(1, num_to_sample):
        nxt = int(np.argmax(min_d))
        selected[i] = nxt
        d = ((arr - arr[nxt]) ** 2).sum(axis=-1)
        np.minimum(min_d, d, out=min_d)
        min_d[nxt] = -1.0
    return selected


def proportional_target(chunk_len: int, n: int, total: int) -> int:
    """O5 allocation: ceil(len(chunk) * n / total) (diversity.py:83)."""
    return math.ceil(chunk_len * n / max(1, total))
