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
import ray.data

from ..hashing import M31, rank_key

RANK_COL = "__rank"
MAX_COMPLETION_ROUNDS = 50
# Below this exact pool size (known driver-side from the counts pass) the
# pruned reserve is merged in pandas instead of a hash shuffle: the reserve
# lands on the driver either way, and at small sizes the shuffle's
# aggregator-actor startup dominates wall time. Above it, the groupby
# shuffle dedups the reserve across blocks before it ships.
DRIVER_MERGE_MAX_ROWS = 2_000_000


def add_rank(ds, salt: int, key: str = "patch_id", columns: list[str] | None = None):
    """Project to ``columns`` (ids/features only — keep payloads out of the
    shuffle) and append the deterministic sampling rank."""

    def _f(batch: pa.Table) -> pa.Table:
        t = batch.select(columns) if columns else batch
        r = rank_key(t[key].to_numpy(zero_copy_only=False), salt)
        return t.append_column(RANK_COL, pa.array(r))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


# Fan-in of the second-level tree reduce: when the input is big enough to
# have more than this many blocks, the ≤ n-rows-per-block reduced stream is
# coalesced into this many blocks and re-pruned before the driver merge, so
# the driver never pulls more than ~TREE_FANIN × n rows at once.
TREE_FANIN = 32


def smallest_n(ds, n: int, col: str = RANK_COL, tiebreak: str = "patch_id",
               force_tree: bool | None = None) -> pa.Table:
    """Global top-n smallest by (col, tiebreak) — no full sort/shuffle.

    Three levels, each a prune (top-n is associative: top-n(top-n(A) ∪
    top-n(B)) = top-n(A ∪ B)):
    1. per-batch partial top-n (np.partition);
    2. for many-block inputs, a tree reduce: coalesce the reduced stream to
       TREE_FANIN blocks (plain repartition, no hash shuffle) and re-prune,
       so level 3 sees ≤ TREE_FANIN × n rows however many input blocks
       there were;
    3. a bounded-buffer streaming merge on the driver (prune whenever the
       buffer exceeds 4n rows) — driver memory stays O(n), never
       O(n × blocks).
    """
    if n <= 0:
        return None

    def _local_topn(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= n:
            return batch
        v = batch[col].to_numpy(zero_copy_only=False)
        idx = np.argpartition(v, n - 1)[:n]
        return batch.take(pa.array(np.sort(idx)))

    reduced = ds.map_batches(_local_topn, batch_format="pyarrow", zero_copy_batch=True)

    from ..stages.partitioning import estimated_size_bytes

    est = estimated_size_bytes(ds)
    target_block = ray.data.DataContext.get_current().target_max_block_size or (
        128 * 1024 * 1024
    )
    tree = force_tree if force_tree is not None else (
        est is not None and est // target_block > TREE_FANIN
    )
    if tree:
        reduced = reduced.repartition(TREE_FANIN).map_batches(
            _local_topn, batch_format="pyarrow", zero_copy_batch=True
        )

    buf: pd.DataFrame | None = None
    for part in reduced.iter_batches(batch_format="pandas", batch_size=None):
        buf = part if buf is None else pd.concat([buf, part], ignore_index=True)
        if len(buf) > 4 * n:
            buf = buf.sort_values([col, tiebreak], kind="mergesort").head(n)
    if buf is None:
        buf = reduced.limit(0).to_pandas()
    tbl = buf.sort_values([col, tiebreak], kind="mergesort").head(n)
    return pa.Table.from_pandas(tbl.reset_index(drop=True), preserve_index=False)


def sample_randomly(ds, n: int, salt: int, columns: list[str] | None = None) -> pd.DataFrame:
    """O1: uniform n-sample = n smallest hash ranks. n clamped to len (the
    reference clamps too, algos.py:18-19)."""
    ranked = add_rank(ds, salt, columns=columns)
    tbl = smallest_n(ranked, n)
    if tbl is None:
        return pd.DataFrame()
    return tbl.drop_columns(RANK_COL).to_pandas()


def sample_weighted(ds, n: int, salt: int, weight_col: str,
                    key: str = "patch_id",
                    columns: list[str] | None = None) -> pd.DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    each row draws a deterministic uniform u ∈ (0,1] from its hash rank and
    competes with key = −ln(u)/w — the n smallest keys are exactly an
    n-sample with inclusion probability ∝ weight. Deterministic and
    partition-invariant (u is a pure function of (row key, salt); −ln and
    the division are the same IEEE ops on every worker). Rows with
    weight ≤ 0 can never be selected.

    The engine analog of quality-weighted corpus subsampling (sample 10%
    of a crawl, favoring high-quality documents) — the weighted twin of
    :func:`sample_randomly`.
    """
    def _key(batch: pa.Table) -> pa.Table:
        t = batch.select(columns) if columns else batch
        r = rank_key(t[key].to_numpy(zero_copy_only=False), salt)
        # hmix is 31-bit: map [0, 2**31) -> (0, 1] so -ln(u) is Exp(1).
        # (A >>11/2**53 mapping here once landed u in (0, 2**-33], making
        # -ln(u) a near-constant ~23-37 that drowned the weights.)
        u = (r.astype(np.float64) + 1.0) / float(M31)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        es = np.where(w > 0, -np.log(u) / np.maximum(w, 1e-300), np.inf)
        return t.append_column(RANK_COL, pa.array(es))

    keyed = ds.map_batches(_key, batch_format="pyarrow", zero_copy_batch=True)
    tbl = smallest_n(keyed, n, col=RANK_COL, tiebreak=key)
    if tbl is None:
        return pd.DataFrame()
    return tbl.drop_columns(RANK_COL).to_pandas()


def sample_weighted_sps(ds, n: int, salt: int, weight_col: str,
                        key: str = "patch_id",
                        columns: list[str] | None = None) -> pd.DataFrame:
    """Sequential Poisson sampling (Ohlsson 1998): rank ξ = u/w from a
    deterministic uniform u, take the n smallest — first-order inclusion
    probability ∝ weight, like :func:`sample_weighted`, but the key is ONE
    exactly-rounded IEEE division of two integers ((hmix+1)/w), so a SQL
    oracle reproduces the selection bit-for-bit (−ln in the E–S key has no
    such cross-engine guarantee). Rows with weight ≤ 0 are excluded before
    keying. Prefer this variant when the selection must be independently
    auditable; E–S when exact WOR semantics matter."""
    def _key(batch: pa.Table) -> pa.Table:
        t = batch.select(columns) if columns else batch
        w64 = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        t = t.filter(pa.array(w64 > 0))
        r = rank_key(t[key].to_numpy(zero_copy_only=False), salt)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        xi = (r.astype(np.float64) + 1.0) / w
        return t.append_column(RANK_COL, pa.array(xi))

    keyed = ds.map_batches(_key, batch_format="pyarrow", zero_copy_batch=True)
    tbl = smallest_n(keyed, n, col=RANK_COL, tiebreak=key)
    if tbl is None:
        return pd.DataFrame()
    return tbl.drop_columns(RANK_COL).to_pandas()



def _typed_empty(cols) -> pd.DataFrame:
    """Typed empty selection frame: int64 ids, object otherwise. An untyped
    ``pd.DataFrame(columns=cols)`` makes every column object, and a later
    pd.concat with real selections then poisons patch_id to object dtype —
    the driver's canonical hash is dtype-sensitive (r4 tpch_q12 lesson)."""
    return pd.DataFrame({c: pd.Series(dtype=np.int64 if c == "patch_id"
                                      else object) for c in cols})

def strata_counts(ranked, strata: str) -> pd.DataFrame:
    """Per-strata row counts WITHOUT a shuffle: per-batch partial
    value_counts (combiner) → tiny driver-side merge. Strata cardinality is
    small (slab keys), so each batch ships ≤ nunique rows."""

    def _partial(batch: pa.Table) -> pa.Table:
        vc = pa.TableGroupBy(batch.select([strata]), strata).aggregate(
            [([], "count_all")]
        )
        return vc.rename_columns([strata, "n"])

    parts = ranked.map_batches(_partial, batch_format="pyarrow").to_pandas()
    if strata not in parts.columns:
        # fully-empty input: Ray 2.49 yields schema-less zero-row blocks,
        # so to_pandas() loses the columns (the documented empty-block
        # class — see stages/joins.safe_join)
        return pd.DataFrame({strata: pd.Series(dtype=object),
                             "n": pd.Series(dtype=np.int64)})
    return parts.groupby(strata, sort=False)["n"].sum().reset_index()


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
    selected ids, take 1 more per strata, trim, loop.

    Physical plan (2 scans, 1 pruned shuffle — no materialization, no
    per-round cluster passes):
    1. shuffle-free per-batch partial counts → exact strata sizes;
    2. from the sizes, solve the reference recurrence for the exact
       completion depth r* (smallest r with Σ min(size, quota+r) ≥ n) and
       fetch each stratum's ``quota + r* + 1`` lowest-rank rows (per-batch
       pre-prune, then a groupby shuffle that moves only pruned rows);
    3. replay the reference's round-0/completion loop driver-side over the
       per-stratum reserves — bit-identical to running the rounds
       distributed, because each round consumes ranks in prefix order so no
       round can reach deeper than quota + rounds.
    Deterministic: per-row ranks are pure functions of (patch_id, salt).
    """
    cols = list(dict.fromkeys((columns or ["patch_id", strata]) + [strata]))
    ranked = add_rank(ds, salt, columns=cols)

    counts = strata_counts(ranked, strata)
    nunique = len(counts)
    if nunique == 0 or n <= 0:
        return _typed_empty(cols)
    total = int(counts["n"].sum())
    if total <= n:
        return ranked.drop_columns([RANK_COL]).to_pandas()
    quota = max(1, n // nunique)

    sizes = counts["n"].to_numpy()
    r = 0
    while np.minimum(sizes, quota + r).sum() < n and r < max_rounds:
        r += 1
    depth = quota + r + 1

    def _local_prune(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.sort_values([RANK_COL, "patch_id"], kind="mergesort")
        return g.groupby(strata, sort=False, group_keys=False).head(depth)

    pruned = ranked.map_batches(_local_prune, batch_format="pandas")
    if total <= DRIVER_MERGE_MAX_ROWS:
        reserve = pruned.to_pandas()
        reserve = reserve.sort_values([RANK_COL, "patch_id"], kind="mergesort")
        reserve = reserve.groupby(strata, sort=False, group_keys=False).head(depth)
    else:
        from ..stages.partitioning import grouped_batch_map

        # strata co-located by hash bucket; ONE vectorized sort +
        # groupby.head per partition (not a Python callback per stratum)
        reserve = grouped_batch_map(pruned, [strata], _local_prune).to_pandas()

    reserve = reserve.sort_values([RANK_COL, "patch_id"], kind="mergesort")
    selected = reserve.groupby(strata, sort=False, group_keys=False).head(quota)
    selected = selected.sort_values([RANK_COL, "patch_id"], kind="mergesort").head(n)
    rounds = 0
    while len(selected) < n and rounds < max_rounds:
        rounds += 1
        rest = reserve[~reserve["patch_id"].isin(selected["patch_id"])]
        if rest.empty:
            break
        extra = rest.groupby(strata, sort=False, group_keys=False).head(1)
        extra = extra.sort_values([RANK_COL, "patch_id"], kind="mergesort").head(
            n - len(selected)
        )
        selected = pd.concat([selected, extra], ignore_index=True)

    return selected.drop(columns=[RANK_COL]).reset_index(drop=True)


def multi_stratified_sample(
    ds,
    specs: list[dict],
    strata: str = "file_id",
    columns: list[str] | None = None,
    max_rounds: int = MAX_COMPLETION_ROUNDS,
) -> dict[str, pd.DataFrame]:
    """Fused O2 for many criteria in TWO cluster passes total.

    ``specs``: [{"name", "filter_col" (bool col or None), "n", "salt"}, ...].
    Semantically identical to calling :func:`sample_with_stratification`
    once per spec on the boolean-filtered pool (M1 → O2), but the counts
    scan and the pruned reserve shuffle are shared across all specs —
    TargettedSampler's per-criterion loop (reference targetted.py:28-39)
    otherwise costs 2 cluster passes PER criterion.
    Returns {name: selection DataFrame}.
    """
    cols = list(dict.fromkeys((columns or ["patch_id", strata]) + [strata]))
    filter_cols = sorted({s["filter_col"] for s in specs if s["filter_col"]})
    scan_cols = list(dict.fromkeys(cols + filter_cols))

    def _tagged(batch: pa.Table) -> pa.Table:
        t = batch.select(scan_cols)
        outs = []
        for si, spec in enumerate(specs):
            sub = t.filter(t[spec["filter_col"]]) if spec["filter_col"] else t
            sub = sub.select(cols)
            r = rank_key(sub["patch_id"].to_numpy(zero_copy_only=False), spec["salt"])
            sub = sub.append_column(RANK_COL, pa.array(r))
            outs.append(sub.append_column("__spec", pa.array(
                np.full(sub.num_rows, si, dtype=np.int64))))
        return pa.concat_tables(outs)

    tagged = ds.map_batches(_tagged, batch_format="pyarrow", zero_copy_batch=True)

    # Pass 1: shuffle-free per-(spec, strata) counts.
    def _partial_counts(batch: pa.Table) -> pa.Table:
        vc = pa.TableGroupBy(batch.select(["__spec", strata]), ["__spec", strata]).aggregate(
            [([], "count_all")]
        )
        return vc.rename_columns(["__spec", strata, "n"])

    parts = tagged.map_batches(_partial_counts, batch_format="pyarrow").to_pandas()
    if "__spec" not in parts.columns:  # empty-block class: see strata_counts
        parts = pd.DataFrame({"__spec": pd.Series(dtype=np.int64),
                              strata: pd.Series(dtype=object),
                              "n": pd.Series(dtype=np.int64)})
    counts = parts.groupby(["__spec", strata], sort=False)["n"].sum().reset_index()

    # Driver: per-spec quota + exact completion depth from the sizes.
    depths: dict[int, int] = {}
    quotas: dict[int, int] = {}
    totals: dict[int, int] = {}
    for si, spec in enumerate(specs):
        sizes = counts.loc[counts["__spec"] == si, "n"].to_numpy()
        nunique = len(sizes)
        n = spec["n"]
        totals[si] = int(sizes.sum())
        if nunique == 0 or n <= 0:
            quotas[si], depths[si] = 0, 0
            continue
        quota = max(1, n // nunique)
        if totals[si] <= n:
            # whole pool is returned: the reserve must hold every row
            quotas[si], depths[si] = quota, int(sizes.max())
            continue
        r = 0
        while np.minimum(sizes, quota + r).sum() < n and r < max_rounds:
            r += 1
        quotas[si], depths[si] = quota, quota + r + 1

    if sum(totals.values()) == 0:
        # every pool empty (degenerate corpus / all-false criteria): the
        # reserve scan below would hit the schema-less empty-block class
        return {s["name"]: _typed_empty(cols) for s in specs}

    max_depth = max(depths.values() or [0])

    # Pass 2: per-batch prune → one shared shuffle on (spec, strata).
    def _local_prune(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.sort_values([RANK_COL, "patch_id"], kind="mergesort")
        g = g.groupby(["__spec", strata], sort=False, group_keys=False).head(max_depth)
        return g

    depth_arr = np.zeros(len(specs), dtype=np.int64)
    for si in range(len(specs)):
        depth_arr[si] = depths[si]

    def _bucket_take(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-(spec, stratum) head(depth[spec]) across the
        # whole bucket: cumcount < spec depth after one sort
        df = df.sort_values([RANK_COL, "patch_id"], kind="mergesort")
        cc = df.groupby(["__spec", strata], sort=False).cumcount().to_numpy()
        return df[cc < depth_arr[df["__spec"].to_numpy()]]

    pruned = tagged.map_batches(_local_prune, batch_format="pandas")
    if sum(totals.values()) <= DRIVER_MERGE_MAX_ROWS:
        merged = pruned.to_pandas()
        merged = merged.sort_values([RANK_COL, "patch_id"], kind="mergesort")
        parts = [
            merged[merged["__spec"] == si]
            .groupby(strata, sort=False, group_keys=False)
            .head(depths[si])
            for si in range(len(specs))
        ]
        reserve_all = pd.concat(parts, ignore_index=True) if parts else merged
    else:
        from ..stages.partitioning import grouped_batch_map

        reserve_all = grouped_batch_map(
            pruned, ["__spec", strata], _bucket_take
        ).to_pandas()

    out: dict[str, pd.DataFrame] = {}
    for si, spec in enumerate(specs):
        n, quota = spec["n"], quotas[si]
        reserve = reserve_all[reserve_all["__spec"] == si].drop(columns="__spec")
        if quota == 0 or reserve.empty:
            out[spec["name"]] = _typed_empty(cols)
            continue
        if totals[si] <= n:
            out[spec["name"]] = (
                reserve.drop(columns=[RANK_COL]).reset_index(drop=True)
            )
            continue
        reserve = reserve.sort_values([RANK_COL, "patch_id"], kind="mergesort")
        selected = reserve.groupby(strata, sort=False, group_keys=False).head(quota)
        selected = selected.sort_values([RANK_COL, "patch_id"], kind="mergesort").head(n)
        rounds = 0
        while len(selected) < n and rounds < max_rounds:
            rounds += 1
            rest = reserve[~reserve["patch_id"].isin(selected["patch_id"])]
            if rest.empty:
                break
            extra = rest.groupby(strata, sort=False, group_keys=False).head(1)
            extra = extra.sort_values([RANK_COL, "patch_id"], kind="mergesort").head(
                n - len(selected)
            )
            selected = pd.concat([selected, extra], ignore_index=True)
        out[spec["name"]] = selected.drop(columns=[RANK_COL]).reset_index(drop=True)
    return out


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
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    selected = np.zeros(num_to_sample, dtype=np.int64)
    # |x-c|² = |x|² − 2·x·c + |c|²: one gemv + two vector ops per step
    # instead of materializing the (n × dim) difference matrix — ~4× less
    # memory traffic, which dominates the O(N·S) loop. ``max(d, 0)`` guards
    # the cancellation-induced tiny negatives so selected-marking (−1)
    # stays unambiguous.
    norms = np.einsum("ij,ij->i", arr, arr)
    d = np.empty(n, dtype=np.float64)
    min_d = np.empty(n, dtype=np.float64)

    def dist_to(c: int, out: np.ndarray) -> np.ndarray:
        np.dot(arr, arr[c], out=out)
        out *= -2.0
        out += norms
        out += norms[c]
        np.maximum(out, 0.0, out=out)
        return out

    dist_to(0, min_d)
    min_d[0] = -1.0  # mark selected so argmax can never re-pick them
    for i in range(1, num_to_sample):
        nxt = int(np.argmax(min_d))
        selected[i] = nxt
        np.minimum(min_d, dist_to(nxt, d), out=min_d)
        min_d[nxt] = -1.0
    return selected


def proportional_target(chunk_len: int, n: int, total: int) -> int:
    """O5 allocation: ceil(len(chunk) * n / total) (diversity.py:83)."""
    return math.ceil(chunk_len * n / max(1, total))
