"""Similarity search over an embedding column (list<float>).

Ray-Data-native ANN building blocks:

- :func:`ann_topk` — distributed brute-force cosine top-k: the (small)
  query matrix is ``ray.put`` once; every batch computes an integer
  matmul against it and emits only its local top-k rows per query; a
  grouped reduction keeps the global top-k. The reduction ships k·Q rows
  per batch — never the vectors.
- :func:`embed_neardup` — exact all-pairs cosine threshold join as a
  distributed block-nested-loop (each batch × broadcast matrix). The
  oracle-exact baseline; quadratic, so the scale path is below.
- :func:`embed_neardup_lsh` — random-hyperplane LSH: multi-table banded
  signatures → per-bucket exact verification. Subset of the exact result
  (recall < 1 by design); checked by pytest recall tests, rows-only for
  the driver.

Exactness contract: embeddings are quantized to int64 (×1000, round) so
every dot product and squared norm is an exact integer; cosine is then ONE
IEEE-double expression ``dot / (sqrt(na)·sqrt(nb))`` — bit-identical in
numpy and DuckDB regardless of summation order (integer-valued doubles
< 2^53 add exactly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

QUANT = 1000.0


def quantize(mat: np.ndarray) -> np.ndarray:
    return np.rint(np.asarray(mat, dtype=np.float64) * QUANT).astype(np.int64)


def quantize_sql(col: str = "embedding") -> str:
    return f"list_transform({col}, x -> CAST(ROUND(x * {QUANT!r}) AS BIGINT))"


def _batch_qmat(t: pa.Table, emb_col: str) -> np.ndarray:
    col = t[emb_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return quantize(np.stack(col.to_numpy(zero_copy_only=False)))


def load_query_matrix(path: str, query_ids: list[int], id_col: str = "vec_id",
                      emb_col: str = "embedding") -> np.ndarray:
    """Driver-side load of the (tiny) query vectors, ordered by query id.
    Row-filter pushed into the parquet read — only the query rows leave
    storage."""
    import pyarrow.dataset as pads

    t = pads.dataset(path).to_table(
        columns=[id_col, emb_col], filter=pads.field(id_col).isin(list(query_ids))
    )
    df = t.to_pandas().set_index(id_col).loc[list(query_ids)]
    return quantize(np.stack(df[emb_col].to_numpy()))


def cosine_from_ints(dots: np.ndarray, na: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """cos = dot / (sqrt(na) * sqrt(nb)) — the single portable float expr."""
    return dots.astype(np.float64) / (
        np.sqrt(na.astype(np.float64)) * np.sqrt(nb.astype(np.float64))
    )


def ann_topk(ds, query_matrix: np.ndarray, k: int,
             id_col: str = "vec_id", emb_col: str = "embedding",
             force_tree: bool | None = None) -> pd.DataFrame:
    """Brute-force cosine top-k per query, distributed with per-batch pruning.

    Returns (query_id, vec_id, cos, rank) — ties broken by vec_id asc.
    Self-matches are NOT excluded (a query that exists in the corpus ranks
    itself first with cos == 1.0, same as the SQL oracle). The merge is
    tree-reduced (stages.topk.merge_local_topk), so the driver pulls
    O(k·Q) rows however many input blocks there are.
    """
    qz = np.asarray(query_matrix, dtype=np.int64)
    qn = (qz * qz).sum(axis=1)
    q_ref = ray.put((qz, qn))

    def _local_topk(t: pa.Table) -> pa.Table:
        qz_, qn_ = ray.get(q_ref)
        ez = _batch_qmat(t, emb_col)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        en = (ez * ez).sum(axis=1)
        dots = ez @ qz_.T  # exact int64
        cos = cosine_from_ints(dots, en[:, None], qn_[None, :])
        out_q, out_id, out_c = [], [], []
        take = min(k, len(ids))
        for qi in range(qz_.shape[0]):
            order = np.lexsort((ids, -cos[:, qi]))[:take]
            out_q.append(np.full(take, qi, dtype=np.int64))
            out_id.append(ids[order])
            out_c.append(cos[order, qi])
        return pa.table({
            "query_id": np.concatenate(out_q),
            id_col: np.concatenate(out_id),
            "cos": np.concatenate(out_c),
        })

    from ..stages.topk import merge_local_topk

    parts = ds.map_batches(_local_topk, batch_format="pyarrow", zero_copy_batch=True)
    out = merge_local_topk(
        parts, k, ["query_id", "cos", id_col], [True, False, True],
        source=ds, force_tree=force_tree,
    )
    out = out.sort_values(["query_id", "cos", id_col],
                          ascending=[True, False, True],
                          kind="mergesort").reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def ann_topk_sql(table: str, query_ids: list[int], k: int,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 dim: int = 64) -> str:
    qe = quantize_sql(emb_col)
    ids = ", ".join(str(i) for i in query_ids)
    order = ", ".join(f"({i}, {qi})" for qi, i in enumerate(query_ids))
    return f"""
WITH z AS (SELECT {id_col}, {qe} AS e FROM {table}),
nz AS (SELECT {id_col}, e,
       (SELECT SUM(e[i] * e[i]) FROM generate_series(1, {dim}) t(i)) AS nn FROM z),
qmap AS (SELECT CAST(qid AS BIGINT) AS qid, CAST(query_id AS BIGINT) AS query_id
         FROM (VALUES {order}) v(qid, query_id)),
q AS (SELECT query_id, e AS qe, nn AS qn FROM nz JOIN qmap ON {id_col} = qid),
d AS (SELECT q.query_id, nz.{id_col},
        (SELECT SUM(qe[i] * nz.e[i]) FROM generate_series(1, {dim}) t(i)) AS dot,
        nz.nn AS en, q.qn FROM q, nz),
c AS (SELECT query_id, {id_col},
        CAST(dot AS DOUBLE) / (SQRT(CAST(en AS DOUBLE)) * SQRT(CAST(qn AS DOUBLE))) AS cos
      FROM d)
SELECT query_id, {id_col}, cos,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, {id_col}) AS rank
FROM c QUALIFY rank <= {k}
"""


def embed_neardup(ds, tau: float = 0.4, id_col: str = "vec_id",
                  emb_col: str = "embedding", corpus_path: str | None = None):
    """Exact cosine-threshold self-join (block-nested-loop): each batch
    matmuls against the broadcast full quantized matrix; pairs (a < b) with
    cos ≥ tau are emitted. The broadcast side is built ONCE on the driver
    and shared zero-copy via the object store. Quadratic — the LSH variant
    below is the 100 TB path; this one is the oracle-checked baseline.
    """
    t = pq.read_table(corpus_path, columns=[id_col, emb_col])
    all_ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = quantize(np.stack(t[emb_col].combine_chunks().to_numpy(zero_copy_only=False)))
    norms = (mat * mat).sum(axis=1)
    ref = ray.put((all_ids, mat, norms))

    def _pairs(b: pa.Table) -> pa.Table:
        ids_all, m_all, n_all = ray.get(ref)
        ez = _batch_qmat(b, emb_col)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        en = (ez * ez).sum(axis=1)
        dots = ez @ m_all.T
        cos = cosine_from_ints(dots, en[:, None], n_all[None, :])
        lt = ids[:, None] < ids_all[None, :]
        hit = (cos >= tau) & lt
        ia, ib = np.nonzero(hit)
        return pa.table({
            "doc_a": pa.array(ids[ia]),
            "doc_b": pa.array(ids_all[ib]),
            "cos": pa.array(cos[ia, ib]),
        })

    return ds.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True)


def embed_neardup_sql(table: str, tau: float = 0.4, id_col: str = "vec_id",
                      emb_col: str = "embedding", dim: int = 64) -> str:
    qe = quantize_sql(emb_col)
    return f"""
WITH z AS (SELECT {id_col}, {qe} AS e FROM {table}),
nz AS (SELECT {id_col}, e,
       (SELECT SUM(e[i] * e[i]) FROM generate_series(1, {dim}) t(i)) AS nn FROM z),
p AS (SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
        (SELECT SUM(a.e[i] * b.e[i]) FROM generate_series(1, {dim}) t(i)) AS dot,
        a.nn AS na, b.nn AS nb
      FROM nz a, nz b WHERE a.{id_col} < b.{id_col})
SELECT doc_a, doc_b,
       CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) AS cos
FROM p
WHERE CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) >= {tau!r}
"""


HYPERPLANE_SALT = 13000  # hmix salt namespace for LSH hyperplane entries


def hyperplane_rademacher(n_tables: int, bits: int, dim: int,
                          seed: int) -> np.ndarray:
    """±1 (Rademacher, Achlioptas 2003) hyperplane entries as a pure hmix
    function of (table, dim index, bit, seed) — sign projections with ±1
    entries behave like Gaussian ones for sign-LSH, and the integer dot
    products they induce over the quantized embeddings are EXACT
    (order-free int64 sums), so the bucket keys — and therefore the whole
    candidate-pair set — are reproduced bit-for-bit by the generated
    DuckDB twin (queries._sql_embed_neardup_lsh). Flat index convention
    mirrored in SQL: idx = (tab * dim + i) * bits + b."""
    from ..hashing import hmix

    idx = np.arange(n_tables * dim * bits, dtype=np.int64)
    signs = 1 - 2 * (hmix(idx, HYPERPLANE_SALT + seed) % 2)
    return signs.reshape(n_tables, dim, bits)


class _HyperplaneSigner:
    """Actor-pool stage: hmix-derived ±1 hyperplanes built once per actor;
    emits one row per (vector, table): sign-signature bucket key ONLY — the
    vector itself never enters the shuffle (that would multiply shuffle
    volume by n_tables; verification re-reads vectors from a broadcast side
    table)."""

    def __init__(self, n_tables: int, bits: int, dim: int, seed: int,
                 id_col: str, emb_col: str):
        self.planes = hyperplane_rademacher(n_tables, bits, dim, seed)
        self.n_tables, self.bits = n_tables, bits
        self.id_col, self.emb_col = id_col, emb_col
        self._pows = (np.int64(1) << np.arange(bits, dtype=np.int64))

    def __call__(self, t: pa.Table) -> pa.Table:
        # int64 quantized embeddings x ±1 int64 planes: exact dots
        ez = _batch_qmat(t, self.emb_col)
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_id, out_tab, out_key = [], [], []
        for tab in range(self.n_tables):
            signs = (ez @ self.planes[tab]) > 0
            keys = (signs.astype(np.int64) * self._pows[None, :]).sum(axis=1)
            out_id.append(ids)
            out_tab.append(np.full(len(ids), tab, dtype=np.int64))
            out_key.append(keys)
        return pa.table({
            self.id_col: np.concatenate(out_id),
            "tab": np.concatenate(out_tab),
            "key": np.concatenate(out_key),
        })


# Above this estimated corpus size the LSH verify stops broadcasting the
# full quantized matrix (object-store bound) and switches to the
# distributed pair-join path.
BROADCAST_SIDE_MAX_BYTES = 2 * 1024 ** 3


def embed_neardup_lsh(ds, tau: float = 0.4, n_tables: int = 24, bits: int = 5,
                      seed: int = 23, id_col: str = "vec_id",
                      emb_col: str = "embedding",
                      concurrency: int | tuple = (1, 8),
                      corpus_path: str | None = None,
                      side: str | None = None,
                      broadcast_max_bytes: int = BROADCAST_SIDE_MAX_BYTES):
    """Scale path: random-hyperplane LSH buckets → exact cosine
    verification → pair dedup. Output ⊆ exact result; recall grows with
    n_tables (collision prob per table = (1 − θ/π)^bits).

    Shuffle discipline: only (id, tab, key) rows move through the bucket
    shuffle — 3 ints per (vector, table), never a vector copy per table.
    Verification has two physical plans, chosen by the metadata-only size
    estimate (override with ``side="broadcast"|"join"``):

    - **broadcast** (corpus fits the object store): the quantized matrix is
      built once, sorted by id, ``ray.put`` once; each bucket group gathers
      its members' vectors by ``np.searchsorted``.
    - **join** (corpus beyond ``broadcast_max_bytes``): buckets emit ID
      PAIRS only (after a singleton-bucket prefilter); pairs dedup across
      tables with one Count groupby; then the (id → vector) side joins in
      by hash — one vector copy per unique pair side, never a resident
      full-matrix replica. Identical output to the broadcast plan
      (asserted by a path-equivalence test).
    """
    from ray.data.aggregate import Count, Min

    from ..stages.partitioning import (estimated_size_bytes, grouped_batch_map,
                                       pick_group_partitions, pick_partitions)

    dim = len(ds.take(1)[0][emb_col])

    sigs = ds.map_batches(
        _HyperplaneSigner, batch_format="pyarrow",
        fn_constructor_args=(n_tables, bits, dim, seed, id_col, emb_col),
        concurrency=concurrency,
    )

    if side is None:
        est = estimated_size_bytes(ds)
        side = "join" if est is not None and est > broadcast_max_bytes else "broadcast"

    if side == "broadcast":
        if corpus_path is not None:
            t = pq.read_table(corpus_path, columns=[id_col, emb_col])
        else:
            t = pa.concat_tables(
                ray.get(ds.select_columns([id_col, emb_col]).to_arrow_refs())
            )
        ids_all = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids_all, kind="stable")
        mat = quantize(np.stack(t[emb_col].combine_chunks().to_numpy(zero_copy_only=False)))
        side_ref = ray.put((ids_all[order], np.ascontiguousarray(mat[order])))

        def _verify(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) < 2:
                return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                     "doc_b": pd.Series([], dtype=np.int64),
                                     "cos": pd.Series([], dtype=np.float64)})
            ids_sorted, m_all = ray.get(side_ref)
            ids = np.sort(g[id_col].to_numpy().astype(np.int64))
            m = m_all[np.searchsorted(ids_sorted, ids)]
            n = (m * m).sum(axis=1)
            dots = m @ m.T
            cos = cosine_from_ints(dots, n[:, None], n[None, :])
            ia, ib = np.triu_indices(len(ids), 1)
            keep = cos[ia, ib] >= tau
            return pd.DataFrame({"doc_a": ids[ia][keep], "doc_b": ids[ib][keep],
                                 "cos": cos[ia, ib][keep]})

        pairs = sigs.groupby(["tab", "key"],
                             num_partitions=pick_group_partitions(sigs)) \
            .map_groups(_verify, batch_format="pandas")

        # A pair found in k tables appears k times with an identical cos —
        # dedup is a vectorized Min aggregate, not a per-group Python callback.
        # scrub: map_groups→aggregate chains emit schema-less zero-row blocks
        # that poison downstream joins (see scrub_empty_blocks).
        from ..stages.partitioning import scrub_empty_blocks

        return scrub_empty_blocks(
            pairs.groupby(["doc_a", "doc_b"],
                          num_partitions=pick_partitions(pairs))
            .aggregate(Min("cos", alias_name="cos"))
        )

    # ---- join path: no resident corpus replica anywhere ----
    sigs = sigs.materialize()  # feeds the prefilter AND the pair stage

    # Singleton buckets dominate and can't produce pairs: one Count
    # aggregate finds the >= 2-member buckets, broadcast into an is_in
    # filter (same prefilter as minhash_lsh_pairs).
    counts = sigs.groupby(["tab", "key"],
                          num_partitions=pick_partitions(sigs)) \
        .aggregate(Count(alias_name="c"))
    hot = counts.filter(expr="c >= 2").select_columns(["tab", "key"]).to_pandas()
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64),
                          "cos": pd.Series([], dtype=np.float64)})
    if not len(hot):
        return ray.data.from_pandas(empty)
    with np.errstate(over="ignore"):
        hot_keys = (hot["key"].to_numpy(np.int64) * np.int64(37)
                    + hot["tab"].to_numpy(np.int64))
    keys_ref = ray.put(pa.array(hot_keys))

    def _keep_collisions(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        with np.errstate(over="ignore"):
            k = (t["key"].to_numpy(zero_copy_only=False) * np.int64(37)
                 + t["tab"].to_numpy(zero_copy_only=False))
        return t.filter(pc.is_in(pa.array(k), value_set=ray.get(keys_ref)))

    cand = sigs.map_batches(_keep_collisions, batch_format="pyarrow")

    def _bucket_id_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per bucket; the loop is over collision buckets only
        # (post-prefilter), inside ONE partition-level callback
        out_a, out_b = [], []
        for _, g in df.groupby(["tab", "key"], sort=False):
            ids = np.sort(g[id_col].to_numpy().astype(np.int64))
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), 1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b)})

    id_pairs = grouped_batch_map(cand, ["tab", "key"], _bucket_id_pairs)
    nparts = pick_partitions(id_pairs, ds)
    from ..stages.partitioning import scrub_empty_blocks

    # scrub BEFORE the vector joins: the map_groups→aggregate chain emits
    # schema-less zero-row blocks that bypass the select below and crash
    # the pyarrow hash join (see scrub_empty_blocks).
    uniq = scrub_empty_blocks(
        id_pairs.groupby(["doc_a", "doc_b"], num_partitions=nparts).aggregate(
            Count(alias_name="__c")
        )
    ).map_batches(lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow")

    # Ray's hash join rejects list-typed payloads: ship each quantized
    # vector as ONE fixed_size_binary(dim*8) cell — packed/unpacked
    # zero-copy through Arrow buffers, no per-row Python.
    byte_width = dim * 8

    def _pack(name_id: str, name_e: str):
        def f(t: pa.Table) -> pa.Table:
            ez = np.ascontiguousarray(_batch_qmat(t, emb_col))
            fsb = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(byte_width), len(ez), [None, pa.py_buffer(ez.tobytes())]
            )
            return pa.table({name_id: t[id_col], name_e: fsb})
        return f

    def _unpack(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        buf = arr.buffers()[1]
        return np.frombuffer(
            buf, dtype=np.int64, count=len(arr) * dim, offset=arr.offset * byte_width
        ).reshape(len(arr), dim)

    vecs_a = ds.map_batches(_pack("__ida", "__ea"), batch_format="pyarrow")
    vecs_b = ds.map_batches(_pack("__idb", "__eb"), batch_format="pyarrow")
    j = uniq.join(vecs_a, join_type="inner", num_partitions=nparts,
                  on=("doc_a",), right_on=("__ida",))
    j = j.join(vecs_b, join_type="inner", num_partitions=nparts,
               on=("doc_b",), right_on=("__idb",))

    def _cos_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pandas(empty, preserve_index=False)
        ea = _unpack(t["__ea"])
        eb = _unpack(t["__eb"])
        dots = np.einsum("ij,ij->i", ea, eb)
        na = np.einsum("ij,ij->i", ea, ea)
        nb = np.einsum("ij,ij->i", eb, eb)
        cos = cosine_from_ints(dots, na, nb)
        keep = cos >= tau
        return pa.table({
            "doc_a": pa.array(t["doc_a"].to_numpy(zero_copy_only=False)[keep]),
            "doc_b": pa.array(t["doc_b"].to_numpy(zero_copy_only=False)[keep]),
            "cos": pa.array(cos[keep]),
        })

    return j.map_batches(_cos_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF — the ANN scale path: coarse-quantize the corpus into nlist centroid
# buckets (inverted lists); a query probes only its nprobe closest buckets,
# so each batch computes distances for the probed fraction of rows instead
# of all of them. Approximate: recall vs brute force is asserted in tests.
# ---------------------------------------------------------------------------


def fit_ivf_centroids(ds, nlist: int, *, sample_size: int = 100_000,
                      iters: int = 10, id_col: str = "vec_id",
                      emb_col: str = "embedding") -> np.ndarray:
    """Deterministic coarse k-means on a bounded streamed subsample.

    The fit sample is the ``sample_size`` rows with the smallest ids
    (deterministic, partition-invariant; streamed via per-batch partial
    top-n, never a full materialization). Lloyd iterations run driver-side
    on the bounded sample — the model is tiny (nlist × dim) and ships to
    workers by broadcast. Vectors are L2-normalized so the assignment metric
    (max dot) matches cosine.
    """
    from ..samplers.algos import smallest_n

    # smallest_n is the tree-reduced, bounded-buffer top-n: driver memory
    # stays O(sample_size), not O(blocks × sample_size).
    parts = smallest_n(
        ds.select_columns([id_col, emb_col]), sample_size,
        col=id_col, tiebreak=id_col,
    ).to_pandas()
    mat = np.stack(parts[emb_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)

    nlist = min(nlist, len(mat))
    cent = mat[:nlist].copy()  # deterministic init: first nlist sample rows
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(nlist):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ann_topk_ivf(ds, query_matrix: np.ndarray, k: int, centroids: np.ndarray,
                 nprobe: int = 8, id_col: str = "vec_id",
                 emb_col: str = "embedding") -> pd.DataFrame:
    """IVF cosine top-k: each batch assigns its rows to centroids (one
    matmul), keeps only rows whose bucket is probed by ≥1 query, and scores
    each survivor against exactly the queries probing its bucket. Same
    output schema and quantized-cosine arithmetic as :func:`ann_topk`, so
    results are comparable row-for-row where recall is perfect.
    """
    qz = np.asarray(query_matrix, dtype=np.int64)
    qn = (qz * qz).sum(axis=1)
    qf = qz.astype(np.float64)
    qf /= np.maximum(np.linalg.norm(qf, axis=1, keepdims=True), 1e-12)
    nprobe = min(nprobe, len(centroids))
    # probe_sets[qi] = the nprobe closest centroid ids for query qi
    qsim = qf @ np.asarray(centroids).T
    probe = np.argsort(-qsim, axis=1, kind="stable")[:, :nprobe]
    state_ref = ray.put((qz, qn, np.asarray(centroids), probe))

    def _local_topk(t: pa.Table) -> pa.Table:
        qz_, qn_, cent, probe_ = ray.get(state_ref)
        ez = _batch_qmat(t, emb_col)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        ef = ez.astype(np.float64)
        ef /= np.maximum(np.linalg.norm(ef, axis=1, keepdims=True), 1e-12)
        bucket = (ef @ cent.T).argmax(axis=1)
        # rows × queries candidate mask: row bucket ∈ query's probe set
        cand = (bucket[:, None, None] == probe_[None, :, :]).any(axis=2)
        keep = cand.any(axis=1)
        if not keep.any():
            return pa.table({
                "query_id": np.empty(0, dtype=np.int64),
                id_col: np.empty(0, dtype=ids.dtype),
                "cos": np.empty(0, dtype=np.float64),
            })
        ez, ids, cand = ez[keep], ids[keep], cand[keep]
        en = (ez * ez).sum(axis=1)
        dots = ez @ qz_.T
        cos = cosine_from_ints(dots, en[:, None], qn_[None, :])
        out_q, out_id, out_c = [], [], []
        for qi in range(qz_.shape[0]):
            rows = np.flatnonzero(cand[:, qi])
            if not len(rows):
                continue
            take = min(k, len(rows))
            order = rows[np.lexsort((ids[rows], -cos[rows, qi]))[:take]]
            out_q.append(np.full(take, qi, dtype=np.int64))
            out_id.append(ids[order])
            out_c.append(cos[order, qi])
        if not out_q:
            return pa.table({
                "query_id": np.empty(0, dtype=np.int64),
                id_col: np.empty(0, dtype=ids.dtype),
                "cos": np.empty(0, dtype=np.float64),
            })
        return pa.table({
            "query_id": np.concatenate(out_q),
            id_col: np.concatenate(out_id),
            "cos": np.concatenate(out_c),
        })

    from ..stages.topk import merge_local_topk

    parts = ds.map_batches(_local_topk, batch_format="pyarrow", zero_copy_batch=True)
    out = merge_local_topk(
        parts, k, ["query_id", "cos", id_col], [True, False, True], source=ds,
    )
    out = out.sort_values(["query_id", "cos", id_col],
                          ascending=[True, False, True],
                          kind="mergesort").reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def kmeans_train_distributed(ds, k: int, iters: int = 10,
                             id_col: str = "vec_id",
                             emb_col: str = "embedding") -> np.ndarray:
    """Full-corpus spherical k-means (Lloyd), every step distributed.

    `fit_ivf_centroids` above fits on a bounded subsample — right for an
    IVF coarse quantizer, wrong when the clustering IS the product (e.g.
    semantic-dedup bucketing of the whole corpus). Here each Lloyd
    iteration is one streaming pass:

    - E-step per batch: int64-quantized rows against the broadcast
      centroid matrix — one matmul, cosine arg-max, ties to the lowest
      centroid id (bit-reproducible, same kernel as `q_kmeans_assign`);
    - M-step as a combiner: each batch emits per-cluster (count,
      Σ quantized-vector) partials — k×dim int64 rows per block, EXACT —
      merged on the driver (k×dim is model-sized, not data-sized) into
      new L2-normalized float64 centroids.

    Exact integer partials make every iteration partition-invariant, so
    the trained model is bit-identical at any block layout — the
    property the accompanying test pins. Empty clusters keep their
    previous centroid (standard Lloyd fallback, deterministic).
    Returns the (k, dim) centroid matrix.
    """
    import ray as _ray

    from ..hashing import hmix
    from ..samplers.algos import smallest_n

    # Seeding: k seeds drawn close together (e.g. the k smallest ids of
    # an ingest-ordered table) collapse Lloyd into splitting one region.
    # Deterministic two-step spread: (1) a bounded hash-rank subsample
    # (partition-invariant, streamed via tree-reduced smallest_n), (2)
    # farthest-point sampling on it — the k-means++-style init the
    # engine's own FPS kernel provides.
    def _rank(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__seed_rank", pa.array(hmix(ids, 911)))

    from ..samplers.algos import fps

    seed = smallest_n(
        ds.select_columns([id_col, emb_col]).map_batches(
            _rank, batch_format="pyarrow"),
        max(k, min(4096, 64 * k)), col="__seed_rank", tiebreak=id_col,
    ).to_pandas()
    pool = np.stack(seed[emb_col].to_numpy()).astype(np.float64)
    pool /= np.maximum(np.linalg.norm(pool, axis=1, keepdims=True), 1e-12)
    cent = pool[fps(pool, k)].copy()
    dim = cent.shape[1]

    for _ in range(iters):
        cref = _ray.put(cent)

        def _partial(t: pa.Table) -> pa.Table:
            c = _ray.get(cref)
            mat = _batch_qmat(t, emb_col)                  # int64 rows
            norms = np.sqrt((mat * mat).sum(axis=1, dtype=np.float64))
            cos = (mat @ c.T) / np.maximum(norms[:, None], 1e-12)
            best = cos.argmax(axis=1)                      # ties -> lowest id
            out_rows = []
            for ci in np.unique(best):
                members = mat[best == ci]
                out_rows.append((int(ci), len(members),
                                 members.sum(axis=0).tolist()))
            return pa.table({
                "cluster": pa.array([r[0] for r in out_rows], pa.int64()),
                "n": pa.array([r[1] for r in out_rows], pa.int64()),
                "sums": pa.array([r[2] for r in out_rows],
                                 pa.list_(pa.int64())),
            })

        parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
        new = cent.copy()
        for ci, grp in parts.groupby("cluster"):
            n = int(grp["n"].sum())
            if not n:
                continue
            s = np.sum(np.stack(grp["sums"].to_numpy()), axis=0,
                       dtype=np.int64).astype(np.float64)
            m = s / n
            new[int(ci)] = m / max(np.linalg.norm(m), 1e-12)
        if np.array_equal(new, cent):
            break
        cent = new
    return cent
