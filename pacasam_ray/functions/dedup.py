"""Deduplication suite for web-scale training-data pipelines.

The reference only ever dedups exactly on the row key
(src/pacasam/connectors/lipac.py:91, src/pacasam/samplers/sampler.py:46);
at 100 TB a training-data engine additionally needs *content* dedup. Four
operators, all expressed as Ray Data shuffles:

- exact text dedup        — md5(text) hash-partition + per-group min-id rep
- n-gram Jaccard pairs    — inverted-index join (flat_map shingles →
                            groupby(gram) pair emission → pair-count →
                            size join), the exact-similarity baseline
- MinHash + LSH           — signature → banded buckets → per-bucket pairs
                            with signature-estimated Jaccard (scale path)
- SimHash near-dup        — 60-bit simhash + band buckets; with ``bands``
                            bands and hamming radius d < bands the banding
                            is EXACT by pigeonhole (no recall loss), so the
                            distributed output equals the all-pairs oracle

Portability contract: every hash that a DuckDB oracle must reproduce is
derived from md5 hex digits (``int(md5(x)[:15], 16)`` ==
``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``), so results are
bit-identical across engines and partition counts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.partitioning import pick_group_partitions, pick_partitions

MD5_HEX = 15  # 60-bit hashes: fit signed int64 in both numpy and DuckDB
P31 = 2_147_483_647  # Mersenne prime 2^31-1 for minhash permutations

# LSH collision buckets are pulled to the driver for the broadcast
# prefilter only below this row count (~80 MB of (band,bucket) int64 keys);
# above it the prefilter becomes a distributed semi-join.
HOT_BUCKET_BROADCAST_CAP = 5_000_000


def md5_int(s: str, nhex: int = MD5_HEX) -> int:
    """Portable 4·nhex-bit integer hash (DuckDB twin: CAST('0x'||substr(md5(s),1,nhex) AS BIGINT))."""
    return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)


def md5_int_sql(expr: str, nhex: int = MD5_HEX) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, {nhex})) AS BIGINT)"


MINHASH_SALT_A = 7001  # hmix salt namespaces for permutation params
MINHASH_SALT_B = 7002


def minhash_perm_params(num_perm: int, seed: int) -> tuple:
    """MinHash permutation params a ∈ [1, P31), b ∈ [0, P31) as pure hmix
    functions of (perm index, seed) — bit-reproducible in SQL via hmix_sql
    with the same salts (see queries._sql_minhash_lsh)."""
    from ..hashing import hmix

    idx = np.arange(num_perm, dtype=np.int64)
    a = hmix(idx, MINHASH_SALT_A + seed) % np.int64(P31 - 1) + 1
    b = hmix(idx, MINHASH_SALT_B + seed) % np.int64(P31)
    return a, b


def word_ngrams(text: str, n: int) -> list[str]:
    """Distinct word n-grams, split on single spaces (== DuckDB string_split)."""
    w = text.split(" ")
    seen: set[str] = set()
    out: list[str] = []
    for i in range(len(w) - n + 1):
        g = " ".join(w[i : i + n])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


# ---------------------------------------------------------------------------
# Exact content dedup
# ---------------------------------------------------------------------------

def fingerprint64_fast(col) -> pa.Array:
    """Vectorized 64-bit content fingerprint (no per-row Python): polars'
    Rust xxhash over the Arrow string column, falling back to pandas'
    C-level siphash when polars is unavailable. NOT md5-portable — use
    :func:`md5_int` when a DuckDB oracle twin must reproduce the keys;
    use this everywhere else (the per-row Python md5 loop was measured as
    the exact-dedup throughput ceiling, not the shuffle)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    try:
        import polars as pl

        h = pl.from_arrow(arr).hash(seed=0).to_numpy()
        return pa.array(h.view(np.int64), pa.int64())
    except ImportError:
        h = pd.util.hash_array(arr.to_numpy(zero_copy_only=False))
        return pa.array(h.view(np.int64), pa.int64())


def dedup_text_exact(ds, text_col: str = "text", id_col: str = "doc_id",
                     method: str = "md5"):
    """Exact content dedup: content fingerprint → hash-shuffle → keep the
    min-id representative per fingerprint group. Partition-count invariant
    (the representative is a deterministic function of the group, never
    "first seen"). ``method``: "md5" (hex digest; reproducible by a DuckDB
    oracle) or "fast" (:func:`fingerprint64_fast`, vectorized — the scale
    default when no oracle twin is required)."""
    from ..stages.dedup import dedup_exact_prehashed

    if method == "fast":
        def _fp(t: pa.Table) -> pa.Table:
            return t.append_column("content_key",
                                   fingerprint64_fast(t[text_col]))
    else:
        def _fp(t: pa.Table) -> pa.Table:
            texts = t[text_col].to_pylist()
            fps = pa.array([hashlib.md5(x.encode()).hexdigest()
                            for x in texts])
            return t.append_column("content_key", fps)

    return dedup_exact_prehashed(
        ds.map_batches(_fp, batch_format="pyarrow"), "content_key", id_col
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted-index join
# ---------------------------------------------------------------------------

def explode_ngrams(ds, n: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    """flat_map: one row per distinct (doc, word-n-gram). The shingle table
    is the inverted index the pair join runs over."""

    def _explode(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        grams: list[str] = []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            gs = word_ngrams(txt, n)
            ids.extend([did] * len(gs))
            grams.extend(gs)
        # typed: an all-tiny-docs block yields empty lists, and untyped
        # pa.array([]) infers null — poisoning downstream join schemas
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "gram": pa.array(grams, pa.string())})

    return ds.map_batches(_explode, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, n: int = 3, tau: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_doc_freq: int | None = None,
                        score: str = "jaccard"):
    """Exact n-gram Jaccard similarity join, fully distributed:

      shingles → groupby(gram): emit candidate pairs (the inverted-index
      join; a gram shared by g docs emits C(g,2) pairs) → groupby(pair):
      |A∩B| → join per-doc set sizes twice → J = i/(na+nb−i).

    ``max_doc_freq`` is the scale path: grams appearing in more than that
    many documents (stop-grams) are dropped BEFORE the pair join, bounding
    the join fan-out at C(max_doc_freq, 2) rows per gram. Jaccard is then
    computed over the filtered gram universe (both intersection AND set
    sizes exclude hot grams — consistent semantics, SQL-expressible, so the
    capped variant keeps its own exact oracle). With the default ``None``
    the join is the uncapped all-pairs oracle — correct but quadratic in
    hot-gram document frequency, so not runnable on a 100 TB corpus.

    Returns (doc_a, doc_b, jaccard) for all pairs with J ≥ tau. Bit-exact:
    J is one IEEE division of exact integer counts.
    """
    from ray.data.aggregate import Count

    # `grams` feeds four branches (two join sides + two size aggregates);
    # checkpoint it once instead of re-running the explode per branch. Small
    # gram tables pin in the object store; past the spill threshold the index
    # goes to partitioned parquet (the 100 TB path). The explode EXPANDS text
    # ~n× (each token lands in n grams), which the metadata estimate cannot
    # see, so the corrected estimate is passed explicitly.
    from ..stages.partitioning import checkpoint, estimated_size_bytes

    src_est = estimated_size_bytes(ds)
    grams = checkpoint(
        explode_ngrams(ds, n=n, text_col=text_col, id_col=id_col),
        tag="grams",
        est_bytes=None if src_est is None else (n + 1) * src_est,
    )

    if max_doc_freq is not None:
        # Identify hot grams with one count-shuffle, then broadcast the hot
        # set (heavy hitters are few — Zipf: at most total_grams/cap distinct
        # values, in practice a tiny head) and anti-filter per batch. This
        # avoids a second full join just to apply the cap.
        import ray as _ray

        dfreq = grams.groupby("gram", num_partitions=pick_partitions(grams)) \
            .aggregate(Count(alias_name="df"))
        hot = dfreq.filter(expr=f"df > {int(max_doc_freq)}") \
                   .select_columns(["gram"]).to_pandas()
        hot_list = hot["gram"].tolist() if "gram" in hot.columns else []
        if hot_list:
            hot_ref = _ray.put(pa.array(hot_list, type=pa.string()))

            def _drop_hot(t: pa.Table) -> pa.Table:
                return t.filter(
                    pc.invert(pc.is_in(t["gram"], value_set=_ray.get(hot_ref)))
                )

            grams = checkpoint(
                grams.map_batches(_drop_hot, batch_format="pyarrow"),
                tag="grams_capped",
                est_bytes=None if src_est is None else (n + 1) * src_est,
            )

    def _as(name):
        def _f(t: pa.Table) -> pa.Table:
            return t.rename_columns([name if c == id_col else c for c in t.column_names])
        return _f

    from ..stages.joins import safe_join

    ga = grams.map_batches(_as("doc_a"), batch_format="pyarrow")
    gb = grams.map_batches(_as("doc_b"), batch_format="pyarrow")
    # Inverted-index self-join on the gram (vectorized hash join — a
    # per-group Python pair loop is ~1 ms per gram and dominates runtime).
    # A gram shared by g docs yields g² joined rows — at 100 TB scale
    # stop-grams above a document-frequency cap must be dropped, which we
    # deliberately do NOT do here to keep oracle-exact semantics.
    # safe_join throughout: a tiny-doc corpus (every doc < n tokens) makes
    # the gram table ENTIRELY empty, and Ray's hash-shuffle join never
    # sees a schema for it (fuzz find, round 4).
    _ga_s = pa.schema([("doc_a", pa.int64()), ("gram", pa.string())])
    _gb_s = pa.schema([("doc_b", pa.int64()), ("gram", pa.string())])
    pairs = safe_join(ga, gb, join_type="inner", on=("gram",),
                      left_schema=_ga_s, right_schema=_gb_s)
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.less(t["doc_a"], t["doc_b"])).select(["doc_a", "doc_b"]),
        batch_format="pyarrow",
    )
    inter = pairs.groupby(["doc_a", "doc_b"],
                          num_partitions=pick_partitions(pairs)) \
        .aggregate(Count(alias_name="inter"))
    sa = grams.groupby(id_col, num_partitions=pick_partitions(grams)) \
        .aggregate(Count(alias_name="na"))
    sb = grams.groupby(id_col, num_partitions=pick_partitions(grams)) \
        .aggregate(Count(alias_name="nb"))
    _inter_s = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("inter", pa.int64())])
    _sa_s = pa.schema([(id_col, pa.int64()), ("na", pa.int64())])
    _sb_s = pa.schema([(id_col, pa.int64()), ("nb", pa.int64())])
    j = safe_join(inter, sa, join_type="inner", on=("doc_a",),
                  right_on=(id_col,), left_schema=_inter_s,
                  right_schema=_sa_s)
    j = safe_join(j, sb, join_type="inner", on=("doc_b",),
                  right_on=(id_col,),
                  left_schema=pa.schema(list(_inter_s) + [pa.field("na", pa.int64())]),
                  right_schema=_sb_s)

    def _score(t: pa.Table) -> pa.Table:
        i = t["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        # containment i/min(na,nb) catches a short doc swallowed by a long
        # one (quote farms, boilerplate wrappers) that Jaccard's union
        # denominator dilutes below any usable threshold.
        v = i / np.minimum(na, nb) if score == "containment" \
            else i / (na + nb - i)
        out = pa.table({
            "doc_a": t["doc_a"], "doc_b": t["doc_b"], score: pa.array(v),
        })
        return out.filter(pa.compute.greater_equal(out[score], tau))

    return j.map_batches(_score, batch_format="pyarrow")


def ngram_jaccard_sql(table: str, n: int = 3, tau: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_doc_freq: int | None = None,
                      score: str = "jaccard") -> str:
    gram = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    cap_cte = ""
    if max_doc_freq is not None:
        cap_cte = f"""
all_grams AS (SELECT DISTINCT {id_col}, {gram} AS g
          FROM toks, UNNEST(generate_series(1, len(w) - {n - 1})) AS t(i)),
kept AS (SELECT g FROM all_grams GROUP BY g HAVING COUNT(*) <= {int(max_doc_freq)}),
grams AS (SELECT all_grams.* FROM all_grams JOIN kept USING (g)),"""
    else:
        cap_cte = f"""
grams AS (SELECT DISTINCT {id_col}, {gram} AS g
          FROM toks, UNNEST(generate_series(1, len(w) - {n - 1})) AS t(i)),"""
    expr = ("CAST(inter AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE)"
            if score == "containment"
            else "CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE)")
    return f"""
WITH toks AS (SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table}),{cap_cte}
sizes AS (SELECT {id_col}, COUNT(*) AS n FROM grams GROUP BY 1),
pairs AS (SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b, COUNT(*) AS inter
          FROM grams a JOIN grams b USING (g)
          WHERE a.{id_col} < b.{id_col} GROUP BY 1, 2)
SELECT doc_a, doc_b,
       {expr} AS {score}
FROM pairs JOIN sizes sa ON doc_a = sa.{id_col} JOIN sizes sb ON doc_b = sb.{id_col}
WHERE {expr} >= {tau!r}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path for near-dup text)
# ---------------------------------------------------------------------------

class MinHashSignatures:
    """Actor-pool stage: hmix-derived permutation parameters built once per
    actor; gram→hash memoised across batches (the stateful-stage shape,
    SURVEY.md §2.3). Emits one row per (doc, band): bucket key + signature.
    """

    def __init__(self, num_perm: int = 128, bands: int = 32, n: int = 3,
                 seed: int = 11, text_col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        # Permutation parameters from hmix, not an RNG: a pure function of
        # (perm index, seed) that hmix_sql reproduces verbatim, which is
        # what lets _sql_minhash_lsh (queries.py) rebuild the signatures —
        # and therefore the candidate-pair set — inside DuckDB.
        self.a, self.b = minhash_perm_params(num_perm, seed)
        self.num_perm, self.bands, self.rows = num_perm, bands, num_perm // bands
        self.n, self.text_col, self.id_col = n, text_col, id_col
        self._cache: dict[str, int] = {}

    def _gram_hashes(self, text: str) -> np.ndarray:
        c = self._cache
        hs = []
        for g in word_ngrams(text, self.n):
            h = c.get(g)
            if h is None:
                h = c[g] = md5_int(g, 7)  # 28-bit: a*h+b stays in int64
            hs.append(h)
        return np.asarray(hs, dtype=np.int64)

    def signature(self, text: str) -> np.ndarray:
        hs = self._gram_hashes(text)
        if len(hs) == 0:
            return np.full(self.num_perm, P31 - 1, dtype=np.int64)
        # (num_perm, n_grams) permuted values; min over grams
        vals = (self.a[:, None] * hs[None, :] + self.b[:, None]) % P31
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(ids)
        # (n_docs, num_perm) signature matrix — the per-doc minhash is the
        # only per-row Python work (gram hashing, memoised per actor).
        S = np.empty((n_docs, self.num_perm), dtype=np.int64)
        for i, txt in enumerate(batch[self.text_col].to_pylist()):
            S[i] = self.signature(txt)
        # Bucket key per (doc, band): polynomial fold of the band's rows in
        # int64 wraparound arithmetic — vectorized over the whole batch.
        # Bucket keys only route grouping (rows-only op, no SQL twin); a
        # fold collision merely adds a candidate pair that the est >= tau
        # filter then rejects.
        B = S.reshape(n_docs, self.bands, self.rows)
        with np.errstate(over="ignore"):
            buckets = np.full((n_docs, self.bands), np.int64(1469598103934665603))
            for r in range(self.rows):
                buckets = buckets * np.int64(1099511628211) + B[:, :, r]
            buckets = buckets * np.int64(1099511628211) + np.arange(
                self.bands, dtype=np.int64
            )[None, :]
        values = np.repeat(S, self.bands, axis=0).ravel()
        # int64 offsets via LargeListArray: int32 offsets silently overflow
        # once n_docs*bands*num_perm exceeds 2**31 (~524k docs/batch at the
        # default 32×128), corrupting the sig column.
        offsets = np.arange(n_docs * self.bands + 1, dtype=np.int64) * self.num_perm
        sig_col = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(values))
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.bands)),
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int64), n_docs)),
            "bucket": pa.array(buckets.ravel()),
            "sig": sig_col,
        })


def minhash_lsh_pairs(ds, num_perm: int = 128, bands: int = 32, n: int = 3,
                      tau: float = 0.5, seed: int = 11,
                      text_col: str = "text", id_col: str = "doc_id",
                      concurrency: int | tuple = (1, 8)):
    """MinHash+LSH near-dup candidates with signature-estimated Jaccard:

      signatures (actor pool) → groupby(band,bucket): per-bucket pairwise
      signature agreement → dedup pairs across bands (min est is
      deterministic; all bands compute the same est) → est ≥ tau.

    The signature est converges to true Jaccard (±1/sqrt(num_perm)); exact
    post-verification is :func:`ngram_jaccard_pairs` restricted to these
    candidates. Permutation params are hmix-derived, so queries.py's
    generated SQL twin reproduces the pair set bit-for-bit; pytest
    additionally cross-checks recall against the exact join at small scale.
    """
    import ray as _ray
    from ray.data.aggregate import Count, Min

    sigs = ds.map_batches(
        MinHashSignatures,
        batch_format="pyarrow",
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, n=n, seed=seed,
                                   text_col=text_col, id_col=id_col),
        concurrency=concurrency,
    ).materialize()  # feeds the bucket-count prefilter AND the pair stage

    # Nearly every bucket is a singleton (one doc); a per-group Python
    # callback over all of them costs ~1 ms each and dominated wall time.
    # One vectorized Count aggregate finds the >= 2-member buckets; their
    # keys broadcast into a per-batch is_in filter, so map_groups only ever
    # sees genuine collision buckets.
    # project the 1 KiB/row sig payload away before the count shuffle —
    # only (band, bucket) key pairs move
    counts = sigs.select_columns(["band", "bucket"]) \
        .groupby(["band", "bucket"], num_partitions=pick_partitions(sigs)) \
        .aggregate(Count(alias_name="c"))
    hot_ds = counts.filter(expr="c >= 2").select_columns(["band", "bucket"])
    n_hot = hot_ds.count()
    if not n_hot:
        return _ray.data.from_pandas(pd.DataFrame({
            "doc_a": pd.Series([], dtype=np.int64),
            "doc_b": pd.Series([], dtype=np.int64),
            "est_jaccard": pd.Series([], dtype=np.float64),
        }))
    if n_hot <= HOT_BUCKET_BROADCAST_CAP:
        hot = hot_ds.to_pandas()
        with np.errstate(over="ignore"):
            hot_keys = (hot["bucket"].to_numpy(np.int64) * np.int64(37)
                        + hot["band"].to_numpy(np.int64))
        keys_ref = _ray.put(pa.array(hot_keys))

        def _keep_collisions(t: pa.Table) -> pa.Table:
            with np.errstate(over="ignore"):
                k = (t["bucket"].to_numpy(zero_copy_only=False) * np.int64(37)
                     + t["band"].to_numpy(zero_copy_only=False))
            return t.filter(pc.is_in(pa.array(k), value_set=_ray.get(keys_ref)))

        cand = sigs.map_batches(_keep_collisions, batch_format="pyarrow")
    else:
        # collision set past the broadcast cap: the corpus is dup-heavy, so
        # most sig rows are in collision buckets anyway and the prefilter
        # would save little — skip it (a semi-join is not an option: acero
        # cannot carry the large_list sig payload through a join). The pair
        # stage ignores singleton buckets by construction.
        cand = sigs

    def _bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        """One callback per hash-bucket PARTITION of (band, bucket) keys —
        exact dup corpora put every dup pair in ~all `bands` buckets, so
        collision buckets number O(pairs x bands) and a per-bucket
        callback dominates wall time (measured 15k dispatches at 1000
        docs). Here size-2 buckets (the overwhelming majority) are scored
        in ONE vectorized signature comparison across the whole partition;
        only >= 3-member buckets fall back to a per-bucket triu loop."""
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                              "doc_b": pd.Series([], dtype=np.int64),
                              "est_jaccard": pd.Series([], dtype=np.float64)})
        if len(part) < 2:
            return empty
        part = part.sort_values(["band", "bucket", id_col], kind="mergesort")
        bb = part[["band", "bucket"]].to_numpy()
        new_b = np.r_[True, (bb[1:] != bb[:-1]).any(axis=1)]
        starts = np.flatnonzero(new_b)
        sizes = np.diff(np.r_[starts, len(part)])
        ids = part[id_col].to_numpy()
        sig_cells = part["sig"].to_numpy()
        out = []
        two = starts[sizes == 2]
        if len(two):
            a = np.stack(sig_cells[two])        # (m, num_perm)
            b = np.stack(sig_cells[two + 1])
            est = (a == b).mean(axis=1)
            keep = est >= tau
            out.append(pd.DataFrame({"doc_a": ids[two][keep],
                                     "doc_b": ids[two + 1][keep],
                                     "est_jaccard": est[keep]}))
        for s, ln in zip(starts[sizes > 2], sizes[sizes > 2]):
            sig = np.stack(sig_cells[s:s + ln])
            ia, ib = np.triu_indices(ln, 1)
            est = (sig[ia] == sig[ib]).mean(axis=1)
            keep = est >= tau
            out.append(pd.DataFrame({"doc_a": ids[s + ia[keep]],
                                     "doc_b": ids[s + ib[keep]],
                                     "est_jaccard": est[keep]}))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    from ..stages.partitioning import grouped_batch_map

    pairs = grouped_batch_map(cand, ["band", "bucket"], _bucket_pairs,
                              nparts=pick_group_partitions(cand))
    # A pair colliding in k bands appears k times with an identical est —
    # dedup is a vectorized Min aggregate, not a per-group head(1).
    # scrub: the map_groups→aggregate chain emits schema-less zero-row
    # blocks that poison any downstream join (see scrub_empty_blocks).
    from ..stages.partitioning import scrub_empty_blocks

    return scrub_empty_blocks(pairs.groupby(
        ["doc_a", "doc_b"], num_partitions=pick_partitions(pairs)
    ).aggregate(Min("est_jaccard", alias_name="est_jaccard")))


# ---------------------------------------------------------------------------
# SimHash (60-bit, md5-portable) + pigeonhole-exact banded near-dup
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60


class SimHasher:
    """Actor-pool stage: 60-bit simhash over whitespace tokens, token weight =
    occurrence count, bit b set iff Σ ±count ≥ 0. Token→hash memoised per
    actor. md5-portable ⇒ reproduced exactly by a generated DuckDB oracle."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 out_col: str = "simhash"):
        self.text_col, self.id_col, self.out_col = text_col, id_col, out_col
        self._cache: dict[str, int] = {}
        self._bits = np.arange(SIMHASH_BITS, dtype=np.int64)

    def simhash(self, text: str) -> int:
        from collections import Counter

        counts = Counter(text.split(" "))
        c = self._cache
        toks = list(counts)
        hs = np.empty(len(toks), dtype=np.int64)
        for i, t in enumerate(toks):
            h = c.get(t)
            if h is None:
                h = c[t] = md5_int(t)
            hs[i] = h
        w = np.asarray([counts[t] for t in toks], dtype=np.int64)
        bitmat = ((hs[:, None] >> self._bits[None, :]) & 1) * 2 - 1
        v = (bitmat * w[:, None]).sum(axis=0)
        return int(((v >= 0).astype(np.int64) << self._bits).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self.simhash(t) for t in batch[self.text_col].to_pylist()]
        return pa.table({
            self.id_col: batch[self.id_col],
            self.out_col: pa.array(out, pa.int64()),
        })


def simhash_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    """Generated DuckDB twin of :class:`SimHasher` (60 bit-sum terms)."""
    th = md5_int_sql("tok")
    terms = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN ((th >> {b}) & 1) = 1 THEN 1 ELSE -1 END) >= 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS tok FROM {table}),
h AS (SELECT {id_col}, {th} AS th FROM toks)
SELECT {id_col}, {terms} AS simhash FROM h GROUP BY {id_col}
"""


def simhash_dataset(ds, concurrency: int | tuple = (1, 8), **kw):
    return ds.map_batches(
        SimHasher, batch_format="pyarrow", fn_constructor_kwargs=kw,
        concurrency=concurrency,
    )


def simhash_neardup_pairs(ds, max_hamming: int = 3, bands: int = 4,
                          concurrency: int | tuple = (1, 8)):
    """Near-dup pairs at hamming distance ≤ d over the 60-bit simhash.

    Banding with ``bands`` equal bit-slices is EXACT for d < bands by
    pigeonhole (d differing bits cannot touch every band, so every
    qualifying pair collides in ≥ 1 band) — the distributed banded join
    returns exactly the all-pairs result, no recall loss. Default d=3,
    bands=4 (15-bit keys).
    """
    assert max_hamming < bands
    width = SIMHASH_BITS // bands
    mask = (1 << width) - 1
    sh = simhash_dataset(ds, concurrency=concurrency)

    def _explode(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy(zero_copy_only=False)
        ids = t[t.column_names[0]].to_numpy(zero_copy_only=False)
        n = len(h)
        out_id = np.repeat(ids, bands)
        out_h = np.repeat(h, bands)
        band = np.tile(np.arange(bands, dtype=np.int64), n)
        key = (out_h >> (band * width)) & mask
        return pa.table({
            "doc_id": out_id, "simhash": out_h, "band": band, "key": key,
        })

    exploded = sh.map_batches(_explode, batch_format="pyarrow").materialize()

    # Same singleton-bucket prefilter as the MinHash path: one vectorized
    # Count aggregate finds the >= 2-member (band, key) buckets, their keys
    # broadcast into an is_in filter — the per-group callback then only
    # runs on genuine collision buckets, not on every singleton.
    import ray as _ray
    from ray.data.aggregate import Count

    counts = exploded.groupby(["band", "key"],
                              num_partitions=pick_partitions(exploded)) \
        .aggregate(Count(alias_name="c"))
    hot = counts.filter(expr="c >= 2").select_columns(["band", "key"]).to_pandas()
    if not len(hot):
        return _ray.data.from_pandas(pd.DataFrame({
            "doc_a": pd.Series([], dtype=np.int64),
            "doc_b": pd.Series([], dtype=np.int64),
            "hamming": pd.Series([], dtype=np.int64),
        }))
    hot_keys = hot["key"].to_numpy(np.int64) * np.int64(bands) \
        + hot["band"].to_numpy(np.int64)
    keys_ref = _ray.put(pa.array(hot_keys))

    def _keep_collisions(t: pa.Table) -> pa.Table:
        k = (t["key"].to_numpy(zero_copy_only=False) * np.int64(bands)
             + t["band"].to_numpy(zero_copy_only=False))
        return t.filter(pc.is_in(pa.array(k), value_set=_ray.get(keys_ref)))

    exploded = exploded.map_batches(_keep_collisions, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        g = g.sort_values("doc_id", kind="mergesort")
        ids = g["doc_id"].to_numpy()
        h = g["simhash"].to_numpy()
        ia, ib = np.triu_indices(len(ids), 1)
        x = h[ia] ^ h[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        while True:
            nz = x != 0
            if not nz.any():
                break
            ham[nz] += 1
            x = x & (x - 1)
        keep = ham <= max_hamming
        return pd.DataFrame({"doc_a": ids[ia][keep], "doc_b": ids[ib][keep],
                             "hamming": ham[keep]})

    pairs = exploded.groupby(["band", "key"],
                             num_partitions=pick_group_partitions(exploded)) \
        .map_groups(_pairs, batch_format="pandas")

    # A pair colliding in k bands appears k times with identical hamming —
    # dedup is a vectorized Min aggregate, not a per-group Python callback.
    from ray.data.aggregate import Min

    from ..stages.partitioning import scrub_empty_blocks

    # scrub: see scrub_empty_blocks — this chain's empty reduce partitions
    # produce schema-less blocks that crash the component-labeling joins.
    return scrub_empty_blocks(pairs.groupby(
        ["doc_a", "doc_b"], num_partitions=pick_partitions(pairs)
    ).aggregate(Min("hamming", alias_name="hamming")))


def simhash_neardup_sql(table: str, max_hamming: int = 3,
                        text_col: str = "text", id_col: str = "doc_id") -> str:
    """All-pairs oracle: banding above is pigeonhole-exact, so this IS the
    same result set."""
    inner = simhash_sql(table, text_col, id_col)
    return f"""
WITH sh AS ({inner})
SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.{id_col} < b.{id_col}
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# Near-dup clustering: candidate pairs → connected components → keep/drop.
# The missing last mile of every near-dup pipeline: pairs alone don't say
# which rows to drop; transitive closure does (A~B, B~C ⇒ one survivor).
# ---------------------------------------------------------------------------


def neardup_components(pairs_ds, a_col: str = "doc_a", b_col: str = "doc_b") -> pd.DataFrame:
    """Union-find over the candidate-pair stream → (doc_id, component) with
    component = min doc id of the connected component.

    The edge list streams through the driver ONCE via ``iter_batches`` (never
    materialized as a whole) and memory is O(ids that appear in any pair) —
    the duplicated subset, orders of magnitude smaller than the corpus.
    Union-find-on-the-driver is the fast single-pass plan while the pair
    set fits one machine; when it doesn't (billions of edges),
    :func:`neardup_components_distributed` computes the identical labeling
    as iterated hash-partition label propagation.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> None:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id root so the component label is deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for batch in pairs_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        aa = batch[a_col].to_numpy(zero_copy_only=False)
        bb = batch[b_col].to_numpy(zero_copy_only=False)
        for a, b in zip(aa.tolist(), bb.tolist()):
            union(a, b)

    return pd.DataFrame({
        "doc_id": list(parent),
        "component": [find(x) for x in parent],
    }).astype({"doc_id": np.int64, "component": np.int64}).sort_values(
        "doc_id", kind="mergesort"
    ).reset_index(drop=True)


def neardup_components_distributed(pairs_ds, a_col: str = "doc_a",
                                   b_col: str = "doc_b",
                                   max_iters: int = 50) -> pd.DataFrame:
    """Scale path of :func:`neardup_components`: iterated min-label
    propagation expressed as hash shuffles — no driver-side graph state, so
    billions of edges partition across the cluster.

    Each round ships every vertex's current label to its neighbors
    (edges ⋈ labels), takes the per-vertex min, then POINTER-JUMPS
    (labels ⋈ labels: lab(v) ← lab(lab(v)) — every label value is itself a
    vertex because labels are mins over the symmetrized vertex set), so
    convergence is O(log diameter) rounds instead of O(diameter); dup
    clusters are near-cliques, so 1-2 rounds in practice. The fixpoint test
    rides min-label monotonicity: the global label sum strictly decreases
    until converged, and it is computed with a shuffle-free per-block
    partial-sum pass (labels are materialized each round), not another
    aggregate shuffle. Result is identical to the driver union-find
    (component = min doc id), asserted by pytest on random graphs; if the
    loop exhausts ``max_iters`` without reaching the fixpoint (graph
    diameter > 2**max_iters — unreachable in practice) it raises rather
    than return a non-fixpoint labeling.
    """
    from ray.data.aggregate import Min

    from ..stages.partitioning import pick_partitions

    def _sym(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": np.concatenate([a, b]), "u": np.concatenate([b, a])})

    # scrub, not a plain materialize: upstream pair producers can carry
    # schema-less zero-row blocks that bypass _sym and poison the
    # label-propagation joins below (see scrub_empty_blocks).
    from ..stages.partitioning import scrub_empty_blocks

    edges = scrub_empty_blocks(pairs_ds.map_batches(_sym, batch_format="pyarrow"))
    if edges.count() == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "component": pd.Series([], dtype=np.int64)})
    nparts = pick_partitions(edges)

    def _label_sum(labels_ds) -> int:
        # shuffle-free fixpoint metric: one int64 per block to the driver
        def _p(t: pa.Table) -> pa.Table:
            s = pc.sum(t["lab"]).as_py() or 0
            return pa.table({"s": pa.array([s], type=pa.int64())})

        parts = labels_ds.map_batches(_p, batch_format="pyarrow").to_pandas()
        return int(parts["s"].sum())

    # Init = first propagation round for free: label(v) = min(v, N(v)).
    labels = edges.groupby("v", num_partitions=nparts).aggregate(
        Min("u", alias_name="lab")
    ).map_batches(
        lambda t: pa.table({"v": t["v"],
                            "lab": pc.min_element_wise(t["v"], t["lab"])}),
        batch_format="pyarrow",
    ).materialize()
    cur_sum = _label_sum(labels)

    converged = False
    for _ in range(max_iters):
        neigh = edges.join(
            labels.map_batches(
                lambda t: t.rename_columns(["w", "lab"]), batch_format="pyarrow"
            ),
            join_type="inner", num_partitions=nparts, on=("u",), right_on=("w",),
        ).map_batches(lambda t: t.select(["v", "lab"]), batch_format="pyarrow")
        labels = neigh.union(labels).groupby("v", num_partitions=nparts).aggregate(
            Min("lab", alias_name="lab")
        ).materialize()
        # Convergence is decided on the min-step ALONE: an unchanged sum here
        # means lab(v) = min(lab(v), min_N(v) lab) for every v — the
        # propagation fixpoint. Checking BEFORE the pointer jump saves the
        # jump's join on the final round; for near-clique dup graphs (the
        # common case, converged after init) the loop then costs one join +
        # one groupby total.
        new_sum = _label_sum(labels)
        if new_sum == cur_sum:
            converged = True
            break
        cur_sum = new_sum
        # Pointer jumping (accelerator only): lab(v) <- lab(lab(v)). Inner
        # join is lossless here — every lab is a vertex id, and every vertex
        # has a label row. Runs only while still converging, giving
        # O(log diameter) rounds on deep chains.
        labels = labels.join(
            labels.map_batches(
                lambda t: t.rename_columns(["w", "lab2"]), batch_format="pyarrow"
            ),
            join_type="inner", num_partitions=nparts, on=("lab",), right_on=("w",),
        ).map_batches(
            lambda t: pa.table({"v": t["v"],
                                "lab": pc.min_element_wise(t["lab"], t["lab2"])}),
            batch_format="pyarrow",
        ).materialize()
        cur_sum = _label_sum(labels)

    if not converged:
        raise RuntimeError(
            f"label propagation did not reach a fixpoint in {max_iters} rounds; "
            "component labels would be wrong — raise max_iters or use "
            "neardup_components (driver union-find)"
        )

    out = labels.to_pandas().rename(columns={"v": "doc_id", "lab": "component"})
    return out.astype({"doc_id": np.int64, "component": np.int64}).sort_values(
        "doc_id", kind="mergesort"
    ).reset_index(drop=True)


def neardup_keep(ds, components: pd.DataFrame, id_col: str = "doc_id"):
    """Drop every component member except its min-id representative:
    broadcast anti-join of the (small) drop set against the full corpus."""
    import ray

    drop = components.loc[
        components["doc_id"] != components["component"], "doc_id"
    ].to_numpy(dtype=np.int64)
    drop_ref = ray.put(pa.array(drop))

    def _keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.invert(pc.is_in(t[id_col], value_set=ray.get(drop_ref))))

    return ds.map_batches(_keep, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (engine addition)
# ---------------------------------------------------------------------------
# Cardinality estimation without a count-distinct shuffle: each batch folds
# its values into m max-registers (a combiner — 2 int64 columns leave each
# block regardless of row count), registers merge with one tiny Max groupby,
# and the estimate is computed from exact integers through ONE IEEE division,
# so a generated DuckDB oracle reproduces it bit-for-bit:
#   v = md5_int(value) (60 bits), j = v mod m, rest = v div m,
#   rho = 1 + leading-zeros of rest within its 60-log2(m) bits,
#   S = Σ_j 2^(B - M_j) as an exact int64 (B = register bit width),
#   E = alpha·m² · 2^B / S  →  one double division of two exact values.
# No linear-counting branch (it needs ln()): pick m small enough that the
# raw estimate regime applies (E > 2.5 m) for the expected cardinalities.

HLL_M = 64                # 6-bit register index
HLL_REST_BITS = MD5_HEX * 4 - 6   # 54 value bits feed rho ∈ [1, 55]
HLL_ALPHA = 0.709         # alpha_64 (Flajolet et al. 2007)


def hll_registers(values: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """m max-registers for one batch of string values (vectorized except
    the md5 per value, which is the portability contract)."""
    v = np.array([md5_int(x) for x in values.to_pylist()], dtype=np.int64)
    regs = np.zeros(HLL_M, dtype=np.int64)
    if not len(v):
        return regs
    j = v % HLL_M
    rest = v // HLL_M
    # rho = (REST_BITS + 1) - bit_length(rest); bit_length via log-free
    # integer compare against descending powers of two, vectorized.
    bl = np.zeros(len(v), dtype=np.int64)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (np.int64(1) << shift)
        bl[big] += shift
        x[big] >>= shift
    bl[rest > 0] += 1
    rho = (HLL_REST_BITS + 1) - bl
    np.maximum.at(regs, j, rho)
    return regs


def distinct_hll(ds, col: str = "text") -> pd.DataFrame:
    """Returns a one-row frame {distinct_est: double}. Deterministic: the
    estimate is a pure function of the md5 register values."""
    def _partial(t: pa.Table) -> pa.Table:
        regs = hll_registers(t[col])
        return pa.table({"j": np.arange(HLL_M, dtype=np.int64), "m": regs})

    from ray.data.aggregate import Max

    merged = ds.map_batches(_partial, batch_format="pyarrow") \
               .groupby("j", num_partitions=pick_partitions(ds)) \
               .aggregate(Max("m", alias_name="m")).to_pandas()
    regs = np.zeros(HLL_M, dtype=np.int64)
    regs[merged["j"].to_numpy()] = merged["m"].to_numpy()
    # exact integer S = Σ 2^(B - M_j); M_j = 0 (empty register) contributes
    # 2^B — still exact (B ≤ 55, sum ≤ m·2^55 < 2^63)
    s = int(np.sum(np.int64(1) << (HLL_REST_BITS + 1 - regs)))
    alpha_num = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_REST_BITS + 1))
    return pd.DataFrame({"distinct_est": [alpha_num / float(s)]})


def distinct_hll_sql(table: str, col: str = "text") -> str:
    v = md5_int_sql(col)
    b = HLL_REST_BITS
    rho_cases = " ".join(
        f"WHEN rest >= {1 << (b - k)} THEN {k}" for k in range(1, b + 1)
    )
    alpha_num = HLL_ALPHA * HLL_M * HLL_M * float(1 << (b + 1))
    return f"""
WITH h AS (SELECT {v} AS v FROM {table}),
jr AS (SELECT v % {HLL_M} AS j, v // {HLL_M} AS rest FROM h),
rho AS (SELECT j, CASE {rho_cases} ELSE {b + 1} END AS r FROM jr),
regs AS (SELECT j, MAX(r) AS m FROM rho GROUP BY j),
full_regs AS (
  SELECT t.j, COALESCE(regs.m, 0) AS m
  FROM (SELECT unnest(generate_series(0, {HLL_M - 1})) AS j) t
  LEFT JOIN regs ON t.j = regs.j
)
SELECT {alpha_num!r} / CAST(SUM(CAST(1 AS BIGINT) << ({b + 1} - m)) AS DOUBLE)
       AS distinct_est
FROM full_regs
"""


def _hll_rho(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index j, rank rho) for pre-hashed int64 values — the
    shared kernel of the global and grouped HLL sketches."""
    j = v % HLL_M
    rest = v // HLL_M
    bl = np.zeros(len(v), dtype=np.int64)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (np.int64(1) << shift)
        bl[big] += shift
        x[big] >>= shift
    bl[rest > 0] += 1
    return j, (HLL_REST_BITS + 1) - bl


def grouped_distinct_hll(ds, group_col: str, col: str):
    """Per-group HLL distinct-count sketch, fully distributed.

    Per batch, SPARSE (group, register, max-rho) rows — at most m=64 rows
    per group per block — cross ONE (group, j) Max shuffle; a second tiny
    per-group Sum/Count aggregate yields the exact-integer register sum,
    and the estimate is one IEEE division of exact ints (empty registers
    enter as (m − #present)·2^(B+1), so nothing materializes dense
    registers anywhere). No per-group Python callback at any stage, so
    10^8 groups cost two hash shuffles of ≤ 64·groups tiny rows.
    ``grouped_distinct_hll_sql`` generates the bit-exact DuckDB twin.
    """
    import pandas as pd
    from ray.data.aggregate import Count, Max, Sum

    b = HLL_REST_BITS

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({group_col: df[group_col],
                                 "j": pd.Series([], dtype=np.int64),
                                 "m": pd.Series([], dtype=np.int64)})
        v = np.array([md5_int(str(x)) for x in df[col]], dtype=np.int64)
        j, rho = _hll_rho(v)
        out = pd.DataFrame({group_col: df[group_col].to_numpy(), "j": j, "m": rho})
        return out.groupby([group_col, "j"], sort=False, as_index=False)["m"].max()

    regs = ds.map_batches(_partial, batch_format="pandas") \
             .groupby([group_col, "j"],
                      num_partitions=pick_partitions(ds)) \
             .aggregate(Max("m", alias_name="m"))

    def _weights(df: pd.DataFrame) -> pd.DataFrame:
        df["w"] = np.int64(1) << (b + 1 - df["m"].to_numpy())
        return df[[group_col, "w"]]

    agg = regs.map_batches(_weights, batch_format="pandas") \
              .groupby(group_col) \
              .aggregate(Sum("w", alias_name="sp"), Count(alias_name="npres"))

    alpha_num = HLL_ALPHA * HLL_M * HLL_M * float(1 << (b + 1))

    def _estimate(df: pd.DataFrame) -> pd.DataFrame:
        s = ((np.int64(HLL_M) - df["npres"].to_numpy()) * (np.int64(1) << (b + 1))
             + df["sp"].to_numpy())
        df["distinct_est"] = alpha_num / s.astype(np.float64)
        return df[[group_col, "distinct_est"]]

    return agg.map_batches(_estimate, batch_format="pandas")


def grouped_distinct_hll_sql(table: str, group_col: str, col_expr: str) -> str:
    v = md5_int_sql(col_expr)
    b = HLL_REST_BITS
    rho_cases = " ".join(
        f"WHEN rest >= {1 << (b - k)} THEN {k}" for k in range(1, b + 1)
    )
    alpha_num = HLL_ALPHA * HLL_M * HLL_M * float(1 << (b + 1))
    return f"""
WITH h AS (SELECT {group_col} AS g, {v} AS v FROM {table}),
jr AS (SELECT g, v % {HLL_M} AS j, v // {HLL_M} AS rest FROM h),
rho AS (SELECT g, j, CASE {rho_cases} ELSE {b + 1} END AS r FROM jr),
regs AS (SELECT g, j, MAX(r) AS m FROM rho GROUP BY g, j),
agg AS (SELECT g, COUNT(*) AS npres,
               SUM(CAST(1 AS BIGINT) << ({b + 1} - m)) AS sp
        FROM regs GROUP BY g)
SELECT g AS {group_col},
       {alpha_num!r} / CAST(({HLL_M} - npres) * (CAST(1 AS BIGINT) << {b + 1})
                            + sp AS DOUBLE) AS distinct_est
FROM agg
"""
