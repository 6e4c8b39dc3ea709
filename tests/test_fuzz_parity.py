"""Property-based Ray-vs-DuckDB parity fuzz.

The oracle suite runs on the driver's synthetic tables and the
edge-parity suite on hand-crafted corner cases; this layer generates
RANDOM tiny tables biased hard toward the shapes that break windowed /
dedup operators — duplicate keys, tied timestamps, tied values, repeated
tokens — and asserts the full Ray pipeline still matches its registered
DuckDB oracle bit-for-bit on every draw. Each example writes a real
parquet dir and runs the real pipelines (no mocked kernels).
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pacasam_ray.queries import build_oracle_sql, build_queries

from test_oracle_parity import canonicalize, to_pandas

QUERIES = build_queries()
ORACLES = build_oracle_sql()

EVENT_QUERIES = [
    "percent_rank", "rank_window", "events_lag", "events_lead",
    "string_agg_sorted", "window_dedup", "time_range_window",
    "events_dedup_latest", "transition_counts", "events_sessions",
    "cumulative_users",
    # round-5: tie-prone minute grid puts click/purchase pairs exactly on
    # the tolerance boundary and on equal timestamps
    "asof_tolerance",
    # round-5 third wave: colliding users + the minute grid land events
    # exactly on interval ends (s == prev_e is NOT a break) and exactly
    # GAP apart (>= keeps), the two off-by-one traps of each closure
    "interval_union", "throttle_dedup",
    # round-5 fourth wave: the tied {1.0, 2.0, 7.5} value pool makes
    # rolling medians land exactly on window middles; the 90-minute grid
    # gives burst_detect at most 2 hourly buckets, pinning the <3-prior
    # empty-result branch on both engines
    "rolling_median", "burst_detect",
]

DOC_QUERIES = ["dedup_keep_best", "dedup_text", "top_terms",
               "repetition_ratio", "tfidf_topk", "heavy_hitters",
               "doc_chunk", "pack_linear", "source_mix", "bigram_counts",
               "token_count_regex",
               "gopher_filter", "c4_filter", "top_ngram_frac",
               "dup_ngram_frac", "hash_split", "sentence_dedup",
               "snapshot_delta", "normalize_mad",
               "token_budget_mix", "bpe_pairs", "postings", "text_canon",
               "skipgram_counts", "url_frontier",
               "crawl_change_rate", "dup_rate_by_source", "lang_confusion",
               "group_sample", "bpe_merge_round",
               # round-5 sampler/selection oracles: tiny fuzz corpora hit
               # the O2 closed form's total<=n early returns, 1-stratum
               # quotas and empty-pool criteria
               "weighted_sample", "sampler_RandomSampler",
               "sampler_SpatialSampler", "sampler_CopySampler",
               "sampler_TargettedSampler",
               # tiny corpora take the single-chunk FPS branch, where the
               # surface's min(n, len) rule must match the SQL CASE arm
               "sampler_diversity_chunks",
               # the e2e composite: short fuzz docs fail the Gopher word
               # minimum, so this mostly exercises the all-empty chain
               # (gates -> dedup -> scan on zero rows) on both engines
               "webtext_curate",
               # round-5 realization/maintenance wave: tiny corpora hit
               # empty shards, single-source interleaves, all-OOV bins,
               # and CDC branches where every mod-5 class is present
               "shard_assign", "interleave_sources", "drift_chi2",
               "apply_cdc", "dedup_fast_count",
               # round-5 third wave: tiny corpora give 1-2-doc sources
               # (DISC quartiles where q1 = q3 = the only element, IQR 0),
               # Morton ranks over hash-colliding cells, and CUBE levels
               # that collapse to single leaves
               "tukey_outliers", "zorder_positions", "cube_agg",
               # round-5 fourth wave: 1-2-doc sources make the OLS trend
               # denominator exactly 0 (the NULL-slope arm on both sides)
               "host_trend",
               # round-5 fifth wave: mixed en/fr with tied n_chars pins
               # the midrank arithmetic (2·R₁ stays integral through
               # ties); empty-string texts give the profiler n_chars=0
               # and duplicate VARCHAR renderings
               "auc_by_source", "profile_stats"]

# multi-shuffle / multi-join pipelines: ~5-20x the wall-clock of the list
# above per example, so they fuzz at a reduced example count (the operator
# count grows each round; without the split the doc fuzz alone would blow
# the suite budget)
DOC_QUERIES_HEAVY = ["lm_score", "dsir_weights", "ngram_containment",
                     "ccnet_bucket", "vocab_oov", "pmi_collocations",
                     "tfidf_cosine", "minhash_lsh", "bpe_train_k",
                     # empty-vocab path: every fuzz term below the count
                     # threshold makes the id-assign + encode join run on
                     # a zero-row vocab (the documented empty-block class)
                     "encode_tokens",
                     # repeated 2-token fuzz docs force tf/df/dl ties, so
                     # BM25's mirrored IEEE expression must tie-break on
                     # term bit-identically through 3 joins
                     "bm25_topk"]


def _assert_parity(name, sf_dir, con):
    ray_df = canonicalize(to_pandas(QUERIES[name](sf_dir)))
    ora_df = canonicalize(con.sql(ORACLES[name]).df())
    assert len(ray_df) == len(ora_df), f"{name}: {len(ray_df)} != {len(ora_df)}"
    assert list(ray_df.columns) == list(ora_df.columns), name
    for c in ray_df.columns:
        a, b = ray_df[c], ora_df[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype("float64"), b.astype("float64"), check_names=False,
                rtol=0, atol=0, obj=f"{name}.{c}")
        else:
            assert list(a.fillna("\x00")) == list(b.fillna("\x00")), f"{name}.{c}"


events_frames = st.lists(
    st.tuples(
        st.integers(1, 3),                       # user_id: heavy collisions
        st.integers(0, 90),                      # minutes: tie-prone
        st.sampled_from(["view", "click", "purchase"]),
        st.sampled_from([1.0, 2.0, 7.5]),        # value: ties
    ),
    min_size=2, max_size=24,
)

doc_texts = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee extra",
                              "the", "a.", "x!", "#n", "w...", "{j", ""]),
             min_size=1, max_size=8).map(" ".join),
    min_size=2, max_size=10,
)


FUZZ_EXAMPLES = int(os.environ.get("GRAFT_FUZZ_EXAMPLES", "4"))


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=events_frames)
def test_fuzz_event_windows(rows, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_ev")
    ev = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "ts": [np.datetime64("2024-01-01T00:00:00", "us")
               + np.timedelta64(m, "m") for _, m, _, _ in rows],
        "user_id": np.array([u for u, _, _, _ in rows], dtype=np.int64),
        "event_type": [t for _, _, t, _ in rows],
        "value": np.array([v for _, _, _, v in rows]),
    })
    ev.to_parquet(d / "events.parquet", index=False)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    for name in EVENT_QUERIES:
        _assert_parity(name, str(d), con)
    con.close()


def _write_fuzz_docs(texts, d):
    docs = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "source": ["s0" if i % 2 else "s1" for i in range(len(texts))],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        # mixed languages: exercises DSIR's target/raw split and the
        # per-lang median/MAD grouping (incl. single-row groups)
        "lang": ["en" if i % 3 else "fr" for i in range(len(texts))],
    })
    docs.to_parquet(d / "documents.parquet", index=False)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    return con


@settings(max_examples=max(3, FUZZ_EXAMPLES * 3 // 4), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=doc_texts)
def test_fuzz_doc_dedup(texts, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_doc")
    con = _write_fuzz_docs(texts, d)
    for name in DOC_QUERIES:
        _assert_parity(name, str(d), con)
    con.close()


@settings(max_examples=max(2, FUZZ_EXAMPLES // 2), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=doc_texts)
def test_fuzz_doc_heavy(texts, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_doch")
    con = _write_fuzz_docs(texts, d)
    for name in DOC_QUERIES_HEAVY:
        _assert_parity(name, str(d), con)
    con.close()


EMB_QUERIES = ["kmeans_assign", "semdedup", "label_centroids",
               "embed_covariance", "kmeans_lloyd", "embed_whiten",
               # round-5: exact duplicates collide in every LSH table and
               # tied cosines stress the mirrored int-cosine expression
               "embed_neardup_lsh",
               # round-5 fifth wave: most RETR_QUERY_IDS probes are absent
               # (the SQL inner-join drop), duplicate vectors put cos==1.0
               # ties at rank 1, and 2-label pools hit the no-relevant arm
               "retrieval_first_rank"]

# pool of 6 distinct 64-dim vectors with float32-exact quarter components;
# repeated picks plant EXACT duplicate vectors (cos == 1.0) and near-ties
_EMB_DIM = 64
_POOL = np.array(
    [[((j * 31 + k * 17) % 7 - 3) / 4.0 for k in range(_EMB_DIM)]
     for j in range(6)], dtype=np.float32)

emb_picks = st.lists(st.integers(0, 5), min_size=4, max_size=12)


@settings(max_examples=max(3, FUZZ_EXAMPLES * 3 // 4), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(picks=emb_picks)
def test_fuzz_embedding_ops(picks, ray_session, tmp_path_factory):
    """Vector-op parity under duplicate vectors and tied cosines: the
    centroid argmax, the SemDeDup prune rule, and the centroid aggregate
    must tie-break identically in Ray and DuckDB."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("fuzz_emb")
    emb = _POOL[np.asarray(picks)]
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(picks), dtype=np.int64)),
        "embedding": pa.array([row for row in emb],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.asarray(picks, dtype=np.int32) % 2,
                          type=pa.int32()),
    })
    pq.write_table(tbl, d / "embeddings.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    for name in EMB_QUERIES:
        _assert_parity(name, str(d), con)
    con.close()


JOIN_QUERIES = ["left_join", "full_join", "semi_join_shuffle",
                "tpch_q3", "tpch_q12", "hits", "grouped_winsorize",
                # round-5: two-value price/weight domains force weighted
                # medians onto the exact 2·cumw == W boundary
                "weighted_median",
                # round-5 fourth wave: the 2-supplier keyspace makes the
                # sparsified co-purchase graph a single edge or empty
                # (the wedge join's degenerate arms), and 2x3 nation keys
                # give reciprocity flows that exist in one direction only
                "triangle_doulion", "trade_reciprocity",
                # round-5 fifth wave: at production thresholds every tiny
                # fuzz graph peels to nothing — the all-pruned empty arm
                # (cascade dynamics live in test_fuzz_bipartite_cascade)
                "bipartite_prune"]

# order rows straddle HIGH_ORDER_PRICE / Q3 / Q12 windows so every filter
# can come up empty, partially empty, or full — the shapes that exercise
# safe_join's degenerate paths and Ray's empty-first-block race
order_rows = st.lists(
    st.tuples(
        st.integers(1, 4),                                 # o_custkey
        st.sampled_from([399_999.0, 400_001.5, 500_000.0]),  # o_totalprice
        st.sampled_from(["1995-06-01", "1997-06-01"]),     # o_orderdate
        st.sampled_from(["1-URGENT", "3-MEDIUM"]),         # o_orderpriority
    ),
    min_size=1, max_size=16,
)
line_rows = st.lists(
    st.tuples(
        st.integers(0, 15),                                # l_orderkey
        st.sampled_from(["1995-06-01", "1997-06-01", "1998-06-02"]),
        st.sampled_from(["N", "R"]),                       # l_returnflag
        st.sampled_from([1.0, 2.0]),                       # l_quantity
        st.sampled_from([10.0, 20.5]),                     # l_extendedprice
        st.sampled_from([0.0, 0.05]),                      # l_discount
    ),
    min_size=1, max_size=16,
)
cust_segments = st.lists(st.sampled_from(["BUILDING", "AUTOMOBILE"]),
                         min_size=1, max_size=4)


@settings(max_examples=max(3, FUZZ_EXAMPLES * 3 // 4), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(orders=order_rows, lines=line_rows, segs=cust_segments)
def test_fuzz_join_family(orders, lines, segs, ray_session,
                          tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_join")
    pd.DataFrame({
        "c_custkey": np.arange(1, len(segs) + 1, dtype=np.int64),
        "c_mktsegment": segs,
        # 2-value nation keys: reciprocity flows collide AND cross
        "c_nationkey": np.arange(1, len(segs) + 1, dtype=np.int64) % 2,
    }).to_parquet(d / "customer.parquet", index=False)
    pd.DataFrame({
        "s_suppkey": np.arange(2, dtype=np.int64),
        "s_nationkey": np.arange(2, dtype=np.int64) % 3,
    }).to_parquet(d / "supplier.parquet", index=False)
    pd.DataFrame({
        "o_orderkey": np.arange(len(orders), dtype=np.int64),
        "o_custkey": np.array([o[0] for o in orders], dtype=np.int64),
        "o_totalprice": np.array([o[1] for o in orders]),
        "o_orderdate": [np.datetime64(o[2] + "T00:00:00", "us") for o in orders],
        "o_orderpriority": [o[3] for o in orders],
    }).to_parquet(d / "orders.parquet", index=False)
    pd.DataFrame({
        "l_orderkey": np.array([r[0] for r in lines], dtype=np.int64),
        "l_shipdate": [np.datetime64(r[1] + "T00:00:00", "us") for r in lines],
        "l_returnflag": [r[2] for r in lines],
        "l_quantity": np.array([r[3] for r in lines]),
        "l_extendedprice": np.array([r[4] for r in lines]),
        "l_discount": np.array([r[5] for r in lines]),
        # tiny part/supplier keyspace: multi-edges + hub nodes for hits
        "l_partkey": np.array([r[0] % 3 for r in lines], dtype=np.int64),
        "l_suppkey": np.array([r[0] % 2 for r in lines], dtype=np.int64),
    }).to_parquet(d / "lineitem.parquet", index=False)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    for name in JOIN_QUERIES:
        _assert_parity(name, str(d), con)
    con.close()


# ---------------------------------------------------------------------------
# round-5 fifth wave: referential-integrity audit + bipartite peeling cascade

fk_children = st.tuples(
    # (o_custkey values, l_orderkey values, l_partkey values, l_suppkey
    # values) — each range deliberately OVERSHOOTS its parent keyspace so
    # every FK edge can produce zero, some, or only orphans
    st.lists(st.integers(0, 5), min_size=1, max_size=8),    # o_custkey (cust 1..3)
    st.lists(st.integers(0, 7), min_size=1, max_size=10),   # l_orderkey
    st.lists(st.integers(0, 4), min_size=1, max_size=10),   # l_partkey (part 0..2)
    st.lists(st.integers(0, 3), min_size=1, max_size=10),   # l_suppkey (supp 0..1)
    st.lists(st.integers(0, 4), min_size=1, max_size=4),    # c_nationkey (nation 0..2)
)


@settings(max_examples=max(3, FUZZ_EXAMPLES * 3 // 4), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=fk_children)
def test_fuzz_fk_violations(data, ray_session, tmp_path_factory):
    """Orphan-count parity: child keys overshoot every parent keyspace, so
    both the broadcast-membership path (dimension parents) and the
    distributed count→anti-join path (the orders parent) must count the
    same orphans as DuckDB's LEFT JOIN ... IS NULL."""
    custs, lords, lparts, lsupps, cnats = data
    d = tmp_path_factory.mktemp("fuzz_fk")
    n_li = max(len(lords), len(lparts), len(lsupps))

    def cyc(v, n):
        return np.array([v[i % len(v)] for i in range(n)], dtype=np.int64)

    pd.DataFrame({"r_regionkey": np.arange(2, dtype=np.int64)}) \
        .to_parquet(d / "region.parquet", index=False)
    pd.DataFrame({
        "n_nationkey": np.arange(3, dtype=np.int64),
        "n_regionkey": np.array([0, 1, 2], dtype=np.int64),  # 2 is an orphan
    }).to_parquet(d / "nation.parquet", index=False)
    pd.DataFrame({
        "c_custkey": np.arange(1, len(cnats) + 1, dtype=np.int64),
        "c_nationkey": np.array(cnats, dtype=np.int64),
    }).to_parquet(d / "customer.parquet", index=False)
    pd.DataFrame({
        "s_suppkey": np.arange(2, dtype=np.int64),
        "s_nationkey": np.array([0, 4], dtype=np.int64),  # 4 is an orphan
    }).to_parquet(d / "supplier.parquet", index=False)
    pd.DataFrame({
        "p_partkey": np.arange(3, dtype=np.int64),
    }).to_parquet(d / "part.parquet", index=False)
    pd.DataFrame({
        "o_orderkey": np.arange(len(custs), dtype=np.int64),
        "o_custkey": np.array(custs, dtype=np.int64),
    }).to_parquet(d / "orders.parquet", index=False)
    pd.DataFrame({
        "l_orderkey": cyc(lords, n_li),
        "l_partkey": cyc(lparts, n_li),
        "l_suppkey": cyc(lsupps, n_li),
    }).to_parquet(d / "lineitem.parquet", index=False)

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    _assert_parity("fk_violations", str(d), con)
    con.close()


bip_edges = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 4)),  # (part, supplier)
    min_size=2, max_size=30,
)


@settings(max_examples=max(3, FUZZ_EXAMPLES * 3 // 4), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=bip_edges)
def test_fuzz_bipartite_cascade(edges, ray_session, tmp_path_factory):
    """Degree-peeling parity at CASCADE-scale thresholds (kp=2, ks=2 over
    a 6x5 keyspace): each round's removals push neighbors below their
    threshold, so partial survival, multi-round cascades, and the
    all-pruned empty arm all occur across examples. The Ray side and the
    unrolled-CTE SQL twin are parameterized identically."""
    from pacasam_ray.queries import _sql_bipartite_prune, q_bipartite_prune

    d = tmp_path_factory.mktemp("fuzz_bip")
    pd.DataFrame({
        "l_partkey": np.array([e[0] for e in edges], dtype=np.int64),
        "l_suppkey": np.array([e[1] for e in edges], dtype=np.int64),
    }).to_parquet(d / "lineitem.parquet", index=False)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{d}/lineitem.parquet'")

    ray_df = canonicalize(to_pandas(
        q_bipartite_prune(str(d), rounds=3, kp=2, ks=2)))
    ora_df = canonicalize(
        con.sql(_sql_bipartite_prune(rounds=3, kp=2, ks=2)).df())
    con.close()
    assert len(ray_df) == len(ora_df)
    assert list(ray_df.columns) == list(ora_df.columns)
    for c in ray_df.columns:
        assert list(ray_df[c]) == list(ora_df[c]), c
