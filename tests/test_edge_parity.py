"""Adversarial-input parity: the same Ray-vs-DuckDB gate as
test_oracle_parity, but over a CRAFTED corner-case table set that the
uniform synthetic testdata cannot produce — value ties inside a rank
window, singleton and all-equal groups for order statistics, a mode tie,
funnel users whose stages arrive out of order, sub-window texts, an
empty LEFT JOIN side, and NTILE remainder arithmetic (7 rows into 4
tiles). Each query runs as its real Ray pipeline AND as its registered
DuckDB oracle over the same parquet directory."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pacasam_ray.queries import build_oracle_sql, build_queries

from test_oracle_parity import canonicalize, to_pandas

EDGE_QUERIES = [
    # round-3 operators
    "rank_window", "rolling_window", "events_lag", "funnel",
    "grouped_median", "grouped_quantiles", "mode_flag", "grouped_corr",
    "grouped_histogram", "ntile", "distinctive_terms", "contamination",
    "cross_source", "left_join", "contamination_join", "lang_id",
    # earlier operators that read only the crafted tables: tiny/tied
    # groups, sub-k strata, duplicate 2-grams, interleaved-equal
    # timestamps are all shapes the uniform testdata never produces
    "grouped_topk", "grouped_top1", "median_price", "dedup_text",
    "top_terms", "repetition_ratio", "text_quality", "fingerprint",
    "token_count", "events_sessions", "events_window", "events_hopping",
    "text_scrub", "asof_join", "distinct_hll", "substring_dedup",
    "doc_rarity", "simhash",
    # round-3 second wave: single-row users (PERCENT_RANK n=1 → 0),
    # equal-(ts,value) pairs (tie-breaks, RANGE peer frames, LEAD gap 0),
    # shared 60-char prefixes (keep-best dedup with an n_chars tie),
    # duplicate (price,size) points on the skyline, no-digit texts
    # (regexp_extract '' branch), tf/df score ties in TF-IDF
    "percent_rank", "zscore_outlier", "dedup_keep_best",
    "string_agg_sorted", "group_gini", "pareto_front", "term_cooccur",
    "csv_roundtrip", "jsonl_roundtrip", "cell_rollup",
    "zone_overlap_area", "zone_distance", "quality_model",
    "cohort_retention", "events_lead", "unpivot_part", "regex_extract",
    "source_intersect", "source_except", "tfidf_topk", "edit_neardup",
    "transition_counts", "time_range_window", "window_dedup", "slab_nn",
    # round-5: the crafted near-dup texts put SimHash pairs in EVERY
    # split combination, so the leakage rollup's cross-split filter and
    # the pure-function stamp both see non-trivial inputs here
    "split_leakage",
    # round-5 second wave: tiny per-source groups (n=3/4 DISC quartiles,
    # IQR 0 on ties), equal-timestamp click/purchase pairs under the
    # as-of tolerance, 7-row Morton ranking, and a CUBE whose lang level
    # collapses to one value
    "tukey_outliers", "asof_tolerance", "zorder_positions", "cube_agg",
    # singleton group (flag C via one row) + all-equal-price group put the
    # weighted median exactly on the first and only CDF step
    "weighted_median",
    # equal-timestamp pairs (user 7) hit the (user, ts) tie pre-dedup in
    # the throttle closure and a zero-length island gap in the union
    "interval_union", "throttle_dedup",
    # round-5 fourth wave: user 1's five equal values pin the rolling
    # median's tie handling; all events share hour 0 so burst_detect's
    # <3-prior-buckets empty branch must agree; doc 5/6 repeated tokens
    # tie BM25 tf and df through the mirrored IEEE score; s0/s1 document
    # ranks exercise the exact-integer OLS moments
    "rolling_median", "burst_detect", "bm25_topk", "host_trend",
    # round-5 fifth wave: every doc is lang='en', so AUC's n0 = 0 arm
    # (NULL auc, zero denominator) must agree on both engines; the
    # profiler sees n_chars ties and a 2-value source column
    "auc_by_source", "profile_stats",
]


def _ts(minute: int):
    return np.datetime64(f"2024-01-01T00:{minute:02d}:00", "us")


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")

    # events: rank ties (user 1 all-equal values), a singleton user (2),
    # funnel users — 3 converts fully, 4 clicks BEFORE viewing (depth 1),
    # 5 purchases BEFORE clicking (depth 2), 6 never views (depth 0) —
    # and user 7 with two equal-value events (lag gap and rank tie-break
    # on event_id).
    rows = []
    for i in range(5):
        rows.append((100 + i, _ts(i), 1, "view", 7.0))
    rows.append((200, _ts(0), 2, "click", 1.5))
    rows += [(300, _ts(0), 3, "view", 10.0), (301, _ts(1), 3, "click", 20.0),
             (302, _ts(2), 3, "purchase", 30.0), (303, _ts(3), 3, "error", 5.0)]
    rows += [(400, _ts(0), 4, "click", 2.0), (401, _ts(1), 4, "view", 3.0)]
    rows += [(500, _ts(0), 5, "view", 4.0), (501, _ts(1), 5, "purchase", 6.0),
             (502, _ts(2), 5, "click", 8.0)]
    rows += [(600, _ts(0), 6, "error", 9.0), (601, _ts(1), 6, "signup", 9.5)]
    rows += [(700, _ts(0), 7, "view", 42.0), (701, _ts(0), 7, "view", 42.0)]
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    ev.to_parquet(d / "events.parquet", index=False)

    # lineitem: singleton group (1), all-equal two-row group (2), a 5-row
    # group (3) whose returnflag mode ties 2-2 ('A' wins lexicographically);
    # every flag keeps variance in (quantity, discount) so corr stays finite.
    li = pd.DataFrame({
        "l_partkey":       [1,    2,    2,    3,    3,    3,    3,    3],
        "l_extendedprice": [10.0, 5.0,  5.0,  1.0,  2.0,  2.0,  3.0,  9.0],
        "l_returnflag":    ["A",  "A",  "B",  "A",  "A",  "B",  "B",  "C"],
        "l_quantity":      [1.0,  2.0,  3.0,  4.0,  5.0,  6.0,  7.0,  8.0],
        "l_discount":      [0.01, 0.05, 0.02, 0.04, 0.03, 0.07, 0.01, 0.06],
    })
    li.loc[len(li)] = [4, 9.0, "C", 9.0, 0.08]  # second C row: variance
    li.to_parquet(d / "lineitem.parquet", index=False)

    # documents: 7 docs (NTILE(4) remainder = 3), n_chars ties, doc 0 is
    # the contamination benchmark (doc_id % 37 == 0), docs 1-2 share its
    # first 60 chars (two stride-aligned windows), doc 3 is shorter than
    # one window, doc 6 has a tf AND df tie for the distinctive term.
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the hills tonight")
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5, 6],
        "text": [
            base,
            base[:60] + " totally different tail of words here",
            base[:60] + " another tail that deviates from both",
            "tiny text",
            "unique words entirely without any overlap at all in this row",
            "aa bb aa bb cc " * 5,
            "xx yy xx yy",
        ],
        "source": ["s0", "s1", "s0", "s1", "s0", "s1", "s0"],
        "n_chars": [90, 90, 90, 9, 60, 75, 11],
        "lang": ["en"] * 7,
    })
    docs.to_parquet(d / "documents.parquet", index=False)

    # customer/orders: cust 1 has two qualifying orders, cust 2 none at
    # all, cust 3 only sub-threshold orders — both NULL-side shapes.
    pd.DataFrame({
        "c_custkey": [1, 2, 3],
        "c_mktsegment": ["AUTO", "HOUSE", "SHIP"],
    }).to_parquet(d / "customer.parquet", index=False)
    pd.DataFrame({
        "o_custkey": [1, 1, 3, 3],
        "o_totalprice": [500000.0, 400000.01, 1000.0, 399999.99],
    }).to_parquet(d / "orders.parquet", index=False)

    # part: skyline corner cases — an exact duplicate point (1,2: both
    # stay on the front, neither dominates the other), an equal-price
    # larger-size row (3: dominated within its price run), an equal-size
    # higher-price row (6: dominated across runs), and two more front
    # members bracketing the price range.
    pd.DataFrame({
        "p_partkey": [1, 2, 3, 4, 5, 6],
        "p_retailprice": [900.0, 900.0, 900.0, 850.0, 950.0, 960.0],
        "p_size": np.array([10, 10, 12, 50, 5, 5], dtype=np.int32),
    }).to_parquet(d / "part.parquet", index=False)

    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    for t in ("events", "lineitem", "documents", "customer", "orders", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{edge_dir}/{t}.parquet'")
    yield con
    con.close()


QUERIES = build_queries()
ORACLES = build_oracle_sql()


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_query_matches_oracle(name, edge_dir, edge_duck):
    ray_df = canonicalize(to_pandas(QUERIES[name](edge_dir)))
    ora_df = canonicalize(edge_duck.sql(ORACLES[name]).df())
    assert len(ray_df) == len(ora_df), f"{name}: {len(ray_df)} != {len(ora_df)} rows"
    assert list(ray_df.columns) == list(ora_df.columns)
    for c in ray_df.columns:
        a, b = ray_df[c], ora_df[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype("float64"), b.astype("float64"), check_names=False,
                rtol=0, atol=0, obj=f"{name}.{c}",
            )
        else:
            assert list(a) == list(b), f"{name}.{c}: values differ"
