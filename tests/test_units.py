"""Unit tests of pure kernels (reference test layer 1, SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pacasam_ray.hashing import M31, hmix, hmix_sql
from pacasam_ray.samplers.algos import fps, proportional_target, yield_chunks
from pacasam_ray.samplers.base import sample_with_stratification_df
from pacasam_ray.sources.pages import extract_text_from_html, wrap_html
from pacasam_ray.stages.filters import split_mask
from pacasam_ray.stages.normalize import UnexpectedNaNValuesError, normalize_df


def test_hmix_matches_sql(duck):
    ks = np.array([0, 1, 5, 12345, 999_999_999], dtype=np.int64)
    for salt in (0, 1, 7, 1000):
        py = hmix(ks, salt)
        sql = duck.sql(
            "SELECT " + ", ".join(hmix_sql(str(k), salt) for k in ks.tolist())
        ).fetchone()
        assert list(py) == list(sql)


def test_hmix_range_and_spread():
    h = hmix(np.arange(100_000, dtype=np.int64), 3)
    assert h.min() >= 0 and h.max() < M31
    # rough uniformity: each decile within 20% of expected
    counts, _ = np.histogram(h, bins=10, range=(0, M31))
    assert counts.min() > 8_000 and counts.max() < 12_000


def test_split_mask_truth_table():
    """F5 mock (reference tests/tests_pacasam/connectors/test_lipac.py:10-36)."""
    test_col = pa.array([True, None, False, None, True, None])
    data = np.arange(1, 7)
    assert split_mask(test_col, "any") is None
    m_test = split_mask(test_col, "test").to_pylist()
    assert [d for d, m in zip(data, m_test) if m] == [1, 5]
    m_train = pa.compute.fill_null(split_mask(test_col, "train"), False).to_pylist()
    assert [d for d, m in zip(data, m_train) if m] == [2, 3, 4, 6]
    with pytest.raises(ValueError):
        split_mask(test_col, "bogus")


def test_fps_selection_order_and_coverage():
    pts = np.array([[0.0, 0.0], [10.0, 0.0], [0.1, 0.0], [5.0, 0.0]])
    idx = fps(pts, 3)
    assert list(idx) == [0, 1, 3]  # farthest-first from index 0
    # degenerate: identical points must not repeat selections
    same = np.zeros((5, 2))
    assert sorted(fps(same, 3)) == sorted(set(fps(same, 3)))
    # n >= len returns all
    assert list(fps(pts, 10)) == [0, 1, 2, 3]


def test_yield_chunks_and_allocation():
    df = pd.DataFrame({"a": range(10)})
    chunks = list(yield_chunks(df, 4))
    assert [len(c) for c in chunks] == [4, 4, 2]
    assert proportional_target(4, 5, 10) == 2


def test_normalize_df_matches_reference_semantics():
    df = pd.DataFrame({"patch_id": [0, 1, 2, 3], "v": [0, 10, 20, 30]})
    out = normalize_df(df, ["v"])
    nz = pd.Series([10.0, 20.0, 30.0])
    expected = (nz - nz.mean()) / (nz.std() + 10e-6)
    # zero maps to min of transformed values
    assert out["v"].iloc[0] == pytest.approx(expected.min())
    assert out["v"].iloc[1:].tolist() == pytest.approx(expected.tolist())
    with pytest.raises(UnexpectedNaNValuesError):
        normalize_df(pd.DataFrame({"v": [1.0, np.nan]}), ["v"])


def test_stratified_df_exact_count_and_coverage():
    df = pd.DataFrame({
        "patch_id": range(100),
        "file_id": [f"s{i % 10}" for i in range(100)],
    })
    out = sample_with_stratification_df(df, 20, keys="file_id", salt=1)
    assert len(out) == 20
    assert out["patch_id"].is_unique
    assert out["file_id"].nunique() == 10  # every strata covered


def test_html_roundtrip_byte_identical():
    text = pa.array(["hello world", "", "héllo ünïcode £"])
    html = wrap_html(text)
    back = extract_text_from_html(html)
    assert pa.compute.cast(back, pa.string()).to_pylist() == text.to_pylist()


def test_kth_smallest_value_refinement_and_ties(monkeypatch):
    """Histogram-refinement quickselect: forced multi-round refinement
    (tiny collect limit) must agree with numpy's full sort for edge ks,
    interior ks, and a heavily-tied column."""
    import numpy as np
    import ray.data

    from pacasam_ray.stages import orderstats

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.normal(100.0, 25.0, 4000),
        np.full(1500, 77.7),          # heavy tie block
        rng.uniform(-1000, 1000, 500),
    ])
    ds = ray.data.from_items([{"x": float(v)} for v in vals],
                             override_num_blocks=7)
    ordered = np.sort(vals, kind="stable")

    monkeypatch.setattr(orderstats, "COLLECT_LIMIT", 50)
    for k in (1, 2, len(vals) // 2, len(vals) - 1, len(vals)):
        got = orderstats.kth_smallest_value(ds, "x", k)
        assert got == float(ordered[k - 1]), k
    # a k landing inside the tie block
    k_tie = int(np.searchsorted(ordered, 77.7)) + 700
    assert orderstats.kth_smallest_value(ds, "x", k_tie) == 77.7


def test_bloom_filter_no_false_negatives_and_bounded_fp():
    """Members always test maybe-positive (no false negatives — required
    for anti-join exactness); non-members mostly test negative (the whole
    point of the prefilter: the big side's definite-miss rows never
    shuffle). With 10k keys in 2^20 bits / k=4 the theoretical FP rate is
    ~1e-4; assert a loose 1% ceiling."""
    from pacasam_ray.stages.bloom import (
        DEFAULT_K, DEFAULT_M_BITS, bloom_maybe_member, build_bloom_bits,
    )
    import ray.data

    members = np.arange(10_000, dtype=np.int64) * 3 + 1
    ds = ray.data.from_pandas(pd.DataFrame({"k": members})).repartition(8)
    words = build_bloom_bits(ds, "k")

    got = bloom_maybe_member(members, words, DEFAULT_M_BITS, DEFAULT_K)
    assert got.all(), "false negative: a member tested absent"

    probes = np.arange(200_000, 400_000, dtype=np.int64)
    non_members = probes[~np.isin(probes, members)]
    fp = bloom_maybe_member(non_members, words, DEFAULT_M_BITS, DEFAULT_K)
    assert fp.mean() < 0.01, f"false-positive rate {fp.mean():.4f}"


def test_bloom_anti_join_equals_exact_anti_join():
    from pacasam_ray.stages.bloom import bloom_anti_join
    import ray.data

    left = pd.DataFrame({"k": np.arange(5000, dtype=np.int64) % 700,
                         "v": np.arange(5000, dtype=np.int64)})
    right = pd.DataFrame({"r": np.arange(0, 700, 3, dtype=np.int64)})
    lds = ray.data.from_pandas(left).repartition(6)
    rds = ray.data.from_pandas(right).repartition(3)

    got = bloom_anti_join(lds, "k", rds, "r").to_pandas() \
        .sort_values("v").reset_index(drop=True)
    want = left[~left["k"].isin(right["r"])].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_edit_distance_batch_matches_reference_dp():
    """The vectorized cummin-relaxation DP equals the classic O(nm)
    cell-by-cell Levenshtein on adversarial shapes: empty strings,
    equal strings, pure insert/delete, transposition (cost 2 under
    unit-cost Levenshtein), and unicode beyond the BMP."""
    from pacasam_ray.queries import edit_distance_batch

    def ref(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    pairs = [
        ("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
        ("kitten", "sitting"), ("ab", "ba"), ("abcdef", "azced"),
        ("aaaa", "aa"), ("día", "dia"), ("x🙂y", "xy"),
        ("the quick brown fox", "the quick brown dog"),
    ]
    got = edit_distance_batch([a for a, _ in pairs], [b for _, b in pairs])
    assert list(got) == [ref(a, b) for a, b in pairs]


def test_schema_floor_preserves_columns_when_empty(ray_session):
    """Ray's to_pandas drops column schema when every block is empty;
    schema_floor substitutes the typed empty frame (and passes non-empty
    results through untouched)."""
    import ray

    from pacasam_ray.stages.partitioning import schema_floor

    src = ray.data.range(5).map_batches(
        lambda t: t.filter(pa.array([False] * t.num_rows)),
        batch_format="pyarrow")
    empty = pd.DataFrame({"id": pd.Series([], dtype=np.int64)})
    out = schema_floor(src, empty)
    assert isinstance(out, pd.DataFrame) and list(out.columns) == ["id"]

    full = schema_floor(ray.data.range(5), empty)
    assert not isinstance(full, pd.DataFrame) and full.count() == 5


def test_pick_group_partitions_floors_at_cluster_cpus(ray_session):
    """map_groups reducers get at least one partition per cluster CPU —
    their per-group Python callbacks are concurrency-bound, unlike
    C-kernel aggregate reducers."""
    import ray

    from pacasam_ray.stages.partitioning import (pick_group_partitions,
                                                 pick_partitions)

    ds = ray.data.range(100)  # tiny: byte-derived count hits the floor (4)
    cpus = int(ray.cluster_resources()["CPU"])
    assert pick_partitions(ds) < pick_group_partitions(ds) or cpus <= 4
    assert pick_group_partitions(ds) >= min(cpus, 4)


def test_grouped_int_kth_matches_numpy(ray_session):
    """Grouped two-pass integer order statistics: every requested (group,
    k) must equal the value numpy finds by fully sorting the group —
    including ties, single-row groups, values spanning many coarse
    buckets, and several ks inside the same coarse bucket."""
    import numpy as np
    import ray.data

    from pacasam_ray.stages.orderstats import grouped_int_kth

    rng = np.random.default_rng(7)
    rows = []
    truth = {}
    for g, n, spread in (("en", 4000, 50_000), ("fr", 700, 900),
                         ("zh", 1, 10), ("de", 60, 3)):
        vals = rng.integers(0, spread + 1, n).astype(np.int64)
        rows.extend({"lang": g, "v": int(v)} for v in vals)
        truth[g] = np.sort(vals)
    ds = ray.data.from_items(rows, override_num_blocks=9)

    ks_of = {"en": [1, 1333, 2667, 4000], "fr": [1, 350, 700],
             "zh": [1], "de": [20, 21, 22]}
    got = grouped_int_kth(ds, "lang", "v", ks_of)
    for g, ks in ks_of.items():
        for k in ks:
            assert got[(g, k)] == int(truth[g][k - 1]), (g, k)
