"""Stats pipeline (Comparer, S8/A2-A4) and distributed quantile
normalization (M6/T2 quantilization path) — the two surfaces not covered by
the oracle-parity or sampler suites."""

import numpy as np
import pandas as pd
import ray.data

from conftest import SF_DIR

from pacasam_ray.pipelines.sampling import (
    extract_selection, make_catalogue, DEFAULT_CONFIG,
)
from pacasam_ray.samplers import SAMPLERS_LIBRARY
from pacasam_ray.pipelines.stats import CSV_NAMES, Comparer, prevalence_and_counts
from pacasam_ray.stages.normalize import normalize_dataset, normalize_df


def test_comparer_produces_expected_csvs(tmp_path):
    """Mirror of the reference's own stats test (tests/.../test_stats.py:6-21):
    compare a sampling against the catalogue, expect the 5 CSVs."""
    cat = make_catalogue(SF_DIR)
    sampler = SAMPLERS_LIBRARY["SpatialSampler"](sampling_config=dict(DEFAULT_CONFIG))
    sampling = extract_selection(cat, sampler.get_patches(cat))
    written = Comparer(tmp_path).compare(cat, sampling)
    assert [p.name for p in written] == CSV_NAMES
    prev = pd.read_csv(tmp_path / CSV_NAMES[0])
    assert set(prev["source"]) == {"database", "sampling"}
    # database prevalences must match a driver-side recount exactly
    full = cat.to_pandas()
    db_row = prev[prev["source"] == "database"].iloc[0]
    assert db_row["num_patches"] == len(full)
    for c in ("c1", "c2", "c3", "c_long"):
        assert db_row[f"prev_{c}"] == full[c].astype("int64").mean()
    by_split = pd.read_csv(tmp_path / CSV_NAMES[3])
    assert set(by_split["split"]) <= {"train", "val", "test"}


def test_prevalence_grouped_matches_pandas():
    cat = make_catalogue(SF_DIR)
    out = prevalence_and_counts(cat, ["c1", "c_long"], group_col="file_id")
    full = cat.to_pandas()
    ref = full.groupby("file_id").agg(
        num_patches=("patch_id", "size"), s1=("c1", "sum"), s2=("c_long", "sum")
    ).reset_index()
    m = out.merge(ref, on="file_id")
    assert len(m) == len(ref)
    assert (m["num_patches_x"] == m["num_patches_y"]).all()
    assert np.array_equal(
        m["prev_c1"].to_numpy(), m["s1"].to_numpy() / m["num_patches_y"].to_numpy()
    )


def test_quantile_normalization_distributed_matches_driver_twin():
    """Distributed quantilization (hash-rank subsample covering ALL rows ⇒
    the grid equals the full-data grid) vs the driver-side reference twin."""
    cols = ["nb_sol", "nb_eau"]
    cat = make_catalogue(SF_DIR).select_columns(["patch_id"] + cols)
    dist = (
        normalize_dataset(cat, cols, normalization="quantilization", n_quantiles=20)
        .to_pandas()
        .sort_values("patch_id")
        .reset_index(drop=True)
    )
    local = (
        normalize_df(
            cat.to_pandas(), cols, normalization="quantilization", n_quantiles=20
        )
        .sort_values("patch_id")
        .reset_index(drop=True)
    )
    for c in cols:
        np.testing.assert_allclose(dist[c].to_numpy(), local[c].to_numpy(), atol=1e-12)
    # quantile transform maps into [0, 1]
    assert dist[cols].to_numpy().min() >= 0.0 and dist[cols].to_numpy().max() <= 1.0


def test_quantile_partition_invariance():
    cols = ["nb_sol"]
    cat = make_catalogue(SF_DIR).select_columns(["patch_id"] + cols)
    a = normalize_dataset(cat, cols, normalization="quantilization").to_pandas()
    b = normalize_dataset(
        cat.repartition(9), cols, normalization="quantilization"
    ).to_pandas()
    a = a.sort_values("patch_id").reset_index(drop=True)
    b = b.sort_values("patch_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_salted_groupby_matches_naive():
    """Skew-spread two-phase aggregation must be bit-identical to the
    single-phase plan (integer sums, any combination order)."""
    from pacasam_ray.stages.skew import salted_groupby_sum

    cat = make_catalogue(SF_DIR).select_columns(["patch_id", "file_id", "nb_total"])
    salted = (
        salted_groupby_sum(cat, "file_id", ["nb_total"], salt_k=7)
        .to_pandas().sort_values("file_id").reset_index(drop=True)
    )
    full = cat.to_pandas()
    ref = full.groupby("file_id").agg(
        num_rows=("patch_id", "size"), sum_nb_total=("nb_total", "sum")
    ).reset_index().sort_values("file_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        salted[["file_id", "num_rows", "sum_nb_total"]], ref, check_dtype=False
    )


def test_quantile_mode_rejects_nan():
    """Reference raises UnexpectedNaNValuesError before EITHER transform
    (src/pacasam/samplers/algos.py:74-76) — quantile mode included."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from pacasam_ray.stages.normalize import (UnexpectedNaNValuesError,
                                              normalize_dataset)

    df = pd.DataFrame({
        "patch_id": np.arange(100, dtype=np.int64),
        "f": np.where(np.arange(100) == 37, np.nan, 1.5),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    with pytest.raises(UnexpectedNaNValuesError):
        normalize_dataset(ds, ["f"], normalization="quantilization")
