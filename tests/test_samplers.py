"""Sampler conformance tests (reference test layer 2, SURVEY.md §5 /
FIXTURES.md F7): property assertions on the deterministic catalogue, not
golden files — counts, schema, val fractions, stratification coverage."""

from math import floor

import pandas as pd
import pytest

from pacasam_ray.pipelines.sampling import DEFAULT_CONFIG, make_catalogue, run_sampling
from pacasam_ray.samplers import SAMPLERS_LIBRARY
from pacasam_ray.samplers.base import SAMPLING_SCHEMA

from conftest import SF_DIR

TARGET = DEFAULT_CONFIG["target_total_num_patches"]
FRAC_VAL = DEFAULT_CONFIG["frac_validation_set"]


@pytest.fixture(scope="module")
def catalogue():
    return make_catalogue(SF_DIR).materialize()


@pytest.mark.parametrize("name", sorted(SAMPLERS_LIBRARY))
def test_sampler_output_schema_and_nonempty(name, catalogue):
    """F7.1: every sampler yields non-empty output, schema ⊇ sampling_schema."""
    sampler = SAMPLERS_LIBRARY[name](sampling_config=dict(DEFAULT_CONFIG))
    sel = sampler.get_patches(catalogue)
    assert len(sel) > 0
    assert set(SAMPLING_SCHEMA) <= set(sel.columns)
    assert sel["patch_id"].is_unique or name == "TargettedSampler"


def test_targetted_with_completion_exact_counts(catalogue):
    """F7.2: len == target_total; #val == floor(frac·total); samplers set."""
    sampler = SAMPLERS_LIBRARY["TargettedSampler"](sampling_config=dict(DEFAULT_CONFIG))
    sel = sampler.get_patches(catalogue)
    assert len(sel) == TARGET
    assert (sel["split"] == "val").sum() == floor(FRAC_VAL * TARGET)
    assert set(sel["sampler"]) == {"TargettedSampler", "SpatialSampler"}


def test_targetted_without_completion_partial(catalogue):
    sampler = SAMPLERS_LIBRARY["TargettedSampler"](
        sampling_config=dict(DEFAULT_CONFIG), complete_with_spatial_sampling=False
    )
    sel = sampler.get_patches(catalogue)
    assert 0 < len(sel) < TARGET


def test_targetted_overconstrained_warns(catalogue):
    """F7.3: all-0.99 targets ⇒ warning + len > target."""
    cf = dict(DEFAULT_CONFIG)
    cf["TargettedSampler"] = {
        "targets": {
            c: {"target_min_samples_proportion": 0.99} for c in ("c1", "c2", "c3")
        }
    }
    sampler = SAMPLERS_LIBRARY["TargettedSampler"](sampling_config=cf)
    with pytest.warns(UserWarning):
        sel = sampler.get_patches(catalogue)
    assert len(sel) > TARGET


def test_random_spatial_exact_target(catalogue):
    for name in ("RandomSampler", "SpatialSampler"):
        sel = SAMPLERS_LIBRARY[name](sampling_config=dict(DEFAULT_CONFIG)).get_patches(catalogue)
        assert len(sel) == TARGET, name
        assert (sel["split"] == "val").sum() == floor(FRAC_VAL * TARGET)


def test_triple_exact_target(catalogue):
    sel = SAMPLERS_LIBRARY["TripleSampler"](sampling_config=dict(DEFAULT_CONFIG)).get_patches(catalogue)
    assert len(sel) == TARGET
    assert sel["patch_id"].is_unique
    assert set(sel["sampler"]) <= {"TargettedSampler", "DiversitySampler", "SpatialSampler"}


def test_diversity_deterministic_across_runs(catalogue):
    cls = SAMPLERS_LIBRARY["DiversitySampler"]
    a = cls(sampling_config=dict(DEFAULT_CONFIG)).get_patches(catalogue)
    b = cls(sampling_config=dict(DEFAULT_CONFIG)).get_patches(catalogue)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_diversity_multichunk_distributed_path(catalogue):
    """Force max_chunk < total so the chunked groupby-FPS shuffle path runs
    (the single-chunk regime short-circuits to driver-side FPS)."""
    cf = dict(DEFAULT_CONFIG)
    cf["DiversitySampler"] = dict(cf["DiversitySampler"], max_chunk_size_for_fps=100)
    cls = SAMPLERS_LIBRARY["DiversitySampler"]
    sel = cls(sampling_config=cf).get_patches(catalogue)
    assert len(sel) == cf["target_total_num_patches"]
    assert sel["patch_id"].is_unique
    # deterministic under repartitioning (chunk ids derive from global
    # positions, not block layout)
    sel2 = cls(sampling_config=cf).get_patches(catalogue.repartition(7))
    pd.testing.assert_frame_equal(
        sel.reset_index(drop=True), sel2.reset_index(drop=True)
    )


def test_run_sampling_end_to_end_enriched():
    out = run_sampling(SF_DIR, "SpatialSampler")
    assert len(out) == TARGET
    # enriched selection = catalogue columns + sampling columns (J1)
    for col in ("patch_id", "split", "sampler", "file_id", "cell", "x", "y"):
        assert col in out.columns


def test_stratified_shuffle_path_matches_driver_merge(catalogue, monkeypatch):
    """The adaptive reserve plan (driver merge below DRIVER_MERGE_MAX_ROWS
    vs groupby hash-shuffle above) must be a pure physical choice: forcing
    the shuffle path on the same input yields identical selections."""
    from pacasam_ray.samplers import algos

    spec = dict(n=37, salt=123, strata="file_id")
    fast = algos.sample_with_stratification(catalogue, spec["n"], spec["salt"])
    monkeypatch.setattr(algos, "DRIVER_MERGE_MAX_ROWS", 0)
    slow = algos.sample_with_stratification(catalogue, spec["n"], spec["salt"])
    pd.testing.assert_frame_equal(
        fast.sort_values("patch_id").reset_index(drop=True),
        slow.sort_values("patch_id").reset_index(drop=True),
    )

    specs = [
        {"name": "a", "filter_col": "c0", "n": 11, "salt": 7},
        {"name": "b", "filter_col": None, "n": 23, "salt": 8},
    ]
    monkeypatch.setattr(algos, "DRIVER_MERGE_MAX_ROWS", algos.MAX_COMPLETION_ROUNDS * 10**6)
    fast_m = algos.multi_stratified_sample(catalogue, specs)
    monkeypatch.setattr(algos, "DRIVER_MERGE_MAX_ROWS", 0)
    slow_m = algos.multi_stratified_sample(catalogue, specs)
    for k in fast_m:
        pd.testing.assert_frame_equal(
            fast_m[k].sort_values("patch_id").reset_index(drop=True),
            slow_m[k].sort_values("patch_id").reset_index(drop=True),
        )


def test_outlier_density_score_recalls_planted_outliers():
    """GLOSH-fidelity check: two dense blobs + planted sparse points. The
    density score must rank every planted outlier above every blob member,
    and land near 1.0 for points in genuinely empty regions (the GLOSH-like
    [0,1] calibration, which a raw center-distance ratio does not give)."""
    import numpy as np
    import pyarrow as pa

    from pacasam_ray.samplers.outliers import _score_fn, fit_outlier_model
    import ray

    rng = np.random.default_rng(7)
    blob_a = rng.normal(loc=(0.0, 0.0), scale=0.05, size=(400, 2))
    blob_b = rng.normal(loc=(4.0, 0.0), scale=0.05, size=(400, 2))
    outliers = np.array(
        [[2.0, 0.0], [2.0, 2.0], [-2.0, -2.0], [6.0, 2.0], [0.0, 3.0],
         [4.0, -3.0], [-1.5, 1.5], [5.5, -2.0], [2.0, -2.5], [1.0, 2.5]]
    )
    arr = np.vstack([blob_a, blob_b, outliers])
    model = fit_outlier_model(arr, n_clusters=2, knn_k=8, ref_size=len(arr))
    model_ref = ray.put(model)

    batch = pa.table({"f0": arr[:, 0], "f1": arr[:, 1]})
    scored = _score_fn(model_ref, ["f0", "f1"])(batch)
    score = scored["outlier_scores"].to_numpy()
    blob_max = score[:800].max()
    outlier_min = score[800:].min()
    assert outlier_min > blob_max
    # the midpoint between the blobs sits in a density desert: calibrated
    # score ≈ 1, not merely "bigger than the blobs'"
    assert score[800] > 0.9


def test_outlier_model_degenerate_fit_sample():
    """A 1-row fit sample must not crash (np.partition kth=1 on a 1-col
    matrix) — scores short-circuit to 0."""
    import numpy as np
    import pyarrow as pa
    import ray

    from pacasam_ray.samplers.outliers import _score_fn, fit_outlier_model

    arr = np.array([[1.0, 2.0]])
    model = fit_outlier_model(arr, n_clusters=1, knn_k=8, ref_size=1)
    assert model[2] == 0
    scored = _score_fn(ray.put(model), ["f0", "f1"])(
        pa.table({"f0": [1.0, 5.0], "f1": [2.0, -3.0]})
    )
    assert scored["outlier_scores"].to_pylist() == [0.0, 0.0]


def test_weighted_sample_properties():
    """Efraimidis–Spirakis sampling: deterministic and partition-invariant;
    zero weights never selected; inclusion tracks weight (9:1 strata must
    skew the sample accordingly)."""
    import numpy as np
    import ray.data

    from pacasam_ray.samplers.algos import sample_weighted

    rows = [{"patch_id": i, "w": 0.0 if i % 10 == 0 else (9.0 if i % 2 else 1.0)}
            for i in range(20_000)]
    a = sample_weighted(ray.data.from_items(rows, override_num_blocks=3),
                        1000, salt=5, weight_col="w")
    b = sample_weighted(ray.data.from_items(rows, override_num_blocks=13),
                        1000, salt=5, weight_col="w")
    assert list(a["patch_id"]) == list(b["patch_id"])
    assert len(a) == 1000
    w = a["w"].to_numpy()
    assert (w > 0).all()  # zero-weight rows excluded
    heavy = (w == 9.0).sum()
    light = (w == 1.0).sum()
    # population: 9k heavy (w=9), 9k light (w=1) -> expected inclusion
    # ratio ~9:1 at a small sampling fraction; allow generous noise
    assert heavy / max(light, 1) > 4.5
    # ...but light rows MUST still appear at roughly their expected ~100/1000
    # rate: a weight-deterministic selection (every heavy key < every light
    # key, the old degenerate-u bug) yields light == 0 and must fail here.
    assert 50 <= light <= 200


def test_weighted_sample_sps_properties():
    """Sequential Poisson sampling: same contract as the E–S test above
    (deterministic, partition-invariant, zero-weight exclusion, inclusion
    tracks weight) for the SQL-auditable ξ = u/w variant."""
    import numpy as np
    import ray.data

    from pacasam_ray.samplers.algos import sample_weighted_sps

    rows = [{"patch_id": i, "w": 0.0 if i % 10 == 0 else (9.0 if i % 2 else 1.0)}
            for i in range(20_000)]
    a = sample_weighted_sps(ray.data.from_items(rows, override_num_blocks=3),
                            1000, salt=5, weight_col="w")
    b = sample_weighted_sps(ray.data.from_items(rows, override_num_blocks=13),
                            1000, salt=5, weight_col="w")
    assert list(a["patch_id"]) == list(b["patch_id"])
    assert len(a) == 1000
    w = a["w"].to_numpy()
    assert (w > 0).all()
    heavy = (w == 9.0).sum()
    light = (w == 1.0).sum()
    assert heavy / max(light, 1) > 4.5
    assert 50 <= light <= 200


def test_copy_sampler_dataset_native_equivalence(tmp_path):
    """CopySampler's Dataset-native path (no driver round-trip, no broadcast
    join-back) must produce the same rows/columns as run_sampling's generic
    path would for the stamped schema."""
    import ray

    from pacasam_ray.pipelines.sampling import make_catalogue, run_sampling
    from pacasam_ray.samplers.copy import CopySampler

    sf = "/root/testdata/sf0.001"
    cat = make_catalogue(sf)
    s = CopySampler(sampling_config={})
    native = s.get_patches_dataset(cat).to_pandas()
    pandas_sel = s.get_patches(cat)
    assert len(native) == len(pandas_sel) == cat.count()
    assert set(pandas_sel["patch_id"]) == set(native["patch_id"])
    assert (native["sampler"] == "CopySampler").all()
    assert native["split"].isna().all()
    # run_sampling routes CopySampler through the native path and can sink
    out = run_sampling(sf, "CopySampler", output_path=str(tmp_path / "copy_out"))
    assert out.count() == len(native)


def test_glosh_scorer_recalls_planted_outliers():
    """Same planted-outlier recall contract under the condensed-tree GLOSH
    scorer (pure-numpy HDBSCAN twin): two blobs found as clusters, every
    planted outlier ranked above every blob member, desert points ≈ 1."""
    import numpy as np
    import pyarrow as pa
    import ray

    from pacasam_ray.samplers.glosh import glosh_fit
    from pacasam_ray.samplers.outliers import _glosh_score_fn

    rng = np.random.default_rng(7)
    blob_a = rng.normal(loc=(0.0, 0.0), scale=0.05, size=(400, 2))
    blob_b = rng.normal(loc=(4.0, 0.0), scale=0.05, size=(400, 2))
    outliers = np.array(
        [[2.0, 0.0], [2.0, 2.0], [-2.0, -2.0], [6.0, 2.0], [0.0, 3.0],
         [4.0, -3.0], [-1.5, 1.5], [5.5, -2.0], [2.0, -2.5], [1.0, 2.5]]
    )
    arr = np.vstack([blob_a, blob_b, outliers])
    model = glosh_fit(arr, min_cluster_size=16)
    assert set(model.labels[:400].tolist()) != set(model.labels[400:800].tolist())
    scored = _glosh_score_fn(ray.put(model), ["f0", "f1"])(
        pa.table({"f0": arr[:, 0], "f1": arr[:, 1]})
    )
    score = scored["outlier_scores"].to_numpy()
    assert score[800:].min() > score[:800].max()
    assert score[800] > 0.9


def test_outliers_sampler_glosh_scorer_end_to_end(catalogue):
    """OutliersSampler with scorer=glosh: same selection contract (schema,
    exact target count, val split) as the default density scorer."""
    import copy

    from pacasam_ray.pipelines.sampling import DEFAULT_CONFIG
    from pacasam_ray.samplers.outliers import OutliersSampler

    cf = copy.deepcopy(dict(DEFAULT_CONFIG))
    cf["OutliersSampler"]["scorer"] = "glosh"
    sampler = OutliersSampler(sampling_config=cf)
    sel = sampler.get_patches(catalogue)
    assert list(sel.columns[:3]) == ["patch_id", "split", "sampler"]
    assert sel["sampler"].eq("OutliersSampler").all()
    assert sel["split"].isin(["train", "val", "test"]).all()
    assert len(sel) == cf["target_total_num_patches"]
