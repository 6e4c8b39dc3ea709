"""Tests for the training-data function suite: dedup, similarity search,
text analysis, multimodal plumbing. Oracle-backed queries are covered by
test_oracle_parity.py; this file covers the seeded/heuristic (rows-only)
operators and the cross-checks between approximate and exact variants."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from conftest import SF_DIR

DOCS = f"{SF_DIR}/documents.parquet"
EMBS = f"{SF_DIR}/embeddings.parquet"


def docs_ds():
    return ray.data.read_parquet(DOCS, columns=["doc_id", "text"])


def embs_ds():
    return ray.data.read_parquet(EMBS, columns=["vec_id", "embedding"])


# --- dedup ------------------------------------------------------------------

def test_minhash_lsh_recall_vs_exact():
    from pacasam_ray.functions.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(docs_ds(), n=3, tau=0.5).to_pandas()
    approx = minhash_lsh_pairs(docs_ds(), tau=0.5).to_pandas()
    ep = set(zip(exact["doc_a"].astype(int), exact["doc_b"].astype(int)))
    ap = set(zip(approx["doc_a"].astype(int), approx["doc_b"].astype(int)))
    assert len(ep) > 0, "test corpus should contain planted near-dups"
    recall = len(ap & ep) / len(ep)
    assert recall >= 0.9, f"minhash recall {recall}"
    # signature estimate within sketch error of true jaccard for true pairs
    est = {(a, b): e for a, b, e in zip(approx["doc_a"].astype(int),
                                        approx["doc_b"].astype(int),
                                        approx["est_jaccard"])}
    for _, r in exact.iterrows():
        key = (int(r["doc_a"]), int(r["doc_b"]))
        if key in est:
            assert abs(est[key] - r["jaccard"]) < 0.25


def test_dedup_fast_fingerprint_matches_md5_path():
    """The vectorized 64-bit fingerprint path must keep exactly the same
    representative ids as the md5 oracle path (same groups, same min-id
    tie-break), and be partition-invariant."""
    import ray.data

    from pacasam_ray.functions.dedup import dedup_text_exact

    rows = [{"doc_id": i, "text": f"document body {i % 37}"}
            for i in range(500)]
    md5_ids = None
    for nblocks in (3, 11):
        ds = ray.data.from_items(rows, override_num_blocks=nblocks)
        fast = sorted(dedup_text_exact(ds, method="fast")
                      .to_pandas()["doc_id"])
        md5 = sorted(dedup_text_exact(ds, method="md5")
                     .to_pandas()["doc_id"])
        assert fast == md5
        assert len(fast) == 37
        if md5_ids is not None:
            assert md5_ids == fast
        md5_ids = fast


def test_minhash_semijoin_prefilter_matches_broadcast(monkeypatch):
    """Forcing the over-cap (distributed semi-join) collision prefilter
    must yield the identical pair set as the broadcast path."""
    from pacasam_ray.functions import dedup as D

    a = D.minhash_lsh_pairs(docs_ds(), tau=0.5).to_pandas()
    monkeypatch.setattr(D, "HOT_BUCKET_BROADCAST_CAP", 0)
    b = D.minhash_lsh_pairs(docs_ds(), tau=0.5).to_pandas()
    ka = sorted(zip(a["doc_a"].astype(int), a["doc_b"].astype(int)))
    kb = sorted(zip(b["doc_a"].astype(int), b["doc_b"].astype(int)))
    assert ka == kb


def test_minhash_partition_invariance():
    from pacasam_ray.functions.dedup import minhash_lsh_pairs

    a = minhash_lsh_pairs(docs_ds(), tau=0.5).to_pandas()
    b = minhash_lsh_pairs(
        docs_ds().repartition(13), tau=0.5
    ).to_pandas()
    ka = sorted(zip(a["doc_a"].astype(int), a["doc_b"].astype(int)))
    kb = sorted(zip(b["doc_a"].astype(int), b["doc_b"].astype(int)))
    assert ka == kb


def test_simhash_banding_is_exact():
    """Pigeonhole: 4 bands / d=3 banded join == brute-force all pairs."""
    from pacasam_ray.functions.dedup import simhash_dataset, simhash_neardup_pairs

    sh = simhash_dataset(docs_ds()).to_pandas()
    h = dict(zip(sh["doc_id"].astype(int), sh["simhash"].astype(int)))
    ids = sorted(h)
    brute = {
        (a, b)
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(h[a] ^ h[b]).count("1") <= 3
    }
    banded = simhash_neardup_pairs(docs_ds(), max_hamming=3).to_pandas()
    got = set(zip(banded["doc_a"].astype(int), banded["doc_b"].astype(int)))
    assert got == brute


def test_dedup_text_removes_planted_duplicates(duck):
    from pacasam_ray.queries import DUP_OFFSET, q_dedup_text

    out = q_dedup_text(SF_DIR).to_pandas()
    n_docs = duck.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert len(out) == n_docs  # half of the doubled corpus survives
    assert (out["doc_id"] < DUP_OFFSET).all()  # min-id reps = originals


# --- similarity -------------------------------------------------------------

def test_embed_lsh_subset_and_recall():
    from pacasam_ray.functions.similarity import embed_neardup, embed_neardup_lsh

    exact = embed_neardup(embs_ds(), tau=0.4, corpus_path=EMBS).to_pandas()
    lsh = embed_neardup_lsh(embs_ds(), tau=0.4).to_pandas()
    ep = set(zip(exact["doc_a"].astype(int), exact["doc_b"].astype(int)))
    lp = set(zip(lsh["doc_a"].astype(int), lsh["doc_b"].astype(int)))
    assert lp <= ep, "LSH must never emit a below-threshold pair (exact verify)"
    assert len(ep) > 0
    assert len(lp & ep) / len(ep) >= 0.5


def test_embed_lsh_join_path_equivalence():
    """The distributed pair-join verify (corpus beyond the object store)
    must produce EXACTLY the broadcast plan's pairs and cosines."""
    from pacasam_ray.functions.similarity import embed_neardup_lsh

    def norm(df):
        return (df.sort_values(["doc_a", "doc_b"])
                  .reset_index(drop=True)[["doc_a", "doc_b", "cos"]]
                  .astype({"doc_a": "int64", "doc_b": "int64"}))

    bc = norm(embed_neardup_lsh(embs_ds(), tau=0.4, side="broadcast").to_pandas())
    jn = norm(embed_neardup_lsh(embs_ds(), tau=0.4, side="join").to_pandas())
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, jn)


def test_neardup_components_transitive():
    """A~B, B~C, D~E ⇒ {A,B,C} labeled min(A), {D,E} labeled min(D);
    partition layout of the edge stream must not matter."""
    from pacasam_ray.functions.dedup import neardup_components

    pairs = pd.DataFrame({"doc_a": [5, 3, 9, 3], "doc_b": [3, 7, 8, 5]})
    for parts in (1, 3):
        ds = ray.data.from_pandas(pairs).repartition(parts)
        comp = neardup_components(ds)
        got = dict(zip(comp["doc_id"], comp["component"]))
        assert got == {3: 3, 5: 3, 7: 3, 8: 8, 9: 8}


def test_ann_topk_batch_invariance():
    """Per-batch pruning must not depend on block layout."""
    from pacasam_ray.functions.similarity import ann_topk, load_query_matrix

    qm = load_query_matrix(EMBS, [0, 1, 2])
    a = ann_topk(embs_ds(), qm, 5)
    b = ann_topk(embs_ds().repartition(11), qm, 5)
    pd.testing.assert_frame_equal(a, b)
    # forced tree-reduce over a 64-block input: the merge must stay exact
    # when the driver pull goes through the repartition + re-prune level
    c = ann_topk(embs_ds().repartition(64), qm, 5, force_tree=True)
    pd.testing.assert_frame_equal(a, c)


def test_ann_topk_self_match():
    from pacasam_ray.functions.similarity import ann_topk, load_query_matrix

    qm = load_query_matrix(EMBS, [7])
    out = ann_topk(embs_ds(), qm, 3)
    top = out[out["rank"] == 1].iloc[0]
    assert int(top["vec_id"]) == 7 and top["cos"] == 1.0


def test_ann_ivf_recall_and_invariance():
    """IVF scale path: ≥80 % recall@10 vs brute force; self-match survives
    probing (a query's own bucket is always its closest); block-layout
    invariant."""
    from pacasam_ray.functions.similarity import (
        ann_topk, ann_topk_ivf, fit_ivf_centroids, load_query_matrix)

    qids = [0, 1, 2, 3, 4]
    qm = load_query_matrix(EMBS, qids)
    cent = fit_ivf_centroids(embs_ds(), nlist=16, sample_size=50_000)
    exact = ann_topk(embs_ds(), qm, 10)
    approx = ann_topk_ivf(embs_ds(), qm, 10, cent, nprobe=6)

    hits = 0
    for qi in range(len(qids)):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        hits += len(e & a)
    assert hits / len(exact) >= 0.8

    top = approx[approx["rank"] == 1]
    assert list(top["vec_id"]) == qids
    assert (top["cos"] >= 1.0 - 1e-12).all()  # sqrt(n)*sqrt(n) can be 1 ulp off n

    again = ann_topk_ivf(embs_ds().repartition(11), qm, 10, cent, nprobe=6)
    pd.testing.assert_frame_equal(approx, again)


# --- text analysis ----------------------------------------------------------

def test_lang_id_schema_and_domain():
    from pacasam_ray.queries import q_lang_id

    out = q_lang_id(SF_DIR).to_pandas()
    assert set(out.columns) == {"doc_id", "lang_pred"}
    assert out["lang_pred"].isin(["en", "fr", "de", "es", "zh"]).all()
    assert len(out) == 500


def test_winnowing_fingerprint_properties():
    from pacasam_ray.functions.text import winnowing_fingerprint

    a = winnowing_fingerprint("the quick brown fox jumps over the lazy dog")
    b = winnowing_fingerprint("the quick brown fox jumps over the lazy dog")
    assert a == b and len(a) > 0
    c = winnowing_fingerprint("a completely different sentence here")
    assert a != c
    assert winnowing_fingerprint("abc", k=5) == []


# --- multimodal -------------------------------------------------------------

def test_image_decode_plumbing():
    from pacasam_ray.queries import _media
    from pacasam_ray.functions.multimodal import decode_images

    out = decode_images(_media(SF_DIR), thumb=8).to_pandas()
    assert set(out.columns) == {"doc_id", "mean_px", "std_px", "thumb"}
    assert (out["doc_id"] % 3 == 0).all()  # only 'image' rows decoded
    assert all(len(t) == 64 for t in out["thumb"])  # 8x8 uint8 thumbnails
    assert (out["mean_px"] > 0).all()


def test_real_decoder_probes_pil():
    """fake=False uses PIL when importable, raises otherwise — both
    branches asserted so the test is meaningful in either environment."""
    from pacasam_ray.functions import multimodal as mm

    if mm._PIL_Image is None:
        with pytest.raises(NotImplementedError):
            mm.ImageDecoder(fake=False).decode(b"\x89PNG")
    else:  # pragma: no cover - PIL absent in this container
        import io

        import numpy as np

        buf = io.BytesIO()
        mm._PIL_Image.fromarray(
            np.arange(64, dtype=np.uint8).reshape(8, 8)).save(buf, "PNG")
        img = mm.ImageDecoder(fake=False).decode(buf.getvalue())
        assert img.shape == (8, 8) and img.dtype == np.uint8


def test_frame_sample_bytes_roundtrip():
    """Frame payload bytes must be exact slices of the source payload."""
    from pacasam_ray.queries import _media
    from pacasam_ray.functions.multimodal import FRAME_BYTES, frame_sample

    media = _media(SF_DIR).to_pandas().set_index("doc_id")
    frames = frame_sample(_media(SF_DIR), stride=4).to_pandas()
    assert len(frames) > 0
    sample = frames.head(50)
    for _, r in sample.iterrows():
        payload = media.loc[int(r["doc_id"]), "payload"]
        fi = int(r["frame_idx"])
        assert r["frame"] == payload[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]


def test_ngram_jaccard_df_cap_drops_stop_grams_keeps_neardups():
    """Planted corpus: every doc shares boilerplate (grams above any small
    df-cap); doc pairs (2i, 2i+1) additionally share rare grams. The capped
    join must (a) still find every planted near-dup pair, and (b) actually
    run on fewer grams than the exact join (the boilerplate is dropped)."""
    from ray.data.aggregate import Count

    from pacasam_ray.functions.dedup import explode_ngrams, ngram_jaccard_pairs

    boiler = "terms of service apply to all visitors of this site"
    rows = []
    for i in range(20):
        rare = f"unique topic {i // 2} alpha beta gamma delta epsilon zeta"
        rows.append({"doc_id": 2 * i, "text": f"{boiler} {rare}"})
        rows.append({"doc_id": 2 * i + 1, "text": f"{boiler} {rare} extra"})
    # double each doc so the corpus isn't trivially tiny per block
    ds = ray.data.from_items(rows, override_num_blocks=4)

    cap = 5
    exact = ngram_jaccard_pairs(ds, n=3, tau=0.3).to_pandas()
    capped = ngram_jaccard_pairs(ds, n=3, tau=0.3, max_doc_freq=cap).to_pandas()

    planted = {(4 * j, 4 * j + 1) for j in range(10)} | {
        (4 * j + 2, 4 * j + 3) for j in range(10)
    }
    got_exact = set(zip(exact.doc_a, exact.doc_b))
    got_capped = set(zip(capped.doc_a, capped.doc_b))
    # exact finds the planted pairs; capped keeps them (recall floor = 1.0
    # here because the planted overlap is rare-gram overlap)
    assert planted <= got_exact
    assert planted <= got_capped
    # the boilerplate grams really were dropped: with cap=5 and 40 docs all
    # sharing the boilerplate, cross-topic pairs (joined only via
    # boilerplate) disappear
    cross_topic = {p for p in got_capped if p[0] // 4 != p[1] // 4}
    assert not cross_topic
    # and the capped gram universe is strictly smaller
    grams = explode_ngrams(ds, n=3)
    df = grams.groupby("gram").aggregate(Count(alias_name="df"))
    n_hot = df.filter(expr=f"df > {cap}").count()
    assert n_hot > 0


def test_distributed_components_match_driver_union_find():
    """Label propagation must equal the driver union-find labeling on a
    random multi-component graph (and on a long chain, where convergence
    needs multiple propagation rounds, not just the init round)."""
    from pacasam_ray.functions.dedup import (
        neardup_components,
        neardup_components_distributed,
    )

    rng = np.random.default_rng(3)
    # 15 random components + a 12-vertex chain (diameter stress)
    edges = []
    base = 0
    for c in range(15):
        size = int(rng.integers(2, 7))
        verts = list(range(base, base + size))
        for v in verts[1:]:
            edges.append({"doc_a": int(rng.choice(verts[: verts.index(v)])),
                          "doc_b": v})
        base += size + 3
    chain = list(range(1000, 1012))
    edges += [{"doc_a": b, "doc_b": a} for a, b in zip(chain, chain[1:])]
    rng.shuffle(edges)

    pairs = ray.data.from_items(edges, override_num_blocks=6)
    want = neardup_components(pairs)
    got = neardup_components_distributed(pairs)
    pd.testing.assert_frame_equal(got, want)
    # transitivity on the chain: one component labeled by its min id
    chain_lab = got[got.doc_id.isin(chain)]["component"].unique()
    assert list(chain_lab) == [1000]


def test_hll_error_bound_and_merge_invariance():
    """HLL estimate within the m=64 error regime on a 20k-cardinality
    input, and invariant to how rows are split across blocks (register
    merge is a max — associative and commutative)."""
    from pacasam_ray.functions.dedup import distinct_hll

    rows = [{"text": f"document body number {i} padding words"} for i in range(20_000)]
    est1 = distinct_hll(ray.data.from_items(rows, override_num_blocks=3))["distinct_est"][0]
    est2 = distinct_hll(ray.data.from_items(rows, override_num_blocks=17))["distinct_est"][0]
    assert est1 == est2  # partition invariance, bit-exact
    assert abs(est1 - 20_000) / 20_000 < 0.35  # ~2.7 sigma at m=64


def test_misra_gries_guarantees(ray_session):
    """MG heavy-hitter summary: bounded counters, explicit error
    certificate, and the cannot-lose-a-heavy-hitter guarantee — all
    holding under different block boundaries (MG estimates are
    partition-dependent; the BOUNDS are not)."""
    import ray

    from pacasam_ray.functions.sketches import misra_gries_terms

    rng = np.random.RandomState(7)
    # heavy term = 30% of mass, 400 distinct noise terms >> k
    toks = ["heavy"] * 3000 + [f"n{i}" for i in rng.randint(0, 400, 7000)]
    rng.shuffle(toks)
    docs = pd.DataFrame({
        "doc_id": np.arange(500),
        "text": [" ".join(toks[i * 20:(i + 1) * 20]) for i in range(500)],
    })
    true = pd.Series(toks).value_counts()
    n_total = len(toks)

    for nblocks in (1, 7):
        ds = ray.data.from_pandas(docs).repartition(nblocks)
        summary, err = misra_gries_terms(ds, k=16)
        assert len(summary) <= 16
        est = dict(zip(summary["term"], summary["cnt"]))
        # certificate: underestimates only, by at most err
        for t, e in est.items():
            assert e <= true[t] <= e + err, (t, e, true[t], err)
        # any term heavier than the certificate must be present
        for t, c in true.items():
            if c > err:
                assert t in est, (t, c, err)
        assert "heavy" in est and err < 0.3 * n_total


def test_streaming_dedup_first_seen(ray_session):
    """Sharded-actor streaming dedup: first occurrence wins across AND
    within micro-batches, the kept set equals batch dedup, and the
    result is invariant to shard count (each key's range serializes)."""
    import pyarrow as pa

    from pacasam_ray.stages.streamdedup import StreamingDeduper

    b1 = pa.table({"url": ["a", "b", "a", "c"], "v": [1, 2, 3, 4]})
    b2 = pa.table({"url": ["b", "d", "c", "e"], "v": [5, 6, 7, 8]})
    for shards in (1, 4):
        dd = StreamingDeduper(key_col="url", num_shards=shards)
        out1, out2 = dd.process(b1), dd.process(b2)
        assert out1.to_pydict() == {"url": ["a", "b", "c"], "v": [1, 2, 4]}
        assert out2.to_pydict() == {"url": ["d", "e"], "v": [6, 8]}
        assert dd.index_size() == 5


def test_dedup_stream_iter_matches_batch_dedup(ray_session):
    """Draining a Dataset through the streaming index keeps exactly one
    row per key — the same key set the at-rest dedup computes."""
    import ray

    from pacasam_ray.stages.streamdedup import dedup_stream_iter

    df = pd.DataFrame({
        "url": [f"u{i % 37}" for i in range(500)],
        "payload": np.arange(500),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    out = pd.concat(
        [t.to_pandas() for t in dedup_stream_iter(ds, "url", num_shards=3,
                                                  batch_size=64)],
        ignore_index=True)
    assert len(out) == 37
    assert sorted(out["url"]) == sorted(df["url"].unique())


def test_kmeans_train_distributed_invariance_and_recovery(ray_session):
    """Full-corpus Lloyd: (1) bit-identical centroids at different block
    layouts (exact integer M-step partials), (2) planted blobs recovered
    (every blob maps to one distinct centroid)."""
    import pyarrow as pa
    import ray

    from pacasam_ray.functions.similarity import kmeans_train_distributed

    rng = np.random.RandomState(3)
    means = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]])
    vecs = np.concatenate([
        m + rng.normal(0, 0.05, size=(60, 4)) for m in means
    ]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    })

    cents = []
    for nblocks in (2, 7):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        cents.append(kmeans_train_distributed(ds, k=3, iters=8))
    assert np.array_equal(cents[0], cents[1])  # bit-identical, not just close

    # blob recovery: each true mean's nearest centroid is distinct & close
    c = cents[0]
    nearest = [(np.abs(c - m / np.linalg.norm(m)).sum(axis=1)).argmin()
               for m in means]
    assert len(set(nearest)) == 3
    for m, ci in zip(means, nearest):
        assert np.dot(c[ci], m / np.linalg.norm(m)) > 0.95
