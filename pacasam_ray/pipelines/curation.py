"""End-to-end webtext curation — the flagship composite pipeline.

The CCNet/C4/Gopher-lineage production chain as ONE streaming Dataset
plan over (doc_id, source, text):

1. language-ID gate + Gopher quality gate, FUSED into a single actor-pool
   stage (profiles compiled once per actor in ``__init__``; both gates
   reuse the exact standalone kernels from ``functions/text``);
2. exact content dedup — md5 fingerprint, token count and order key in
   one pre-exchange pass (text never enters the shuffle; ~60 B/row move),
   then the single key-hash exchange keeping the min-id representative
   (``stages/dedup.dedup_exact_prehashed``);
3. per-source token-budget realization — deterministic hash-rank order +
   the two-pass distributed prefix-sum scan (``stages/scan``), keeping
   documents until each source's budget line is crossed.

Scale shape (100 TB): one narrow gated read pass, the dedup's one key
exchange (text projected away before it), the scan's two passes; nothing
corpus-sized reaches the driver. The registry twin ``webtext_curate``
(queries.py) value-checks every stage of this chain against one composed
DuckDB oracle, so the e2e pipeline a real user would ship is
oracle-verified end to end, not just stage by stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import hmix

CURATE_LANG = "en"     # language gate
CURATE_BUDGET = 800    # per-source curated token budget
SALT_CURATE = 11700    # hmix salt for the curated-order key


class CurateGates:
    """Both document gates in one actor pass: LangId state built once per
    actor; each batch is filtered to CURATE_LANG then to Gopher ``kept``."""

    def __init__(self):
        from ..functions.text import LangId

        self._lang = LangId()

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.text import gopher_filter

        lp = self._lang(t)[self._lang.out_col]
        t = t.filter(pc.equal(lp, CURATE_LANG))
        if t.num_rows:
            t = t.filter(gopher_filter(t)["kept"])
        return t.select(["doc_id", "source", "text"])


def webtext_curate_pipeline(ds):
    """(doc_id, source, text) Dataset → curated (doc_id, source, ntok),
    fully STREAMING (consume with write_parquet / iter_batches; the
    registry wrapper applies ``schema_floor`` for its bounded driver-side
    result, which costs a materialization this function never forces)."""
    from ..functions.text import token_count
    from ..stages.scan import grouped_prefix_sum

    # fixed pool sized to HALF the session CPUs: a full-width fixed pool
    # deadlocks a small test session (starves the upstream read — the
    # verify-recipe gotcha) and a (1, 16) autoscaling pool ramps too
    # slowly to matter on a 10-second leg (measured 8.9 s vs 4.0 s fixed
    # at 2M docs/32 cpus); half-width leaves the read + downstream ops
    # headroom at ANY session size, 4-CPU pytest included
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 4)) \
        if _ray.is_initialized() else 4
    gated = ds.map_batches(CurateGates, batch_format="pyarrow",
                           concurrency=max(2, cpus // 2))

    def _fp_prep(t: pa.Table) -> pa.Table:
        # fingerprint + token count + order key in ONE pass over the gated
        # text, BEFORE the dedup exchange: ntok and rk are row-local, and
        # the representative dedup keeps is a whole row, so computing them
        # pre-dedup is value-identical to computing them on the survivor —
        # but the shuffle then moves (id, source, ntok, rk, md5) ≈ 60 B/row
        # instead of the full text (measured: the text-through-the-exchange
        # plan was ~8 s of the 24 s leg at 2M docs)
        import hashlib

        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # same order-key uniqueness bound as token_budget_mix
        if len(ids) and ids.max() >= np.int64(2**31):
            raise ValueError(
                "webtext_curate order key requires doc_id < 2**31; "
                "re-key the corpus or widen the order key to a composite")
        rk = hmix(ids, SALT_CURATE) * np.int64(2**31) + ids % np.int64(2**31)
        fps = pa.array([hashlib.md5(x.encode()).hexdigest()
                        for x in t["text"].to_pylist()])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "source": pc.cast(t["source"], pa.string()),
            "ntok": token_count(t["text"]),
            "rk": pa.array(rk, pa.int64()),
            "content_key": fps})

    from ..stages.dedup import dedup_exact_prehashed

    ded = dedup_exact_prehashed(
        gated.map_batches(_fp_prep, batch_format="pyarrow"),
        "content_key", "doc_id")

    # the budget scan is two passes; checkpoint the (id, source, ntok, rk)
    # projection so gates + dedup run ONCE, not once per pass (the
    # ccnet_bucket lesson) — text never entered the exchange, so the
    # checkpoint is 32 bytes/doc, spilling to parquet past the threshold
    from ..stages.partitioning import checkpoint

    prep = checkpoint(
        ded.map_batches(lambda t: t.drop_columns(["content_key"]),
                        batch_format="pyarrow"),
        "curate_prep")
    scanned = grouped_prefix_sum(prep, "source", "rk", "ntok",
                                 out_col="__pre")

    def _keep(t: pa.Table) -> pa.Table:
        pre = t["__pre"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(pre < CURATE_BUDGET)) \
                .select(["doc_id", "source", "ntok"])

    return scanned.map_batches(_keep, batch_format="pyarrow")


def curate_empty_frame() -> pd.DataFrame:
    """The TYPED empty result frame, for schema_floor at the driver edge."""
    return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                         "source": pd.Series(dtype=object),
                         "ntok": pd.Series(dtype="int64")})
