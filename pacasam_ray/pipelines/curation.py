"""End-to-end webtext curation — the flagship composite pipeline.

The CCNet/C4/Gopher-lineage production chain as ONE streaming Dataset
plan over (doc_id, source, text):

1. language-ID gate + Gopher quality gate, FUSED into a single actor-pool
   stage (profiles compiled once per actor in ``__init__``; both gates
   reuse the exact standalone kernels from ``functions/text``);
2. exact content dedup — md5 fingerprint per batch, then the single
   key-hash exchange keeping the min-id representative
   (``functions/dedup.dedup_text_exact``);
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
    from ..functions.dedup import dedup_text_exact
    from ..functions.text import token_count
    from ..stages.scan import grouped_prefix_sum

    # autoscaling pool: min=1 so a 4-CPU test session can't starve the
    # upstream read (the fixed-pool deadlock documented in the verify
    # recipe); max sized for a full node so the gate stage is never the
    # parallelism cap at volume
    gated = ds.map_batches(CurateGates, batch_format="pyarrow",
                           concurrency=(1, 16))
    ded = dedup_text_exact(gated)

    def _prep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # same order-key uniqueness bound as token_budget_mix
        if len(ids) and ids.max() >= np.int64(2**31):
            raise ValueError(
                "webtext_curate order key requires doc_id < 2**31; "
                "re-key the corpus or widen the order key to a composite")
        rk = hmix(ids, SALT_CURATE) * np.int64(2**31) + ids % np.int64(2**31)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "source": pc.cast(t["source"], pa.string()),
            "ntok": token_count(t["text"]),
            "rk": pa.array(rk, pa.int64())})

    # the budget scan is two passes; checkpoint the (id, source, ntok, rk)
    # projection so gates + dedup run ONCE, not once per pass (the
    # ccnet_bucket lesson) — text is already projected away, so the
    # checkpoint is 32 bytes/doc, spilling to parquet past the threshold
    from ..stages.partitioning import checkpoint

    prep = checkpoint(ded.map_batches(_prep, batch_format="pyarrow"),
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
