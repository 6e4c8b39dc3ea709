"""Sources for the engine's authoritative input table: Common-Crawl-style pages.

Input shape (BASELINE.json input_hint / FIXTURES.md F1):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Two deterministic sources:
- :func:`synthetic_pages` — the analog of the reference's SyntheticConnector
  (src/pacasam/connectors/synthetic.py:34-113): a seeded generator expressed
  as ``ray.data.range(n).map_batches`` so generation itself is distributed.
- :func:`pages_from_documents` — derives the page table from the driver's
  ``documents`` parquet (doc_id, text, lang, source, n_chars), embedding the
  doc_id in the url tail so SQL oracles can recover the key with
  ``CAST(substr(url, -9) AS BIGINT)``.

The per-row invariant (BASELINE.json): the ``text`` payload embedded into
``html`` must extract back byte-identical per url.
"""

from __future__ import annotations

import numpy as np
from ..io import read_parquet_sized
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..hashing import hmix

HTML_PREFIX = b"<html><head><meta charset=\"utf-8\"></head><body><p>"
HTML_SUFFIX = b"</p></body></html>"
BASE_EPOCH_US = 1_640_995_200_000_000  # 2022-01-01T00:00:00Z in microseconds
TS_STEP_US = 1_000_000  # 1 s per row (monotone warc_ts)

LANGS = ["en", "fr", "de", "es", "zh"]
_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "stream filter customer data group row value batch query line slow spark"
).split()


def make_url(ids: np.ndarray, n_sites: int = 20) -> pa.Array:
    site = pa.compute.cast(pa.array(ids % n_sites), pa.string())
    tail = pa.array([f"{i:09d}" for i in ids.tolist()], type=pa.string())
    return pc.binary_join_element_wise(
        pa.array(["https://site"] * len(ids)), site, pa.array(["/p/"] * len(ids)), tail, ""
    )


def wrap_html(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """text → html bytes embedding the payload (deterministic byte layout)."""
    t = pc.cast(text, pa.binary())
    n = len(t)
    return pc.binary_join_element_wise(
        pa.array([HTML_PREFIX] * n, type=pa.binary()),
        t,
        pa.array([HTML_SUFFIX] * n, type=pa.binary()),
        b"",
    )


def extract_text_from_html(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """The extraction op (E2 analog): slice the payload bytes back out of html.

    Must be byte-identical to the original text per url (north-rule invariant).
    Vectorized: a single Arrow binary_slice kernel with fixed start and
    negative (from-end) stop — no Python row loop.
    """
    return pc.binary_slice(
        pc.cast(html, pa.binary()), start=len(HTML_PREFIX), stop=-len(HTML_SUFFIX)
    )


def _gen_text(ids: np.ndarray) -> list[str]:
    """Deterministic pseudo-text per id (hash-seeded word sequence).

    Vectorized: one (n_rows × max_words) hash matrix, masked per-row length.
    """
    max_words = 64
    n_words = 8 + (hmix(ids, 101) % 56)
    grid = ids[:, None] * np.int64(131) + np.arange(max_words, dtype=np.int64)[None, :]
    word_idx = (hmix(grid.ravel(), 103) % len(_WORDS)).reshape(len(ids), max_words)
    words = np.array(_WORDS, dtype=object)
    return [
        " ".join(words[word_idx[r, : n_words[r]]]) for r in range(len(ids))
    ]


def synthetic_pages(n: int = 10_000, *, override_num_blocks: int | None = None) -> ray.data.Dataset:
    """Distributed deterministic page-table generator (S3 analog)."""

    def _make(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.int64)
        text = pa.array(_gen_text(ids), type=pa.string())
        lang = pa.array([LANGS[j] for j in (hmix(ids, 105) % len(LANGS)).tolist()])
        return pa.table(
            {
                "url": make_url(ids),
                "warc_ts": pa.array(BASE_EPOCH_US + ids * TS_STEP_US, type=pa.timestamp("us")),
                "html": wrap_html(text),
                "text": text,
                "lang": lang,
                "doc_id": pa.array(ids),
            }
        )

    kw = {"override_num_blocks": override_num_blocks} if override_num_blocks else {}
    return ray.data.range(n, **kw).map_batches(_make, batch_format="pyarrow")


def pages_from_documents(sf_dir: str) -> ray.data.Dataset:
    """documents.parquet → page table (url embeds doc_id; html wraps text)."""
    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def _to_pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        text = batch["text"]
        return pa.table(
            {
                "url": make_url(ids),
                "warc_ts": pa.array(BASE_EPOCH_US + ids * TS_STEP_US, type=pa.timestamp("us")),
                "html": wrap_html(text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text),
                "text": batch["text"],
                "lang": batch["lang"],
                "doc_id": pa.array(ids),
            }
        )

    return ds.map_batches(_to_pages, batch_format="pyarrow", zero_copy_batch=True)
