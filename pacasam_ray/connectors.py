"""Connector registry — the engine's data-source abstraction.

Reference surface (src/pacasam/connectors/): an abstract ``Connector``
holding the patch catalogue (connector.py:19-31) with concrete
implementations selected by CLI string via ``CONNECTORS_LIBRARY``
(utils.py:55-63):

  - ``LiPaCConnector``    chunked PostGIS read + sort + dedup (lipac.py:73-94)
  - ``SyntheticConnector`` deterministic generated catalogue (synthetic.py:34-113)
  - ``GeopandasConnector`` re-read a previous sampling file, dropping stale
                           split/sampler columns (geopandas.py:9-31)

Engine equivalents (all return a lazy ``ray.data.Dataset`` catalogue —
never a driver-materialized frame):

  - ``ParquetConnector``   reads ``documents.parquet`` with column pruning
                           (S1: only the columns the catalogue derivation
                           needs leave storage) and derives the patch
                           catalogue via one fused ``map_batches``.
  - ``SyntheticConnector`` distributed seeded page generator (S3) feeding
                           the same derivation.
  - ``ParquetSamplingConnector`` re-reads a prior sampling parquet and drops
                           ``split``/``sampler`` so it can be re-sampled (S4).

Split filtering (S2, lipac.py:102-138) is applied lazily by every connector
through ``stages.filters.filter_on_split``.
"""

from __future__ import annotations

import logging

import pandas as pd
import pyarrow as pa
import ray
from .io import read_parquet_sized

from .catalogue import build_catalogue
from .sources.pages import pages_from_documents, synthetic_pages
from .stages.filters import filter_on_split

log = logging.getLogger("pacasam_ray")

#: the projection used by sampler id-requests (connector.py:16)
PATCH_INFO = ["patch_id", "file_id"]


class Connector:
    """Abstract base (reference: connectors/connector.py:19-51)."""

    def __init__(self, split: str = "any", **kwargs):
        self.split = split

    def get_catalogue(self) -> ray.data.Dataset:
        raise NotImplementedError

    def extract(self, selection: pd.DataFrame) -> ray.data.Dataset:
        """J1: enrich a selection by inner join back to the catalogue
        (connector.py:48-51), broadcast-small-side — the selection ships
        once via the object store; each catalogue batch probes it with an
        Arrow hash join; no shuffle."""
        from .pipelines.sampling import extract_selection

        return extract_selection(self.get_catalogue(), selection)


class ParquetConnector(Connector):
    """S1 analog of LiPaCConnector: Parquet catalogue source with pruned
    columns; dedup/sort are unnecessary for the deterministic input but the
    split filter (S2) applies."""

    def __init__(self, db_path: str, split: str = "any", **kwargs):
        super().__init__(split=split)
        self.db_path = db_path

    def get_catalogue(self) -> ray.data.Dataset:
        ds = read_parquet_sized(
            f"{self.db_path}/documents.parquet", columns=["doc_id", "n_chars", "lang"]
        )
        cat = build_catalogue(ds)
        if self.split != "any":
            cat = filter_on_split(cat, self.split)
        return cat


class SyntheticConnector(Connector):
    """S3: deterministic distributed synthetic catalogue
    (synthetic.py:34-113). ``db_size`` mirrors Synthetic.yml:16."""

    def __init__(self, db_size: int = 10_000, split: str = "any", **kwargs):
        super().__init__(split=split)
        self.db_size = int(db_size)

    def get_catalogue(self) -> ray.data.Dataset:
        cat = build_catalogue(synthetic_pages(self.db_size))
        if self.split != "any":
            cat = filter_on_split(cat, self.split)
        return cat


class ParquetSamplingConnector(Connector):
    """S4 analog of GeopandasConnector: re-read a previous sampling output,
    dropping stale ``split``/``sampler`` so the rows can be re-sampled
    (geopandas.py:24-29)."""

    def __init__(self, db_path: str, split: str = "any", **kwargs):
        super().__init__(split=split)
        self.db_path = db_path

    def get_catalogue(self) -> ray.data.Dataset:
        ds = read_parquet_sized(self.db_path)
        drop = [c for c in ("split", "sampler") if c in ds.schema().names]
        if drop:
            ds = ds.drop_columns(drop)
        if self.split != "any":
            ds = filter_on_split(ds, self.split)
        return ds


CONNECTORS_LIBRARY = {
    "ParquetConnector": ParquetConnector,
    "SyntheticConnector": SyntheticConnector,
    "ParquetSamplingConnector": ParquetSamplingConnector,
}


def attach_pages(selection_ids: pd.DataFrame, sf_dir: str) -> ray.data.Dataset:
    """Join a small selection (patch_id, split[, sampler]) back to the full
    page table to recover payload columns (url, html) for extraction.

    The sampling path deliberately never carries ``html`` (SURVEY §7.4.7:
    project early, re-join late by key so shuffles move only ids+features);
    this is the late re-join: broadcast the id table once, probe per batch.
    """
    cols = [c for c in ("patch_id", "split", "sampler") if c in selection_ids.columns]
    sel_tbl = pa.Table.from_pandas(selection_ids[cols], preserve_index=False)
    sel_ref = ray.put(sel_tbl)

    pages = pages_from_documents(sf_dir)

    def _join(batch: pa.Table) -> pa.Table:
        sel = ray.get(sel_ref)
        batch = batch.append_column("patch_id", batch["doc_id"])
        joined = batch.join(sel, keys="patch_id", join_type="inner")
        from .catalogue import add_catalogue_columns

        return add_catalogue_columns(joined)

    return pages.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)
