"""CopySampler (reference: src/pacasam/samplers/copy.py:5-12)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..catalogue import PATCH_INFO
from .base import Sampler


class CopySampler(Sampler):
    """Full copy of the catalogue ids: sampler=name, split=None.

    Unlike every other sampler, the selection here is BY DEFINITION
    corpus-sized, so the driver-side pandas contract (fine at real
    sampling ratios) breaks at 100 TB. ``get_patches_dataset`` is the
    Dataset-native path: stamp the schema columns in a ``map_batches``
    and keep streaming — ``run_sampling`` detects it and skips both the
    driver round-trip and the broadcast join-back."""

    dataset_native = True

    def get_patches(self, catalogue, **kw) -> pd.DataFrame:
        patches = catalogue.select_columns(PATCH_INFO).to_pandas()
        patches["sampler"] = self.name
        patches["split"] = None
        return patches[self.sampling_schema + ["file_id"]]

    def get_patches_dataset(self, catalogue, **kw):
        name = self.name

        def _stamp(t: pa.Table) -> pa.Table:
            t = t.append_column("split", pa.nulls(t.num_rows, pa.string()))
            return t.append_column("sampler", pa.array([name] * t.num_rows))

        return catalogue.map_batches(_stamp, batch_format="pyarrow",
                                     zero_copy_batch=True)
