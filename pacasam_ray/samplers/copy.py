"""CopySampler (reference: src/pacasam/samplers/copy.py:5-12)."""

from __future__ import annotations

import pandas as pd

from ..catalogue import PATCH_INFO
from .base import Sampler


class CopySampler(Sampler):
    """Full copy of the catalogue ids: sampler=name, split=None."""

    def get_patches(self, catalogue, **kw) -> pd.DataFrame:
        patches = catalogue.select_columns(PATCH_INFO).to_pandas()
        patches["sampler"] = self.name
        patches["split"] = None
        return patches[self.sampling_schema + ["file_id"]]
