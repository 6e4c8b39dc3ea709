"""Sampler suite (reference: src/pacasam/samplers/*).

Each sampler consumes a catalogue ``ray.data.Dataset`` and returns a SMALL
selection table (pandas DataFrame with the fixed sampling schema
``[patch_id, split, sampler]``, reference src/pacasam/samplers/sampler.py:17-23).
Heavy work (filters, stratified groupbys, FPS, scoring) runs as Ray Data
pipelines; only id-level selections are materialized driver-side — they are
bounded by the sampling target, exactly like the reference's driver-held
selections (SURVEY.md §2.8).
"""

from .base import SAMPLING_SCHEMA, Sampler
from .random import RandomSampler
from .spatial import SpatialSampler
from .copy import CopySampler
from .targetted import TargettedSampler
from .diversity import DiversitySampler
from .outliers import OutliersSampler
from .triple import TripleSampler

SAMPLERS_LIBRARY = {
    cls.__name__: cls
    for cls in (
        RandomSampler,
        SpatialSampler,
        CopySampler,
        TargettedSampler,
        DiversitySampler,
        OutliersSampler,
        TripleSampler,
    )
}
