"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in pacasam_ray) calls ray.init/ray.shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001: pages → catalogue (geocode + tile-assign
    + descriptors) → spatial-stratified sampling → enriched selection."""
    from pacasam_ray.pipelines.sampling import run_sampling

    return run_sampling("/root/testdata/sf0.001", "SpatialSampler")


def queries() -> dict[str, Callable[[str], Any]]:
    from pacasam_ray.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from pacasam_ray.queries import build_oracle_sql

    return build_oracle_sql()
