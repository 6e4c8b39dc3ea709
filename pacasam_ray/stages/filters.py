"""Row filters and broadcast semi/anti joins (stateless map_batches stages).

Reference semantics reimplemented Ray-Data-first:
- split filter truth table: src/pacasam/connectors/lipac.py:102-138
- boolean-indicator filter + projection: src/pacasam/connectors/connector.py:33-38
- anti-join against an exclusion id set: src/pacasam/connectors/connector.py:40-42

Both join directions broadcast the SMALL side (selection id sets are always
≪ catalogue) via ``ray.put`` once; each task reads the object-store ref and
probes with a vectorized ``pyarrow.compute.is_in`` — no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..catalogue import PATCH_INFO

VALID_SPLITS = ("any", "train", "test")


def split_mask(test_col: pa.ChunkedArray | pa.Array, desired_split: str) -> pa.Array | None:
    """Boolean mask for the reference's split truth table (lipac.py:102-138).

    - any   → all rows
    - test  → test IS TRUE
    - train → test IS NULL OR test IS FALSE
    """
    if desired_split == "any":
        return None
    if desired_split == "test":
        return pc.and_kleene(pc.is_valid(test_col), pc.equal(test_col, True))
    if desired_split == "train":
        return pc.or_kleene(pc.is_null(test_col), pc.equal(test_col, False))
    raise ValueError(f"desired_split must be one of {VALID_SPLITS}, got {desired_split!r}")


def filter_on_split(ds, desired_split: str, test_col: str = "test"):
    """Dataset-level split filter (S2)."""
    if desired_split == "any":
        return ds
    if desired_split not in VALID_SPLITS:
        raise ValueError(f"desired_split must be one of {VALID_SPLITS}, got {desired_split!r}")

    def _f(batch: pa.Table) -> pa.Table:
        mask = split_mask(batch[test_col], desired_split)
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def filter_by_boolean_indicator(ds, descriptor: str, columns: list[str] | None = None):
    """M1: assert bool dtype, keep rows where the descriptor is true, project.

    Reference: connectors/connector.py:33-38 (only booleans may be targeted).
    """
    field = ds.schema().base_schema.field(descriptor)
    if field.type != pa.bool_():
        raise TypeError(
            f"descriptor {descriptor!r} must be boolean, got {field.type} "
            "(reference: connectors/connector.py:35)"
        )
    cols = columns or PATCH_INFO

    def _f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.fill_null(batch[descriptor], False)).select(cols)

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def _as_id_array(ids) -> pa.Array:
    if isinstance(ids, (pa.Array, pa.ChunkedArray)):
        return ids
    return pa.array(np.asarray(list(ids) if not isinstance(ids, np.ndarray) else ids))


def broadcast_membership_filter(ds, ids, key: str = "patch_id", *, keep_members: bool,
                                columns=None):
    """Semi-join (keep_members=True, J2) or anti-join (False, M2) against a
    small id collection, broadcast ONCE via the object store (``ray.put``)
    and probed per batch with ``ray.get`` (zero-copy from plasma) — a
    stateless task stage, so it never starves other pipeline stages."""
    ids_ref = ray.put(np.asarray(list(ids)) if not isinstance(ids, np.ndarray) else ids)

    def _probe(batch: pa.Table) -> pa.Table:
        value_set = _as_id_array(ray.get(ids_ref))
        mask = pc.is_in(batch[key], value_set=value_set)
        if not keep_members:
            mask = pc.invert(mask)
        out = batch.filter(pc.fill_null(mask, False))
        return out.select(columns) if columns else out

    return ds.map_batches(_probe, batch_format="pyarrow", zero_copy_batch=True)


def exclude_ids(ds, ids, key: str = "patch_id", columns=None, **kw):
    """M2 `request_all_other_patches`: drop rows whose key ∈ ids; project."""
    return broadcast_membership_filter(ds, ids, key, keep_members=False,
                                       columns=columns or PATCH_INFO, **kw)


def flag_membership(ds, ids, key: str = "patch_id", flag_col: str = "in_selection"):
    """Append a bool column marking membership of key in the broadcast id set."""
    ids_ref = ray.put(np.asarray(list(ids)) if not isinstance(ids, np.ndarray) else ids)

    def _flag(batch: pa.Table) -> pa.Table:
        value_set = _as_id_array(ray.get(ids_ref))
        mask = pc.fill_null(pc.is_in(batch[key], value_set=value_set), False)
        return batch.append_column(flag_col, mask)

    return ds.map_batches(_flag, batch_format="pyarrow", zero_copy_batch=True)
