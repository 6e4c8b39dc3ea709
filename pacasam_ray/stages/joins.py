"""Empty-safe wrapper around ``Dataset.join``.

Two Ray 2.49 hash-shuffle defects make a naive ``left.join(right)`` crash
whenever a join input CAN be empty (a selective filter, an aggregate over a
filtered stream):

1. join schemas are broadcast to the aggregator actors only with the FIRST
   submitted block of each input, and zero-row blocks return early without
   broadcasting (``hash_shuffle.py:223`` vs ``:584``) — so an empty first
   block leaves every empty partition schema-less and pyarrow dies with
   "No match ... for key field reference";
2. a FULLY empty input has no schema to broadcast at all, so the same
   crash is deterministic, not a race.

``safe_join`` fixes both: it scrubs zero-row blocks from each side (so a
non-empty side always broadcasts its schema with its first block) and,
when a side is ENTIRELY empty, synthesizes the join's degenerate result
directly from the schemas — no shuffle at all, which is also faster.

Output schema mirrors Ray/pyarrow ``coalesce_keys=True``: left columns
followed by the right side's non-key columns (right keys coalesce into the
left key names).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .partitioning import pick_partitions, scrub_empty_blocks

_SUPPORTED = ("inner", "left_outer", "full_outer", "left_semi", "left_anti")


def _schema_of(ds, floor: pa.Schema | None) -> pa.Schema:
    try:
        base = ds.schema(fetch_if_missing=True).base_schema
        if base is not None and len(base.names):
            return base
    except Exception:
        pass
    if floor is None:
        raise ValueError(
            "safe_join: side is empty AND schema-less; pass a schema floor")
    return floor


def _empty_table(schema: pa.Schema) -> pa.Table:
    return pa.table({f.name: pa.array([], type=f.type) for f in schema},
                    schema=schema)


def _with_null_columns(ds, add_fields: list[pa.Field]):
    """Append typed all-null columns to every row of ``ds``."""

    def _add(t: pa.Table) -> pa.Table:
        for f in add_fields:
            t = t.append_column(f.name, pa.nulls(t.num_rows, type=f.type))
        return t

    return ds.map_batches(_add, batch_format="pyarrow", zero_copy_batch=True)


def safe_join(left, right, *, join_type: str, on: tuple, right_on=None,
              num_partitions: int | None = None,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None,
              scrub_left: bool = True, scrub_right: bool = True):
    """``left.join(right)`` that tolerates empty / empty-blocked inputs.

    ``left_schema`` / ``right_schema`` are only consulted when that side is
    empty AND carries no schema (e.g. an aggregate over an empty stream) —
    pass the expected schema so the degenerate result is still typed.

    ``scrub_left=False`` / ``scrub_right=False`` skip the materializing
    scrub for a side that provably carries no zero-row blocks — a plain
    ``read_parquet`` with at most a column projection (readers never emit
    empty blocks for non-empty files, and ``count()`` on it is
    metadata-only). Leave True for anything filter/aggregate-derived: the
    scrub's materialize is the price of dodging the Ray 2.49 schema
    broadcast bug, and is the only extra pass this wrapper adds.
    """
    import ray as _ray

    if join_type not in _SUPPORTED:
        raise ValueError(f"safe_join: unsupported join_type {join_type!r}")
    on = tuple(on)
    r_on = tuple(right_on) if right_on is not None else on

    if scrub_left:
        left = scrub_empty_blocks(left)
    if scrub_right:
        right = scrub_empty_blocks(right)
    nl, nr = left.count(), right.count()

    if nl and nr:
        if num_partitions is None:
            num_partitions = pick_partitions(left, right)
        kw = {"right_on": r_on} if right_on is not None else {}
        return left.join(right, join_type=join_type,
                         num_partitions=num_partitions, on=on, **kw)

    ls = _schema_of(left, left_schema) if nl == 0 else \
        left.schema(fetch_if_missing=True).base_schema
    rs = _schema_of(right, right_schema) if nr == 0 else \
        right.schema(fetch_if_missing=True).base_schema
    r_nonkey = [rs.field(n) for n in rs.names if n not in r_on]
    joined_schema = pa.schema(list(ls) + r_nonkey)

    if join_type in ("left_semi",):
        # empty either side -> no left row has a match
        return _ray.data.from_arrow([_empty_table(ls)])
    if join_type == "left_anti":
        # empty right -> every left row survives; empty left -> nothing
        return left if nr == 0 and nl else _ray.data.from_arrow([_empty_table(ls)])
    if join_type == "inner":
        return _ray.data.from_arrow([_empty_table(joined_schema)])
    if join_type == "left_outer":
        if nl == 0:
            return _ray.data.from_arrow([_empty_table(joined_schema)])
        return _with_null_columns(left, r_nonkey)
    # full_outer
    if nl == 0 and nr == 0:
        return _ray.data.from_arrow([_empty_table(joined_schema)])
    if nr == 0:
        return _with_null_columns(left, r_nonkey)

    # left empty, right non-empty: right keys surface under the LEFT key
    # names (coalesce), left non-key columns become nulls
    key_map = dict(zip(r_on, on))

    def _promote(t: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array] = {}
        for name in ls.names:
            if name in on:
                src = t[key_map_inv[name]]
                cols[name] = src.combine_chunks() if isinstance(
                    src, pa.ChunkedArray) else src
            else:
                cols[name] = pa.nulls(t.num_rows, type=ls.field(name).type)
        for f in r_nonkey:
            src = t[f.name]
            cols[f.name] = src.combine_chunks() if isinstance(
                src, pa.ChunkedArray) else src
        return pa.table(cols, schema=joined_schema)

    key_map_inv = {v: k for k, v in key_map.items()}
    return right.map_batches(_promote, batch_format="pyarrow")
