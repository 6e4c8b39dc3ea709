"""Size-derived shuffle partition counts.

Every hash shuffle (``Dataset.join``, ``groupby(num_partitions=...)``)
needs a partition count. A constant is wrong at both ends: too many
partitions at small scale pays Ray's fixed ~2.5 s/shuffle overhead per
wave of tiny reducers, too few at 100 TB turns each reducer into a
multi-GB straggler. We derive the count from an *estimate* of the input
bytes so the same call site is right at sf0.001 and at 1000x.

The estimate is metadata-only and NEVER triggers execution: Ray infers
in-memory size for read ops from parquet metadata
(``LogicalOperator.infer_metadata``); for transformed datasets we walk up
the logical DAG to the nearest op with a known size, which upper-bounds
the shuffled bytes (filters/projections only shrink data). Callers that
know better (e.g. post-aggregation cardinality) pass ``est_bytes``.
"""

from __future__ import annotations

from ..io import read_parquet_sized

# ~256 MiB of in-memory Arrow per shuffle partition: big enough to amortize
# Ray's per-task overhead, small enough that a reducer (partition + its
# hash-build structures) stays well inside a worker heap.
TARGET_PARTITION_BYTES = 256 * 1024 * 1024

# Floor keeps tiny inputs from serializing onto one reducer; ceiling bounds
# scheduler/metadata pressure (at 100 TB you shuffle in key-range waves or
# raise the target bytes, not with 400k reducers).
MIN_PARTITIONS = 4
MAX_PARTITIONS = 16384
# smallest partition worth a dedicated reducer: below this, task dispatch
# overhead beats the parallelism (see pick_partitions' mid-range rule)
MIN_PARTITION_BYTES = 32 * 1024 * 1024


def estimated_size_bytes(ds) -> int | None:
    """Metadata-only size estimate for a (possibly lazy) Dataset.

    Returns the inferred in-memory size of the dataset if Ray knows it
    without executing; otherwise the size of the nearest upstream operator
    that does (normally the parquet read), which is an upper bound.
    Returns None when nothing in the lineage has a known size.
    """
    def _size(op) -> int | None:
        size = op.infer_metadata().size_bytes
        if size is not None:
            return size
        known = [s for s in map(_size, op.input_dependencies) if s is not None]
        return sum(known) if known else None

    try:
        return _size(ds._logical_plan.dag)
    except Exception:
        return None


def pick_partitions(
    *datasets,
    est_bytes: int | None = None,
    target_bytes: int = TARGET_PARTITION_BYTES,
    lo: int = MIN_PARTITIONS,
    hi: int = MAX_PARTITIONS,
) -> int:
    """Partition count for a shuffle over ``datasets`` (join: pass both sides).

    ``est_bytes`` overrides the metadata estimate when the caller knows the
    true shuffled volume (e.g. bytes after an aggressive filter).

    Deliberately NOT floored at the CPU count: Ray's hash-shuffle
    join/aggregate runs one aggregator ACTOR per partition alongside the
    upstream map tasks, and raising the count only oversubscribes the node
    — measured on a 2M-row string join: 4 partitions 32 s, 8 → 31 s,
    16 → 40 s, 32 → 94 s. (`pick_group_partitions` is the exception:
    map_groups reducers are Python-callback-bound and do want a
    CPU-count floor.)
    """
    if est_bytes is None:
        sizes = [estimated_size_bytes(d) for d in datasets]
        known = [s for s in sizes if s is not None]
        if not known:
            return lo
        est_bytes = sum(known)
    return max(lo, min(hi, -(-est_bytes // target_bytes)))


def pick_group_partitions(*datasets, **kw) -> int:
    """Partition count for a ``groupby(...).map_groups`` stage.

    Unlike a hash AGGREGATE (C kernels — a handful of fat reducers is
    optimal), a ``map_groups`` reduce runs a PYTHON callback per group,
    and its wall time is bounded by the number of concurrent reduce
    partitions. At small scale `pick_partitions` legitimately returns
    its floor (4), which would cap the callback stage at 4 cores on a
    32-core node. Take max with the cluster CPU count: at 100 TB the
    byte-derived count dominates anyway, at bench scale every core gets
    a partition."""
    import ray as _ray

    try:
        cpus = int(_ray.cluster_resources().get("CPU", MIN_PARTITIONS))
    except Exception:
        cpus = MIN_PARTITIONS
    return max(pick_partitions(*datasets, **kw), min(cpus, MAX_PARTITIONS))


# Above this estimated size a multi-consumer intermediate is checkpointed to
# parquet instead of pinned in the object store. Env-overridable so tests can
# force the spill path (GRAFT_CHECKPOINT_SPILL_BYTES=0).
CHECKPOINT_SPILL_BYTES = 8 * 1024 ** 3


def checkpoint(ds, tag: str, est_bytes: int | None = None,
               spill_threshold_bytes: int | None = None):
    """Materialize a Dataset consumed by several downstream branches.

    Small intermediates pin in the object store (``materialize()``); above
    ``spill_threshold_bytes`` the blocks are written to partitioned parquet
    under /tmp and re-read lazily, so a 100 TB-scale intermediate (e.g. the
    n-gram inverted index, which is ~n× the corpus text) spills to disk once
    instead of occupying object-store memory for the whole pipeline, and a
    re-run can reuse the spill. ``est_bytes`` lets the caller correct the
    metadata estimate when the op EXPANDS data (explodes), which the
    lineage-walk upper bound cannot see.
    """
    import os
    import tempfile

    import ray as _ray

    if spill_threshold_bytes is None:
        spill_threshold_bytes = int(os.environ.get(
            "GRAFT_CHECKPOINT_SPILL_BYTES", str(CHECKPOINT_SPILL_BYTES)
        ))
    est = est_bytes if est_bytes is not None else estimated_size_bytes(ds)
    if est is not None and est > spill_threshold_bytes:
        path = tempfile.mkdtemp(prefix=f"pacasam_ckpt_{tag}_", dir="/tmp")
        ds.write_parquet(path)
        return read_parquet_sized(path)
    return ds.materialize()


def scrub_empty_blocks(ds):
    """Drop zero-row blocks from a Dataset (materializing it) and return an
    Arrow-block rebuild.

    Why this exists: ``groupby(...).map_groups`` / hash-aggregate over
    pandas-block input emits zero-row blocks for empty reduce partitions,
    and some of them carry NO columns at all (observed: 44 of 64 blocks
    after a ``map_groups`` → ``Min`` chain at sf0.01). Zero-row blocks
    BYPASS every downstream ``map_batches`` UDF, so they cannot be
    re-schema'd in-stream, and when one lands in a hash-join partition the
    pyarrow join dies with ``No match ... for key field reference``.
    Any map_groups/aggregate output that later feeds a join must pass
    through here. Blocks are converted to Arrow by small remote tasks (no
    driver pull); non-empty data is never copied through the driver.
    """
    import pandas as _pd
    import pyarrow as _pa
    import ray as _ray

    mat = ds.materialize()

    @_ray.remote
    def _to_arrow(b):
        if isinstance(b, _pd.DataFrame):
            return _pa.Table.from_pandas(b, preserve_index=False)
        return b

    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(_to_arrow.remote(ref))
    if not refs:
        # keep ONE empty block so the dataset retains a usable schema;
        # pick any correctly-columned one if present
        for bundle in mat.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                b = _ray.get(ref)
                cols = list(b.columns) if isinstance(b, _pd.DataFrame) else b.column_names
                if cols:
                    return _ray.data.from_arrow_refs([_to_arrow.remote(ref)])
        return mat
    return _ray.data.from_arrow_refs(refs)


def schema_floor(ds, empty_df):
    """Schema guarantee for query results that may be EMPTY.

    Ray 2.49's ``Dataset.to_pandas`` returns a column-less frame when
    every block has zero rows — even ``from_pandas(typed empty)`` /
    ``from_arrow(typed empty)`` lose their schema — so a legitimately
    empty result set would fail any schema-checking comparator. This
    finalizer materializes the result once (results are driver-consumed
    by the query contract; corpus-scale outputs go through
    ``write_parquet`` instead) and substitutes the TYPED empty frame
    when nothing survived. Non-empty results pass through as the
    materialized Dataset, un-copied.
    """
    mat = ds.materialize()
    if mat.count() == 0:
        return empty_df
    return mat


def typed_table(schema, **arrays):
    """Build a pyarrow Table with an EXPLICIT schema from numpy arrays.

    The empty-type-inference trap: a ``map_batches`` UDF that constructs
    ``pa.table({"w": flat[:-1][mask]})`` from a masked numpy OBJECT array
    infers ``string`` when the mask keeps rows but ``null`` when it keeps
    none — so blocks disagree on schema, and Ray's hash-shuffle join hands
    pyarrow a partition whose key column is ``null``-typed ("No match ...
    for key field reference"). Any UDF whose output columns come from
    masked/fancy-indexed numpy must construct through here so the zero-row
    block carries the same schema as every other block.
    """
    import pyarrow as _pa

    schema = _pa.schema(schema)
    return _pa.table(
        {f.name: _pa.array(arrays[f.name], type=f.type) for f in schema},
        schema=schema)


_FNV_PRIME = 1099511628211


def grouped_batch_map(ds, keys: list[str], fn, nparts: int | None = None):
    """Partition-level replacement for ``groupby(keys).map_groups(fn)``.

    ``map_groups`` dispatches a Python callback PER GROUP (~50 µs each —
    measured at 87 s for 1.5 M groups, see stages/dedup.py); at 10^8 keys
    that is the whole job. This helper instead groups on a deterministic
    hash BUCKET of the key columns, so the callback count equals the
    bucket count (``pick_partitions``-derived, ~1 per 256 MiB) and ``fn``
    receives each bucket's rows as ONE DataFrame that contains only whole
    key-groups — ``fn`` must therefore be vectorized ACROSS groups
    (sort + ``df.groupby(keys)``-style kernels), which is exactly what a
    post-shuffle reduce wants.

    Determinism: buckets come from ``pandas.util.hash_pandas_object``
    (keyed SipHash of values — stable across processes and partitions;
    works for any key dtype incl. strings), FNV-folded across multiple key
    columns. The bucket column never reaches ``fn`` or the output.
    """
    import numpy as np
    import pandas as pd

    nparts = nparts or pick_partitions(ds)

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(df), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in keys:
                h = h * np.uint64(_FNV_PRIME) + pd.util.hash_pandas_object(
                    df[k], index=False
                ).to_numpy()
        return df.assign(__bucket=(h % np.uint64(nparts)).astype(np.int64))

    def _apply(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__bucket"))

    tagged = ds.map_batches(_tag, batch_format="pandas")
    return tagged.groupby("__bucket", num_partitions=min(nparts, MAX_PARTITIONS)).map_groups(
        _apply, batch_format="pandas"
    )
