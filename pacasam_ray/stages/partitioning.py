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

# ~256 MiB of in-memory Arrow per shuffle partition: big enough to amortize
# Ray's per-task overhead, small enough that a reducer (partition + its
# hash-build structures) stays well inside a worker heap.
TARGET_PARTITION_BYTES = 256 * 1024 * 1024

# Floor keeps tiny inputs from serializing onto one reducer; ceiling bounds
# scheduler/metadata pressure (at 100 TB you shuffle in key-range waves or
# raise the target bytes, not with 400k reducers).
MIN_PARTITIONS = 4
MAX_PARTITIONS = 16384


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
    """
    if est_bytes is None:
        sizes = [estimated_size_bytes(d) for d in datasets]
        known = [s for s in sizes if s is not None]
        if not known:
            return lo
        est_bytes = sum(known)
    return max(lo, min(hi, -(-est_bytes // target_bytes)))
