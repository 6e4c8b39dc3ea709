"""Size-derived parquet reads.

Ray's automatic read parallelism targets ≥ 2×CPU blocks regardless of
input size, so a 2 MB table on a 32-core node becomes 64 near-empty
blocks and EVERY downstream operator pays 64-128 task dispatches —
measured 9.1 s → 0.85 s on the as-of join at sf0.01 just from right-
sizing the read. This helper derives the block count from the actual
on-disk bytes instead (one block per ~4 MiB compressed ≈ 16 MiB in
memory): small inputs collapse to a handful of blocks, corpus-scale
inputs get the same many-block layout the auto policy would produce, and
the decision is metadata-only (an os.stat walk, never a read).
"""

from __future__ import annotations

import os

import ray

# ~4 MiB compressed parquet ≈ 16 MiB decoded Arrow — small enough that a
# CPU-heavy map stage still parallelizes at bench scale, large enough that
# per-task dispatch (~5-15 ms) stays noise.
READ_BLOCK_BYTES = 4 * 1024 * 1024


def _disk_bytes(path: str) -> int | None:
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if os.path.isdir(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    total += os.path.getsize(os.path.join(root, f))
            return total
    except OSError:
        return None
    return None


def read_parquet_sized(path, *, columns=None,
                       target_block_bytes: int = READ_BLOCK_BYTES, **kw):
    """`ray.data.read_parquet` with `override_num_blocks` derived from the
    input's on-disk size (no-op if the caller already set it, or if the
    path is remote/unstatable — Ray's auto policy applies then)."""
    if "override_num_blocks" not in kw and isinstance(path, str):
        size = _disk_bytes(path)
        if size is not None:
            # floor of 4: keep a little intra-query parallelism for
            # compute-heavy map stages on small tables (measured sweet spot
            # on the as-of join: 4 blocks 0.85 s, 8 blocks 1.2 s, auto-64
            # blocks 9.1 s)
            kw["override_num_blocks"] = max(4, -(-size // target_block_bytes))
    return ray.data.read_parquet(path, columns=columns, **kw)
