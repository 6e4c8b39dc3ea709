"""Spatial operators: point-in-polygon broadcast join, bbox extraction, kNN.

North-star operators (BASELINE.json): the reference delegates
point-in-polygon to PostGIS DB-side (``EN_FRANCE`` flag,
configs/Lipac_query.sql:57) and bbox point filtering to numpy
(closed bounds both sides, src/pacasam/extractors/laz.py:131-149). The
engine runs PiP as a BROADCAST SPATIAL JOIN: the (small) sampling-zone
polygon set is ``ray.put`` once; each actor of a stateful pool builds a
grid-bucketed candidate index over polygon bboxes ONCE in ``__init__``
(shapely/STRtree is unavailable in this environment — the pure-numpy grid
index plays its role), and every batch probes it with a vectorized
ray-casting kernel.

kNN neighbor retrieval: distributed brute force with per-batch top-k
pruning (the reduction ships k rows per query per batch, never the data),
plus a cell-index variant (k-ring candidate expansion) for the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

__all__ = [
    "points_in_box",
    "points_in_polygon",
    "rect_zone",
    "assign_zones",
    "filter_in_zones",
    "knn_brute",
]


def points_in_box(px: np.ndarray, py: np.ndarray, xmin, ymin, xmax, ymax) -> np.ndarray:
    """Closed bounds on BOTH sides — exact reference semantics
    (extractors/laz.py:139-142)."""
    return (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)


def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: loop over edges (few), vector over
    points (many). ``poly`` is (N,2), open or closed ring."""
    poly = np.asarray(poly, dtype=np.float64)
    if np.allclose(poly[0], poly[-1]):
        poly = poly[:-1]
    n = len(poly)
    inside = np.zeros(len(px), dtype=bool)
    x1, y1 = poly[-1]
    for i in range(n):
        x2, y2 = poly[i]
        crosses = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        inside ^= crosses & (px < xint)
        x1, y1 = x2, y2
    return inside


def rect_zone(xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
    """Axis-aligned rectangle as a polygon ring (pacasam supports only
    axis-aligned rectangles — README.md:198; general rings work too)."""
    return np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]], dtype=np.float64
    )


class _ZoneIndex:
    """Per-actor immutable spatial index over zone polygons (T5 analog).

    Grid-bucketed bboxes: probe = O(points · candidate polys). Built ONCE
    per actor from the broadcast polygon list."""

    def __init__(self, polys: list[np.ndarray]):
        self.polys = [np.asarray(p, dtype=np.float64) for p in polys]
        self.bboxes = np.array(
            [[p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max()] for p in self.polys]
        ) if self.polys else np.zeros((0, 4))

    def assign(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """First-match zone index per point (priority = list order), -1 if none."""
        out = np.full(len(px), -1, dtype=np.int64)
        todo = np.ones(len(px), dtype=bool)
        for zi, poly in enumerate(self.polys):
            if not todo.any():
                break
            bx = self.bboxes[zi]
            cand = todo & points_in_box(px, py, bx[0], bx[1], bx[2], bx[3])
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            hit = points_in_polygon(px[idx], py[idx], poly)
            hit_idx = idx[hit]
            out[hit_idx] = zi
            todo[hit_idx] = False
        return out


class _AssignZones:
    """Stateful actor-pool stage: zone index built once per actor."""

    def __init__(self, polys_ref, x_col: str, y_col: str, zone_col: str):
        self.index = _ZoneIndex(ray.get(polys_ref))
        self.x_col, self.y_col, self.zone_col = x_col, y_col, zone_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy(zero_copy_only=False)
        py = batch[self.y_col].to_numpy(zero_copy_only=False)
        return batch.append_column(self.zone_col, pa.array(self.index.assign(px, py)))


def assign_zones(ds, polys: list[np.ndarray], x_col: str = "x", y_col: str = "y",
                 zone_col: str = "zone_id", concurrency: int | tuple | None = None,
                 stateful: bool = False):
    """Broadcast spatial join: stamp each row with its first-match zone id.

    ``stateful=False`` (default): stateless tasks rebuild the tiny index per
    task from the broadcast polygon ref — full task parallelism, no actor
    ramp-up, and Ray can fuse it with upstream maps. Use ``stateful=True``
    (actor pool, index built once per actor in ``__init__``) when the index
    is heavy (thousands of polygons / a real STRtree): measured on the 1M-row
    scaling workload, fusing the pipeline into a (1,16) autoscaling actor
    pool CAPPED parallelism below the CPU count and anti-scaled 8→32 CPUs.
    """
    polys_ref = ray.put([np.asarray(p, dtype=np.float64) for p in polys])
    if stateful:
        return ds.map_batches(
            _AssignZones,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_constructor_args=(polys_ref, x_col, y_col, zone_col),
            concurrency=concurrency or (1, 8),
        )

    def _assign(batch: pa.Table) -> pa.Table:
        index = _ZoneIndex(ray.get(polys_ref))
        px = batch[x_col].to_numpy(zero_copy_only=False)
        py = batch[y_col].to_numpy(zero_copy_only=False)
        return batch.append_column(zone_col, pa.array(index.assign(px, py)))

    return ds.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)


def filter_in_zones(ds, polys, **kw):
    """Keep only rows inside any zone (the EN_FRANCE-flag analog)."""
    tagged = assign_zones(ds, polys, **kw)
    return tagged.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t[kw.get("zone_col", "zone_id")], -1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def knn_brute(ds, query_points: np.ndarray, k: int, x_col: str = "x", y_col: str = "y",
              id_col: str = "patch_id") -> pd.DataFrame:
    """Distributed brute-force kNN: each batch computes the (rows × Q)
    squared-distance matrix vectorized and emits only its local top-k rows
    per query; the driver merges ≤ k·Q rows per batch. Deterministic
    tie-break (dist2, id). Exact float parity with a SQL oracle because the
    distance expression is a single IEEE-double formula per pair.
    """
    q = np.asarray(query_points, dtype=np.float64)
    q_ref = ray.put(q)

    def _local_topk(batch: pa.Table) -> pa.Table:
        qp = ray.get(q_ref)
        px = batch[x_col].to_numpy(zero_copy_only=False)
        py = batch[y_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_d = [], [], []
        for qi in range(len(qp)):
            dx = px - qp[qi, 0]
            dy = py - qp[qi, 1]
            d2 = dx * dx + dy * dy
            take = min(k, len(d2))
            idx = np.argpartition(d2, take - 1)[:take] if len(d2) > take else np.arange(len(d2))
            out_q.append(np.full(take, qi, dtype=np.int64))
            out_id.append(ids[idx])
            out_d.append(d2[idx])
        return pa.table({
            "query_id": np.concatenate(out_q),
            id_col: np.concatenate(out_id),
            "dist2": np.concatenate(out_d),
        })

    from .topk import merge_local_topk

    parts = ds.map_batches(_local_topk, batch_format="pyarrow", zero_copy_batch=True)
    out = merge_local_topk(
        parts, k, ["query_id", "dist2", id_col], [True, True, True], source=ds,
    )
    return out.sort_values(
        ["query_id", "dist2", id_col], kind="mergesort"
    ).reset_index(drop=True)


def knn_kring(ds, query_points: np.ndarray, k: int, *, grid: int, patch_size: float,
              cell_col: str = "cell", x_col: str = "x", y_col: str = "y",
              id_col: str = "patch_id", initial_ring: int = 2) -> pd.DataFrame:
    """Exact kNN via k-ring candidate expansion over the cell grid (north
    rule: "kNN neighbor retrieval uses H3 k-ring expansion with per-cell
    candidate pruning").

    Round r scans only rows whose cell lies within Chebyshev grid distance r
    of ANY query's cell (the k-ring); each batch prunes to its local top-k
    per query and the driver merges. The result is returned only once every
    query's kth distance is strictly below the distance from the query point
    to the nearest uncovered cell (points outside the ring are provably
    farther); otherwise the ring doubles. Worst case degrades to
    ``knn_brute`` semantics with the full grid covered — results are always
    EXACT, the ring only prunes work.

    At production scale ``cell`` is a stored (partition) column, so the ring
    predicate pushes down to the parquet read and prunes I/O, not just
    compute; here it prunes after the derivation ``map_batches``.
    """
    q = np.asarray(query_points, dtype=np.float64)
    nq = len(q)
    qgx = np.clip((q[:, 0] // patch_size).astype(np.int64), 0, grid - 1)
    qgy = np.clip((q[:, 1] // patch_size).astype(np.int64), 0, grid - 1)

    r = int(initial_ring)
    while True:
        qg_ref = ray.put((qgx, qgy, q, r))

        def _ring_topk(batch: pa.Table) -> pa.Table:
            gx_q, gy_q, qp, ring = ray.get(qg_ref)
            cell = batch[cell_col].to_numpy(zero_copy_only=False)
            gx = cell % grid
            gy = cell // grid
            # Chebyshev distance of every row's cell to every query cell;
            # keep rows inside ANY query's ring (vectorized rows × Q).
            cheb = np.maximum(
                np.abs(gx[:, None] - gx_q[None, :]),
                np.abs(gy[:, None] - gy_q[None, :]),
            )
            in_ring = (cheb <= ring).any(axis=1)
            if not in_ring.any():
                return pa.table({
                    "query_id": np.empty(0, dtype=np.int64),
                    id_col: np.empty(0, dtype=batch[id_col].to_numpy(zero_copy_only=False).dtype),
                    "dist2": np.empty(0, dtype=np.float64),
                })
            px = batch[x_col].to_numpy(zero_copy_only=False)[in_ring]
            py = batch[y_col].to_numpy(zero_copy_only=False)[in_ring]
            ids = batch[id_col].to_numpy(zero_copy_only=False)[in_ring]
            out_q, out_id, out_d = [], [], []
            for qi in range(len(qp)):
                dx = px - qp[qi, 0]
                dy = py - qp[qi, 1]
                d2 = dx * dx + dy * dy
                take = min(k, len(d2))
                if take == 0:
                    continue
                idx = np.argpartition(d2, take - 1)[:take] if len(d2) > take else np.arange(len(d2))
                out_q.append(np.full(take, qi, dtype=np.int64))
                out_id.append(ids[idx])
                out_d.append(d2[idx])
            if not out_q:
                return pa.table({
                    "query_id": np.empty(0, dtype=np.int64),
                    id_col: np.empty(0, dtype=ids.dtype),
                    "dist2": np.empty(0, dtype=np.float64),
                })
            return pa.table({
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_id),
                "dist2": np.concatenate(out_d),
            })

        from .topk import merge_local_topk

        parts = ds.map_batches(_ring_topk, batch_format="pyarrow", zero_copy_batch=True)
        out = merge_local_topk(
            parts, k, ["query_id", "dist2", id_col], [True, True, True], source=ds,
        ).sort_values(
            ["query_id", "dist2", id_col], kind="mergesort"
        ).reset_index(drop=True)

        if r >= grid:  # full grid covered: nothing outside the ring exists
            return out
        # Exactness check: covered box per query (world coords, grid-clipped
        # sides count as infinite — nothing lies beyond the world edge).
        ok = True
        for qi in range(nq):
            got = out[out["query_id"] == qi]
            bxmin = (qgx[qi] - r) * patch_size
            bxmax = (qgx[qi] + r + 1) * patch_size
            bymin = (qgy[qi] - r) * patch_size
            bymax = (qgy[qi] + r + 1) * patch_size
            margins = []
            if qgx[qi] - r > 0:
                margins.append(q[qi, 0] - bxmin)
            if qgx[qi] + r + 1 < grid:
                margins.append(bxmax - q[qi, 0])
            if qgy[qi] - r > 0:
                margins.append(q[qi, 1] - bymin)
            if qgy[qi] + r + 1 < grid:
                margins.append(bymax - q[qi, 1])
            if not margins:
                continue  # ring covers the whole world for this query
            d_out = min(margins)
            if len(got) < k or got["dist2"].iloc[-1] >= d_out * d_out:
                ok = False
                break
        if ok:
            return out
        r = min(grid, r * 2)
