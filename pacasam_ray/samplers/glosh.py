"""HDBSCAN / GLOSH outlier scoring on the bounded fit sample — pure numpy.

Reference semantics (src/pacasam/samplers/outliers.py:58-61): fit
``hdbscan.HDBSCAN`` and rank by ``outlier_scores_`` (GLOSH, Campello et
al. 2015). The hdbscan package is probed at import and used when present;
this module otherwise provides a from-scratch implementation of the same
algorithm — mutual-reachability MST → single-linkage hierarchy → condensed
tree (min_cluster_size) → Excess-of-Mass cluster selection → GLOSH
(1 − λ_p / λ_max of the point's cluster subtree) — sized for the BOUNDED
fit sample (O(n²) Prim over an implicit distance matrix; the cap keeps
n ≤ a few thousand). Out-of-sample rows at corpus scale are scored by a
broadcastable nearest-fit-member approximation (hdbscan's own
``approximate_predict`` shape): λ(x) = 1 / max(d(x, nn), core(nn)),
cluster(x) = cluster(nn).

The k-means + kNN-density scorer (outliers.py) remains the default: it is
calibration-free and cheaper. ``scorer: glosh`` in the sampler config opts
into this module.
"""

from __future__ import annotations

import numpy as np

try:  # real library when the environment has it (not in this sandbox)
    import hdbscan as _hdbscan_lib
except ImportError:  # pragma: no cover - absent in the build container
    _hdbscan_lib = None

EPS = 1e-12

# O(n²) MST + Python-loop condensed tree bound the fit cost; 4096 rows is
# ~16M distance evals — milliseconds — while staying a faithful density
# sample of the (already hash-rank-bounded) fit sample.
GLOSH_FIT_CAP = 4096


def _pairwise_sq(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    d = (a * a).sum(1)[:, None] - 2.0 * (a @ b.T) + (b * b).sum(1)[None, :]
    return np.maximum(d, 0.0)


def core_distances(arr: np.ndarray, min_samples: int) -> np.ndarray:
    """d_core[i] = distance to the min_samples-th nearest OTHER row."""
    n = len(arr)
    k = min(min_samples, n - 1)
    if k <= 0:
        return np.zeros(n)
    d2 = _pairwise_sq(arr, arr)
    # slot 0 is the self distance (0), so the k-th other row sits at index k
    return np.sqrt(np.partition(d2, k, axis=1)[:, k])


def mutual_reachability_mst(arr: np.ndarray, core: np.ndarray):
    """Prim's MST over the implicit mutual-reachability matrix
    mr(a,b) = max(core[a], core[b], d(a,b)). O(n²) time, O(n) memory.

    Returns (us, vs, ws): n-1 edges sorted by ascending weight."""
    n = len(arr)
    in_tree = np.zeros(n, dtype=bool)
    best = np.full(n, np.inf)
    best_from = np.zeros(n, dtype=np.int64)
    us = np.empty(n - 1, dtype=np.int64)
    vs = np.empty(n - 1, dtype=np.int64)
    ws = np.empty(n - 1)
    cur = 0
    in_tree[0] = True
    for i in range(n - 1):
        d = np.sqrt(
            np.maximum(((arr - arr[cur]) ** 2).sum(1), 0.0))
        mr = np.maximum(np.maximum(d, core), core[cur])
        upd = mr < best
        best[upd] = mr[upd]
        best_from[upd] = cur
        best[in_tree] = np.inf
        nxt = int(np.argmin(best))
        us[i], vs[i], ws[i] = best_from[nxt], nxt, best[nxt]
        in_tree[nxt] = True
        best[nxt] = np.inf
        cur = nxt
    order = np.argsort(ws, kind="stable")
    return us[order], vs[order], ws[order]


def _single_linkage(us, vs, ws, n):
    """scipy-style linkage from sorted MST edges: internal node n+i merges
    (left, right) at distance ws[i]; returns (left, right, dist, size)."""
    parent = np.arange(2 * n - 1, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    left = np.empty(n - 1, dtype=np.int64)
    right = np.empty(n - 1, dtype=np.int64)
    size = np.ones(2 * n - 1, dtype=np.int64)
    for i in range(n - 1):
        a, b = find(us[i]), find(vs[i])
        node = n + i
        left[i], right[i] = a, b
        size[node] = size[a] + size[b]
        parent[a] = parent[b] = node
    return left, right, ws, size


def _condense(left, right, dist, size, n, min_cluster_size):
    """Condensed tree + per-point fall-out records.

    Returns:
      point_lambda[n]   λ at which each point leaves its last cluster
      point_cluster[n]  condensed-cluster id it leaves
      parents, births   per condensed cluster: parent id (-1 for root),
                        λ_birth
      stab_extra        per cluster: stability mass contributed by points
                        that LEFT it into child clusters at a true split
                        (their own fall-out records live in descendants)
    """
    point_lambda = np.zeros(n)
    point_cluster = np.zeros(n, dtype=np.int64)
    parents = [-1]
    births = [0.0]
    stab_extra = [0.0]

    def leaves(node):
        stack, out = [node], []
        while stack:
            t = stack.pop()
            if t < n:
                out.append(t)
            else:
                stack.append(left[t - n])
                stack.append(right[t - n])
        return out

    # walk root-down; each work item = (tree node, condensed cluster id)
    root = 2 * n - 2
    stack = [(root, 0)]
    while stack:
        node, cid = stack.pop()
        if node < n:  # singleton cluster remnant: the point exits at λ=inf
            point_lambda[node] = np.inf
            point_cluster[node] = cid
            continue
        i = node - n
        lam = 1.0 / dist[i] if dist[i] > EPS else np.inf
        l_node, r_node = left[i], right[i]
        big = [c for c in (l_node, r_node) if size[c] >= min_cluster_size]
        small = [c for c in (l_node, r_node) if size[c] < min_cluster_size]
        for c in small:
            for p in leaves(c):
                point_lambda[p] = lam
                point_cluster[p] = cid
        if len(big) == 2:  # true split: two child clusters born at λ
            lam_f = lam if np.isfinite(lam) else 0.0
            stab_extra[cid] += max(lam_f - births[cid], 0.0) * (
                size[big[0]] + size[big[1]])
            for c in big:
                parents.append(cid)
                # clip the duplicate-point λ=inf birth so stability stays finite
                births.append(lam if np.isfinite(lam) else 1.0 / EPS)
                stab_extra.append(0.0)
                stack.append((c, len(parents) - 1))
        elif len(big) == 1:  # cluster continues through the larger side
            stack.append((big[0], cid))
        # len(big) == 0: everything fell out above; cluster ends
    return (point_lambda, point_cluster, np.asarray(parents),
            np.asarray(births), np.asarray(stab_extra))


def _select_eom(point_lambda, point_cluster, parents, births, stab_extra):
    """Excess-of-Mass cluster selection. Returns (selected_of, lambda_max):
    selected_of[cid] = the selected ancestor-or-self cluster id (or -1),
    lambda_max[cid] = max point λ within cid's subtree (for GLOSH)."""
    ncl = len(parents)
    stability = stab_extra.astype(np.float64).copy()
    lambda_max = np.zeros(ncl)
    finite = np.where(np.isfinite(point_lambda), point_lambda, 0.0)
    for p in range(len(point_lambda)):
        cid = point_cluster[p]
        stability[cid] += max(finite[p] - births[cid], 0.0)
        lambda_max[cid] = max(lambda_max[cid], finite[p])
    children = [[] for _ in range(ncl)]
    for cid in range(1, ncl):
        children[parents[cid]].append(cid)
    # λ_max propagates up: a cluster's subtree peak includes its descendants
    for cid in range(ncl - 1, 0, -1):
        lambda_max[parents[cid]] = max(lambda_max[parents[cid]], lambda_max[cid])

    selected = np.zeros(ncl, dtype=bool)
    subtree_stab = stability.copy()
    for cid in range(ncl - 1, -1, -1):
        child_sum = sum(subtree_stab[c] for c in children[cid])
        if cid == 0:  # never select the root (allow_single_cluster=False)
            subtree_stab[cid] = child_sum
            continue
        if children[cid] and child_sum > stability[cid]:
            subtree_stab[cid] = child_sum
        else:
            selected[cid] = True
            subtree_stab[cid] = stability[cid]
    # deselect ancestors'-descendants conflicts top-down: keep the
    # upper-most selected cluster on each root-to-leaf path
    selected_of = np.full(ncl, -1, dtype=np.int64)
    order = list(range(ncl))  # parents precede children by construction
    for cid in order:
        anc = selected_of[parents[cid]] if cid else -1
        if anc != -1:
            selected[cid] = False
            selected_of[cid] = anc
        elif selected[cid]:
            selected_of[cid] = cid
    return selected_of, lambda_max


class GloshModel:
    """Broadcastable fit result: fit matrix + per-fit-point cluster label,
    λ, core distance, and per-cluster (λ_max, dense label)."""

    __slots__ = ("fit", "core", "labels", "lambda_max_of_point",
                 "fit_scores")

    def __init__(self, fit, core, labels, lambda_max_of_point, fit_scores):
        self.fit = fit
        self.core = core
        self.labels = labels
        self.lambda_max_of_point = lambda_max_of_point
        self.fit_scores = fit_scores


def glosh_fit(arr: np.ndarray, min_cluster_size: int = 8,
              min_samples: int | None = None) -> GloshModel:
    """Fit HDBSCAN + GLOSH on (a ≤GLOSH_FIT_CAP prefix of) ``arr``."""
    arr = np.ascontiguousarray(arr[:GLOSH_FIT_CAP], dtype=np.float64)
    n = len(arr)
    ms = min_samples if min_samples is not None else min_cluster_size
    if _hdbscan_lib is not None:  # pragma: no cover - lib absent in sandbox
        m = _hdbscan_lib.HDBSCAN(min_cluster_size=min_cluster_size,
                                 min_samples=ms).fit(arr)
        core = core_distances(arr, ms)
        lam_max = np.ones(n)
        return GloshModel(arr, core, m.labels_.astype(np.int64), lam_max,
                          np.asarray(m.outlier_scores_, dtype=np.float64))
    if n < 2:
        return GloshModel(arr, np.zeros(n), np.full(n, -1, np.int64),
                          np.ones(n), np.zeros(n))
    core = core_distances(arr, ms)
    us, vs, ws = mutual_reachability_mst(arr, core)
    left, right, dist, size = _single_linkage(us, vs, ws, n)
    pl, pc, parents, births, stab_extra = _condense(
        left, right, dist, size, n, max(2, min_cluster_size))
    selected_of, lambda_max = _select_eom(pl, pc, parents, births, stab_extra)

    labels = selected_of[pc]
    # dense relabel of selected cluster ids to 0..k-1 (noise = -1)
    uniq = np.unique(labels[labels >= 0])
    remap = {int(c): i for i, c in enumerate(uniq)}
    labels = np.asarray([remap.get(int(c), -1) for c in labels],
                        dtype=np.int64)

    # GLOSH: 1 − λ_p / λ_max(subtree of the cluster p last belonged to)
    lmax_p = lambda_max[pc]
    finite_pl = np.where(np.isfinite(pl), pl, lmax_p)
    scores = np.clip(1.0 - finite_pl / np.maximum(lmax_p, EPS), 0.0, 1.0)
    return GloshModel(arr, core, labels, np.maximum(lmax_p, EPS), scores)


def glosh_score(model: GloshModel, X: np.ndarray,
                chunk: int = 4096) -> tuple[np.ndarray, np.ndarray]:
    """Out-of-sample labels + GLOSH scores via nearest fit member
    (hdbscan ``approximate_predict`` shape): λ(x) = 1/max(d(x,nn),
    core(nn)); score = 1 − λ(x)/λ_max(nn's cluster subtree)."""
    X = np.ascontiguousarray(X, dtype=np.float64)
    labels = np.empty(len(X), dtype=np.int64)
    scores = np.empty(len(X))
    fit = model.fit
    for lo in range(0, len(X), chunk):
        xs = X[lo:lo + chunk]
        d2 = _pairwise_sq(xs, fit)
        nn = d2.argmin(1)
        d = np.sqrt(d2[np.arange(len(xs)), nn])
        lam = 1.0 / np.maximum(np.maximum(d, model.core[nn]), EPS)
        labels[lo:lo + chunk] = model.labels[nn]
        scores[lo:lo + chunk] = np.clip(
            1.0 - lam / model.lambda_max_of_point[nn], 0.0, 1.0)
    return labels, scores
