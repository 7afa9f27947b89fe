"""Survivor clustering — the re-expression of the reference's DBSCAN
classifier (/root/reference/classifiers/dbscan.py:10-124,
classifiers/__init__.py:21-72).

The reference clusters the (tiny) anomaly-survivor set on the driver with
sklearn DBSCAN over two distances: Jaccard on binary z-score-indicator
vectors, then Pearson correlation within groups. Survivor sets are small by
construction (the detect funnel), so this stays a DRIVER-side step over
collected chart vectors — pure numpy (no sklearn in this environment), same
two-level semantics. The distributed part is only the chart extraction:
``collect_charts`` builds per-item dense vectors with one window + groupBy.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def collect_charts(
    history: DataFrame,
    key: str = "itemid",
    order: str = "clock",
    value: str = "value",
) -> dict[int, np.ndarray]:
    """Dict[itemid → dense value vector ordered by clock] (reference
    models/history.py:70-88 get_charts). Use ONLY on survivor sets."""
    rows = (
        history.groupBy(key)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(order), F.col(value)))
            ).alias("pts")
        )
        .collect()
    )
    return {
        r[key]: np.array([p[value] for p in r["pts"]], dtype=np.float64)
        for r in rows
    }


def z_indicator_vectors(charts: dict[int, np.ndarray], sigma: float = 2.0) -> dict[int, np.ndarray]:
    """Binary |z|>σ indicator vectors (reference classifiers/__init__.py:21-34)."""
    out = {}
    for k, v in charts.items():
        std = v.std(ddof=1) if len(v) > 1 else 0.0
        z = (v - v.mean()) / std if std > 0 else np.zeros_like(v)
        out[k] = (np.abs(z) > sigma).astype(np.int8)
    return out


def _dbscan(dist: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    """Minimal DBSCAN over a precomputed distance matrix. Labels: -1 noise,
    0.. clusters. O(N²) — fine for driver-side survivor sets."""
    n = dist.shape[0]
    labels = np.full(n, -2)
    neighbors = [np.nonzero(dist[i] <= eps)[0] for i in range(n)]
    cid = -1
    for i in range(n):
        if labels[i] != -2:
            continue
        if len(neighbors[i]) < min_samples:
            labels[i] = -1
            continue
        cid += 1
        labels[i] = cid
        seeds = list(neighbors[i])
        j = 0
        while j < len(seeds):
            q = seeds[j]
            j += 1
            if labels[q] == -1:
                labels[q] = cid
            if labels[q] != -2:
                continue
            labels[q] = cid
            if len(neighbors[q]) >= min_samples:
                seeds.extend(neighbors[q])
    labels[labels == -2] = -1
    return labels


def jaccard_distance_matrix(vecs: list[np.ndarray]) -> np.ndarray:
    m = np.array(vecs, dtype=np.float64)
    inter = m @ m.T
    sums = m.sum(axis=1)
    union = sums[:, None] + sums[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = np.where(union > 0, inter / union, 1.0)
    return 1.0 - sim


def pearson_distance_matrix(vecs: list[np.ndarray]) -> np.ndarray:
    m = np.array(vecs, dtype=np.float64)
    sd = m.std(axis=1)
    ok = sd > 0
    mn = m - m.mean(axis=1, keepdims=True)
    denom = np.outer(sd, sd) * m.shape[1]
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = np.where(denom > 0, (mn @ mn.T) / denom, 0.0)
    corr[~ok, :] = 0.0
    corr[:, ~ok] = 0.0
    np.fill_diagonal(corr, 1.0)
    return 1.0 - corr


def classify_charts(
    charts: dict[int, np.ndarray],
    sigma: float = 2.0,
    eps_jaccard: float = 0.5,
    eps_corr: float = 0.3,
    min_samples: int = 2,
) -> dict[int, int]:
    """Two-level clustering (reference classifiers/dbscan.py:63-112):
    DBSCAN on Jaccard distance of z-indicators, then refine each cluster by
    DBSCAN on Pearson-correlation distance of the raw charts.
    Returns itemid → clusterid (-1 = noise)."""
    if not charts:
        return {}
    keys = sorted(charts)
    # level 1: indicator Jaccard
    ind = z_indicator_vectors(charts, sigma)
    # pad to common length (series are regularized upstream; guard anyway)
    L = max(len(v) for v in ind.values())
    ivecs = [np.pad(ind[k], (0, L - len(ind[k]))) for k in keys]
    lab1 = _dbscan(jaccard_distance_matrix(ivecs), eps_jaccard, min_samples)

    # level 2: split each Jaccard cluster by raw-chart correlation
    out: dict[int, int] = {}
    next_id = 0
    for c in sorted(set(lab1)):
        members = [k for k, l in zip(keys, lab1) if l == c]
        if c == -1 or len(members) < min_samples:
            for k in members:
                out[k] = -1
            continue
        cvecs = [
            np.pad(charts[k], (0, L - len(charts[k]))) for k in members
        ]
        lab2 = _dbscan(pearson_distance_matrix(cvecs), eps_corr, min_samples)
        for k, l in zip(members, lab2):
            out[k] = next_id + l if l >= 0 else -1
        next_id += max(lab2.max() + 1, 0)
    return out
