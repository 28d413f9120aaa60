"""Dynamic time warping with traceback for the alignment visualizer.

Functional parity with the reference's vendored DTW (`utils/dtw.py:6-61`,
originally pierre-rouanet/dtw): accumulated-cost matrix over a cdist
distance, returning (min distance, cost matrix, accumulated matrix, path).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.distance import cdist


def dtw(x, y, dist="sqeuclidean"):
    """Align sequences x (N, D) and y (M, D). Returns
    (distance, cost_matrix, acc_cost_matrix, (path_x, path_y))."""
    x = np.atleast_2d(np.asarray(x, float))
    y = np.atleast_2d(np.asarray(y, float))
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    cost = cdist(x, y, dist)
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(n):
        for j in range(m):
            acc[i + 1, j + 1] = cost[i, j] + min(acc[i, j + 1], acc[i + 1, j],
                                                 acc[i, j])
    acc = acc[1:, 1:]
    path = _traceback(acc)
    return acc[-1, -1] / (n + m), cost, acc, path


def _traceback(acc):
    i, j = np.array(acc.shape) - 1
    px, py = [i], [j]
    while i > 0 or j > 0:
        moves = []
        if i > 0 and j > 0:
            moves.append((acc[i - 1, j - 1], i - 1, j - 1))
        if i > 0:
            moves.append((acc[i - 1, j], i - 1, j))
        if j > 0:
            moves.append((acc[i, j - 1], i, j - 1))
        _, i, j = min(moves, key=lambda t: t[0])
        px.append(i)
        py.append(j)
    return np.array(px[::-1]), np.array(py[::-1])
