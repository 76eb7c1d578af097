"""Partitioning and load balancing (Zoltan2-lite).

TPU-native coverage of the reference's partitioning stack:
  * ``partition_rcb``   — recursive coordinate bisection, the core of
    Zoltan's geometric RCB (packages/zoltan/src/rcb/) and the spiritual
    sibling of Zoltan2's MultiJagged
    (packages/zoltan2/src/algorithms/partition/Zoltan2_AlgMultiJagged.hpp)
  * ``partition_greedy_graph`` — BFS region growing over the matrix graph
    (cheap graph partitioning when no coordinates exist)
  * ``permute_csr`` / ``partition_to_permutation`` — renumber a matrix so
    a computed partition becomes contiguous, which is what
    ``parallel.distmatrix.distribute`` (contiguous uniform maps) consumes.
"""
from __future__ import annotations

import numpy as np

from ..ops.formats import CsrHost


def partition_rcb(coords: np.ndarray, n_parts: int) -> np.ndarray:
    """Recursive coordinate bisection: coords (n, d) → part id per row.
    n_parts may be any positive integer (uneven splits weighted)."""
    coords = np.asarray(coords, dtype=np.float64)
    n = coords.shape[0]
    part = np.zeros(n, dtype=np.int64)

    def rec(idx: np.ndarray, parts: int, base: int):
        if parts <= 1 or len(idx) == 0:
            part[idx] = base
            return
        left_parts = parts // 2
        frac = left_parts / parts
        c = coords[idx]
        widths = c.max(axis=0) - c.min(axis=0)
        axis = int(np.argmax(widths))
        order = np.argsort(c[:, axis], kind="stable")
        cut = int(round(frac * len(idx)))
        rec(idx[order[:cut]], left_parts, base)
        rec(idx[order[cut:]], parts - left_parts, base + left_parts)

    rec(np.arange(n), n_parts, 0)
    return part


def partition_greedy_graph(a: CsrHost, n_parts: int) -> np.ndarray:
    """BFS region growing: grow each part to ~n/n_parts nodes following
    graph adjacency; leftovers appended to the last part."""
    n = a.shape[0]
    target = -(-n // n_parts)
    part = np.full(n, -1, dtype=np.int64)
    visited = np.zeros(n, dtype=bool)
    cur_part = 0
    count = 0
    from collections import deque

    queue: deque = deque()
    for seed in range(n):
        if visited[seed]:
            continue
        queue.append(seed)
        visited[seed] = True
        while queue:
            i = queue.popleft()
            part[i] = cur_part
            count += 1
            if count >= target and cur_part < n_parts - 1:
                cur_part += 1
                count = 0
                # restart BFS frontier into the new part
            cols, _ = a.row(i)
            for c in cols:
                c = int(c)
                if 0 <= c < n and not visited[c]:
                    visited[c] = True
                    queue.append(c)
    return part


def partition_to_permutation(part: np.ndarray) -> np.ndarray:
    """perm[new_index] = old_index, grouping rows of each part
    contiguously (stable within parts)."""
    return np.argsort(part, kind="stable")


def permute_csr(a: CsrHost, perm: np.ndarray) -> CsrHost:
    """Symmetric permutation B = A[perm, perm] (renumbering both rows and
    columns — the RowMatrix permutation of EpetraExt's transforms,
    packages/epetraext/src/transform/)."""
    n = a.shape[0]
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    rows = np.repeat(np.arange(n, dtype=np.int64), a.row_lengths())
    return CsrHost.from_coo(inv[rows], inv[a.cols.astype(np.int64)], a.vals,
                            a.shape, sum_duplicates=False)


def partition_quality(a: CsrHost, part: np.ndarray) -> dict:
    """Edge-cut and imbalance metrics (Zoltan2 EvaluatePartition analogue)."""
    rows = np.repeat(np.arange(a.shape[0], dtype=np.int64),
                     a.row_lengths())
    cut = int((part[rows] != part[a.cols]).sum())
    counts = np.bincount(part)
    imbalance = float(counts.max() / max(counts.mean(), 1e-300))
    return dict(edge_cut=cut, imbalance=imbalance,
                part_sizes=counts.tolist())
