"""fake_stencil: whole-brick adjacency-walking average
(ref: stencils/fake.h:364-388).

The reference uses it (single/mpi.cpp) to validate decomposition layouts
without any codegen: every brick averages itself with its 2*dims face
neighbors, walking only the adjacency list.  Vectorized here as gathers;
also checks the center-self invariant (adj[b][mid] == b) like the
reference's runtime throw (fake.h:376-377).
"""

from __future__ import annotations

import numpy as np


def fake_stencil(view, adj, check_center: bool = True):
    """``view``: [nbricks, *bdims]; returns the face-neighbor average."""
    ncols = adj.shape[1]
    mid = ncols // 2
    dims = 0
    n = ncols
    while n > 1:
        n //= 3
        dims += 1
    if check_center:
        center = np.asarray(adj[:, mid])
        if not np.array_equal(center, np.arange(adj.shape[0])):
            raise RuntimeError("adjacency center-self invariant violated")
    acc = view
    shift = ncols // 3
    while shift > 0:
        acc = acc + view[adj[:, mid - shift]] + view[adj[:, mid + shift]]
        shift //= 3
    return acc / (2 * dims + 1)
