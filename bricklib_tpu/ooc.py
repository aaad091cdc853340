"""Out-of-core stencils: domains larger than device HBM.

The reference is bounded by device memory (its mmap storage aliases
views, it does not stream); the classic extension is out-of-core
temporal streaming (cf. arXiv:1709.02125, "Beyond 16GB: Out-of-Core
Stencil Computations" — PAPERS.md).  On TPU the natural form: the
domain lives in HOST RAM, and each sweep streams overlapping k-slabs
through the chip —

    host slab [s0-lo_k, s1+hi_k)  --H2D-->  dense Pallas sweep
        --D2H-->  host out rows [s0, s1)

with the next slab's H2D transfer dispatched before the previous
output is read back, so jax's async dispatch overlaps transfer with
compute.  Global boundaries are periodic (the drivers' convention):
k wraps through the slab indexing, j/i wrap via per-slab host padding.

This is deliberately the DENSE-array path (the ``tile(...)`` twin):
out-of-core domains are transfer-bound, so the brick layout's on-chip
advantages are irrelevant and the array form avoids a layout transform
per slab.

Measured on the axon tunnel (remote single chip): H2D ~1.1 GB/s, D2H
~2 MB/s — the tunnel's device-to-host path makes streaming impractical
THERE (capability is validated for correctness; throughput needs a
locally-attached TPU host, where DMA runs tens of GB/s both ways).
"""

from __future__ import annotations

import numpy as np


def _slab_plan(K: int, slab_rows: int):
    """Half-open owned k-ranges covering [0, K)."""
    plan = []
    s0 = 0
    while s0 < K:
        s1 = min(s0 + slab_rows, K)
        plan.append((s0, s1))
        s0 = s1
    return plan


def ooc_sweep(arr: np.ndarray, stencil, params: dict | None = None,
              iters: int = 1, slab_bytes: int = 2 * 2 ** 30,
              slab_rows: int | None = None, tile_elems=None,
              stats: dict | None = None):
    """Apply ``iters`` periodic stencil sweeps to a host-resident 3-D
    array by streaming k-slabs through the device; returns the new host
    array (the input is not modified).

    ``slab_bytes`` bounds the per-slab device footprint (in+out, both
    resident during the overlap window); ``slab_rows`` overrides the
    derived slab height.  ``stats`` (optional dict) receives
    ``{"slabs", "h2d_bytes", "d2h_bytes", "wall_s"}`` per call.
    """
    import time

    import jax
    import jax.numpy as jnp

    from .codegen.jnp_backend import _as_ir
    from .codegen.pallas_backend import pallas_dense_stencil

    ir = _as_ir(stencil)
    if ir.dims != 3:
        raise NotImplementedError("out-of-core path is 3-D")
    if len(ir.sdef.inputs) != 1:
        raise NotImplementedError("out-of-core path reads one grid")
    gname = next(iter(ir.sdef.inputs))
    arr = np.asarray(arr)
    K, J, I = arr.shape
    lo, hi = ir.radius()
    # per-axis pad: j rounded up to sublanes, i to whole lane tiles so
    # the padded slab satisfies the dense kernel's DMA granularity
    pk = max(lo[0], hi[0])
    pj = max(8, -(-max(lo[1], hi[1]) // 8) * 8)
    pi = max(lo[2], hi[2])
    interpret = jax.default_backend() not in ("tpu",)
    if I % 2:
        raise ValueError("out-of-core i extent must be even")
    # grow the symmetric i pad until the padded row is whole lane tiles
    pi += ((-(I + 2 * pi)) % 128) // 2
    if J % 8:
        raise ValueError("out-of-core j extent must be a sublane "
                         "multiple (8)")

    row_bytes = (J + 2 * pj) * (I + 2 * pi) * arr.dtype.itemsize
    if slab_rows is None:
        slab_rows = max(1, int(slab_bytes // (3 * row_bytes)) - 2 * pk)
    slab_rows = min(slab_rows, K)
    plan = _slab_plan(K, slab_rows)

    fns = {}

    def fn_for(rows: int):
        if rows not in fns:
            shape = (rows + 2 * pk, J + 2 * pj, I + 2 * pi)
            fns[rows] = jax.jit(pallas_dense_stencil(
                ir, shape, (pk, pj, pi), params,
                tile_elems=tile_elems, interpret=interpret))
        return fns[rows]

    def host_slab(src, s0, s1):
        """Padded host slab: k rows [s0-pk, s1+pk) with global wrap,
        j/i wrapped by np.pad."""
        ks = np.arange(s0 - pk, s1 + pk) % K
        return np.pad(src[ks], ((0, 0), (pj, pj), (pi, pi)),
                      mode="wrap")

    t0 = time.perf_counter()
    h2d = d2h = 0
    cur = arr
    for _ in range(int(iters)):
        out = np.empty_like(cur)
        # software pipeline: slab s+1's H2D dispatches before slab s's
        # result readback blocks, so transfer overlaps compute
        dev = jax.device_put(jnp.asarray(host_slab(cur, *plan[0])))
        for s, (s0, s1) in enumerate(plan):
            o = fn_for(s1 - s0)(dev)
            h2d += dev.nbytes
            if s + 1 < len(plan):
                dev = jax.device_put(
                    jnp.asarray(host_slab(cur, *plan[s + 1])))
            res = np.asarray(o)
            d2h += res.nbytes
            out[s0:s1] = res[pk:pk + (s1 - s0), pj:pj + J, pi:pi + I]
        cur = out
    if stats is not None:
        stats.update(slabs=len(plan), h2d_bytes=h2d, d2h_bytes=d2h,
                     wall_s=time.perf_counter() - t0)
    return cur
