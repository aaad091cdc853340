"""Rank-generic pencil-brick streaming kernel for 5-D+ domains.

The reference's brick templates are dimension-generic
(ref: include/brick.h:96-127, bit-codec ``Dim<...>`` packs any rank);
its highest *tested* rank is 4 (ref: weak/main-4d.cpp).  The rebuild's
layout/decomp/exchange/oracle stack is rank-generic already
(``test_dim_generic``); this module extends the Pallas fast path the
same way, generalizing the 4-D emitter's design (:mod:`.pencil_kernel_4d`):

- the innermost axis i spans the brick row (lane rolls for i-taps),
- j is tiled (sublane realignments for j-taps),
- k streams through a rolling double-buffered VMEM window,
- EVERY remaining outer axis (w, v, u, ...) becomes a pallas grid
  dimension whose brick extent rides as a leading FREE axis of the
  window slab — outer-axis taps are free slices
  (``pencil_kernel.build_row_compute``'s ``pre`` axes, which were
  always L-generic; the 4-D path is the L=1 instance).

Window rows assemble the outer-axis halos from THIN slices of the
+/-1 neighbor bricks along each outer axis — including the corner
combinations (the product over axes of {lo-halo, center, hi-halo}),
which the 4-D path never needed (one outer axis has no corners).
Only the last two dims carry the (8,128) Mosaic tile granularity, so
every outer-halo slice DMAs at any size.

``fuse`` is fixed at 1 here by design: each fused level would
recompute ``(F-f)*2*radius`` extra slices along EVERY outer grid axis
(the 4-D emitter's w-amplification, compounded per axis), and 4-D
already measured F=4 unpayable + compile-hanging at real sizes
(tools/bench_4d.py) — at rank 5+ the amplification is strictly worse.
Deep-ghost ST_ITER amortization and the shift exchange work unchanged
(exchange machinery is shape-agnostic along the brick axis).
"""

from __future__ import annotations

from itertools import product
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .evaluate import resolve_const_from_params
from .jnp_backend import _as_ir


def pallas_pencil_sweep_nd(stencil, grid: np.ndarray,
                           bdims: Sequence[int],
                           nbricks: int,
                           params: dict | None = None,
                           ranges: Sequence[tuple[int, int]] | None = None,
                           tile_j: int | None = None,
                           dtype=jnp.float32,
                           compute_dtype=jnp.float32,
                           interpret: bool | None = None,
                           fuse: int = 1,
                           lookahead: int = 1,
                           vmem_limit_bytes: int = 110 * 2 ** 20):
    """Build ``fn(*views) -> out_view`` for rank-``nd`` pencil bricks
    (``nd >= 5``; ranks 2/3/4 have dedicated tuned emitters).

    ``grid``: brick-grid table of shape ``(G_0, ..., G_{m-1}, GK, GJ)``
    (or with a trailing i-extent of 1), where ``m = nd - 3`` outer
    axes precede the streamed k axis; ``bdims`` = ``(B_0, ...,
    B_{m-1}, BK, BJ, BIROW)``; ``ranges`` gives one half-open grid
    range per table axis (outer axes..., k, j), defaulting to skipping
    one ghost ring per axis.

    Multi-input stencils stream one rolling window per field, exactly
    as in 4-D; returns ``fn(*views)`` in ``fn.fields`` order.
    """
    ir = _as_ir(stencil)
    params = dict(params or {})
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nd = ir.dims
    if nd < 5:
        raise NotImplementedError(
            "this path is rank-5+; use pencil_kernel{,_2d,_4d} for "
            "ranks 3/2/4")
    m = nd - 3             # number of outer (pallas grid) axes
    fieldnames = list(ir.sdef.inputs)
    NF = len(fieldnames)
    if NF == 0:
        raise ValueError("stencil reads no input grid")
    fmap = {n: i for i, n in enumerate(fieldnames)} if NF > 1 else None
    bdims = tuple(int(b) for b in bdims)
    if len(bdims) != nd:
        raise ValueError(f"bdims must have {nd} entries, got {bdims}")
    BO = bdims[:m]
    BK, BJ, BIROW = bdims[m], bdims[m + 1], bdims[m + 2]
    if not interpret and (BIROW % 128 or BJ % 8):
        raise ValueError(
            f"Mosaic DMA granularity: bricks need BI a multiple of 128 "
            f"and BJ a multiple of 8 on hardware, got {bdims}")
    grid = np.asarray(grid)
    if grid.ndim == nd:
        if grid.shape[-1] != 1:
            raise ValueError("pencil layout needs one brick per "
                             "(outer..., k, j)")
        grid = grid[..., 0]
    if grid.ndim != nd - 1:
        raise ValueError(f"grid table must be rank {nd - 1} "
                         f"(outer axes..., k, j), got {grid.shape}")
    GO = grid.shape[:m]
    GK, GJ = grid.shape[m], grid.shape[m + 1]
    if ranges is None:
        ranges = tuple((1, g - 1) for g in grid.shape)
    ranges = tuple((int(a), int(b)) for a, b in ranges)
    if len(ranges) != nd - 1:
        raise ValueError(f"need {nd - 1} ranges (outer..., k, j)")
    O0 = tuple(r[0] for r in ranges[:m])
    OC = tuple(r[1] - r[0] for r in ranges[:m])
    K0, K1 = ranges[m]
    J0, J1 = ranges[m + 1]
    KC, JC = K1 - K0, J1 - J0
    lo, hi = ir.radius()   # numpy order, length nd
    for a in range(m + 2):
        if lo[a] > bdims[a] or hi[a] > bdims[a]:
            raise ValueError("stencil radius exceeds brick dims")
    if int(fuse) != 1:
        raise NotImplementedError(
            "rank-5+ sweeps are fuse=1: every outer grid axis would "
            "recompute (F-f)*2*radius extra slices per level (the 4-D "
            "w-amplification compounded per axis; 4-D measured F=4 "
            "unpayable, tools/bench_4d.py) — use deep-ghost ST_ITER "
            "amortization instead")

    resolve = resolve_const_from_params(params)

    D = int(lookahead)
    if D < 1:
        raise ValueError("lookahead must be >= 1")
    W = 3 + D              # k-window slots: 3-row span + D prefetch

    def _roll_i(v, di):
        return pltpu.roll(v, (-di) % BIROW, nd - 1) if di else v

    from .ir import fold_linear

    lin = fold_linear(ir, resolve, fields=fmap)

    # outer-axis halo extents of one window slab
    EO = tuple(lo[a] + BO[a] + hi[a] for a in range(m))
    isz = np.dtype(dtype).itemsize
    csz = np.dtype(jnp.dtype(compute_dtype)).itemsize
    obody = int(np.prod(BO))
    oslab = int(np.prod(EO))

    def vmem_estimate(tj: int) -> int:
        row = oslab * BK * (tj + 2) * BJ * BIROW
        est = W * row * isz * NF + 2 * obody * BK * tj * BJ * BIROW * isz
        est += oslab * (BK + lo[m] + hi[m]) * (tj + 2) * BJ * BIROW \
            * csz * NF
        if lin is not None:
            wdefs_, vmap_, (jl, jh) = lin
            nksum = len({tuple(wks) for terms in wdefs_
                         for _c, wks in terms})
            live = nksum + len(wdefs_) + len(set(vmap_.values())) + 2
            ext = obody * BK * (tj * BJ + jl + jh) * BIROW * csz
        else:
            live = min(len(ir.sdef.taps), 6) + 2
            ext = obody * BK * tj * BJ * BIROW * csz
        return est + live * ext

    if tile_j is None:
        from .pencil_kernel import choose_tile_j

        tile_j = choose_tile_j(JC, vmem_estimate, vmem_limit_bytes)
    TJ = int(tile_j)
    if JC % TJ:
        raise ValueError(f"tile_j {TJ} must divide computed j extent {JC}")
    JT = JC // TJ
    JW = TJ + 2

    row_shape = EO + (BK, JW * BJ, BIROW)

    # flat strides of the (GO..., GK, GJ) table for scalar-prefetch ids
    tshape = GO + (GK, GJ)
    strides = [1] * (m + 2)
    for a in range(m, -1, -1):
        strides[a] = strides[a + 1] * tshape[a + 1]

    def _clip(x, n):
        return jnp.clip(x, 0, n - 1)

    # per-outer-axis window regions: (brick shift, src slice, dst slice)
    regions = []
    for a in range(m):
        parts = []
        if lo[a]:
            parts.append((-1, slice(BO[a] - lo[a], BO[a]),
                          slice(0, lo[a])))
        parts.append((0, slice(0, BO[a]), slice(lo[a], lo[a] + BO[a])))
        if hi[a]:
            parts.append((1, slice(0, hi[a]),
                          slice(lo[a] + BO[a], EO[a])))
        regions.append(parts)

    def _row_copies(ids_ref, dat_refs, wins, sem, ocs, jt, w, slot):
        krow = _clip(K0 - 1 + w, GK)
        cps = []
        for cj in range(JW):
            jcol = _clip(J0 - 1 + jt * TJ + cj, GJ)
            jsl = slice(cj * BJ, (cj + 1) * BJ)
            for combo in product(*regions):
                idx = krow * strides[m] + jcol
                for a in range(m):
                    idx += _clip(O0[a] + ocs[a] + combo[a][0],
                                 GO[a]) * strides[a]
                src = tuple(c[1] for c in combo)
                dst = tuple(c[2] for c in combo)
                for fi in range(NF):
                    cps.append(pltpu.make_async_copy(
                        dat_refs[fi].at[(ids_ref[idx],) + src],
                        wins[fi].at[(slot,) + dst + (slice(None), jsl,
                                                     slice(None))],
                        sem.at[slot]))
        return cps

    from .pencil_kernel import build_row_compute

    rc = build_row_compute(ir, resolve, lin, _roll_i, fields=fmap,
                           pre=tuple((lo[a], BO[a]) for a in range(m)))

    lo_k, hi_k = lo[m], hi[m]

    def kernel(ids_ref, *args):
        dat_refs = list(args[:NF])
        out_ref = args[NF]
        rest = list(args[NF + 1:])
        wins = rest[:NF]
        tout = rest[NF]
        sem, osem = rest[NF + 1:]
        ocs = tuple(pl.program_id(a) for a in range(m))
        jt = pl.program_id(m)
        t = pl.program_id(m + 1)

        @pl.when(t == 0)
        def _():
            for w in range(min(W, KC + 2)):
                for cp in _row_copies(ids_ref, dat_refs, wins, sem, ocs,
                                      jt, w, w % W):
                    cp.start()

        @pl.when(jnp.logical_and(t > 0, t + 2 + D <= KC + 1))
        def _():
            for cp in _row_copies(ids_ref, dat_refs, wins, sem, ocs,
                                  jt, t + 2 + D, (t + 2 + D) % W):
                cp.start()

        @pl.when(t == 0)
        def _():
            for w in range(min(2, KC + 1)):
                for cp in _row_copies(ids_ref, dat_refs, wins, sem,
                                      ocs, jt, w, w % W):
                    cp.wait()
        for cp in _row_copies(ids_ref, dat_refs, wins, sem, ocs, jt,
                              t + 2, (t + 2) % W):
            cp.wait()

        def _cast(v):
            return (v.astype(compute_dtype)
                    if compute_dtype != dtype else v)

        def win_row_f(fi, a):
            # absolute grid k-row -> field fi's window slot (content
            # edge-clamped by _row_copies)
            return _cast(wins[fi][(a + 1 - K0) % W])

        def slab_of(get):
            pieces = []
            if lo_k:
                pieces.append(get(t + K0 - 1)[(slice(None),) * m
                                              + (slice(BK - lo_k, BK),)])
            pieces.append(get(t + K0))
            if hi_k:
                pieces.append(get(t + K0 + 1)[(slice(None),) * m
                                              + (slice(0, hi_k),)])
            return (jnp.concatenate(pieces, axis=m)
                    if len(pieces) > 1 else pieces[0])

        kslab = ([slab_of(lambda a, fi=fi: win_row_f(fi, a))
                  for fi in range(NF)] if NF > 1
                 else slab_of(lambda a: win_row_f(0, a)))
        out_row = rc(kslab, BJ, TJ * BJ, lo_k, BK)
        if compute_dtype != dtype:
            out_row = out_row.astype(dtype)

        def _out_copies(tt, parity):
            cps = []
            for cj in range(TJ):
                idx = (K0 + tt) * strides[m] + J0 + jt * TJ + cj
                for a in range(m):
                    idx += (O0[a] + ocs[a]) * strides[a]
                cps.append(pltpu.make_async_copy(
                    tout.at[(parity,) + (slice(None),) * (m + 1)
                            + (slice(cj * BJ, (cj + 1) * BJ),
                               slice(None))],
                    out_ref.at[ids_ref[idx]], osem.at[parity]))
            return cps

        @pl.when(t >= 2)
        def _():
            for cp in _out_copies(t - 2, t % 2):
                cp.wait()

        tout[t % 2] = out_row
        for cp in _out_copies(t, t % 2):
            cp.start()

        @pl.when(t == KC - 1)
        def _():
            for tt in range(max(KC - 2, 0), KC):
                for cp in _out_copies(tt, tt % 2):
                    cp.wait()

    nelems = int(np.prod(OC)) * obody * KC * BK * JC * BJ * BIROW
    cost = pl.CostEstimate(
        flops=ir.flops_per_element() * nelems,
        bytes_accessed=(NF + 1) * nelems * isz,
        transcendentals=0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=OC + (JT, KC),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * NF,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((W,) + row_shape, dtype) for _ in range(NF)
        ] + [
            pltpu.VMEM((2,) + BO + (BK, TJ * BJ, BIROW), dtype),
            pltpu.SemaphoreType.DMA((W,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbricks,) + bdims, dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * (m + 2),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )
    ids = jnp.asarray(grid.ravel().astype(np.int32))

    if NF > 1:
        def fn(*dat_views):
            if len(dat_views) != NF:
                raise TypeError(f"stencil reads {NF} grids "
                                f"({fieldnames}), got {len(dat_views)}")
            return call(ids, *dat_views)
        fn.fields = tuple(fieldnames)
    else:
        def fn(dat_view):
            return call(ids, dat_view)

    fn.tile_j = TJ
    fn.vmem_bytes = vmem_estimate(TJ)
    fn.vmem_limit_bytes = vmem_limit_bytes
    return fn
