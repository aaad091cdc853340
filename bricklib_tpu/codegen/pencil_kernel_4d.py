"""4-D pencil-brick streaming kernel (ref: weak/main-4d.cpp:36-53).

Same architecture as the 3-D flagship (:mod:`.pencil_kernel`): bricks
span the device's full innermost (i) extent, the k axis streams through
a rolling double-buffered VMEM window, j is tiled, and i-taps are lane
rolls.  The extra outer axis w rides along two ways that are both free
on TPU:

- within a brick, w is an outer dim of the (BW, BK, BJ, BIROW) block —
  w-taps are outer-dim slices, costing nothing;
- across bricks, the w-halo is a THIN outer-dim slice of the w±1
  neighbor brick, DMA-able at any size (only the last two dims carry
  the (8,128) tile granularity), so each window row load is 3 small
  DMAs per j-cell instead of the 3-D path's one.

The pallas grid is (w-planes, j-tiles, k-rows); each (w, j-tile) pair
runs its own k-stream.  Windows clamp at the table edge like the 3-D
sweep (ghost-inclusive deep-ghost semantics).

The hierarchical factorization folds (dw, dk) — both free slices — into
per-(dj, di) profiles, then j-shifts, then one lane roll per distinct
di, exactly as in 3-D.

``fuse`` = F > 1 applies F stencil iterations per HBM pass, mirroring
the 3-D fused rings along k and j; the w axis is a pallas GRID dim
here, so intermediate levels instead extend (F - f) * radius elements
along w inside each plane's ring rows (bounded recompute shared with
no one — the w analog of the j extension), reading a window whose
w-halo is F slices deep.  Semantics equal F composed sweeps, as in
3-D.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .evaluate import resolve_const_from_params
from .jnp_backend import _as_ir


def pallas_pencil_sweep_4d(stencil, grid: np.ndarray,
                           bdims: Sequence[int],
                           nbricks: int,
                           params: dict | None = None,
                           w_range: tuple[int, int] | None = None,
                           k_range: tuple[int, int] | None = None,
                           j_range: tuple[int, int] | None = None,
                           tile_j: int | None = None,
                           dtype=jnp.float32,
                           compute_dtype=jnp.float32,
                           interpret: bool | None = None,
                           fuse: int = 1,
                           lookahead: int = 1,
                           vmem_limit_bytes: int = 110 * 2 ** 20):
    """Build ``fn(dat_view) -> out_view`` for 4-D pencil bricks.

    ``grid``: brick-grid table, shape (GW, GK, GJ) or (GW, GK, GJ, 1);
    ``bdims`` = (BW, BK, BJ, BIROW); ranges are half-open grid coords
    (default: skip one ghost ring per axis).

    Multi-input stencils (variable coefficients / polynomial products;
    the reference codegen's per-grid support,
    codegen/st/codegen/backend/base.py:93-123) stream one rolling
    window PER FIELD — each with its own thin w-halo slices — through
    the shared k-stream; returns ``fn(*views)`` taking views in
    ``fn.fields`` order.  ``fuse`` > 1 is single-input only.
    """
    ir = _as_ir(stencil)
    params = dict(params or {})
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if ir.dims != 4:
        raise NotImplementedError("this path is 4-D; use pencil_kernel "
                                  "for 3-D")
    # multi-input (the reference codegen's per-grid support,
    # codegen/st/codegen/backend/base.py:93-123): one brick view per
    # field sharing ONE grid table; each field streams its own rolling
    # window (incl. its own thin w-halo slices) — unlocks
    # variable-coefficient / polynomial 4-D stencils and their exact
    # adjoint sweeps on this path
    fieldnames = list(ir.sdef.inputs)
    NF = len(fieldnames)
    if NF == 0:
        raise ValueError("stencil reads no input grid")
    fmap = {n: i for i, n in enumerate(fieldnames)} if NF > 1 else None
    BW, BK, BJ, BIROW = (int(b) for b in bdims)
    if not interpret and (BIROW % 128 or BJ % 8):
        raise ValueError(
            f"Mosaic DMA granularity: bricks need BI a multiple of 128 "
            f"and BJ a multiple of 8 on hardware, got "
            f"{(BW, BK, BJ, BIROW)}")
    grid = np.asarray(grid)
    if grid.ndim == 4:
        if grid.shape[3] != 1:
            raise ValueError("pencil layout needs one brick per (w,k,j)")
        grid = grid[:, :, :, 0]
    GW, GK, GJ = grid.shape
    if w_range is None:
        w_range = (1, GW - 1)
    if k_range is None:
        k_range = (1, GK - 1)
    if j_range is None:
        j_range = (1, GJ - 1)
    W0, W1 = (int(x) for x in w_range)
    K0, K1 = (int(x) for x in k_range)
    J0, J1 = (int(x) for x in j_range)
    WC, KC, JC = W1 - W0, K1 - K0, J1 - J0
    lo, hi = ir.radius()   # numpy order: (w, k, j, i)
    if lo[0] > BW or hi[0] > BW or lo[1] > BK or hi[1] > BK \
            or lo[2] > BJ or hi[2] > BJ:
        raise ValueError("stencil radius exceeds brick dims")
    F = int(fuse)
    if F < 1:
        raise ValueError("fuse must be >= 1")
    if F > 1 and NF > 1:
        raise NotImplementedError(
            "fused 4-D sweeps read one input grid (multi-input "
            "temporal fusion needs per-level static aux windows; the "
            "3-D emitter has them, the 4-D form is unbuilt)")
    if F > 1:
        # contamination bounds, one per non-lane axis (same model as
        # the 3-D kernel: each fused level grows radius deeper)
        if F * lo[0] > BW or F * hi[0] > BW:
            raise ValueError(f"fuse {F} x w-radius exceeds the brick "
                             f"w depth (BW={BW})")
        if F * lo[1] > BK or F * hi[1] > BK:
            raise ValueError(f"fuse {F} x k-radius exceeds the brick "
                             f"row depth (BK={BK})")
        if F * lo[2] > BJ or F * hi[2] > BJ:
            raise ValueError(f"fuse {F} x j-radius exceeds the "
                             f"one-pencil window halo (BJ={BJ})")

    # fused-level bookkeeping (k rows / j elements / w elements):
    # level f in [1, F) holds intermediate iteration f; level F is the
    # output.
    lvlA = {f: max(K0 - (F - f), 0) for f in range(1, F)}
    lvlB = {f: min(K1 + (F - f), GK) for f in range(1, F)}
    lvlS = {f: 2 * (F - f) + 3 for f in range(1, F)}
    extj_lo = {f: (F - f) * lo[2] for f in range(1, F + 1)}
    extj_hi = {f: (F - f) * hi[2] for f in range(1, F + 1)}
    extw_lo = {f: (F - f) * lo[0] for f in range(1, F + 1)}
    extw_hi = {f: (F - f) * hi[0] for f in range(1, F + 1)}
    wout = {f: BW + extw_lo[f] + extw_hi[f] for f in range(1, F + 1)}

    resolve = resolve_const_from_params(params)

    # k-window slots: warmup span + D rows of DMA prefetch (same
    # rolling-window scheme as the 3-D emitter's NW)
    D = int(lookahead)
    if D < 1:
        raise ValueError("lookahead must be >= 1")
    W = 2 * F + 1 + D
    # window w-halo: level 1 consumes F*radius w slices
    WHL, WHH = F * lo[0], F * hi[0]
    WE = BW + WHL + WHH

    def _roll_i(v, di):
        return pltpu.roll(v, (-di) % BIROW, 3) if di else v

    # hierarchical factorization shared by every Pallas emitter
    # (codegen.ir.fold_linear); here the free outer offsets are (dw, dk)
    from .ir import fold_linear

    lin = fold_linear(ir, resolve, fields=fmap)

    # VMEM-budget j-tile (same model as 3-D, with the w extent folded in)
    isz = np.dtype(dtype).itemsize
    csz = np.dtype(jnp.dtype(compute_dtype)).itemsize

    def vmem_estimate(tj: int) -> int:
        row = WE * BK * (tj + 2) * BJ * BIROW
        est = (W * row * isz * NF
               + 2 * BW * BK * tj * BJ * BIROW * isz)
        est += (WE * (BK + lo[1] + hi[1]) * (tj + 2) * BJ * BIROW * csz
                * NF)
        for f in range(1, F):
            est += (lvlS[f] * wout[f] * BK
                    * (tj * BJ + extj_lo[f] + extj_hi[f]) * BIROW * csz)
        if lin is not None:
            wdefs_, vmap_, (jl, jh) = lin
            nksum = len({tuple(wks) for terms in wdefs_
                         for _c, wks in terms})
            live = nksum + len(wdefs_) + len(set(vmap_.values())) + 2
            ext = BW * BK * (tj * BJ + jl + jh) * BIROW * csz
        else:
            live = min(len(ir.sdef.taps), 6) + 2
            ext = BW * BK * tj * BJ * BIROW * csz
        return est + live * ext

    if tile_j is None:
        from .pencil_kernel import choose_tile_j

        tile_j = choose_tile_j(JC, vmem_estimate, vmem_limit_bytes)
    TJ = int(tile_j)
    if JC % TJ:
        raise ValueError(f"tile_j {TJ} must divide computed j extent {JC}")
    JT = JC // TJ
    JW = TJ + 2

    # window slot: w-extended center row (thin w-halo slices of the w±1
    # bricks live alongside the full center brick)
    row_shape = (WE, BK, JW * BJ, BIROW)

    def _clip(x, n):
        return jnp.clip(x, 0, n - 1)

    def _row_copies(ids_ref, dat_refs, wins, sem, wc, jt, w, slot):
        wrow = _clip(W0 + wc, GW)
        wlo = _clip(W0 + wc - 1, GW)
        whi = _clip(W0 + wc + 1, GW)
        krow = _clip(K0 - F + w, GK)
        cps = []
        for cj in range(JW):
            jcol = _clip(J0 - 1 + jt * TJ + cj, GJ)
            jsl = slice(cj * BJ, (cj + 1) * BJ)
            base = (krow * GJ + jcol)
            for fi in range(NF):
                cps.append(pltpu.make_async_copy(
                    dat_refs[fi].at[ids_ref[wrow * GK * GJ + base]],
                    wins[fi].at[slot, WHL:WHL + BW, :, jsl, :],
                    sem.at[slot]))
                if WHL:
                    cps.append(pltpu.make_async_copy(
                        dat_refs[fi].at[ids_ref[wlo * GK * GJ + base],
                                        BW - WHL:, :, :, :],
                        wins[fi].at[slot, :WHL, :, jsl, :],
                        sem.at[slot]))
                if WHH:
                    cps.append(pltpu.make_async_copy(
                        dat_refs[fi].at[ids_ref[whi * GK * GJ + base],
                                        :WHH, :, :, :],
                        wins[fi].at[slot, WHL + BW:, :, jsl, :],
                        sem.at[slot]))
        return cps

    # per-row arithmetic from the shared factory (pencil_kernel.
    # build_row_compute): the w axis rides as one extra leading FREE
    # axis of the slab; j-shifts / lane rolls are identical to 3-D.
    # One builder per distinct level w-extent: each level's output
    # w origin sits lo[0] slices into its source slab (both for the
    # F-deep window halo and for ring rows one extension step wider).
    from .pencil_kernel import build_row_compute

    _rcs = {we: build_row_compute(ir, resolve, lin, _roll_i,
                                  fields=fmap, pre=((lo[0], we),))
            for we in sorted(set(wout.values()))}

    def kernel(ids_ref, *args):
        dat_refs = list(args[:NF])
        out_ref = args[NF]
        rest = list(args[NF + 1:])
        wins = rest[:NF]
        tout = rest[NF]
        rings = rest[NF + 1:NF + F]
        sem, osem = rest[NF + F:]
        wc = pl.program_id(0)
        jt = pl.program_id(1)
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _():
            for w in range(min(W, KC + 2 * F)):
                for cp in _row_copies(ids_ref, dat_refs, wins, sem, wc,
                                      jt, w, w % W):
                    cp.start()

        @pl.when(jnp.logical_and(t > 0, t + 2 * F + D <= KC + 2 * F - 1))
        def _():
            for cp in _row_copies(ids_ref, dat_refs, wins, sem, wc, jt,
                                  t + 2 * F + D, (t + 2 * F + D) % W):
                cp.start()

        @pl.when(t == 0)
        def _():
            for w in range(min(2 * F, KC + 2 * F - 1)):
                for cp in _row_copies(ids_ref, dat_refs, wins, sem,
                                      wc, jt, w, w % W):
                    cp.wait()
        for cp in _row_copies(ids_ref, dat_refs, wins, sem, wc, jt,
                              t + 2 * F, (t + 2 * F) % W):
            cp.wait()

        def _cast(v):
            return (v.astype(compute_dtype)
                    if compute_dtype != dtype else v)

        def win_row_f(fi, a):
            """Absolute grid k-row -> field fi's window slot (content
            edge-clamped by _row_copies)."""
            return _cast(wins[fi][(a + F - K0) % W])

        def win_row(a):
            return win_row_f(0, a)

        def lvl_row(f, x):
            xx = jnp.clip(x, lvlA[f], lvlB[f] - 1)
            return rings[f - 1][xx % lvlS[f]]

        def compute_level(f, x):
            """Level-f row x from level f-1 (f == 1 reads the window);
            returns [wout[f], BK, TJ*BJ + jext, BIROW]."""
            def slab_of(get):
                pieces = []
                if lo[1]:
                    pieces.append(get(x - 1)[:, BK - lo[1]:])
                pieces.append(get(x))
                if hi[1]:
                    pieces.append(get(x + 1)[:, :hi[1]])
                return (jnp.concatenate(pieces, axis=1)
                        if len(pieces) > 1 else pieces[0])

            if NF > 1:   # F == 1: every field reads its own window
                kslab = [slab_of(lambda a, fi=fi: win_row_f(fi, a))
                         for fi in range(NF)]
            else:
                kslab = slab_of(win_row if f == 1
                                else (lambda a: lvl_row(f - 1, a)))
            jout = TJ * BJ + extj_lo[f] + extj_hi[f]
            j0 = (BJ - extj_lo[f]) if f == 1 else lo[2]
            return _rcs[wout[f]](kslab, j0, jout, lo[1], BK)

        # warmup: prime each level's ring backlog
        @pl.when(t == 0)
        def _():
            for f in range(1, F):
                for x in range(lvlA[f], K0 + (F - f)):
                    rings[f - 1][x % lvlS[f]] = compute_level(f, x)

        # cadence: one row per intermediate level per step
        for f in range(1, F):
            x = K0 + t + (F - f)

            @pl.when(x < lvlB[f])
            def _(f=f, x=x):
                rings[f - 1][x % lvlS[f]] = compute_level(f, x)

        out_row = compute_level(F, K0 + t)
        if compute_dtype != dtype:
            out_row = out_row.astype(dtype)

        def _out_copies(tt, parity):
            wrow = W0 + wc
            cps = []
            for cj in range(TJ):
                bid = ids_ref[(wrow * GK + K0 + tt) * GJ
                              + J0 + jt * TJ + cj]
                cps.append(pltpu.make_async_copy(
                    tout.at[parity, :, :, cj * BJ:(cj + 1) * BJ, :],
                    out_ref.at[bid], osem.at[parity]))
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

    nelems = WC * BW * KC * BK * JC * BJ * BIROW
    cost = pl.CostEstimate(
        flops=ir.flops_per_element() * nelems * F,
        bytes_accessed=(NF + 1) * nelems * np.dtype(dtype).itemsize,
        transcendentals=0,
    )
    ring_shapes = [
        pltpu.VMEM((lvlS[f], wout[f], BK,
                    TJ * BJ + extj_lo[f] + extj_hi[f], BIROW),
                   compute_dtype)
        for f in range(1, F)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(WC, JT, KC),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * NF,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((W,) + row_shape, dtype) for _ in range(NF)
        ] + [
            pltpu.VMEM((2, BW, BK, TJ * BJ, BIROW), dtype),
        ] + ring_shapes + [
            pltpu.SemaphoreType.DMA((W,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbricks, BW, BK, BJ, BIROW),
                                       dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )
    ids = jnp.asarray(grid.ravel().astype(np.int32))

    if NF > 1:
        def fn(*dat_views):
            # one [nbricks, BW, BK, BJ, BI] view per input grid, in
            # fn.fields order
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
