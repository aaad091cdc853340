"""Pallas TPU kernel emitter — the single backend replacing the
reference's nine ISA emitters (codegen/st/codegen/backend/{avx512,avx2,
sse,asimd,cuda,...}.py).

Two kernels, one shared tile-compute:

- :func:`pallas_brick_stencil` — the brick fast path.  Each program owns a
  (TK × TJ × all-i) tile of *interior* bricks; the brick-grid table rides
  in SMEM via scalar prefetch (the TPU analog of the reference's
  ``neighbor{0..26} = binfo->adj[b][..]`` prologue,
  codegen/st/codegen/backend/base.py:93-123).  The window of bricks
  including a one-brick halo shell is assembled into a VMEM scratch tile
  by async DMAs — only the sub-box each halo brick actually contributes
  (clipped to the stencil radius), so HBM read amplification is
  ~((T·B+2R)/(T·B))² instead of the 27-neighbor-brick 3.4×.  Then every
  tap is a static shifted slice of the tile (the lane/sublane-roll analog
  of the reference's ``alignr``/``dev_shl`` merges), and output bricks are
  DMA'd back through the grid table.
- :func:`pallas_dense_stencil` — the array twin (the reference's
  ``tile(...)`` codegen path, include/vecscatter.h:27-55): same tile
  compute, but the window is one strided DMA from a padded dense array.

Coefficients are resolved at trace time and baked as constants (the
reference compiles them in via -D defines / const arrays the same way).
"""

from __future__ import annotations
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .evaluate import resolve_const_from_params
from .ir import StencilIR
from .jnp_backend import _as_ir, _np_offsets, _run


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_compute(ir: StencilIR, params: dict, tile_val, base, out_extent,
                  roll_axes: tuple[int, ...] = ()):
    """Evaluate the stencil over a halo-extended VMEM tile value.

    ``tile_val``: [EK, EJ, EI] array; returns [out_extent] array where tap
    (dk,dj,di) reads ``tile_val[base+d : base+d+extent]``.  Axes listed in
    ``roll_axes`` are read at full width with a circular roll instead of a
    slice (used by the dense path to keep every store lane-tile aligned);
    for those axes ``out_extent[a]`` must equal the tile extent.
    """
    dims = ir.dims

    def read_tap(_name, offs_edsl):
        offs = _np_offsets(offs_edsl, dims)
        v = tile_val
        for a in roll_axes:
            if offs[a]:
                v = jnp.roll(v, -offs[a], axis=a)
        sl = tuple(
            slice(None) if a in roll_axes else
            slice(base[a] + offs[a], base[a] + offs[a] + out_extent[a])
            for a in range(dims))
        return v[sl]

    resolve = resolve_const_from_params(params)

    def resolve_static(name):
        return float(resolve(name))

    return _run(ir, read_tap, resolve_static, jnp)


def choose_tile(interior_cells: Sequence[int], bdims: Sequence[int],
                target_elems: int = 32) -> tuple[int, ...]:
    """Pick a cell-tile size per given axis (callers pass the axes they
    tile — the innermost is always covered whole and excluded).  Prefers
    ~``target_elems`` elements per axis, must divide the interior
    cell count."""
    out = []
    for cells, b in zip(interior_cells, bdims):
        want = max(1, target_elems // b)
        t = 1
        for cand in range(1, cells + 1):
            if cells % cand == 0 and cand <= want:
                t = cand
        out.append(t)
    return tuple(out)


W = 4  # rolling-window slots, as in the pencil sweep


def pallas_brick_stencil(stencil, grid: np.ndarray, bdims: Sequence[int],
                         ghost_bricks: Sequence[int], nbricks: int,
                         params: dict | None = None,
                         tile: Sequence[int] | None = None,
                         tile_j: int | None = None,
                         dtype=jnp.float32,
                         compute_dtype=jnp.float32,
                         interpret: bool | None = None,
                         vmem_limit_bytes: int = 110 * 2 ** 20):
    """Streaming brick stencil for distributed-i layouts (BI-brick folds,
    canonically (8, 8, 128)).

    Same architecture as the pencil flagship (pencil_kernel.py): the k
    axis streams through a 4-slot rolling double-buffered VMEM window so
    every brick row is read from HBM exactly once per sweep (no k-halo
    re-reads), j is tiled, and the FULL i extent — including the i-ghost
    bricks — is assembled contiguously along the lane axis per row, so
    i-taps are static lane-offset slices (no rolls: the assembled halo
    plays the reference's dev_shl funnel-shift role, dev_shl.h:11-64).

    - ``grid``: i32 brick-grid table (GK, GJ, GI), interior+skin+ghost
      like the reference's ``bDecomp[k][j][i]`` (brick-mpi.h:49-75);
    - ``ghost_bricks``: per-axis ghost depth in bricks (one ring);
      output covers interior bricks (GB-trimmed, stencils/3axis.cpp:51-56);
    - views are ``[nbricks, *bdims]`` reshapes of storage fields.
    """
    ir = _as_ir(stencil)
    params = dict(params or {})
    if interpret is None:
        interpret = _default_interpret()
    if ir.dims != 3:
        raise NotImplementedError("pallas brick path is 3-D for now; "
                                  "use brick_apply for other ranks")
    if len(ir.sdef.inputs) != 1:
        raise NotImplementedError(
            "pallas paths read one input grid; multi-input stencils run "
            "through brick_apply")
    BK, BJ, BI = (int(b) for b in bdims)
    if not interpret and (BI % 128 or BJ % 8):
        raise ValueError(
            f"Mosaic DMA granularity: bricks need BI a multiple of 128 "
            f"and BJ a multiple of 8 on hardware, got {(BK, BJ, BI)}; "
            f"use brick_apply for other folds")
    grid = np.asarray(grid)
    GK, GJ, GI = grid.shape
    gz = tuple(int(g) for g in ghost_bricks)
    lo, hi = ir.radius()
    for a in range(3):
        if lo[a] > (BK, BJ, BI)[a] or hi[a] > (BK, BJ, BI)[a]:
            raise ValueError("stencil radius exceeds brick dim")

    K0, K1 = gz[0], GK - gz[0]
    J0, J1 = gz[1], GJ - gz[1]
    I0 = gz[2]
    KC, JC = K1 - K0, J1 - J0
    NI = GI - 2 * gz[2]
    IW = NI * BI                   # written i extent (elements)
    ilo_r, ihi_r = lo[2], hi[2]

    from .evaluate import resolve_const_from_params as _res
    resolve = _res(params)

    # hierarchical factorization shared by every Pallas emitter
    # (codegen.ir.fold_linear); i is handled like j here (slices of the
    # assembled row instead of lane rolls)
    from .ir import fold_linear

    lin = fold_linear(ir, resolve)

    isz = np.dtype(dtype).itemsize
    csz = np.dtype(jnp.dtype(compute_dtype)).itemsize
    RI = GI * BI                  # assembled row i extent

    def vmem_estimate(tj: int) -> int:
        row = BK * (tj + 2) * BJ * RI
        est = W * row * isz + 2 * BK * tj * BJ * IW * isz
        est += (BK + lo[0] + hi[0]) * (tj + 2) * BJ * RI * csz  # kslab
        if lin is not None:
            wdefs_, vmap_, (jl, jh) = lin
            nksum = len({dks for terms in wdefs_ for _c, dks in terms})
            live = nksum + len(wdefs_) + len(set(vmap_.values())) + 2
            ext = BK * (tj * BJ + jl + jh) * (IW + ilo_r + ihi_r) * csz
        else:
            live = min(len(ir.sdef.taps), 6) + 2
            ext = BK * tj * BJ * IW * csz
        return est + live * ext

    if tile_j is None and tile is not None:
        tile_j = int(tile[-1])     # legacy (TK, TJ) tuples: TK is moot
    if tile_j is None:
        budget = int(0.85 * vmem_limit_bytes)
        tile_j = 1
        for cand in range(1, JC + 1):
            if JC % cand == 0 and vmem_estimate(cand) <= budget:
                tile_j = cand
    TJ = int(tile_j)
    if JC % TJ:
        raise ValueError(f"tile_j {TJ} must divide interior j {JC}")
    JT = JC // TJ
    JW = TJ + 2

    row_shape = (BK, JW * BJ, RI)

    def _clip(x, n):
        return jnp.clip(x, 0, n - 1)

    def _row_copies(ids_ref, dat_ref, win, sem, jt, w, slot):
        krow = _clip(K0 - 1 + w, GK)
        cps = []
        for cj in range(JW):
            jcol = _clip(J0 - 1 + jt * TJ + cj, GJ)
            for ci in range(GI):
                bid = ids_ref[(krow * GJ + jcol) * GI + ci]
                cps.append(pltpu.make_async_copy(
                    dat_ref.at[bid],
                    win.at[slot, :, cj * BJ:(cj + 1) * BJ,
                           ci * BI:(ci + 1) * BI],
                    sem.at[slot]))
        return cps

    ibase = I0 * BI

    def _compute(kslab):
        """kslab: [BK+lok+hik, JW*BJ, RI] -> [BK, TJ*BJ, IW]."""
        if lin is not None:
            wdefs_, vmap_, (jlo_r, jhi_r) = lin
            JE = TJ * BJ + jlo_r + jhi_r
            IE = IW + ilo_r + ihi_r
            kcache: dict = {}

            def ksum(dks):
                if dks not in kcache:
                    v = None
                    for (dk,) in dks:
                        s = kslab[lo[0] + dk:lo[0] + dk + BK,
                                  BJ - jlo_r:BJ - jlo_r + JE,
                                  ibase - ilo_r:ibase - ilo_r + IE]
                        v = s if v is None else v + s
                    kcache[dks] = v
                return kcache[dks]

            Ws = []
            for terms in wdefs_:
                acc = None
                for c, dks in terms:
                    t = ksum(dks)
                    t = t if c == 1.0 else c * t
                    acc = t if acc is None else acc + t
                Ws.append(acc)
            out = None
            vcache: dict = {}
            for di, terms in sorted(vmap_.items()):
                V = vcache.get(terms)
                if V is None:
                    for dj, wid in terms:
                        sl = Ws[wid][:, jlo_r + dj:jlo_r + dj + TJ * BJ, :]
                        V = sl if V is None else V + sl
                    vcache[terms] = V
                t = V[:, :, ilo_r + di:ilo_r + di + IW]
                out = t if out is None else out + t
            return out

        def read_tap(_name, offs_edsl):
            offs = _np_offsets(offs_edsl, 3)
            return kslab[lo[0] + offs[0]:lo[0] + offs[0] + BK,
                         BJ + offs[1]:BJ + offs[1] + TJ * BJ,
                         ibase + offs[2]:ibase + offs[2] + IW]

        return _run(ir, read_tap, lambda n: float(resolve(n)), jnp)

    def kernel(ids_ref, dat_ref, out_ref, win, tout, sem, osem):
        jt = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            for w in range(min(W, KC + 2)):
                for cp in _row_copies(ids_ref, dat_ref, win, sem, jt,
                                      w, w % W):
                    cp.start()

        @pl.when(jnp.logical_and(t > 0, t + 3 <= KC + 1))
        def _():
            for cp in _row_copies(ids_ref, dat_ref, win, sem, jt,
                                  t + 3, (t + 3) % W):
                cp.start()

        @pl.when(t == 0)
        def _():
            for w in range(2):
                for cp in _row_copies(ids_ref, dat_ref, win, sem,
                                      jt, w, w % W):
                    cp.wait()
        for cp in _row_copies(ids_ref, dat_ref, win, sem, jt,
                              t + 2, (t + 2) % W):
            cp.wait()

        pieces = []
        if lo[0]:
            pieces.append(win[t % W, BK - lo[0]:, :, :])
        pieces.append(win[(t + 1) % W])
        if hi[0]:
            pieces.append(win[(t + 2) % W, :hi[0], :, :])
        kslab = (jnp.concatenate(pieces, axis=0)
                 if len(pieces) > 1 else pieces[0])
        if compute_dtype != dtype:
            kslab = kslab.astype(compute_dtype)

        out_row = _compute(kslab)
        if compute_dtype != dtype:
            out_row = out_row.astype(dtype)

        def _out_copies(tt, parity):
            cps = []
            for cj in range(TJ):
                for ci in range(NI):
                    bid = ids_ref[((K0 + tt) * GJ + J0 + jt * TJ + cj)
                                  * GI + I0 + ci]
                    cps.append(pltpu.make_async_copy(
                        tout.at[parity, :, cj * BJ:(cj + 1) * BJ,
                                ci * BI:(ci + 1) * BI],
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

    nelems = KC * BK * JC * BJ * IW
    cost = pl.CostEstimate(
        flops=ir.flops_per_element() * nelems,
        bytes_accessed=2 * nelems * np.dtype(dtype).itemsize,
        transcendentals=0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(JT, KC),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((W,) + row_shape, dtype),
            pltpu.VMEM((2, BK, TJ * BJ, IW), dtype),
            pltpu.SemaphoreType.DMA((W,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbricks, BK, BJ, BI), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )
    ids = jnp.asarray(grid.ravel().astype(np.int32))

    def fn(dat_in_view):
        return call(ids, dat_in_view)

    fn.tile_j = TJ
    fn.vmem_bytes = vmem_estimate(TJ)
    fn.vmem_limit_bytes = vmem_limit_bytes
    return fn


def pallas_dense_stencil(stencil, shape: Sequence[int],
                         padding: Sequence[int],
                         params: dict | None = None,
                         tile_elems: Sequence[int] | None = None,
                         dtype=jnp.float32,
                         interpret: bool | None = None,
                         vmem_limit_bytes: int = 100 * 2 ** 20):
    """Build ``fn(arr) -> arr_out`` over a padded dense array — the array
    codegen twin (ref: ``tile(...)`` sites, stencils/3axis.cpp:68-76).

    ``shape`` is the full padded array shape; ``padding`` per-axis ghost
    depth (must be ≥ stencil radius).  Interior = shape - 2·padding is
    computed; the pad region of the output is zero.
    """
    ir = _as_ir(stencil)
    params = dict(params or {})
    if interpret is None:
        interpret = _default_interpret()
    dims = ir.dims
    if dims != 3:
        raise NotImplementedError("dense pallas path is 3-D for now")
    shape = tuple(int(s) for s in shape)
    pad = tuple(int(p) for p in padding)
    lo, hi = ir.radius()
    for a in range(dims):
        if pad[a] < max(lo[a], hi[a]):
            raise ValueError("padding smaller than stencil radius")
    # lane axis of HBM arrays is only DMA-addressable in whole 128-lane
    # tiles, so windows span the full padded i extent
    if shape[2] % 128:
        raise ValueError("innermost padded extent must be a multiple of "
                         "128 (choose pad[2] accordingly)")
    interior = tuple(shape[a] - 2 * pad[a] for a in range(dims))

    if tile_elems is None:
        tk = next(t for t in (32, 16, 8, 4, 2, 1) if interior[0] % t == 0)
        tj = next(t for t in (64, 32, 16, 8) if interior[1] % t == 0)
        tile_elems = (tk, tj)
    TKE, TJE = (int(t) for t in tile_elems)
    if interior[0] % TKE or interior[1] % TJE:
        raise ValueError(f"tile {tile_elems} must divide interior")
    if TJE % 8:
        raise ValueError("j tile must be a sublane multiple (8)")
    NIE = interior[2]
    # j halo rounded up to whole sublane tiles (DMA granularity); k is an
    # untiled axis and slices freely
    jlo = -(-lo[1] // 8) * 8
    jhi = -(-hi[1] // 8) * 8
    if pad[1] < jlo or pad[1] < jhi:
        raise ValueError("pad[1] must cover the sublane-rounded j halo")
    EK, EJ, EI = TKE + lo[0] + hi[0], TJE + jlo + jhi, shape[2]
    out_extent = (TKE, TJE, NIE)

    def kernel(arr_ref, out_ref, tin, tout, sem):
        a = pl.program_id(0)
        b = pl.program_id(1)
        k0 = pad[0] + a * TKE
        j0 = pad[1] + b * TJE
        cp = pltpu.make_async_copy(
            arr_ref.at[pl.ds(k0 - lo[0], EK), pl.ds(j0 - jlo, EJ), :],
            tin, sem)
        cp.start()
        cp.wait()
        # i-taps via circular roll at full row width: every load/store
        # stays lane-tile aligned; the pad region holds wrapped garbage
        # that validation ignores (like the reference's untouched PADDING)
        tout[...] = _tile_compute(
            ir, params, tin[...], (lo[0], jlo, 0),
            (TKE, TJE, shape[2]), roll_axes=(2,))
        cp = pltpu.make_async_copy(
            tout, out_ref.at[pl.ds(k0, TKE), pl.ds(j0, TJE), :], sem)
        cp.start()
        cp.wait()

    nelems = int(np.prod(interior))
    cost = pl.CostEstimate(
        flops=ir.flops_per_element() * nelems,
        bytes_accessed=2 * nelems * np.dtype(dtype).itemsize,
        transcendentals=0,
    )
    call = pl.pallas_call(
        kernel,
        grid=(interior[0] // TKE, interior[1] // TJE),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((EK, EJ, EI), dtype),
            pltpu.VMEM((TKE, TJE, shape[2]), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )

    def fn(arr):
        return call(arr)

    return fn
