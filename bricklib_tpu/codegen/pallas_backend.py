"""Pallas TPU kernel emitters beyond the flagship sweep.

The single streaming emitter replacing the reference's nine ISA
backends (codegen/st/codegen/backend/{avx512,avx2,sse,asimd,cuda,...})
lives in :mod:`.pencil_kernel`; this module provides:

- :func:`pallas_brick_stencil` — the distributed-i brick surface: a
  thin wrapper putting the unified sweep in i-bricked mode (assembled
  lane-axis i-ghost halos; the brick-grid table rides in SMEM via
  scalar prefetch, the TPU analog of the reference's
  ``neighbor{0..26} = binfo->adj[b][..]`` prologue,
  codegen/st/codegen/backend/base.py:93-123).
- :func:`pallas_dense_stencil` — the array twin (the reference's
  ``tile(...)`` codegen path, include/vecscatter.h:27-55): one strided
  DMA window from a padded dense array, taps as shifted slices/rolls.

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
                  roll_axes: tuple[int, ...] = (), fields=None):
    """Evaluate the stencil over a halo-extended VMEM tile value.

    ``tile_val``: [EK, EJ, EI] array; returns [out_extent] array where tap
    (dk,dj,di) reads ``tile_val[base+d : base+d+extent]``.  Axes listed in
    ``roll_axes`` are read at full width with a circular roll instead of a
    slice (used by the dense path to keep every store lane-tile aligned);
    for those axes ``out_extent[a]`` must equal the tile extent.

    Multi-input stencils: ``fields`` maps grid name -> index and
    ``tile_val`` is a list of per-field tiles."""
    dims = ir.dims

    def read_tap(name, offs_edsl):
        offs = _np_offsets(offs_edsl, dims)
        v = tile_val[fields[name]] if fields is not None else tile_val
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


def pallas_brick_stencil(stencil, grid: np.ndarray, bdims: Sequence[int],
                         ghost_bricks: Sequence[int], nbricks: int,
                         params: dict | None = None,
                         tile: Sequence[int] | None = None,
                         tile_j: int | None = None,
                         **kw):
    """Streaming brick stencil for distributed-i layouts (BI-brick
    folds, canonically (8, 8, 128)) — a thin wrapper over the unified
    streaming emitter (:func:`..pencil_kernel.pallas_pencil_sweep` in
    i-bricked mode): rolling double-buffered k-window, VMEM-budget j
    tiles, banded compute, and the full i extent including ghost bricks
    assembled contiguously along the lane axis per row so i-taps are
    static lane-offset slices (the assembled halo plays the reference's
    dev_shl funnel-shift role, dev_shl.h:11-64).  Supports the sweep's
    batch/fuse/range options via ``**kw``.

    - ``grid``: i32 brick-grid table (GK, GJ, GI), interior+skin+ghost
      like the reference's ``bDecomp[k][j][i]`` (brick-mpi.h:49-75);
    - ``ghost_bricks``: per-axis ghost depth in bricks;
      output covers interior bricks (GB-trimmed, stencils/3axis.cpp:51-56);
    - views are ``[nbricks, *bdims]`` reshapes of storage fields.
    """
    from .pencil_kernel import pallas_pencil_sweep

    grid = np.asarray(grid)
    gz = tuple(int(g) for g in ghost_bricks)
    GK, GJ, GI = grid.shape
    if tile_j is None and tile is not None:
        tile_j = int(tile[-1])     # legacy (TK, TJ) tuples: TK is moot
    return pallas_pencil_sweep(
        stencil, grid, bdims, nbricks, params,
        k_range=kw.pop("k_range", (gz[0], GK - gz[0])),
        j_range=kw.pop("j_range", (gz[1], GJ - gz[1])),
        i_range=kw.pop("i_range", (gz[2], GI - gz[2])),
        i_ghost=gz[2], tile_j=tile_j, **kw)


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
    computed; the pad region of the output is zero.  Multi-input
    stencils take one padded array per field, ``fn(*arrs)`` in
    ``fn.fields`` order.
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

    fieldnames = list(ir.sdef.inputs)
    NF = len(fieldnames)
    fmap = {n: i for i, n in enumerate(fieldnames)} if NF > 1 else None

    def kernel(*args):
        arr_refs = args[:NF]
        out_ref = args[NF]
        tins = args[NF + 1:NF + 1 + NF]
        tout, sem = args[NF + 1 + NF:]
        a = pl.program_id(0)
        b = pl.program_id(1)
        k0 = pad[0] + a * TKE
        j0 = pad[1] + b * TJE
        cps = []
        for arr_ref, tin in zip(arr_refs, tins):
            cp = pltpu.make_async_copy(
                arr_ref.at[pl.ds(k0 - lo[0], EK), pl.ds(j0 - jlo, EJ),
                           :],
                tin, sem)
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()
        # i-taps via circular roll at full row width: every load/store
        # stays lane-tile aligned; the pad region holds wrapped garbage
        # that validation ignores (like the reference's untouched PADDING)
        tv = [t[...] for t in tins] if fmap is not None else tins[0][...]
        tout[...] = _tile_compute(
            ir, params, tv, (lo[0], jlo, 0),
            (TKE, TJE, shape[2]), roll_axes=(2,), fields=fmap)
        cp = pltpu.make_async_copy(
            tout, out_ref.at[pl.ds(k0, TKE), pl.ds(j0, TJE), :], sem)
        cp.start()
        cp.wait()

    nelems = int(np.prod(interior))
    cost = pl.CostEstimate(
        flops=ir.flops_per_element() * nelems,
        bytes_accessed=(NF + 1) * nelems * np.dtype(dtype).itemsize,
        transcendentals=0,
    )
    call = pl.pallas_call(
        kernel,
        grid=(interior[0] // TKE, interior[1] // TJE),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * NF,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((EK, EJ, EI), dtype) for _ in range(NF)
        ] + [
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

    if NF > 1:
        def fn(*arrs):
            if len(arrs) != NF:
                raise TypeError(f"stencil reads {NF} grids "
                                f"({fieldnames}), got {len(arrs)}")
            return call(*arrs)
        fn.fields = tuple(fieldnames)
    else:
        def fn(arr):
            return call(arr)

    return fn
