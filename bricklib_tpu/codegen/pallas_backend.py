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


def pallas_brick_stencil(stencil, grid: np.ndarray, bdims: Sequence[int],
                         ghost_bricks: Sequence[int], nbricks: int,
                         params: dict | None = None,
                         tile: Sequence[int] | None = None,
                         dtype=jnp.float32,
                         interpret: bool | None = None,
                         vmem_limit_bytes: int = 100 * 2 ** 20):
    """Build a jittable ``fn(dat_in_view) -> dat_out_view`` brick stencil.

    - ``grid``: i32 brick-grid table (grid coords → storage brick index),
      covering interior+skin+ghost cells like the reference's
      ``bDecomp[k][j][i]`` accessor (include/brick-mpi.h:49-75).
    - ``bdims``: brick shape (outermost first).  Pallas path requires the
      last dim to be a multiple of 128 and the middle a multiple of 8
      for float32 (the canonical TPU fold); other folds use the jnp path.
    - ``ghost_bricks``: ghost depth per axis in bricks; output is computed
      for interior (non-ghost) bricks only, like the drivers' GB-trimmed
      loops (stencils/3axis.cpp:51-56).
    - views are ``[nbricks, *bdims]`` reshapes of storage fields.
    """
    ir = _as_ir(stencil)
    params = dict(params or {})
    if interpret is None:
        interpret = _default_interpret()

    dims = ir.dims
    if dims != 3:
        raise NotImplementedError("pallas brick path is 3-D for now; "
                                  "use brick_apply for other ranks")
    if len(ir.sdef.inputs) != 1:
        raise NotImplementedError(
            "pallas paths read one input grid; multi-input stencils run "
            "through brick_apply")
    bdims = tuple(int(b) for b in bdims)
    BK, BJ, BI = bdims
    gshape = grid.shape
    gz = tuple(int(g) for g in ghost_bricks)
    lo, hi = ir.radius()
    for a in range(dims):
        if lo[a] > bdims[a] or hi[a] > bdims[a]:
            raise ValueError("stencil radius exceeds brick dim")

    interior = tuple(gshape[a] - 2 * gz[a] for a in range(dims))
    if tile is None:
        tile = choose_tile(interior[:2], bdims[:2])
    TK, TJ = (int(t) for t in tile)
    if interior[0] % TK or interior[1] % TJ:
        raise ValueError(f"tile {tile} must divide interior {interior[:2]}")
    NI = interior[2]

    # Halo-extended tile extents.  DMA slices must be whole (8,128) tiles
    # in the VMEM (sublane, lane) = (j, i) axes, so j/i halos are full
    # bricks; only the k-axis halo is a thin slab clipped to the stencil
    # radius (outer dims slice freely).
    halo_lo = (lo[0], BJ, BI)
    halo_hi = (hi[0], BJ, BI)
    EK = TK * BK + lo[0] + hi[0]
    EJ = (TJ + 2) * BJ
    EI = (NI + 2) * BI
    out_extent = (TK * BK, TJ * BJ, NI * BI)
    # output is computed and written back one j brick-row at a time to
    # halve VMEM pressure (tout holds a single row chunk)
    chunk_extent = (TK * BK, BJ, NI * BI)

    # grid table padded with one ring of garbage brick 0 so halo reads
    # beyond the table are well-defined; flattened because SMEM pads the
    # trailing dim of multi-D scalar-prefetch arrays to 128 lanes
    gridp = np.zeros(tuple(s + 2 for s in gshape), dtype=np.int32)
    gridp[1:-1, 1:-1, 1:-1] = grid
    GJP, GIP = gridp.shape[1], gridp.shape[2]

    cells = (TK + 2, TJ + 2, NI + 2)

    def borig(a, c):
        # element origin of window cell c in tile coords (cell 0 = low halo)
        return bdims[a] * (c - 1) + halo_lo[a]

    def kernel(ids_ref, dat_ref, out_ref, tin, tout, sem):
        a = pl.program_id(0)
        b = pl.program_id(1)
        # padded-grid coord of window cell 0 per axis
        p0 = (gz[0] + a * TK, gz[1] + b * TJ, gz[2])

        def bid_at(ck, cj, ci):
            return ids_ref[((p0[0] + ck) * GJP + p0[1] + cj) * GIP
                           + p0[2] + ci]

        # -- assemble halo window ---------------------------------------
        copies = []
        for ck in range(cells[0]):
            for cj in range(cells[1]):
                for ci in range(cells[2]):
                    src, dst = [], []
                    skip = False
                    for ax, c in zip(range(3), (ck, cj, ci)):
                        o = borig(ax, c)
                        if ax != 0:
                            # sublane/lane axes: whole bricks (tile-aligned)
                            dst.append(slice(o, o + bdims[ax]))
                            src.append(slice(0, bdims[ax]))
                            continue
                        s0 = max(o, 0)
                        s1 = min(o + bdims[ax], EK)
                        if s1 <= s0:
                            skip = True
                            break
                        dst.append(slice(s0, s1))
                        src.append(slice(s0 - o, s1 - o))
                    if skip:
                        continue
                    bid = bid_at(ck, cj, ci)
                    cp = pltpu.make_async_copy(
                        dat_ref.at[(bid,) + tuple(src)],
                        tin.at[tuple(dst)], sem)
                    cp.start()
                    copies.append(cp)
        for cp in copies:
            cp.wait()

        # -- compute + scatter, one j brick-row at a time ------------------
        tile_val = tin[...]
        prev = []
        for cj in range(TJ):
            base = (lo[0], (1 + cj) * BJ, BI)
            chunk = _tile_compute(ir, params, tile_val, base, chunk_extent)
            for cp in prev:  # previous row's writes must land before reuse
                cp.wait()
            prev = []
            tout[...] = chunk
            for ck in range(TK):
                for ci in range(NI):
                    bid = bid_at(1 + ck, 1 + cj, 1 + ci)
                    cp = pltpu.make_async_copy(
                        tout.at[ck * BK:(ck + 1) * BK, :,
                                ci * BI:(ci + 1) * BI],
                        out_ref.at[bid], sem)
                    cp.start()
                    prev.append(cp)
        for cp in prev:
            cp.wait()

    nelems = int(np.prod(interior)) * BK * BJ * BI
    cost = pl.CostEstimate(
        flops=ir.flops_per_element() * nelems,
        bytes_accessed=2 * nelems * np.dtype(dtype).itemsize,
        transcendentals=0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(interior[0] // TK, interior[1] // TJ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((EK, EJ, EI), dtype),
            pltpu.VMEM(chunk_extent, dtype),
            pltpu.SemaphoreType.DMA,
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
    ids = jnp.asarray(gridp.ravel())

    def fn(dat_in_view):
        return call(ids, dat_in_view)

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
