"""Pencil-brick streaming stencil kernel — the flagship TPU fast path.

Key insight: the TPU lane axis is only DMA-addressable in whole 128-lane
tiles, so *thin* i-halos cannot be fetched from HBM.  Instead of paying a
full ghost brick per 128-wide halo (1.5x read amplification at 512^3),
the canonical fast-path brick spans the device's ENTIRE i extent
("pencil brick", e.g. (8, 8, 512)), the i axis stays undistributed
(mesh axes ride the outer dims, which is how TPU shardings want to be
laid out anyway), and i-taps become in-register lane rolls with periodic
wrap — the Pallas analog of the reference's dev_shl funnel shift across
brick boundaries (include/dev_shl.h:11-64).

The k axis streams: grid = (batch, j-tiles, k rows) with k fastest; a
rolling VMEM window holds the live brick rows so every row is read from
HBM exactly once per sweep (no k-halo re-reads) and the next row's DMA
overlaps the current row's compute (double buffering, cf. pallas_guide
'Patterns: Double Buffering').  Per-level compute is BANDED: interior
output rows read only the center slot (pure slices); radius-thin
boundary bands assemble tiny 2-piece concats — the full-row halo concat
was the single largest VPU cost per row.

:func:`pallas_pencil_sweep` computes an arbitrary rectangular sub-range
of the brick grid; windows clamp at the table edge.  This one emitter
provides every schedule the drivers need:

- the classic interior sweep (``skip=1`` — the reference drivers'
  GB-trimmed loops, stencils/3axis.cpp:51-56),
- the ghost-inclusive sweep (``skip=0``) that lets ``ST_ITER`` deep-ghost
  iterations run between exchanges with a stale outer ring — the
  reference's flagship weak-scaling trick (weak/main.cpp:203-212):
  contamination enters clamped edge windows at radius elements per
  iteration and stays inside the ghost for st_iter*radius <= ghost depth,
- interior/ring partial sweeps (in-place via ``out_prev`` aliasing) so a
  driver can compute ghost-independent rows concurrently with the
  ppermute exchange — the sep_pos interior/boundary overlap
  (ref: brick-mpi.h:196; weak/main.cu:251-291),
- batched sweeps over the strong-scaling subdomain stacks
  (``batch``/``batch_stride``, ref: strong/main.cpp:37-50),
- temporally FUSED sweeps (``fuse=F``): F stencil iterations per HBM
  pass, intermediates in per-level VMEM rings — per-iteration memory
  traffic divides by F until the VPU saturates (F=4 optimal for 7pt:
  1.54x the copy roofline per iteration at 512^3),
- MULTI-INPUT stencils (variable-coefficient fields, the reference
  codegen's per-grid support, codegen/st/codegen/backend/base.py:
  93-123): one rolling window per field over one shared grid table,
  ``fn(*views)`` in ``fn.fields`` order; fusion composes (per-level
  rings read the static aux windows — the aux fields are
  iteration-invariant across the fused levels).

Works on any layout whose grid table has i-extent 1 (one pencil per
(k, j) cell): dense init_grid or BrickDecomp with ghost_depth[i] = 0.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .evaluate import resolve_const_from_params
from .ir import StencilIR, fold_linear  # noqa: F401 (re-exported)
from .jnp_backend import _as_ir, _np_offsets, _run


# --- shared per-row machinery -----------------------------------------
# The fused-exchange kernel (:mod:`.fused_exchange`) must be bit-exact
# equal to [exchange -> this sweep]; both emitters therefore build their
# per-row arithmetic from these factories rather than keeping copies.

def build_row_compute(ir, resolve, lin, roll_i, *, islice=False,
                      ilo_r=0, ihi_r=0, fields=None, pre=(),
                      roll_j=None):
    """Return ``compute(kslab, j0, jout, base, nrows, i0=0, iout=0)``
    evaluating ``nrows`` output k-rows from a k-slab covering
    [base - lo_k, base + nrows + hi_k); ``j0``/``i0`` are the kslab
    coordinates of the output's first element (i only in i-bricked
    mode; pencil mode computes the full lane-roll width).

    ``lin`` is :func:`..ir.fold_linear`'s factorization (or None for
    the generic tap walk); ``roll_i`` the periodic lane roll.

    ``fields`` (multi-input stencils, ref: the codegen's per-grid
    neighbor prologues, codegen/st/codegen/backend/base.py:93-123):
    map grid name -> field index; ``kslab`` is then a LIST of
    per-field slabs and ``lin`` must come from ``fold_linear(...,
    fields=fields)`` so its outer-offset tuples carry the index.
    ``j0`` may then also be a per-field list — fused multi-input
    levels mix ring-sourced slabs (evolving field) with window-sourced
    slabs (static aux fields), whose j origins differ.

    ``pre``: (origin, extent) per extra leading FREE axis of the slab
    before the banded k axis (the 4-D path's w axis,
    ref: weak/main-4d.cpp:36-53); ``lin``'s outer-offset tuples then
    run outermost-first over (pre axes..., k)."""
    multi = fields is not None
    L = len(pre)

    def compute(kslab, j0, jout, base, nrows, i0=0, iout=0):
        j0s = (j0 if isinstance(j0, (list, tuple))
               else [j0] * (len(fields) if multi else 1))
        isl = (slice(i0 - ilo_r, i0 + iout + ihi_r) if islice
               else slice(None))

        def outer_idx(outs):
            return tuple(
                slice(pre[a][0] + outs[a],
                      pre[a][0] + outs[a] + pre[a][1])
                for a in range(L)
            ) + (slice(base + outs[L], base + outs[L] + nrows),)

        if lin is not None:
            wdefs, vmap_, (jlo_r, jhi_r) = lin
            # j-shift realization: "slice" extracts each shifted window
            # (one sublane realign per unaligned offset); "roll" builds
            # W on an 8-ALIGNED base and rotates the sublane axis with
            # pltpu.roll, making the post-roll extract slice-aligned.
            # roll mode is only sound while the 8-aligned W base covers
            # the full low j-halo (the slab spans offsets [-8, jout +
            # jhi_r)); a j-radius > 8 would need data the base never
            # holds — fall back to the slice realization
            use_roll = (roll_j is not None and jlo_r <= 8
                        and all(jf >= 8 for jf in j0s))
            AL = 8 if use_roll else jlo_r
            JE = jout + AL + jhi_r

            kcache: dict = {}

            def ksum(dks):
                if dks not in kcache:
                    v = None
                    for fr in dks:
                        if multi:
                            f, outs = fr[0], fr[1:]
                            src = kslab[f]
                        else:
                            outs = fr
                            f = 0
                            src = kslab
                        jf = j0s[f]
                        s = src[outer_idx(outs)
                                + (slice(jf - AL, jf - AL + JE),
                                   isl)]
                        v = s if v is None else v + s
                    kcache[dks] = v
                return kcache[dks]

            Ws = []
            for terms in wdefs:
                W_ = None
                for c, dks in terms:
                    t = ksum(dks)
                    t = t if c == 1.0 else c * t
                    W_ = t if W_ is None else W_ + t
                Ws.append(W_)
            out = None
            vcache: dict = {}    # ±di with equal structure share one V
            for di, terms in sorted(vmap_.items()):
                V = vcache.get(terms)
                if V is None:
                    for dj, wid in terms:
                        if use_roll and dj:
                            sl = roll_j(Ws[wid], dj)[
                                ..., AL:AL + jout, :]
                        else:
                            sl = Ws[wid][...,
                                         AL + dj:AL + dj + jout, :]
                        V = sl if V is None else V + sl
                    vcache[terms] = V
                t = (V[..., ilo_r + di:ilo_r + di + iout] if islice
                     else roll_i(V, di))
                out = t if out is None else out + t
            return out

        def read_tap(name, offs_edsl):
            offs = _np_offsets(offs_edsl, 3 + L)
            src = kslab[fields[name]] if multi else kslab
            jf = j0s[fields[name]] if multi else j0s[0]
            v = src[outer_idx(tuple(offs[:L + 1]))
                    + (slice(jf + offs[L + 1],
                             jf + offs[L + 1] + jout),
                       (slice(i0 + offs[L + 2],
                              i0 + offs[L + 2] + iout)
                        if islice else slice(None)))]
            if not islice and offs[L + 2]:
                v = roll_i(v, offs[L + 2])
            return v

        return _run(ir, read_tap, lambda n: float(resolve(n)), jnp)

    return compute


def banded_row(src, x, cast, write, compute, BK, lo0, hi0, pre_hi=None):
    """Emit one output brick row ``x`` in k-bands: interior rows read
    ONLY the center source row (pure slices — the full-row halo concat
    was the single largest VPU cost per row); radius-thin boundary
    bands assemble tiny 2-piece concats.  Falls back to the full
    3-piece concat when the radius spans the brick (strictly cheaper
    there: one (BK + lo0 + hi0)-row slab instead of two overlapping
    band slabs).

    ``src(a, rows)`` reads source row ``a``; ``cast`` promotes to the
    compute dtype; ``compute(kslab, base, nrows)`` evaluates the
    stencil; ``write(r0, r1, v)`` stores band [r0, r1).  ``src`` may
    return a list of per-field rows (multi-input stencils) — slabs are
    then assembled per field and ``compute`` receives the list.

    ``pre_hi``: wait-late hook run after the mid and low bands (which
    read only rows ``x - 1`` and ``x``) and before the high band — the
    caller waits row ``x + 1``'s DMA there, so most of the row's VPU
    work overlaps the newest window row's transfer."""

    def amap(fn, v):
        return [fn(e) for e in v] if isinstance(v, list) else fn(v)

    def acat(pieces):
        if len(pieces) == 1:
            return pieces[0]
        if isinstance(pieces[0], list):
            return [jnp.concatenate([p[f] for p in pieces], axis=0)
                    for f in range(len(pieces[0]))]
        return jnp.concatenate(pieces, axis=0)

    banded = BK > lo0 + hi0 and (lo0 or hi0)
    if not banded:
        if pre_hi is not None:
            pre_hi()
        pieces = []
        if lo0:
            pieces.append(amap(cast, src(x - 1, slice(BK - lo0, BK))))
        pieces.append(amap(cast, src(x)))
        if hi0:
            pieces.append(amap(cast, src(x + 1, slice(0, hi0))))
        write(0, BK, compute(acat(pieces), lo0, BK))
        return
    cur = amap(cast, src(x))
    mid0, mid1 = lo0, BK - hi0
    if mid1 > mid0:
        write(mid0, mid1, compute(cur, lo0, mid1 - mid0))
    if lo0:
        piece = acat([amap(cast, src(x - 1, slice(BK - lo0, BK))),
                      amap(lambda v: v[:lo0 + hi0], cur)])
        write(0, lo0, compute(piece, lo0, lo0))
    if pre_hi is not None:
        pre_hi()
    if hi0:
        piece = acat([amap(lambda v: v[BK - hi0 - lo0:], cur),
                      amap(cast, src(x + 1, slice(0, hi0)))])
        write(mid1, BK, compute(piece, lo0, hi0))


def pencil_vmem_estimate(tj: int, *, BK, BJ, RI, IW, isz, csz, NW,
                         lo_k, hi_k, lin, ntaps, ie=0, rings=(),
                         nfields=1, nout=1) -> int:
    """VMEM bytes for a ``tj``-pencil tile of the streaming sweep (the
    surviving form of the reference codegen's MSIZE/THRES machinery,
    base.py:445-519): window slots + out double-buffer + kslab + live
    row-sized temporaries of the factorized compute.  ``rings`` holds
    (slots, j_ext, i_ext) per fused intermediate level (already
    repeated per output for systems); ``nout`` output double-buffers."""
    row = BK * (tj + 2) * BJ * RI
    est = NW * row * isz * nfields            # rolling window per field
    est += 2 * BK * tj * BJ * IW * isz * nout  # tout double buffers
    est += ((BK + lo_k + hi_k) * (tj + 2) * BJ * RI * csz
            * nfields)                        # kslab per field
    for slots, jext, iext in rings:           # fused-level rings
        est += slots * BK * (tj * BJ + jext) * (IW + iext) * csz
    if lin is not None:
        wdefs_, vmap_, (jl, jh) = lin
        nksum = len({dks for terms in wdefs_ for _c, dks in terms})
        nv = len(set(vmap_.values()))
        live = nksum + len(wdefs_) + nv + 2
        ext = BK * (tj * BJ + jl + jh) * (IW + ie) * csz
    else:
        live = min(ntaps, 6) + 2
        ext = BK * tj * BJ * (IW + ie) * csz
    return est + live * ext


def choose_tile_j(JC: int, estimate, vmem_limit_bytes: int) -> int:
    """Largest divisor of ``JC`` whose ``estimate(tj)`` fits 85% of the
    scoped VMEM budget (headroom for Mosaic's own scratch)."""
    budget = int(0.85 * vmem_limit_bytes)
    tile = 1
    for cand in range(1, JC + 1):
        if JC % cand == 0 and estimate(cand) <= budget:
            tile = cand
    return tile


def pallas_pencil_sweep(stencil, grid: np.ndarray,
                        bdims: Sequence[int],
                        nbricks: int,
                        params: dict | None = None,
                        k_range: tuple[int, int] | None = None,
                        j_range: tuple[int, int] | None = None,
                        i_range: tuple[int, int] | None = None,
                        tile_j: int | None = None,
                        dtype=jnp.float32,
                        compute_dtype=jnp.float32,
                        interpret: bool | None = None,
                        inplace: bool = False,
                        batch: int = 1,
                        batch_stride: int | None = None,
                        fuse: int = 1,
                        i_ghost: int = 0,
                        lookahead: int = 1,
                        evolve=None,
                        wait_late: bool = False,
                        j_shift: str = "slice",
                        vmem_limit_bytes: int = 110 * 2 ** 20):
    """Build a pencil sweep over grid rows ``k_range`` x pencils
    ``j_range`` (half-open, grid coords).

    ``batch`` > 1 sweeps ``batch`` identical subdomains whose storage is
    stacked along the brick axis with ``batch_stride`` bricks per
    subdomain (the strong-scaling two-level layout,
    ref: strong/main.cpp:37-50): the same grid table serves every
    subdomain with a per-subdomain brick offset, and each (sub, j-tile)
    runs its own clamped k-stream.

    ``fuse`` = F > 1 applies F stencil iterations per HBM pass
    (temporal blocking in VMEM): intermediate iterations live in
    per-level rolling rings and never touch HBM, so per-iteration
    memory traffic divides by F — the deep-ghost ST_ITER amortization
    (weak/main.cpp:203-212) carried to its TPU-logical end.  The
    kernels are memory-bound with a near-idle VPU, so throughput scales
    with F until the VPU saturates.  Semantics are identical to F
    composed sweeps: the output range gets skip semantics, intermediate
    levels extend (F-f) rows/elements beyond it with edge-clamped
    windows (same contamination as F ghost-inclusive sweeps), and
    lane rolls keep i exact.  Requires fuse*radius_j <= BJ.

    Returns ``fn(dat_view) -> out_view`` or, with ``inplace=True``,
    ``fn(dat_view, out_prev) -> out_view`` where the output buffer is
    aliased onto ``out_prev`` and only the bricks of this sweep's range
    are overwritten (partial sweeps compose into one output).

    Windows outside the table clamp to the edge row/pencil, so
    ghost-inclusive sweeps read the ghost's own edge as its missing
    neighbor — the stale-ring contamination semantics of the reference's
    garbage-brick reads (bricksetup.h:44-48).

    ``grid``: brick-grid table, shape (GK, GJ) / (GK, GJ, 1) for the
    pencil layout (full-i bricks, i-taps = periodic lane rolls) or
    (GK, GJ, GI) with GI > 1 for i-BRICKED layouts (``i_ghost`` ghost
    brick rings in i): each window row assembles all GI bricks
    contiguously along the lane axis, so i-taps become static slices of
    the assembled halo — the generic distributed-i mode (the assembled
    halo plays the reference's dev_shl funnel-shift role,
    dev_shl.h:11-64).  ``bdims`` = (BK, BJ, BI) with BI the per-brick i
    width (the full per-device extent in pencil mode).
    ``dtype`` is the storage element type; with ``dtype=bfloat16`` HBM
    traffic halves and taps are accumulated in ``compute_dtype``.

    ``stencil`` may be a LIST of StencilDefs — a coupled stencil SYSTEM
    (the reference's multi-output ``STENCIL = [out1, out2]`` contract,
    codegen/vecscatter:165-168): one kernel computes every output per
    pass (Jacobi update — all outputs read the pre-step fields), so
    shared input fields stream through HBM once instead of once per
    stencil.  ``evolve`` names the input grid each output REPLACES (in
    STENCIL order; defaults to the single stencil's first input); with
    ``fuse`` = F > 1 the evolving fields iterate in per-level VMEM
    rings while every other input is a STATIC aux field read from its
    window at each level — temporal fusion for variable-coefficient
    stencils and systems.  Returns ``fn(*views) -> (out1, out2, ...)``
    for systems (``fn.fields`` gives the view order).
    """
    sdefs = stencil if isinstance(stencil, (list, tuple)) else [stencil]
    NO = len(sdefs)
    if NO == 0:
        raise ValueError("empty stencil system")
    irs = [_as_ir(s) for s in sdefs]
    params = dict(params or {})
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if any(r.dims != 3 for r in irs):
        raise NotImplementedError("pencil path is 3-D")
    # union input fields across the system, first-seen order
    fieldnames: list = []
    for s_ in irs:
        for n in s_.sdef.inputs:
            if n not in fieldnames:
                fieldnames.append(n)
    NF = len(fieldnames)
    if NF == 0:
        raise ValueError("stencil reads no input grid")
    uidx = {n: i for i, n in enumerate(fieldnames)}
    if evolve is None:
        if NO > 1:
            raise ValueError("a stencil system needs evolve=(name, ...)"
                             " naming each output's evolving input grid")
        evolve = (fieldnames[0],)
    elif isinstance(evolve, str):
        evolve = (evolve,)
    else:
        evolve = tuple(evolve)
    if len(evolve) != NO or len(set(evolve)) != NO:
        raise ValueError(f"{NO} output(s) need {NO} distinct evolve "
                         f"name(s), got {evolve}")
    for e_ in evolve:
        if e_ not in uidx:
            raise ValueError(f"evolve field {e_!r} is not a stencil "
                             f"input ({fieldnames})")
    evolve_out = {n: o for o, n in enumerate(evolve)}
    # multi-input (the reference codegen's per-grid support,
    # codegen/st/codegen/backend/base.py:93-123): one brick view per
    # field sharing ONE grid table; each field streams its own window.
    # Per-OUTPUT field maps index into that stencil's own input order
    # (its kslab list), not the union.
    fmaps = [({n: i for i, n in enumerate(s_.sdef.inputs)}
              if len(s_.sdef.inputs) > 1 else None) for s_ in irs]
    BK, BJ, BIROW = (int(b) for b in bdims)
    if not interpret and (BIROW % 128 or BJ % 8):
        raise ValueError(
            f"Mosaic DMA granularity: pencil bricks need BI a multiple "
            f"of 128 and BJ a multiple of 8 on hardware, got "
            f"{(BK, BJ, BIROW)}; use the jnp backend for other folds")
    grid = np.asarray(grid)
    GI = 1
    if grid.ndim == 3:
        GI = grid.shape[2]
        if GI == 1:
            grid = grid[:, :, 0]
    i_ghost = int(i_ghost)
    islice = GI > 1
    if islice and i_ghost < 1:
        raise ValueError("i-bricked layouts (GI > 1) need i_ghost >= 1 "
                         "ghost brick rings in i")
    if not islice:
        i_ghost = 0
        if i_range is not None and tuple(i_range) != (0, 1):
            raise ValueError("i_range applies to i-bricked layouts only")
    BI = BIROW
    # window/extension radius = elementwise max over the system
    _rads = [s_.radius() for s_ in irs]
    lo_pre = tuple(max(r[0][a] for r in _rads) for a in range(3))
    hi_pre = tuple(max(r[1][a] for r in _rads) for a in range(3))
    # written i-brick columns (half-open over GI).  The default skips the
    # i-ghost ring; (0, GI) is the ghost-INCLUSIVE sweep — out-of-table
    # neighbors clamp to duplicated edge bricks in the assembled window,
    # the same stale-ring contamination semantics as k/j (deep-ghost
    # ST_ITER for i-bricked layouts, ref: weak/main.cpp:203-212)
    if i_range is None:
        I0o, I1o = i_ghost, GI - i_ghost
    else:
        I0o, I1o = (int(i) for i in i_range)
        if not (0 <= I0o < I1o <= GI):
            raise ValueError(f"i_range {i_range} outside grid i extent "
                             f"{GI}")
    pad_lo = 1 if (islice and I0o == 0 and lo_pre[2] > 0) else 0
    pad_hi = 1 if (islice and I1o == GI and hi_pre[2] > 0) else 0
    CI = GI + pad_lo + pad_hi     # padded i-brick columns (pre-trim)
    NIb = I1o - I0o               # written i bricks
    IW = NIb * BI                 # written i extent (elements)
    I0 = I0o
    GK, GJ = grid.shape[0], grid.shape[1]
    if k_range is None:
        k_range = (1, GK - 1)
    if j_range is None:
        j_range = (1, GJ - 1)
    K0, K1 = (int(k) for k in k_range)
    J0, J1 = (int(j) for j in j_range)
    if not (0 <= K0 < K1 <= GK and 0 <= J0 < J1 <= GJ):
        raise ValueError(f"range k{k_range} j{j_range} outside grid "
                         f"({GK}, {GJ})")
    KC, JC = K1 - K0, J1 - J0
    batch = int(batch)
    if batch > 1 and batch_stride is None:
        raise ValueError("batch > 1 needs batch_stride (bricks per "
                         "subdomain)")
    lo, hi = lo_pre, hi_pre
    if lo[0] > BK or hi[0] > BK or lo[1] > BJ or hi[1] > BJ:
        raise ValueError("stencil radius exceeds brick dims")
    if islice and (lo[2] > BI or hi[2] > BI):
        raise ValueError("stencil i-radius exceeds brick i width")
    F = int(fuse)
    if F < 1:
        raise ValueError("fuse must be >= 1")
    if NF > 1 and inplace:
        raise NotImplementedError(
            "inplace partial sweeps support one input grid")
    if NO > 1:
        if inplace or batch > 1:
            raise NotImplementedError("stencil systems run the plain "
                                      "sweep (no inplace/batch)")
        if islice:
            raise NotImplementedError("stencil systems need the pencil "
                                      "layout (one brick per (k, j))")
    if F > 1 and NF > 1 and islice:
        raise NotImplementedError("fused multi-input sweeps need the "
                                  "pencil layout (GI == 1)")
    if F > 1:
        if inplace:
            raise NotImplementedError("fuse>1 with inplace partial "
                                      "sweeps is not supported")
        if F * lo[1] > BJ or F * hi[1] > BJ:
            raise ValueError(
                f"fuse {F} x j-radius exceeds the one-pencil window "
                f"halo (BJ={BJ})")
        if F * lo[0] > BK or F * hi[0] > BK:
            # intermediate levels substitute brick-clamped windows for
            # the missing beyond-table rows; that contamination grows
            # radius elements per level and must stay inside one brick
            # row (same bound as deep-ghost ST_ITER validity)
            raise ValueError(
                f"fuse {F} x k-radius exceeds the brick row depth "
                f"(BK={BK})")
        if islice and (F * lo[2] > (I0o + pad_lo) * BI
                       or F * hi[2] > (GI - I1o + pad_hi) * BI):
            raise ValueError(
                f"fuse {F} x i-radius exceeds the i window margin "
                f"({(I0o + pad_lo) * BI}, {(GI - I1o + pad_hi) * BI})")
    # fused-level bookkeeping: level f in [1, F) holds intermediate
    # iteration f; level F is the output. Ranges in grid rows; j
    # extensions in elements.
    lvlA = {f: max(K0 - (F - f), 0) for f in range(1, F)}
    lvlB = {f: min(K1 + (F - f), GK) for f in range(1, F)}
    lvlS = {f: 2 * (F - f) + 3 for f in range(1, F)}  # ring slots
    ext_lo = {f: (F - f) * lo[1] for f in range(1, F + 1)}
    ext_hi = {f: (F - f) * hi[1] for f in range(1, F + 1)}
    iext_lo = {f: ((F - f) * lo[2] if islice else 0)
               for f in range(1, F + 1)}
    iext_hi = {f: ((F - f) * hi[2] if islice else 0)
               for f in range(1, F + 1)}
    # i-bricked window TRIM: assemble only the brick columns the
    # computed i_range actually reads (level 1 is the widest consumer),
    # instead of all CI columns — kills the ~2x i-ghost read
    # amplification of sub-range sweeps (strong-scaling cubic
    # subdomains, ref: strong/main.cpp:66-71)
    if islice:
        _ilo1 = (iext_lo[1] if F > 1 else 0) + lo[2]
        _ihi1 = (iext_hi[1] if F > 1 else 0) + hi[2]
        ci0 = max(((I0 + pad_lo) * BI - _ilo1) // BI, 0)
        ci1 = min(-((-((I0 + pad_lo) * BI + IW + _ihi1)) // BI), CI)
    else:
        ci0, ci1 = 0, CI
    CIw = ci1 - ci0               # assembled window i-brick columns
    RI = CIw * BI                 # assembled row i extent (trimmed)
    D = int(lookahead)          # window rows DMA'd ahead of the wait
    if D < 1:
        raise ValueError("lookahead must be >= 1")
    NW = 2 * F + 1 + D          # window slots (warmup span + prefetch)

    resolve = resolve_const_from_params(params)

    def _roll_i(v, di):
        return pltpu.roll(v, (-di) % BI, 2) if di else v

    if j_shift not in ("slice", "roll"):
        raise ValueError("j_shift is 'slice' or 'roll'")

    def _roll_j(v, dj):
        return pltpu.roll(v, (-dj) % int(v.shape[1]), 1)

    _rj = _roll_j if j_shift == "roll" else None

    # hierarchical axis factorization shared by every Pallas emitter
    # (see codegen.ir.fold_linear): 125pt drops to 4 lane rolls
    lins = [fold_linear(r, resolve, fields=fm)
            for r, fm in zip(irs, fmaps)]

    # --- VMEM-budget tile selection (shared model, see
    # :func:`pencil_vmem_estimate`)
    isz = np.dtype(dtype).itemsize
    csz = np.dtype(jnp.dtype(compute_dtype)).itemsize

    def _live(l_, r_):
        if l_ is None:
            return min(len(r_.sdef.taps), 6) + 2
        wdefs_, vmap_, _ = l_
        nksum = len({dks for terms in wdefs_ for _c, dks in terms})
        return nksum + len(wdefs_) + len(set(vmap_.values())) + 2

    _worst = max(range(NO), key=lambda o: _live(lins[o], irs[o]))

    def vmem_estimate(tj: int) -> int:
        return pencil_vmem_estimate(
            tj, BK=BK, BJ=BJ, RI=RI, IW=IW, isz=isz, csz=csz, NW=NW,
            lo_k=lo[0], hi_k=hi[0], lin=lins[_worst],
            ntaps=len(irs[_worst].sdef.taps),
            ie=(lo[2] + hi[2]) if islice else 0, nfields=NF, nout=NO,
            rings=[(lvlS[f], ext_lo[f] + ext_hi[f],
                    iext_lo[f] + iext_hi[f]) for f in range(1, F)] * NO)

    if tile_j is None:
        tile_j = choose_tile_j(JC, vmem_estimate, vmem_limit_bytes)
    TJ = int(tile_j)
    if JC % TJ:
        raise ValueError(f"tile_j {TJ} must divide computed j extent {JC}")
    JT = JC // TJ
    JW = TJ + 2                 # window pencils incl one each side

    row_shape = (BK, JW * BJ, RI)

    def _clip(x, n):
        return jnp.clip(x, 0, n - 1)

    def _row_copies(ids_ref, dat_refs, wins, sem, sb, jt, w, slot):
        """Copy descriptors loading window row w (rolling index; absolute
        grid row K0 - F + w, edge-clamped) for j-tile jt of batch sub
        sb, for every input field.  In i-bricked mode all GI bricks of
        the row assemble contiguously along the lane axis."""
        krow = _clip(K0 - F + w, GK)
        cps = []
        for cj in range(JW):
            jcol = _clip(J0 - 1 + jt * TJ + cj, GJ)
            base = sb * (GK * GJ * GI) + (krow * GJ + jcol) * GI
            for ci in range(ci0, ci1):
                cic = min(max(ci - pad_lo, 0), GI - 1)  # clamped pad col
                for f in range(NF):
                    cps.append(pltpu.make_async_copy(
                        dat_refs[f].at[ids_ref[base + cic]],
                        wins[f].at[slot, :, cj * BJ:(cj + 1) * BJ,
                                   (ci - ci0) * BI:(ci - ci0 + 1) * BI],
                        sem.at[slot]))
        return cps

    ilo_r, ihi_r = (lo[2], hi[2]) if islice else (0, 0)
    _computes = [build_row_compute(r, resolve, l_, _roll_i,
                                   islice=islice, ilo_r=ilo_r,
                                   ihi_r=ihi_r, fields=fm, roll_j=_rj)
                 for r, l_, fm in zip(irs, lins, fmaps)]
    # per-output input metadata: union window index and (for fused
    # levels) whether each input reads a ring (its evolving output) or
    # stays on the window (static aux field)
    in_meta = [[(uidx[g], evolve_out.get(g)) for g in r.sdef.inputs]
               for r in irs]

    def make_kernel(extra_ref: bool):
        def kernel(ids_ref, *args):
            dat_refs = list(args[:NF])
            rest = list(args[NF:])
            if extra_ref:
                rest.pop(0)          # out_prev (aliased onto out_ref)
            out_refs = [rest.pop(0) for _ in range(NO)]
            wins = rest[:NF]
            touts = rest[NF:NF + NO]
            rings = rest[NF + NO:NF + NO + NO * (F - 1)]
            sem, osem = rest[NF + NO + NO * (F - 1):]
            sb = pl.program_id(0)   # subdomain in the batch
            jt = pl.program_id(1)
            t = pl.program_id(2)

            # startup for this j-tile: fill the window (warmup span)
            @pl.when(t == 0)
            def _():
                for w in range(min(NW, KC + 2 * F)):
                    for cp in _row_copies(ids_ref, dat_refs, wins, sem, sb,
                                          jt, w, w % NW):
                        cp.start()

            # prefetch D window rows ahead of the steady-state wait (one
            # new row per step; warmup already filled rows 0..2F+D)
            @pl.when(jnp.logical_and(t > 0,
                                     t + 2 * F + D <= KC + 2 * F - 1))
            def _():
                for cp in _row_copies(ids_ref, dat_refs, wins, sem, sb, jt,
                                      t + 2 * F + D,
                                      (t + 2 * F + D) % NW):
                    cp.start()

            # wait the warmup rows (t==0 only; later steps waited them)
            @pl.when(t == 0)
            def _():
                for w in range(min(2 * F, KC + 2 * F - 1)):
                    for cp in _row_copies(ids_ref, dat_refs, wins, sem,
                                          sb, jt, w, w % NW):
                        cp.wait()

            # the newest row this step consumes.  F == 1: wait LATE —
            # only the output row's high band reads it, so the wait
            # moves inside banded_row (pre_hi) and the mid/low bands'
            # VPU work overlaps the transfer.  F > 1: level 1 consumes
            # it first, wait up front.
            def wait_newest():
                for cp in _row_copies(ids_ref, dat_refs, wins, sem, sb,
                                      jt, t + 2 * F, (t + 2 * F) % NW):
                    cp.wait()

            if F > 1 or not wait_late:
                wait_newest()

            # --- fused-level machinery ---------------------------------
            def win_row_of(fi, a, rs=slice(None)):
                # absolute grid row -> window slot (content edge-clamped
                # by _row_copies, so no index clipping needed)
                return wins[fi][(a + F - K0) % NW, rs]

            def lvl_row(o, f, x, rs=slice(None)):
                xx = jnp.clip(x, lvlA[f], lvlB[f] - 1)
                return rings[o * (F - 1) + f - 1][xx % lvlS[f], rs]

            lo0, hi0 = lo[0], hi[0]

            def compute_level(o, f, x, write, pre_hi=None):
                """Level-f row x of output o from level f-1 (f==1 reads
                the input windows; fused levels read each evolving
                input's ring and each static aux input's window); emits
                output row bands via ``write(r0, r1, v)`` (banded
                assembly, see :func:`banded_row`)."""
                meta = in_meta[o]
                elo = ext_lo[f] if f <= F else 0
                ehi = ext_hi[f] if f <= F else 0
                jout = TJ * BJ + elo + ehi
                eilo, eihi = iext_lo[f], iext_hi[f]
                iout = IW + eilo + eihi
                j0w = BJ - elo
                j0r = 0 if f == 1 else (ext_lo[f - 1] - elo)
                i0w = (I0 + pad_lo - ci0) * BI - eilo
                i0r = 0 if f == 1 else (iext_lo[f - 1] - eilo)

                def one_src(fi, oo, a, rs):
                    if f == 1 or oo is None:
                        v = win_row_of(fi, a, rs)
                        return (v.astype(compute_dtype)
                                if compute_dtype != dtype else v)
                    return lvl_row(oo, f - 1, a, rs)

                def src(a, rs=slice(None)):
                    rows = [one_src(fi, oo, a, rs) for fi, oo in meta]
                    return rows if len(rows) > 1 else rows[0]

                j0s = [j0w if (f == 1 or oo is None) else j0r
                       for _fi, oo in meta]
                j0 = j0s if len(j0s) > 1 else j0s[0]
                i0 = i0w if f == 1 else i0r
                banded_row(src, x, lambda v: v, write,
                           lambda ks, b, n, o=o: _computes[o](
                               ks, j0, jout, b, n, i0, iout),
                           BK, lo0, hi0, pre_hi=pre_hi)

            def ring_writer(o, f, x):
                def wr(r0, r1, v):
                    rings[o * (F - 1) + f - 1][x % lvlS[f], r0:r1] = v
                return wr

            # warmup: prime each level's backlog (static rows)
            @pl.when(t == 0)
            def _():
                for f in range(1, F):
                    for x in range(lvlA[f], K0 + (F - f)):
                        for o in range(NO):
                            compute_level(o, f, x, ring_writer(o, f, x))

            # cadence: one row per intermediate level per step
            for f in range(1, F):
                x = K0 + t + (F - f)

                @pl.when(x < lvlB[f])
                def _(f=f, x=x):
                    for o in range(NO):
                        compute_level(o, f, x, ring_writer(o, f, x))

            def _out_copies(o, tt, parity):
                cps = []
                for cj in range(TJ):
                    base = (sb * (GK * GJ * GI)
                            + ((K0 + tt) * GJ + J0 + jt * TJ + cj) * GI)
                    for ci in range(NIb):
                        cps.append(pltpu.make_async_copy(
                            touts[o].at[parity, :,
                                        cj * BJ:(cj + 1) * BJ,
                                        ci * BI:(ci + 1) * BI],
                            out_refs[o].at[ids_ref[base + I0 + ci]],
                            osem.at[o, parity]))
                return cps

            # wait the out-DMAs issued two steps ago from this tout slot
            # BEFORE the final level writes its bands into the slot
            @pl.when(t >= 2)
            def _():
                for o in range(NO):
                    for cp in _out_copies(o, t - 2, t % 2):
                        cp.wait()

            def out_writer(o):
                def wr(r0, r1, v):
                    if compute_dtype != dtype:
                        v = v.astype(dtype)
                    touts[o][t % 2, r0:r1] = v
                return wr

            for o in range(NO):
                # wait-late runs exactly once per step, on the first
                # output's high band (later outputs read already-waited
                # rows)
                compute_level(o, F, K0 + t, out_writer(o),
                              pre_hi=(wait_newest
                                      if F == 1 and wait_late and o == 0
                                      else None))
                for cp in _out_copies(o, t, t % 2):
                    cp.start()

            # drain at the end of each j-tile sweep
            @pl.when(t == KC - 1)
            def _():
                for tt in range(max(KC - 2, 0), KC):
                    for o in range(NO):
                        for cp in _out_copies(o, tt, tt % 2):
                            cp.wait()

        return kernel

    nelems = batch * KC * BK * JC * BJ * IW
    cost = pl.CostEstimate(
        flops=sum(r.flops_per_element() for r in irs) * nelems * F,
        bytes_accessed=(NF + NO) * nelems * np.dtype(dtype).itemsize,
        transcendentals=0,
    )
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * NF
    if inplace:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
    ring_shapes = [
        pltpu.VMEM((lvlS[f], BK, TJ * BJ + ext_lo[f] + ext_hi[f],
                    IW + iext_lo[f] + iext_hi[f]), compute_dtype)
        for _o in range(NO) for f in range(1, F)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, JT, KC),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY) if NO == 1 else
                   [pl.BlockSpec(memory_space=pl.ANY)] * NO),
        scratch_shapes=[
            pltpu.VMEM((NW,) + row_shape, dtype) for _ in range(NF)
        ] + [
            pltpu.VMEM((2, BK, TJ * BJ, IW), dtype) for _ in range(NO)
        ] + ring_shapes + [
            pltpu.SemaphoreType.DMA((NW,)),
            pltpu.SemaphoreType.DMA((NO, 2)),
        ],
    )
    out_shape = jax.ShapeDtypeStruct((nbricks, BK, BJ, BIROW), dtype)
    # NOTE: batch/j-tile grid instances are logically independent, but
    # marking them "parallel" measured neutral at F=1 and regressed the
    # fused-kernel compile — keep the sequential semantics
    dim_sem = ("arbitrary",) * 3
    # input indices for aliasing count the scalar-prefetch operand:
    # operand 1 + NF is out_prev when inplace
    alias = dict(input_output_aliases={1 + NF: 0}) if inplace else {}
    call = pl.pallas_call(
        make_kernel(inplace),
        grid_spec=grid_spec,
        out_shape=(out_shape if NO == 1 else [out_shape] * NO),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_sem,
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        cost_estimate=cost,
        interpret=interpret,
        **alias,
    )
    flat = grid.ravel().astype(np.int32)
    if batch > 1:
        flat = np.concatenate([flat + s * int(batch_stride)
                               for s in range(batch)])
    ids = jnp.asarray(flat)

    if inplace:
        def fn(dat_view, out_prev):
            return call(ids, dat_view, out_prev)
    elif NF > 1 or NO > 1:
        def fn(*dat_views):
            # one [nbricks, BK, BJ, BI] view per input grid, in
            # fn.fields order; systems return one view per output in
            # STENCIL order
            if len(dat_views) != NF:
                raise TypeError(f"stencil reads {NF} grids "
                                f"({fieldnames}), got {len(dat_views)}")
            out = call(ids, *dat_views)
            return tuple(out) if NO > 1 else out
        fn.fields = tuple(fieldnames)
        fn.evolve = tuple(evolve)
    else:
        def fn(dat_view):
            return call(ids, dat_view)

    fn.tile_j = TJ
    fn.vmem_bytes = vmem_estimate(TJ)
    fn.vmem_limit_bytes = vmem_limit_bytes
    return fn


def pallas_pencil_stencil(stencil, grid: np.ndarray,
                          bdims: Sequence[int],
                          ghost_bricks: Sequence[int],
                          nbricks: int,
                          params: dict | None = None,
                          tile_j: int | None = None,
                          skip: int = 1,
                          **kw):
    """Classic full-domain pencil sweep (back-compat surface).

    ``ghost_bricks`` = (gzk, gzj) must be (1, 1); ``skip=1`` computes the
    owned rows/pencils only (the reference's skip parameter,
    weak/main.cpp:26-36), ``skip=0`` additionally computes the ghost ring
    with edge-clamped windows (deep-ghost ST_ITER mode).
    """
    gzk, gzj = int(ghost_bricks[0]), int(ghost_bricks[1])
    if gzk != 1 or gzj != 1:
        raise ValueError("pencil path expects exactly one ghost brick "
                         "in k and j")
    if skip not in (0, 1):
        raise ValueError("skip is 0 (ghost-inclusive) or 1 (owned only)")
    g = np.asarray(grid)
    GK, GJ = g.shape[0], g.shape[1]
    return pallas_pencil_sweep(
        stencil, grid, bdims, nbricks, params,
        k_range=(skip, GK - skip), j_range=(skip, GJ - skip),
        tile_j=tile_j, **kw)
