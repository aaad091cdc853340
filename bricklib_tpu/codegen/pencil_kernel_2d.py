"""2-D streaming pencil kernel — dimension generality for the fast path.

The reference's templates are dim-generic (Brick<Dim<BDims...>> works
for any rank, include/brick.h:96-127); until round 4 the rebuild's fast
path was 3-D/4-D only, with 2-D served by the jnp oracle.  This emitter
is the natural TPU form of a 2-D stencil:

- storage ``(nbricks, BY, X)`` — a brick is BY whole domain rows; the x
  axis IS the lane axis, undistributed, periodic by lane rolls (the
  dev_shl analog, include/dev_shl.h:11-64), so each window k-slice is
  natively 2-D;
- the y-contraction runs on the MXU: all distinct y-profiles for all
  BY output rows compute as three small matmuls ``A_slot (nW*BY, BY) @
  slot (BY, X)`` accumulated in f32 (precision=HIGHEST) — the same
  k-profile-contraction form as :mod:`.mxu_kernel`, with no j stage at
  all (2-D has no sublane-block axis, so rolls need no wrap fix);
- nonlinear stencils run the generic evaluator over a 3-slot banded
  slab with memoized tap reads (see :mod:`.evaluate`).

Rows stream with the standard double-buffered window (one HBM read per
row per sweep); ghost rows clamp at the table edge like every other
emitter.  Fully periodic configs use a redirection table
(``BrickDecomp.periodic_grid`` over both axes, or any 1-D id table).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .evaluate import evaluate, resolve_const_from_params
from .ir import linear_decomposition
from .jnp_backend import _as_ir


def pallas_pencil_sweep_2d(stencil, grid: np.ndarray,
                           bdims: Sequence[int],
                           nbricks: int,
                           params: dict | None = None,
                           y_range: tuple[int, int] | None = None,
                           dtype=jnp.float32,
                           interpret: bool | None = None,
                           lookahead: int = 2,
                           fuse: int = 1,
                           vmem_limit_bytes: int = 110 * 2 ** 20):
    """Build ``fn(view) -> view`` over ``(nbricks, BY, X)`` storage for
    a 2-D stencil.  ``grid`` is the 1-D brick-row id table (shape
    ``(GY,)`` or ``(GY, 1)``); ``bdims = (BY, X)`` with X the full
    domain width (lane-periodic).

    MULTI-INPUT stencils (variable-coefficient fields, ref: the
    codegen's per-grid buffers, codegen/st/codegen/backend/base.py:
    93-123) stream one rolling window ring per input field and call as
    ``fn(*views)`` in ``fn.fields`` order, like the 3-D emitter.
    Stencil SYSTEMS (a list of StencilDefs, the reference's
    multi-output ``STENCIL`` contract, codegen/vecscatter:165-168)
    compute every output per row from the shared windows — one kernel,
    inputs stream through HBM once — and return one view per output.

    ``fuse = F > 1`` (single-input single-output, ST_ITER amortization,
    ref: weak/main.cpp:203-212) applies the stencil F times per HBM
    pass.  Unlike the 3-D emitter's per-level VMEM rings, the whole
    fusion trapezoid fits INSIDE the 3-row window whenever
    ``F * y_radius <= BY``: level l computes a y-extended slab of
    ``BY + (F-1-l)*(lo+hi)`` rows from the previous level's slab, all
    within one grid step — the recompute amplification is
    ``~1 + (F-1)*(lo+hi)/BY`` per level while HBM traffic drops
    F-fold.  Composition is exact on periodic tables and on ghost
    rows valid to depth F*radius (the usual deep-ghost contract)."""
    sdefs = stencil if isinstance(stencil, (list, tuple)) else [stencil]
    irs = [_as_ir(s) for s in sdefs]
    ir = irs[0]
    NO = len(irs)
    params = dict(params or {})
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if any(r.dims != 2 for r in irs):
        raise NotImplementedError("pallas_pencil_sweep_2d is 2-D")
    # union input fields across the system, first-seen order
    fieldnames: list = []
    for r_ in irs:
        for n in r_.sdef.inputs:
            if n not in fieldnames:
                fieldnames.append(n)
    NF = len(fieldnames)
    if NF == 0:
        raise ValueError("stencil reads no input grid")
    uidx = {n: f for f, n in enumerate(fieldnames)}
    BY, X = (int(b) for b in bdims)
    if not interpret and (X % 128 or BY % 8):
        raise ValueError("2-D pencil bricks need X % 128 == 0 and "
                         "BY % 8 == 0 on hardware")
    los, his = zip(*(r_.radius() for r_ in irs))
    lo = np.max(np.asarray(los), axis=0)   # numpy order: (y, x)
    hi = np.max(np.asarray(his), axis=0)
    lo0, hi0 = int(lo[0]), int(hi[0])
    if lo0 > BY or hi0 > BY:
        raise ValueError("y radius exceeds brick depth")
    if lo[1] >= X or hi[1] >= X:
        raise ValueError("x radius exceeds domain width")
    grid = np.asarray(grid)
    if grid.ndim == 2:
        if grid.shape[1] != 1:
            raise ValueError("2-D pencil table is one brick per y row")
        grid = grid[:, 0]
    GY = grid.shape[0]
    if y_range is None:
        y_range = (1, GY - 1)
    Y0, Y1 = (int(y) for y in y_range)
    if not (0 <= Y0 < Y1 <= GY):
        raise ValueError("y_range outside table")
    KC = Y1 - Y0
    sdt = jnp.dtype(dtype)     # storage dtype (bf16 halves HBM traffic)
    resolve = resolve_const_from_params(params)
    # the MXU y-contraction serves single-output single-input linear
    # stencils; multi-input/systems run the generic evaluator
    lin = (linear_decomposition(ir.sdef.rhs)
           if NF == 1 and NO == 1 else None)
    F = int(fuse)
    if F < 1:
        raise ValueError("fuse must be >= 1")
    if F > 1 and (NF != 1 or NO != 1):
        raise ValueError("fuse > 1 is single-input single-output")
    if F * lo0 > BY or F * hi0 > BY:
        raise ValueError(f"fuse {F} x y-radius ({lo0}, {hi0}) exceeds "
                         f"brick depth {BY}")
    # per-level output heights of the in-window fusion trapezoid
    hs = [BY + (F - 1 - l) * (lo0 + hi0) for l in range(F)]

    D = int(lookahead)
    NW = 3 + D

    xmap = None
    mat_ops: list = []
    has_p = has_n = False
    if lin is not None:
        # y-profile factorization: C[(dy, dx)] -> shared profiles
        C: dict = {}
        for _key, cexpr, taps in lin:
            c = float(resolve(cexpr.name)) if hasattr(cexpr, "name") \
                else float(cexpr.val)
            for sign, _g, offs in taps:
                dx, dy = int(offs[0]), int(offs[1])
                C[(dy, dx)] = C.get((dy, dx), 0.0) + (c if sign > 0
                                                      else -c)
        prof: dict = {}
        for (dy, dx), c in C.items():
            prof.setdefault(dx, {})[dy] = c
        wkeys: dict = {}
        profiles: list = []
        xmap = {}
        for dx, p in sorted(prof.items()):
            key = tuple(sorted(p.items()))
            if key not in wkeys:
                wkeys[key] = len(profiles)
                profiles.append(p)
            xmap[dx] = wkeys[key]
        nW = len(profiles)
        if F == 1:
            # unfused: three (nW*BY, BY) matmuls over prev/cur/nxt
            Ap = np.zeros((nW * BY, BY), np.float32)
            Ac = np.zeros((nW * BY, BY), np.float32)
            An = np.zeros((nW * BY, BY), np.float32)
            for w, p in enumerate(profiles):
                for dy, c in p.items():
                    for r in range(BY):
                        a = r + dy
                        if a < 0:
                            Ap[w * BY + r, BY + a] += c
                        elif a < BY:
                            Ac[w * BY + r, a] += c
                        else:
                            An[w * BY + r, a - BY] += c
            has_p, has_n = bool(Ap.any()), bool(An.any())
            mat_ops = [jnp.asarray(Ap), jnp.asarray(Ac),
                       jnp.asarray(An)]
        else:
            # fused: one self-contained (nW*h_out, h_in) banded matrix
            # per trapezoid level
            for ho in hs:
                hin = ho + lo0 + hi0
                A = np.zeros((nW * ho, hin), np.float32)
                for w, p in enumerate(profiles):
                    for dy, c in p.items():
                        for r in range(ho):
                            A[w * ho + r, lo0 + r + dy] += c
                mat_ops.append(jnp.asarray(A))
    NM = len(mat_ops)

    def _clip(x, n):
        return jnp.clip(x, 0, n - 1)

    def kernel(*refs):
        ids_ref = refs[0]
        dat_refs = refs[1:1 + NF]
        mat_refs = refs[1 + NF:1 + NF + NM]
        out_refs = refs[1 + NF + NM:1 + NF + NM + NO]
        scr = refs[1 + NF + NM + NO:]
        wins = scr[:NF]
        touts = scr[NF:NF + NO]
        sems = scr[NF + NO:2 * NF + NO]
        osems = scr[2 * NF + NO:]
        t = pl.program_id(0)

        def row_copy(f, w, slot):
            yrow = _clip(Y0 - 1 + w, GY)
            return pltpu.make_async_copy(
                dat_refs[f].at[ids_ref[yrow]], wins[f].at[slot],
                sems[f].at[slot])

        @pl.when(t == 0)
        def _():
            for f in range(NF):
                for w in range(min(NW, KC + 2)):
                    row_copy(f, w, w % NW).start()

        @pl.when(jnp.logical_and(t > 0, t + 2 + D <= KC + 1))
        def _():
            for f in range(NF):
                row_copy(f, t + 2 + D, (t + 2 + D) % NW).start()

        @pl.when(t == 0)
        def _():
            for f in range(NF):
                for w in range(min(2, KC + 1)):
                    row_copy(f, w, w % NW).wait()

        for f in range(NF):
            row_copy(f, t + 2, (t + 2) % NW).wait()

        def window(f):
            prev = wins[f][(t + 0) % NW]
            cur = wins[f][(t + 1) % NW]
            nxt = wins[f][(t + 2) % NW]
            if sdt != jnp.float32:
                # bf16 storage: taps accumulate in f32 like every
                # emitter
                prev, cur, nxt = (v.astype(jnp.float32)
                                  for v in (prev, cur, nxt))
            return prev, cur, nxt

        def roll_x(v, dx):
            return pltpu.roll(v, (-dx) % X, 1) if dx else v

        def _dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        def _combine(W2, ho):
            acc = None
            for dx, wid in sorted(xmap.items()):
                v = roll_x(W2[wid * ho:(wid + 1) * ho], dx)
                acc = v if acc is None else acc + v
            return acc

        if lin is not None and F == 1:
            prev, cur, nxt = window(0)
            ap_ref, ac_ref, an_ref = mat_refs
            W2 = _dot(ac_ref[:], cur)
            if has_p:
                W2 = W2 + _dot(ap_ref[:], prev)
            if has_n:
                W2 = W2 + _dot(an_ref[:], nxt)
            out = _combine(W2, BY)
        elif lin is not None:
            # fused: the trapezoid lives inside the 3-row slab — one
            # (nW*h_out, h_in) matmul + x-combine per level
            prev, cur, nxt = window(0)
            s0 = BY - F * lo0
            slab = jnp.concatenate([prev, cur, nxt],
                                   axis=0)[s0:s0 + hs[0] + lo0 + hi0]
            for lv in range(F):
                slab = _combine(_dot(mat_refs[lv][:], slab), hs[lv])
            out = slab
        elif F > 1:
            # fused generic: evaluate the stencil per trapezoid level
            prev, cur, nxt = window(0)
            s0 = BY - F * lo0
            slab = jnp.concatenate([prev, cur, nxt],
                                   axis=0)[s0:s0 + hs[0] + lo0 + hi0]
            for lv in range(F):
                ho = hs[lv]

                def read_tap(_name, offs, slab=slab, ho=ho):
                    dx, dy = int(offs[0]), int(offs[1])
                    return roll_x(slab[lo0 + dy:lo0 + dy + ho], dx)

                slab = evaluate(ir.sdef.rhs, read_tap,
                                lambda n: float(resolve(n)), jnp)
            out = slab
        else:
            def fslab(f):
                prev, cur, nxt = window(f)
                # Mosaic rejects zero-size vector slices: only include
                # the prev/next segments that actually carry halo rows.
                segs = ([prev[BY - lo0:]] if lo0 else []) + [cur] \
                    + ([nxt[:hi0]] if hi0 else [])
                return (jnp.concatenate(segs, axis=0)
                        if len(segs) > 1 else cur)

            slabs = [fslab(f) for f in range(NF)]

            def read_tap(name, offs):
                dx, dy = int(offs[0]), int(offs[1])
                return roll_x(
                    slabs[uidx[name]][lo0 + dy:lo0 + dy + BY], dx)

            out = [evaluate(r_.sdef.rhs, read_tap,
                            lambda n: float(resolve(n)), jnp)
                   for r_ in irs]
            out = out[0] if NO == 1 else out

        outs = [out] if NO == 1 else out
        if sdt != jnp.float32:
            outs = [o_.astype(sdt) for o_ in outs]

        @pl.when(t >= 2)
        def _():
            for o in range(NO):
                pltpu.make_async_copy(touts[o].at[t % 2],
                                      out_refs[o].at[ids_ref[Y0 + t - 2]],
                                      osems[o].at[t % 2]).wait()

        for o in range(NO):
            touts[o][t % 2] = outs[o]
            pltpu.make_async_copy(touts[o].at[t % 2],
                                  out_refs[o].at[ids_ref[Y0 + t]],
                                  osems[o].at[t % 2]).start()

        @pl.when(t == KC - 1)
        def _():
            for o in range(NO):
                for tt in range(max(KC - 2, 0), KC):
                    pltpu.make_async_copy(touts[o].at[tt % 2],
                                          out_refs[o].at[ids_ref[Y0 + tt]],
                                          osems[o].at[tt % 2]).wait()

    nelems = KC * BY * X
    ntaps = sum(len(r_.sdef.taps) for r_ in irs)
    cost = pl.CostEstimate(flops=2 * ntaps * nelems * F,
                           bytes_accessed=(NF + NO) * nelems
                           * sdt.itemsize,
                           transcendentals=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(KC,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * NF
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * NM,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY) if NO == 1
                   else [pl.BlockSpec(memory_space=pl.ANY)] * NO),
        scratch_shapes=(
            [pltpu.VMEM((NW, BY, X), sdt) for _ in range(NF)]
            + [pltpu.VMEM((2, BY, X), sdt) for _ in range(NO)]
            + [pltpu.SemaphoreType.DMA((NW,)) for _ in range(NF)]
            + [pltpu.SemaphoreType.DMA((2,)) for _ in range(NO)]),
    )
    oshape = jax.ShapeDtypeStruct((nbricks, BY, X), sdt)
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=oshape if NO == 1 else [oshape] * NO,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes),
        cost_estimate=cost,
        interpret=interpret,
    )
    ids = jnp.asarray(grid.astype(np.int32))

    def fn(*views):
        if len(views) != NF:
            raise TypeError(f"fn takes {NF} view(s) in fn.fields "
                            f"order, got {len(views)}")
        out = call(ids, *views, *mat_ops)
        return tuple(out) if NO > 1 else out

    fn.n_wprofiles = 0 if xmap is None else len(set(xmap.values()))
    fn.fuse = F
    if NF > 1:
        fn.fields = tuple(fieldnames)
    return fn
