"""MXU-form pencil sweep: the k-profile contraction on the matrix unit.

The measured 125pt floor (docs/DESIGN.md "QUANTIFIED FLOOR") is VMEM
bandwidth contention between the factorized compute's VPU row passes
and the window DMAs — every lever tried in rounds 2-3 was VPU-pass
algebra.  This variant moves the W stage (the per-(dj,di) k-profile
contractions, ~20 of 125pt's 55 row passes) onto the MXU, which is
otherwise idle in a stencil sweep, and reshapes the rest of the
pipeline so the j stage costs aligned lane slices instead of sublane
realigns:

- storage is FLAT-PENCIL: ``(nbricks, BK, BJ*BI)`` — each brick's
  (j, i) plane is one row-major lane vector.  Brick DMAs are
  shape-identical to the classic layout (same element order), so the
  decomp/exchange machinery (which moves whole bricks along axis 0)
  is unaffected; only the within-brick view changes.
- a window k-slice is then natively 2-D ``(BK, JW*BJ*BI)``, and the
  k-contraction W[w][r] = sum_dk c_w[dk] * row(r+dk) over the 3-slot
  slab becomes THREE small matmuls ``A_slot (nW*BK, BK) @ slot (BK,
  LW)`` accumulated in f32 (``precision=HIGHEST`` — fp32-faithful on
  the MXU) — one MXU pass computes every distinct k-profile for every
  output row at once, with full operand reuse inside the systolic
  array instead of nW*taps VPU row passes through VMEM.
- the V stage's j-shift extracts become LANE slices at multiples of
  BI (128-aligned for the canonical BI=512) — free addressing, where
  the classic layout pays one sublane realign per distinct (dj, wid).
- i-taps keep periodic lane-roll semantics via a roll-pair + iota
  select: a full-width roll is correct except at the BI-block edges,
  where a second roll shifted one block supplies the wrapped values.

Scope (the 125pt/radius-2 gate, BASELINE.md:32): single linear
3-D stencil, single input/output, fuse=1, pencil layout (GI == 1).
Reference target: /root/reference/stencils/mpi125pt.py; the reference
computes the same contraction as unrolled FMAs over vector folds
(stencils/fake.h:175-353) — on TPU the matrix unit is the idle
resource that absorbs it.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .evaluate import resolve_const_from_params
from .ir import fold_linear
from .jnp_backend import _as_ir


def flatten_bricks(view):
    """(nbricks, BK, BJ, BI) -> (nbricks, BK, BJ*BI) flat-pencil view.

    Same element order (row-major), so this is a plain reshape; do it
    ONCE outside the timed/jitted region (rule: reshapes around pallas
    calls materialize copies)."""
    nb, bk, bj, bi = view.shape
    return view.reshape(nb, bk, bj * bi)


def unflatten_bricks(view, bdims):
    nb = view.shape[0]
    return view.reshape((nb,) + tuple(bdims))


def _slot_matrices(wdefs, BK, lo0, hi0):
    """A_prev/A_cur/A_next (nW*BK, BK) f32: row w*BK+r accumulates
    coefficient c into the column holding slab row r+dk (prev slot
    rows are its last lo0, next slot rows its first hi0)."""
    nW = len(wdefs)
    Ap = np.zeros((nW * BK, BK), np.float32)
    Ac = np.zeros((nW * BK, BK), np.float32)
    An = np.zeros((nW * BK, BK), np.float32)
    for w, terms in enumerate(wdefs):
        for c, dks in terms:
            for fr in dks:
                (dk,) = fr
                for r in range(BK):
                    a = r + dk
                    if a < 0:
                        Ap[w * BK + r, BK + a] += c
                    elif a < BK:
                        Ac[w * BK + r, a] += c
                    else:
                        An[w * BK + r, a - BK] += c
    return Ap, Ac, An


def pallas_pencil_sweep_mxu(stencil, grid: np.ndarray,
                            bdims: Sequence[int],
                            nbricks: int,
                            params: dict | None = None,
                            k_range: tuple[int, int] | None = None,
                            j_range: tuple[int, int] | None = None,
                            tile_j: int | None = None,
                            dtype=jnp.float32,
                            interpret: bool | None = None,
                            lookahead: int = 2,
                            vmem_limit_bytes: int = 110 * 2 ** 20):
    """Build the MXU-form sweep; returns ``fn(flat_view) -> flat_view``
    over flat-pencil storage ``(nbricks, BK, BJ*BI)`` (see
    :func:`flatten_bricks`).  Semantics match
    ``pallas_pencil_sweep(...)`` at fuse=1 on the same table: windows
    clamp at the table edge, i is periodic over the brick row."""
    ir = _as_ir(stencil)
    params = dict(params or {})
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if ir.dims != 3:
        raise NotImplementedError("mxu path is 3-D")
    if len(ir.sdef.inputs) != 1:
        raise NotImplementedError("mxu path is single-input")
    resolve = resolve_const_from_params(params)
    lin = fold_linear(ir, resolve)
    if lin is None:
        raise NotImplementedError("mxu path needs a linear stencil")
    wdefs, vmap_, (jlo, jhi) = lin

    BK, BJ, BI = (int(b) for b in bdims)
    LB = BJ * BI                  # lanes per brick column
    if not interpret and (BI % 128 or BJ % 8):
        raise ValueError("flat-pencil bricks need BI % 128 == 0 and "
                         "BJ % 8 == 0 on hardware")
    lo, hi = ir.radius()
    if lo[0] > BK or hi[0] > BK:
        raise ValueError("k radius exceeds brick depth")
    if jlo > BJ or jhi > BJ:
        raise ValueError("j radius exceeds one pencil column")
    if lo[2] >= BI or hi[2] >= BI:
        raise ValueError("i radius exceeds brick i width")
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise NotImplementedError("mxu path stores f32 or bf16")
    bf16 = dtype == jnp.dtype(jnp.bfloat16)
    grid = np.asarray(grid)
    if grid.ndim == 3:
        if grid.shape[2] != 1:
            raise NotImplementedError("mxu path is pencil-only (GI==1)")
        grid = grid[:, :, 0]
    GK, GJ = grid.shape
    if k_range is None:
        k_range = (1, GK - 1)
    if j_range is None:
        j_range = (1, GJ - 1)
    K0, K1 = (int(k) for k in k_range)
    J0, J1 = (int(j) for j in j_range)
    KC, JC = K1 - K0, J1 - J0
    if not (0 <= K0 < K1 <= GK and 0 <= J0 < J1 <= GJ):
        raise ValueError("range outside grid table")
    lo0, hi0 = lo[0], hi[0]

    D = int(lookahead)
    if D < 1:
        raise ValueError("lookahead must be >= 1")
    NW = 3 + D                   # F=1 warmup span + prefetch slots
    nWd = len(wdefs)
    Ap, Ac, An = _slot_matrices(wdefs, BK, lo0, hi0)

    def vmem_estimate(tj: int) -> int:
        LW_ = (tj + 2) * LB
        est = NW * BK * LW_ * 4            # window slots
        est += nWd * BK * LW_ * 4          # W2
        est += 2 * BK * tj * LB * 4        # tout double buffer
        nv = len(set(vmap_.values()))
        est += (nv + 3) * BK * tj * LB * 4  # live V / roll temps
        return est

    if tile_j is None:
        budget = int(0.85 * vmem_limit_bytes)
        tile_j = 1
        for cand in range(1, JC + 1):
            if JC % cand == 0 and vmem_estimate(cand) <= budget:
                tile_j = cand
    TJ = int(tile_j)
    if JC % TJ:
        raise ValueError(f"tile_j {TJ} must divide j extent {JC}")
    JT = JC // TJ
    JW = TJ + 2
    LW = JW * LB                 # flat window lanes
    LO = TJ * LB                 # flat output lanes
    L_I = LO                     # roll width (i wrap fixed per block)

    # bf16 storage: operands enter the MXU in bf16 (storage is already
    # bf16-quantized, so bf16 x bf16 -> f32 products lose nothing the
    # storage hasn't); the A coefficients round to bf16 accordingly
    mAp = jnp.asarray(Ap).astype(dtype)
    mAc = jnp.asarray(Ac).astype(dtype)
    mAn = jnp.asarray(An).astype(dtype)
    use_p = bool(Ap.any())
    use_n = bool(An.any())
    mxu_prec = None if bf16 else jax.lax.Precision.HIGHEST

    def _clip(x, n):
        return jnp.clip(x, 0, n - 1)

    def kernel(ids_ref, dat_ref, ap_ref, ac_ref, an_ref, out_ref, win,
               tout, sem, osem):
        jt = pl.program_id(0)
        t = pl.program_id(1)

        def row_copies(w, slot):
            krow = _clip(K0 - 1 + w, GK)
            cps = []
            for cj in range(JW):
                jcol = _clip(J0 - 1 + jt * TJ + cj, GJ)
                cps.append(pltpu.make_async_copy(
                    dat_ref.at[ids_ref[krow * GJ + jcol]],
                    win.at[slot, :, cj * LB:(cj + 1) * LB],
                    sem.at[slot]))
            return cps

        @pl.when(t == 0)
        def _():
            for w in range(min(NW, KC + 2)):
                for cp in row_copies(w, w % NW):
                    cp.start()

        @pl.when(jnp.logical_and(t > 0, t + 2 + D <= KC + 1))
        def _():
            for cp in row_copies(t + 2 + D, (t + 2 + D) % NW):
                cp.start()

        @pl.when(t == 0)
        def _():
            for w in range(min(2, KC + 1)):
                for cp in row_copies(w, w % NW):
                    cp.wait()

        for cp in row_copies(t + 2, (t + 2) % NW):
            cp.wait()

        # W stage on the MXU: slab rows live in 3 window slots (grid
        # rows t-1, t, t+1 relative to output row t); A_prev/A_cur/
        # A_next pick each output k-profile row's taps out of them.
        prev = win[(t + 0) % NW]          # grid row K0 + t - 1
        cur = win[(t + 1) % NW]
        nxt = win[(t + 2) % NW]
        W2 = jax.lax.dot_general(
            ac_ref[:], cur, (((1,), (0,)), ((), ())),
            precision=mxu_prec,
            preferred_element_type=jnp.float32)
        if use_p:
            W2 = W2 + jax.lax.dot_general(
                ap_ref[:], prev, (((1,), (0,)), ((), ())),
                precision=mxu_prec,
                preferred_element_type=jnp.float32)
        if use_n:
            W2 = W2 + jax.lax.dot_general(
                an_ref[:], nxt, (((1,), (0,)), ((), ())),
                precision=mxu_prec,
                preferred_element_type=jnp.float32)

        # V stage: lane slices at BI multiples (aligned for BI % 128
        # == 0) — the flat layout's payoff over sublane realigns
        out = None
        vcache = {}
        for di, terms in sorted(vmap_.items()):
            V = vcache.get(terms)
            if V is None:
                for dj, wid in terms:
                    s = W2[wid * BK:(wid + 1) * BK,
                           (BJ + dj) * BI:(BJ + dj) * BI + LO]
                    V = s if V is None else V + s
                vcache[terms] = V
            if di == 0:
                term = V
            else:
                # periodic i roll per BI block: full-width roll +
                # one-block-shifted roll supply the wrapped edge lanes
                s1 = (-di) % L_I
                s2 = ((BI if di > 0 else -BI) - di) % L_I
                main = pltpu.roll(V, s1, 1)
                corr = pltpu.roll(V, s2, 1)
                ii = jax.lax.broadcasted_iota(
                    jnp.int32, (BK, LO), 1) % BI
                mask = (ii >= BI - di) if di > 0 else (ii < -di)
                term = jnp.where(mask, corr, main)
            out = term if out is None else out + term

        def out_copies(tt, parity):
            cps = []
            for cj in range(TJ):
                b = (K0 + tt) * GJ + J0 + jt * TJ + cj
                cps.append(pltpu.make_async_copy(
                    tout.at[parity, :, cj * LB:(cj + 1) * LB],
                    out_ref.at[ids_ref[b]],
                    osem.at[parity]))
            return cps

        @pl.when(t >= 2)
        def _():
            for cp in out_copies(t - 2, t % 2):
                cp.wait()

        tout[t % 2] = out.astype(dtype) if bf16 else out
        for cp in out_copies(t, t % 2):
            cp.start()

        @pl.when(t == KC - 1)
        def _():
            for tt in range(max(KC - 2, 0), KC):
                for cp in out_copies(tt, tt % 2):
                    cp.wait()

    nelems = KC * BK * JC * LB
    cost = pl.CostEstimate(
        flops=int((ir.flops_per_element()
                   + 2 * nWd * BK * JW / max(TJ, 1)) * nelems),
        bytes_accessed=2 * nelems * 4,
        transcendentals=0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(JT, KC),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NW, BK, LW), dtype),
            pltpu.VMEM((2, BK, LO), dtype),
            pltpu.SemaphoreType.DMA((NW,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbricks, BK, LB), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )
    ids = jnp.asarray(grid.ravel().astype(np.int32))

    def fn(flat_view):
        return call(ids, flat_view, mAp, mAc, mAn)

    fn.tile_j = TJ
    fn.vmem_bytes = vmem_estimate(TJ)
    fn.n_wprofiles = nWd
    return fn
