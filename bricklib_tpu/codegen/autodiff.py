"""Differentiable stencil sweeps (beyond the reference).

The jnp oracle (:mod:`.jnp_backend`) is differentiable for free, but
the Pallas fast path is opaque to JAX's AD.  For LINEAR single-input
stencils the reverse-mode rule is exact and cheap: the operator is
``y = A x`` with ``A`` the periodic stencil matrix, so the pullback is
``x̄ = Aᵀ ȳ`` — and ``Aᵀ`` is just the stencil with every tap offset
NEGATED (same coefficients), i.e. *another pencil sweep at identical
cost*.  That turns the flagship kernel into a building block for
differentiable simulation / PINN-style training loops without leaving
the speed-of-light path.

Contract (checked at build time):

- single linear input (``linear_decomposition`` succeeds) — nonlinear
  or multi-input stencils differentiate through ``brick_apply``;
- the grid table is FULLY PERIODIC in k and j (``BrickDecomp.
  periodic_grid`` over all axes) and the layout is the pencil one
  (i periodic by lane rolls), so the owned bricks form a torus and
  the transpose of "periodic stencil" is "periodic stencil with
  negated offsets";
- gradients flow through the storage array only (coefficients are
  trace-time constants, as everywhere on the Pallas path).

Rows the sweep never writes (ghost ring, garbage brick 0) hold
undefined data in any Pallas output; the pullback therefore masks
them to zero so downstream consumers (optimizers, checkpoints) never
see garbage — the true gradient there IS zero, because the forward
never reads ghost storage through a periodic table.

Temporal fusion composes cleanly: ``(A^F)ᵀ = (Aᵀ)^F``, so ``fuse=F``
builds the pullback as the F-fused adjoint sweep.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..st.expr import ConstRef, FloatLiteral, Index
from ..st.grid import Grid
from ..st.loader import StencilDef, load_stencil_module
from .ir import linear_decomposition


def adjoint_stencil(sdef: StencilDef) -> StencilDef:
    """The transpose stencil: same coefficients, every offset negated.

    For ``y[p] = Σ_t c_t · x[p + o_t]`` (periodic), ``(Aᵀ ȳ)[q] =
    Σ_t c_t · ȳ[q - o_t]``.  Coefficient ``ConstRef``s keep their
    names so one params dict serves both sweeps.  Involution:
    ``adjoint(adjoint(s))`` has the original taps."""
    lin = linear_decomposition(sdef.rhs)
    if lin is None:
        raise ValueError(
            f"stencil '{sdef.output.name}' is not a pure linear tap "
            f"combination — differentiate through brick_apply instead")
    if len(sdef.inputs) != 1:
        raise ValueError("adjoint_stencil supports single-input stencils")
    d = sdef.dims
    in_name = next(iter(sdef.inputs))
    g = Grid(in_name, d)
    og = Grid(sdef.output.name + "_adj", d)
    idx = [Index(a) for a in range(d)]
    rhs = None
    for _key, cexpr, taps in lin:
        coeff = (ConstRef(cexpr.name) if hasattr(cexpr, "name")
                 else FloatLiteral(float(cexpr.val)))
        for sign, _gname, offs in taps:
            ref = g(*[idx[a] - int(offs[a]) for a in range(d)])
            term = coeff * ref
            if sign < 0:
                term = -term
            rhs = term if rhs is None else rhs + term
    og(*idx).assign(rhs)
    return load_stencil_module({"STENCIL": [og]})[0]


def _check_periodic_table(grid: np.ndarray, k_range, j_range,
                          axes=(0, 1)):
    """The transpose rule needs a torus on every NON-exchanged axis:
    each ghost ring cell must redirect to the wrapped owned brick
    (periodic_grid semantics)."""
    GK, GJ = grid.shape[:2]
    K0, K1 = k_range
    J0, J1 = j_range
    pk, pj = K1 - K0, J1 - J0
    ok = True
    if 0 in axes:
        for r in range(K0):
            ok &= bool(np.array_equal(grid[r], grid[r + pk]))
        for r in range(GK - K1):
            ok &= bool(np.array_equal(grid[K1 + r], grid[K0 + r]))
    if 1 in axes:
        for r in range(J0):
            ok &= bool(np.array_equal(grid[:, r], grid[:, r + pj]))
        for r in range(GJ - J1):
            ok &= bool(np.array_equal(grid[:, J1 + r], grid[:, J0 + r]))
    if not ok:
        raise ValueError(
            "differentiable_pencil_sweep needs a fully periodic grid "
            "table (BrickDecomp.periodic_grid over all axes): the "
            "transpose of the periodic stencil operator is only "
            "another stencil on a torus")


def differentiable_pencil_sweep(stencil, grid: np.ndarray,
                                bdims: Sequence[int], nbricks: int,
                                params: dict | None = None,
                                mask_ghost: bool = True,
                                exchanged_axes: Sequence[int] = (),
                                forward_fn=None,
                                **kw):
    """``fn(dat_view) -> out_view`` like :func:`pallas_pencil_sweep`,
    but registered with :func:`jax.custom_vjp`: ``jax.grad`` through it
    runs the adjoint stencil as a second pencil sweep (same schedule,
    same cost).  See the module docstring for the contract.

    ``exchanged_axes`` (numpy order: 0 = k, 1 = j) marks axes whose
    ghost ring is filled by a real exchange (``exchange_shift`` under
    ``shard_map`` — pure ppermute/slice ops, AD-transparent) instead of
    table periodicity.  On those axes the pullback runs the adjoint
    sweep over the FULL grid range: the cotangent it scatters into the
    ghost bricks is routed back to the neighbors' skins by the
    exchange's own transpose.  Exactness needs the incoming cotangent
    to vanish on the ghost ring — true whenever the loss reads owned
    rows and steps compose as ``sweep(exchange(x))`` (the exchange's
    overwrite-transpose re-zeroes ghost cotangent every step), i.e.
    one sweep per exchange.  Deep-ghost ``st_iter > 1`` chains
    ghost-INCLUSIVE sweeps whose edge-clamped windows are not exactly
    transposed — exchange every iteration when differentiating; for
    the same reason ``fuse > 1`` is rejected with exchanged axes.

    ``forward_fn``: a prebuilt :func:`pallas_pencil_sweep` with the
    SAME configuration (skips rebuilding the forward kernel — e.g.
    the one a Problem's plan already built)."""
    import jax
    import jax.numpy as jnp

    from .pencil_kernel import pallas_pencil_sweep

    for bad in ("evolve", "batch", "i_ghost", "inplace"):
        if kw.get(bad):
            raise ValueError(f"differentiable_pencil_sweep does not "
                             f"support {bad}=...")
    grid = np.asarray(grid)
    g2 = grid[:, :, 0] if grid.ndim == 3 else grid
    if grid.ndim == 3 and grid.shape[2] != 1:
        raise ValueError("pencil layout only (one brick per (k, j))")
    GK, GJ = g2.shape
    k_range = tuple(kw.get("k_range") or (1, GK - 1))
    j_range = tuple(kw.get("j_range") or (1, GJ - 1))
    exchanged_axes = tuple(exchanged_axes)
    if not set(exchanged_axes) <= {0, 1}:
        raise ValueError("exchanged_axes are numpy-order k/j axes "
                         "(0 and/or 1); i is always lane-periodic")
    if exchanged_axes and int(kw.get("fuse") or 1) > 1:
        # the fused adjoint's intermediate levels CLAMP their windows
        # at the table edge, which injects cotangent into outer ghost
        # elements where the exact transpose is zero — and the exchange
        # transpose would route that garbage into the neighbors' owned
        # gradients.  fuse=1 is immune: its only clamped reads hit
        # ghost-row cotangent, zero by contract.
        raise ValueError("exchanged_axes with fuse > 1 would compute "
                         "wrong gradients (clamped fused adjoint "
                         "levels); exchange every iteration at fuse=1")
    # every NON-exchanged axis must be table-periodic AND keep its
    # ghost ring OUT of the computed range: a ghost-inclusive range on
    # a periodic axis (e.g. the deep-ghost (0, GK)) writes each skin
    # brick twice through the ring alias — last-write-wins corruption —
    # and makes the periodicity check below vacuous
    for ax, rng, G in ((0, k_range, GK), (1, j_range, GJ)):
        if ax not in exchanged_axes and (rng[0] < 1 or rng[1] > G - 1):
            raise ValueError(
                f"axis {ax}: range {rng} includes the periodic ghost "
                f"ring (grid extent {G}); table-periodic axes must "
                f"compute owned cells only (1, {G - 1})")
    _check_periodic_table(
        g2, k_range, j_range,
        axes=tuple(a for a in (0, 1) if a not in exchanged_axes))
    sdefs = stencil if isinstance(stencil, (list, tuple)) else [stencil]
    if len(sdefs) != 1:
        raise ValueError("differentiable_pencil_sweep takes one output")
    fwd_fn = forward_fn or pallas_pencil_sweep(stencil, grid, bdims,
                                               nbricks, params, **kw)
    # pullback ranges: full span on exchanged axes (ghost cotangent is
    # real data the exchange transpose routes home), owned span on
    # table-periodic axes (their ring cells alias owned bricks — a
    # full-range write would scatter each brick twice)
    bkw = dict(kw)
    bkw["k_range"] = (0, GK) if 0 in exchanged_axes else k_range
    bkw["j_range"] = (0, GJ) if 1 in exchanged_axes else j_range
    adj_fn = pallas_pencil_sweep(adjoint_stencil(sdefs[0]), grid, bdims,
                                 nbricks, params, **bkw)

    # rows the pullback writes; everything else (the garbage brick 0,
    # and on table-periodic axes the ghost bricks) is undefined in a
    # Pallas output and its true gradient is zero — mask so it never
    # leaks downstream
    written = np.zeros(nbricks, np.bool_)
    written[np.unique(g2[bkw["k_range"][0]:bkw["k_range"][1],
                         bkw["j_range"][0]:bkw["j_range"][1]])] = True
    mask = jnp.asarray(written.reshape((nbricks,) + (1,) * len(bdims)))

    @jax.custom_vjp
    def step(d):
        return fwd_fn(d)

    def step_fwd(d):
        return fwd_fn(d), None

    def step_bwd(_res, ct):
        xb = adj_fn(ct)
        # where, not multiply: the unwritten rows can hold NaN/inf and
        # garbage * 0 keeps the NaN
        return ((jnp.where(mask, xb, jnp.zeros((), xb.dtype))
                 if mask_ghost else xb),)

    step.defvjp(step_fwd, step_bwd)
    step.forward = fwd_fn
    step.adjoint = adj_fn
    return step


def oracle_vjp_sweep(stencil, dec, bdims: Sequence[int],
                     params: dict | None = None,
                     fields: Sequence[str] | None = None,
                     **kw):
    """Fast Pallas forward + exact ORACLE pullback, for everything the
    adjoint-stencil mode cannot serve: nonlinear stencils, coupled
    multi-output systems, and multi-input (variable-coefficient)
    problems — including gradients wrt the AUX coefficient fields,
    the inverse-problem case.

    On a fully periodic table the dense twin computes the same
    function as the pencil kernel (the golden equivalence every test
    asserts), so ``jax.vjp`` through the traceable dense oracle is the
    exact pullback of the Pallas forward.  The forward runs at kernel
    speed; the backward runs at XLA-fused jnp speed (one dense
    periodic application per output per fused level).

    ``dec``: a :class:`~bricklib_tpu.comm.decomp.BrickDecomp` whose
    table is used fully periodic (single-device / table-periodic
    semantics — distributed meshes differentiate through the linear
    adjoint mode only).  ``fields``: evolving grid names in STENCIL
    output order (defaults to the single input).  Returns
    ``fn(*views)`` in ``fn.fields`` input order, one output view per
    STENCIL entry."""
    import jax
    import jax.numpy as jnp

    from .jnp_backend import dense_apply
    from .pencil_kernel import pallas_pencil_sweep

    sdefs = stencil if isinstance(stencil, (list, tuple)) else [stencil]
    for bad in ("evolve", "batch", "i_ghost", "inplace", "k_range",
                "j_range", "i_range"):
        if kw.get(bad):
            raise ValueError(f"oracle_vjp_sweep does not take {bad}=")
    if fields is None:
        if len(sdefs) != 1 or len(sdefs[0].inputs) != 1:
            raise ValueError("fields= is required for systems / "
                             "multi-input stencils")
        fields = (next(iter(sdefs[0].inputs)),)
    fields = tuple(fields)
    if len(fields) != len(sdefs):
        raise ValueError("one evolving field per STENCIL output")
    nd = sdefs[0].dims
    if nd != 3:
        raise ValueError("oracle_vjp_sweep is 3-D pencil only")
    kgrid = dec.periodic_grid(tuple(range(nd)))
    F = int(kw.get("fuse") or 1)

    fwd_fn = pallas_pencil_sweep(
        sdefs if len(sdefs) > 1 else sdefs[0], kgrid, bdims,
        dec.nbricks, params, evolve=fields, **kw)
    fieldnames = getattr(fwd_fn, "fields", fields)
    NO = len(sdefs)

    # traceable storage <-> dense transforms over the OWNED cells
    ids_np = dec.interior_grid()
    ids2 = ids_np[:, :, 0] if ids_np.ndim == 3 else ids_np
    gk, gj = ids2.shape
    BK, BJ, BI = (int(b) for b in bdims)
    flat_ids = jnp.asarray(ids2.ravel().astype(np.int32))

    def to_dense(v):
        b = v[flat_ids].reshape(gk, gj, BK, BJ, BI)
        return b.transpose(0, 2, 1, 3, 4).reshape(gk * BK, gj * BJ, BI)

    def to_store(dn, like):
        b = dn.reshape(gk, BK, gj, BJ, BI).transpose(0, 2, 1, 3, 4)
        return jnp.zeros_like(like).at[flat_ids].set(
            b.reshape(gk * gj, BK, BJ, BI))

    pads = {}
    for sd in sdefs:
        lo, hi = sd.radius()
        pads[sd.output.name] = tuple((lo[a], hi[a]) for a in range(nd))

    def oracle(*views):
        vs = {n: to_dense(v) for n, v in zip(fieldnames, views)}
        for _ in range(F):
            outs = [dense_apply(
                sd, {n: jnp.pad(vs[n], pads[sd.output.name],
                                mode="wrap") for n in sd.inputs},
                params) for sd in sdefs]
            vs.update(zip(fields, outs))   # Jacobi: all read pre-level
        return tuple(vs[f] for f in fields)

    written = np.zeros(dec.nbricks, np.bool_)
    written[np.unique(ids2)] = True
    mask = jnp.asarray(written.reshape((dec.nbricks,)
                                       + (1,) * len(bdims)))

    @jax.custom_vjp
    def step(*views):
        return fwd_fn(*views)

    def step_fwd(*views):
        return fwd_fn(*views), views

    def step_bwd(views, ct):
        cts = ct if isinstance(ct, tuple) else (ct,)
        # zero the undefined (unwritten) output rows before the vjp
        cts = tuple(jnp.where(mask, c, jnp.zeros((), c.dtype))
                    for c in cts)

        def ofn(*v):
            outs = oracle(*v)
            return tuple(to_store(o, views[fieldnames.index(f)])
                         for o, f in zip(outs, fields))

        _, vjp = jax.vjp(ofn, *views)
        return vjp(cts)

    step.defvjp(step_fwd, step_bwd)
    step.forward = fwd_fn
    step.fields = tuple(fieldnames)
    return step


def _check_periodic_table_nd(grid: np.ndarray, ranges):
    """n-outer-axis torus check (4-D pencil tables): every ghost ring
    cell must alias the wrapped owned brick along every axis."""
    ok = True
    for ax, (a0, a1) in enumerate(ranges):
        G = grid.shape[ax]
        p = a1 - a0
        sl = [slice(None)] * grid.ndim

        def at(r):
            s = list(sl)
            s[ax] = r
            return grid[tuple(s)]

        for r in range(a0):
            ok &= bool(np.array_equal(at(r), at(r + p)))
        for r in range(G - a1):
            ok &= bool(np.array_equal(at(a1 + r), at(a0 + r)))
    if not ok:
        raise ValueError(
            "differentiable_pencil_sweep_4d needs a fully periodic "
            "grid table (BrickDecomp.periodic_grid over all axes)")


def differentiable_pencil_sweep_4d(stencil, grid: np.ndarray,
                                   bdims: Sequence[int], nbricks: int,
                                   params: dict | None = None,
                                   mask_ghost: bool = True,
                                   **kw):
    """4-D twin of :func:`differentiable_pencil_sweep` (table-periodic
    configs only — the 4-D path has no exchanged-axes mode).  Same
    contract: linear single-input stencil, fully periodic table, exact
    adjoint sweep as the pullback, undefined output rows masked to
    zero.  ``fuse`` composes exactly on the torus."""
    import jax
    import jax.numpy as jnp

    from .pencil_kernel_4d import pallas_pencil_sweep_4d

    sdefs = stencil if isinstance(stencil, (list, tuple)) else [stencil]
    if len(sdefs) != 1:
        raise ValueError("differentiable_pencil_sweep_4d takes one "
                         "output")
    if sdefs[0].dims != 4:
        raise ValueError("use differentiable_pencil_sweep for 3-D")
    grid = np.asarray(grid)
    g3 = grid[:, :, :, 0] if grid.ndim == 4 else grid
    if grid.ndim == 4 and grid.shape[3] != 1:
        raise ValueError("pencil layout only (one brick per (w, k, j))")
    GW, GK, GJ = g3.shape
    ranges = (tuple(kw.get("w_range") or (1, GW - 1)),
              tuple(kw.get("k_range") or (1, GK - 1)),
              tuple(kw.get("j_range") or (1, GJ - 1)))
    for ax, (a0, a1) in enumerate(ranges):
        G = g3.shape[ax]
        if a0 < 1 or a1 > G - 1:
            raise ValueError(
                f"axis {ax}: range {(a0, a1)} includes the periodic "
                f"ghost ring (grid extent {G}); compute owned cells "
                f"only (1, {G - 1})")
    _check_periodic_table_nd(g3, ranges)

    fwd_fn = pallas_pencil_sweep_4d(sdefs[0], grid, bdims, nbricks,
                                    params, **kw)
    adj_fn = pallas_pencil_sweep_4d(adjoint_stencil(sdefs[0]), grid,
                                    bdims, nbricks, params, **kw)

    written = np.zeros(nbricks, np.bool_)
    written[np.unique(g3[ranges[0][0]:ranges[0][1],
                         ranges[1][0]:ranges[1][1],
                         ranges[2][0]:ranges[2][1]])] = True
    mask = jnp.asarray(written.reshape((nbricks,) + (1,) * len(bdims)))

    @jax.custom_vjp
    def step(d):
        return fwd_fn(d)

    def step_fwd(d):
        return fwd_fn(d), None

    def step_bwd(_res, ct):
        xb = adj_fn(ct)
        return ((jnp.where(mask, xb, jnp.zeros((), xb.dtype))
                 if mask_ghost else xb),)

    step.defvjp(step_fwd, step_bwd)
    step.forward = fwd_fn
    step.adjoint = adj_fn
    return step
