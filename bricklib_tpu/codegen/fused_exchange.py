"""Exchange fused INTO the sweep: one Pallas kernel that issues the
ghost exchange as remote DMAs and overlaps the ICI transfer with its own
k-stream — the kernel-level end of the reference's interior-first
compute/comm overlap (sep_pos split, brick-mpi.h:196; staged D2H window
weak/main.cu:251-291).

Structure (vs the flagship :mod:`.pencil_kernel` sweep, whose shared
row machinery — :func:`~.pencil_kernel.build_row_compute`,
:func:`~.pencil_kernel.banded_row`, the VMEM model — this reuses):

- at the FIRST grid step the kernel starts one ``make_async_remote_copy``
  per ghost/skin run pair of the PUT plan (:func:`...comm.exchange.
  put_plan` — direct per-direction messages, no staging; 1-device
  directions are blocking local DMAs, ref: exchange(),
  brick-mpi.h:466-495);
- j-tiles are REORDERED so the two tiles whose windows read j-ghost
  pencils run last; each tile's k-stream is reordered interior-first:
  rows [s, K1) stream normally, the ``nepi`` rows adjacent to the low-k
  ghost run as an epilogue with a fresh window fill;
- each ghost region's recv semaphores are waited exactly once, at its
  statically-known first reader: high-k at the prefetch step that first
  requests the top ghost row, low-k at the epilogue start, j faces and
  all corners at the first j-ghost tile's warmup.  Everything before
  those gates is ghost-independent, so the ICI transfer hides behind
  the interior stream;
- the input storage is updated in place (aliased second output) — the
  remote copies land straight in the neighbor's ghost bricks, pack-free.

Per-row arithmetic is identical to the flagship sweep, so the result is
bit-exact equal to ``exchange_put`` (= ``exchange_shift``) followed by
the ghost-inclusive sweep; only the execution order differs.

Scope: 3-D pencil layout (GI == 1), fuse == 1, batch == 1.  Temporal
fusion composes at the step level instead: the driver runs this kernel
as the step's FIRST sweep and fused sweeps after it.
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
from .pencil_kernel import (banded_row, build_row_compute, choose_tile_j,
                            pencil_vmem_estimate)


def pallas_pencil_sweep_fusedx(stencil, grid: np.ndarray,
                               bdims: Sequence[int],
                               nbricks: int,
                               plan,
                               mesh_shape: tuple[int, ...],
                               params: dict | None = None,
                               k_range: tuple[int, int] | None = None,
                               j_range: tuple[int, int] | None = None,
                               tile_j: int | None = None,
                               dtype=jnp.float32,
                               compute_dtype=jnp.float32,
                               interpret: bool | None = None,
                               collective_id: int = 2,
                               ghost_rings: tuple[int, int] | None = None,
                               vmem_limit_bytes: int = 110 * 2 ** 20):
    """Build ``fn(dat_view, nbr_ids) -> (out_view, dat_view')``.

    ``plan`` is :func:`put_plan`'s entry list; ``nbr_ids`` the i32 vector
    of send-target logical device ids for its remote entries in order
    (trace-time ``lax.axis_index`` arithmetic — the caller runs inside
    ``shard_map`` over ONE flat device axis).  ``k_range``/``j_range``
    default to ghost-INCLUSIVE on exchanged axes (axes some plan entry
    moves along) and owned-only on table axes.  ``dat_view'`` is
    ``dat_view`` with its ghost bricks updated in place (aliased).

    ``ghost_rings`` = (gzk, gzj): ghost-BRICK rings per exchanged axis
    (``decomp.ghost_depth[a] // bdims[a]`` — the reference's free GZ,
    brick-mpi.h:304-316).  Defaults to the counts the plan carries
    (:class:`...comm.exchange.PutPlan`); passing a value that
    contradicts the plan raises — a wrong ring count silently shifts
    the recv gates and races the remote copies.  Deeper rings shift
    the gate rows: the main k-stream starts above the low ghost block
    (gzk + F), the khi gate fires at the first prefetch of the LOWEST
    high-ghost row, and the j gate covers every tile whose window
    reads a ghost pencil.
    """
    ir = _as_ir(stencil)
    params = dict(params or {})
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if ir.dims != 3:
        raise NotImplementedError("fused-exchange sweep is 3-D pencil")
    if len(ir.sdef.inputs) != 1:
        raise NotImplementedError("pallas paths read one input grid")
    BK, BJ, BI = (int(b) for b in bdims)
    if not interpret and (BI % 128 or BJ % 8):
        raise ValueError("Mosaic DMA granularity: pencil bricks need "
                         "BI % 128 == 0 and BJ % 8 == 0 on hardware")
    grid = np.asarray(grid)
    if grid.ndim == 3:
        if grid.shape[2] != 1:
            raise ValueError("pencil layout needs one brick per (k, j)")
        grid = grid[:, :, 0]
    GK, GJ = grid.shape
    k_ex = any(d[0][0] for d in plan)
    j_ex = any(d[0][1] for d in plan)
    if k_range is None:
        k_range = (0, GK) if k_ex else (1, GK - 1)
    if j_range is None:
        j_range = (0, GJ) if j_ex else (1, GJ - 1)
    K0, K1 = (int(k) for k in k_range)
    J0, J1 = (int(j) for j in j_range)
    KC, JC = K1 - K0, J1 - J0
    lo, hi = ir.radius()
    if lo[0] > BK or hi[0] > BK or lo[1] > BJ or hi[1] > BJ:
        raise ValueError("stencil radius exceeds brick dims")
    F = 1

    plan_rings = getattr(plan, "ghost_rings", None)
    if ghost_rings is None:
        ghost_rings = plan_rings if plan_rings is not None else (1, 1)
    elif (plan_rings is not None
            and tuple(int(g) for g in ghost_rings) != tuple(plan_rings)):
        raise ValueError(
            f"ghost_rings {tuple(ghost_rings)} contradicts the plan's "
            f"decomp ({tuple(plan_rings)}) — recv gates would race the "
            f"remote ghost copies")
    gzk, gzj = (int(g) for g in ghost_rings)
    if gzk < 1 or gzj < 1:
        raise ValueError("ghost_rings counts ghost-brick rings (>= 1)")
    # interior-first reorder: stream rows [s, K1) then epilogue [K0, s).
    # s is the lowest stream start whose NW-row warmup (rows s-F..s+F+1)
    # avoids the low ghost BLOCK (gzk rings); the warmup must also not
    # reach the top ghost block early (that's the khi gate's job,
    # mid-stream).
    if k_ex:
        s = gzk + F
        nepi = s - K0
        if KC - nepi < 2 * F + 2 or GK - gzk <= s + F + 1:
            raise ValueError(f"fused-exchange sweep needs a deeper k "
                             f"grid (GK={GK}, ghost rings={gzk})")
        # first step whose PREFETCH requests the (unclamped) LOWEST
        # high-ghost row GK - gzk: warmup starts rows [s-F, s+F+1],
        # prefetch at step t starts row s + t + F + 1
        t_top = (GK - gzk) - s - F - 1
        if t_top < 1:
            raise ValueError("k grid too shallow for the khi gate")
    else:
        s, nepi, t_top = K0, 0, None
    SL = KC - nepi              # main-stream steps per tile
    # window slots: the streamed main pass needs 2F+2 (warmup span +
    # one-ahead prefetch); the epilogue refills rows [K0-F, s+F) in one
    # burst and needs nepi+2F DISTINCT slots (deep ghost makes this the
    # larger term).  Warmup still fills only the first 2F+2 rows — the
    # extra slots exist for the epilogue's virtual below-edge rows.
    NW = max(2 * F + 2, nepi + 2 * F)

    resolve = resolve_const_from_params(params)
    lin = fold_linear(ir, resolve)

    def _roll_i(v, di):
        return pltpu.roll(v, (-di) % BI, 2) if di else v

    # --- VMEM budget (flagship model, F=1, pencil) ---------------------
    isz = np.dtype(dtype).itemsize
    csz = np.dtype(jnp.dtype(compute_dtype)).itemsize

    def vmem_estimate(tj: int) -> int:
        return pencil_vmem_estimate(
            tj, BK=BK, BJ=BJ, RI=BI, IW=BI, isz=isz, csz=csz, NW=NW,
            lo_k=lo[0], hi_k=hi[0], lin=lin, ntaps=len(ir.sdef.taps))

    if tile_j is None:
        tile_j = choose_tile_j(JC, vmem_estimate, vmem_limit_bytes)
    TJ = int(tile_j)
    if JC % TJ:
        raise ValueError(f"tile_j {TJ} must divide j extent {JC}")
    JT = JC // TJ
    JW = TJ + 2

    # --- plan bookkeeping ----------------------------------------------
    remote = [e for e in plan if e[5]]
    local = [e for e in plan if not e[5]]
    n_remote = len(remote)
    NGRID = GK * GJ             # nbr ids live after the grid table
    gate_rows = {"khi": [], "klo": [], "j": []}
    for r_i, e in enumerate(remote):
        gate_rows[e[6]].append(r_i)
    # tiles whose windows read j-ghost pencils: each window spans jcols
    # jt*TJ-1 .. (jt+1)*TJ, so the low-end tiles with jt*TJ - 1 < gzj
    # and the mirrored high-end tiles touch ghost.  Rotate so they all
    # run last and gate at the first of them in reordered order.
    jrot = -((-(gzj + 1)) // TJ)     # ceil((gzj + 1) / TJ)
    jgate_pos = max(JT - 2 * jrot, 0)

    def _clip(x, n):
        return jnp.clip(x, 0, n - 1)

    def slot(a):                # absolute-row -> window slot
        return (a + F - K0) % NW

    def _row_copies(ids_ref, dat_ref, win, sem, jt, absrow):
        """Window DMAs for absolute grid row ``absrow`` (edge-clamped)
        of reordered j-tile ``jt``."""
        krow = _clip(absrow, GK)
        sl = slot(absrow)
        cps = []
        for cj in range(JW):
            jcol = _clip(J0 - 1 + jt * TJ + cj, GJ)
            cps.append(pltpu.make_async_copy(
                dat_ref.at[ids_ref[krow * GJ + jcol]],
                win.at[sl, :, cj * BJ:(cj + 1) * BJ, :],
                sem.at[sl]))
        return cps

    def _xchg_copies(ids_ref, out_ref, ssem, rsem, rows=None):
        cps = []
        for r_i, (_d, d0, d1, s0, s1, _r, _g) in enumerate(remote):
            if rows is not None and r_i not in rows:
                continue
            cps.append(pltpu.make_async_remote_copy(
                out_ref.at[s0:s1], out_ref.at[d0:d1],
                ssem.at[r_i], rsem.at[r_i],
                device_id=ids_ref[NGRID + r_i],
                device_id_type=pltpu.DeviceIdType.LOGICAL))
        return cps

    # flagship arithmetic (factorized or generic); the fused sweep
    # always computes the full lane-roll width with a one-pencil j halo
    _row_compute = build_row_compute(ir, resolve, lin, _roll_i)

    def _compute(kslab, base, nrows):
        return _row_compute(kslab, BJ, TJ * BJ, base, nrows)

    def kernel(ids_ref, dat_ref, out_ref, alias_ref, win, tout, sem,
               ssem, rsem, lsem, osem):   # noqa: F811
        jpos = pl.program_id(0)
        t = pl.program_id(1)
        jt = jax.lax.rem(jpos + jrot, JT) if (j_ex and JT > 1) else jpos

        @pl.when(jnp.logical_and(jpos == 0, t == 0))
        def _():
            if n_remote and not interpret:
                bsem = pltpu.get_barrier_semaphore()
                for r_i in range(n_remote):
                    pltpu.semaphore_signal(
                        bsem, 1, device_id=ids_ref[NGRID + r_i],
                        device_id_type=pltpu.DeviceIdType.LOGICAL)
                pltpu.semaphore_wait(bsem, n_remote)
            for cp in _xchg_copies(ids_ref, alias_ref, ssem, rsem):
                cp.start()
            lcs = []
            for _d, d0, d1, s0, s1, _r, _g in local:
                cp = pltpu.make_async_copy(alias_ref.at[s0:s1],
                                           alias_ref.at[d0:d1], lsem)
                cp.start()
                lcs.append(cp)
            for cp in lcs:
                cp.wait()

        def wait_gate(group):
            for cp in _xchg_copies(ids_ref, alias_ref, ssem, rsem,
                                   rows=set(gate_rows[group])):
                cp.wait_recv()

        if j_ex and gate_rows["j"]:
            @pl.when(jnp.logical_and(jpos == jgate_pos, t == 0))
            def _():
                wait_gate("j")

        @pl.when(t == 0)
        def _():
            # fill only the streamed-warmup span (2F+2 rows) — with
            # deep ghost NW is larger, and prefetch continues at
            # w = t + 2F + 1 from exactly this fill edge
            for w in range(min(2 * F + 2, SL + 2 * F)):
                for cp in _row_copies(ids_ref, alias_ref, win, sem, jt,
                                      s - F + w):
                    cp.start()

        if k_ex and gate_rows["khi"]:
            @pl.when(jnp.logical_and(jpos == 0, t == t_top))
            def _():
                wait_gate("khi")

        @pl.when(jnp.logical_and(t > 0,
                                 jnp.logical_and(t < SL,
                                                 t + 2 * F + 1
                                                 <= SL + 2 * F - 1)))
        def _():
            for cp in _row_copies(ids_ref, alias_ref, win, sem, jt,
                                  s - F + t + 2 * F + 1):
                cp.start()

        @pl.when(t == 0)
        def _():
            for w in range(min(2 * F, SL + 2 * F - 1)):
                for cp in _row_copies(ids_ref, alias_ref, win, sem,
                                      jt, s - F + w):
                    cp.wait()

        @pl.when(t < SL)
        def _():
            for cp in _row_copies(ids_ref, alias_ref, win, sem, jt,
                                  s - F + jnp.minimum(t, SL - 1)
                                  + 2 * F):
                cp.wait()

        if nepi:
            if k_ex and gate_rows["klo"]:
                @pl.when(jnp.logical_and(jpos == 0, t == SL))
                def _():
                    wait_gate("klo")

            @pl.when(t == SL)
            def _():
                # fresh fill for the epilogue rows' windows, INCLUDING
                # the virtual below-edge row (content clamps to row K0,
                # same as the flagship warmup's clamped slots)
                cps = []
                for a in range(K0 - F, s + F):
                    for cp in _row_copies(ids_ref, alias_ref, win, sem,
                                          jt, a):
                        cp.start()
                        cps.append(cp)
                for cp in cps:
                    cp.wait()

        row = jnp.where(t < SL, s + t, K0 + (t - SL))

        def win_row(a, rs=slice(None)):
            return win[slot(a), rs]

        lo0, hi0 = lo[0], hi[0]

        def _out_copies(tt, parity):
            rr = jnp.where(tt < SL, s + tt, K0 + (tt - SL))
            cps = []
            for cj in range(TJ):
                cps.append(pltpu.make_async_copy(
                    tout.at[parity, :, cj * BJ:(cj + 1) * BJ, :],
                    out_ref.at[ids_ref[rr * GJ + J0 + jt * TJ + cj]],
                    osem.at[parity]))
            return cps

        @pl.when(t >= 2)
        def _():
            for cp in _out_copies(t - 2, t % 2):
                cp.wait()

        def out_writer(r0, r1, v):
            if compute_dtype != dtype:
                v = v.astype(dtype)
            tout[t % 2, r0:r1] = v

        def cast(v):
            return (v.astype(compute_dtype)
                    if compute_dtype != dtype else v)

        banded_row(win_row, row, cast, out_writer, _compute, BK,
                   lo0, hi0)

        for cp in _out_copies(t, t % 2):
            cp.start()

        @pl.when(t == KC - 1)
        def _():
            for tt in range(max(KC - 2, 0), KC):
                for cp in _out_copies(tt, tt % 2):
                    cp.wait()
            # sender-side completion of the remote copies before exit
            @pl.when(jpos == JT - 1)
            def _():
                cps = _xchg_copies(ids_ref, alias_ref, ssem, rsem)
                for cp in cps:
                    cp.wait_send()

    nelems = KC * BK * JC * BJ * BI
    cost = pl.CostEstimate(
        flops=ir.flops_per_element() * nelems,
        bytes_accessed=2 * nelems * np.dtype(dtype).itemsize,
        transcendentals=0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(JT, KC),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((NW, BK, JW * BJ, BI), dtype),
            pltpu.VMEM((2, BK, TJ * BJ, BI), dtype),
            pltpu.SemaphoreType.DMA((NW,)),
            pltpu.SemaphoreType.DMA((max(n_remote, 1),)),
            pltpu.SemaphoreType.DMA((max(n_remote, 1),)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    cparams = dict(dimension_semantics=("arbitrary", "arbitrary"),
                   vmem_limit_bytes=vmem_limit_bytes,
                   has_side_effects=True)
    if n_remote:
        cparams["collective_id"] = collective_id
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nbricks, BK, BJ, BI), dtype),
                   jax.ShapeDtypeStruct((nbricks, BK, BJ, BI), dtype)],
        input_output_aliases={1: 1},   # dat -> second output, in place
        compiler_params=pltpu.CompilerParams(**cparams),
        cost_estimate=cost,
        interpret=interpret,
    )
    grid_ids = grid.ravel().astype(np.int32)

    def fn(dat_view, nbr_ids=None):
        if n_remote:
            ids = jnp.concatenate([jnp.asarray(grid_ids),
                                   nbr_ids.astype(jnp.int32)])
        else:
            ids = jnp.asarray(grid_ids)
        out, dat2 = call(ids, dat_view)
        return out, dat2

    fn.tile_j = TJ
    fn.vmem_bytes = vmem_estimate(TJ)
    return fn
