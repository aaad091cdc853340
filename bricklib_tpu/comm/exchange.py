"""Ghost exchange over a jax.sharding.Mesh.

The reference's MPI machinery maps onto ICI collectives:

- PUT exchange (ref: BrickDecomp::exchange, brick-mpi.h:466-495): one
  Irecv/Isend pair per neighbor run → one ``jax.lax.ppermute`` per run,
  moving the skin slice straight out of brick storage (pack-free: the
  slice is contiguous by construction of the skin ordering).
- SHIFT multi-stage exchange (ref: MultiStageExchangeView,
  brick-mpi.h:587-681): one ppermute pair per mesh axis, with corners
  forwarded through previously received ghosts — the natural form on a
  TPU torus (26 logical neighbors, 6 messages).
- Array exchange twin (ref: exchangeArr, array-mpi.h:130-212): the same
  dimension sweep on a plain dense array with ghost shells, used to
  cross-check brick results.

All functions run *inside* ``shard_map`` over a Mesh whose axis names map
one-to-one onto domain axes (size-1 axes = undistributed; periodic wrap
makes a 1-device axis exchange with itself, which is exactly the
reference's np=1 torus trick).
"""

from __future__ import annotations

import numpy as np

import jax
from jax import lax

from ..utils.bitset import BitSet
from .decomp import BrickDecomp


def _shift_perm(size: int, shift: int) -> list[tuple[int, int]]:
    """perm pairs (src, dst) so each dst receives from dst+shift
    (periodic)."""
    return [((r + shift) % size, r) for r in range(size)]


def _delta(neighbor: BitSet, ndim: int) -> tuple[int, ...]:
    """Mesh-coordinate offset of the device a ghost region copies from."""
    d = [0] * ndim
    for t in neighbor:
        d[ndim - abs(t)] = 1 if t > 0 else -1
    return tuple(d)


def neighbor_perm(neighbor: BitSet, mesh_shape: tuple[int, ...]):
    """Linearized (src, dst) pairs for a diagonal neighbor direction —
    the SPMD analog of the reference's ``populate()`` rank map
    (brick-mpi.h:730-753)."""
    nd = len(mesh_shape)
    delta = _delta(neighbor, nd)
    pairs = []
    for c in np.ndindex(*mesh_shape):
        src = tuple((c[a] + delta[a]) % mesh_shape[a] for a in range(nd))
        lin = lambda x: int(np.ravel_multi_index(x, mesh_shape))
        pairs.append((lin(src), lin(c)))
    return pairs


def _flat_names(axis_names):
    """Flatten per-domain-axis ppermute names (entries may be COMPOSITE
    tuples — the multi-slice mesh's ``(slice, ici)`` axis pair,
    :func:`..mesh.make_multislice_mesh`) into one mesh-axis-name tuple
    for whole-mesh collectives."""
    out = []
    for n in axis_names:
        if isinstance(n, tuple):
            out.extend(n)
        else:
            out.append(n)
    return tuple(out)


def _rows(runs) -> np.ndarray:
    """Concatenate (pos, len) runs into one row-index array (static)."""
    return np.concatenate([np.arange(r.pos, r.pos + r.len)
                           for r in runs]).astype(np.int32)


def _merge_intervals(pairs):
    """Merge (dst section, src section) pairs into maximal contiguous
    interval pairs [(d0, d1, s0, s1), ...] — static slices are ~2x
    cheaper than row gathers/scatters on TPU and update in place under
    donation."""
    ivs = sorted(((d.pos, d.pos + d.len, s.pos, s.pos + s.len)
                  for d, s in pairs))
    out = []
    for d0, d1, s0, s1 in ivs:
        if out and out[-1][1] == d0 and out[-1][3] == s0:
            prev = out[-1]
            out[-1] = (prev[0], d1, prev[2], s1)
        else:
            out.append((d0, d1, s0, s1))
    return out


def exchange_put(dat, decomp: BrickDecomp, axis_names: tuple[str, ...],
                 mesh_shape: tuple[int, ...],
                 interpret: bool | None = None,
                 table_axes: tuple[int, ...] = ()):
    """PUT exchange: one ppermute per (ghost run, skin run) pair —
    skin and ghost runs are contiguous by construction of the skin
    ordering, so every message is a static storage slice (pack-free).
    Runs whose neighbors are all on this device are periodic
    self-copies, fused into one in-place Pallas DMA kernel.  Runs with
    a component on a ``table_axes`` axis are skipped entirely — the
    kernel reads those directions through a ``periodic_grid`` table
    redirection, so moving their ghost bricks is pure waste.

    ``dat``: per-device ``[nbricks, step]`` brick storage (all interleaved
    fields move together, like the reference exchanging whole chunks).
    """
    import jax

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    table = set(table_axes)
    local_ivs = []
    for gr, sr in zip(decomp.ghost, decomp.skin):
        if table and ({decomp._tag_axis(t) for t in gr.neighbor} & table):
            continue
        delta = _delta(gr.neighbor, len(mesh_shape))
        if any(d and mesh_shape[a] > 1 for a, d in enumerate(delta)):
            val = dat[sr.pos:sr.pos + sr.len]
            perm = neighbor_perm(gr.neighbor, mesh_shape)
            val = lax.ppermute(val, _flat_names(axis_names), perm)
            dat = dat.at[gr.pos:gr.pos + gr.len].set(val)
        else:
            local_ivs.append((gr.pos, gr.pos + gr.len,
                              sr.pos, sr.pos + sr.len))
    if local_ivs:
        dat = _local_copy_kernel(dat, [local_ivs], interpret)
    return dat


def _local_copy_kernel(dat, stage_ivs, interpret: bool):
    """In-place ghost copies as one Pallas kernel: async DMAs within a
    stage, a barrier between stages (corner forwarding order).  XLA-level
    slice updates on the same buffer force defensive whole-array copies;
    ``input_output_aliases`` makes these true in-place moves (the TPU
    analog of the reference's zero-copy mmap links,
    strong/main.cpp:204-213)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(dat_ref, out_ref, sem):
        for ivs in stage_ivs:
            cps = []
            for d0, d1, s0, s1 in ivs:
                cp = pltpu.make_async_copy(out_ref.at[s0:s1],
                                           out_ref.at[d0:d1], sem)
                cp.start()
                cps.append(cp)
            for cp in cps:
                cp.wait()

    # brick rows must live on an untiled axis for arbitrary-interval DMA.
    # Storage in kernel-native [n, ..., SUB, LANE] shape already has n
    # untiled (only the last two dims carry the (8,128) tiling) — pass it
    # through UNRESHAPED: a reshape around the pallas call changes the
    # physical tiling and materializes two full-array copies
    # (~10x the ghost traffic at 512^3).
    shape = dat.shape
    n, step = shape[0], int(np.prod(shape[1:]))
    if step % 128:
        # sub-lane-tile chunks can't be DMA'd row-wise; fall back to XLA
        # slice copies (small storages only — every canonical step is a
        # 128 multiple)
        for ivs in stage_ivs:
            for d0, d1, s0, s1 in ivs:
                dat = dat.at[d0:d1].set(dat[s0:s1])
        return dat
    if len(shape) >= 3 and shape[-1] % 128 == 0 and shape[-2] % 8 == 0:
        v = dat                       # already DMA-able per brick row
    else:
        v = dat.reshape(n, step // 128, 128)   # flat [n, step] storage
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(v)
    return out.reshape(shape)


def exchange_shift(dat, decomp: BrickDecomp, axis_names: tuple[str, ...],
                   mesh_shape: tuple[int, ...],
                   axis_order: "list[int] | None" = None,
                   interpret: bool | None = None,
                   table_axes: tuple[int, ...] = ()):
    """Multi-stage SHIFT exchange: 2 ppermutes per mesh axis, corners
    forwarded (ref: MultiStageExchangeView semantics).  One message per
    axis-direction; sections merged into contiguous slice runs.  Stages
    whose mesh axis has one device are periodic self-copies, fused into
    a single in-place Pallas DMA kernel — or skipped entirely for axes
    in ``table_axes``, where the kernel reads through a
    ``decomp.periodic_grid`` table instead (zero-copy periodicity).

    ``axis_names`` entries may be COMPOSITE tuples (the multi-slice
    2-level mesh: axis 0 = ``("slice", "z")`` with ``mesh_shape[0]``
    the slices x ici PRODUCT, :func:`..mesh.make_multislice_mesh`):
    the shift then runs over the flattened slice-major device line,
    and the one pair per shift that crosses a slice boundary lowers to
    a DCN collective-permute while every other pair stays on ICI."""
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    order, stages = decomp.stage_sections(axis_order)
    table_axes = set(table_axes)

    pending_local: list[list[tuple[int, int, int, int]]] = []

    def flush_local(d):
        nonlocal pending_local
        if pending_local:
            d = _local_copy_kernel(d, pending_local, interpret)
            pending_local = []
        return d

    def owner_axes(sec):
        return {decomp._tag_axis(t) for t in sec.owner}

    for s, ax in enumerate(order):
        if ax in table_axes:
            continue
        local_ivs = []
        for sign in (+1, -1):
            pairs = [(d, sr) for d, sr in stages[s][sign]
                     if not (owner_axes(d) & table_axes)]
            if not pairs:
                continue
            ivs = _merge_intervals(pairs)
            if mesh_shape[ax] > 1:
                dat = flush_local(dat)
                send = jnp.concatenate(
                    [dat[s0:s1] for _d0, _d1, s0, s1 in ivs]) \
                    if len(ivs) > 1 else dat[ivs[0][2]:ivs[0][3]]
                perm = _shift_perm(mesh_shape[ax], sign)
                recv = lax.ppermute(send, axis_names[ax], perm)
                off = 0
                for d0, d1, _s0, _s1 in ivs:
                    dat = dat.at[d0:d1].set(recv[off:off + d1 - d0])
                    off += d1 - d0
            else:
                local_ivs.extend(ivs)
        if local_ivs:
            pending_local.append(local_ivs)
    return flush_local(dat)


def exchange_shift_remote(dat, decomp: BrickDecomp,
                          axis_names: tuple[str, ...],
                          mesh_shape: tuple[int, ...],
                          axis_order: "list[int] | None" = None,
                          interpret: bool | None = None,
                          table_axes: tuple[int, ...] = (),
                          collective_id: int = 1):
    """Multi-stage SHIFT exchange as ONE Pallas kernel: every message is
    a ``pltpu.make_async_remote_copy`` straight from skin storage into
    the neighbor's ghost storage over ICI — the kernel-level form of the
    reference's pack-free one-message-per-neighbor exchange
    (brick-mpi.h:466-495, 587-681), with no XLA-level gather/concat
    staging at all.  Same semantics as :func:`exchange_shift` (stage per
    mesh axis, corners forwarded, ``table_axes`` skipped, 1-device axes
    as local in-place DMAs); the storage is updated in place via
    ``input_output_aliases``.

    Stages are ordered inside the kernel: all copies of stage ``s``
    (remote + local) complete before stage ``s+1`` issues its sends,
    which is exactly the corner-forwarding dependence.  Within a stage
    the ±axis messages are concurrent — their source rows (own skin or
    earlier-stage ghosts) and destination rows (this stage's ghosts) are
    disjoint by construction of the section table.

    On hardware the kernel opens with the collective barrier
    (``get_barrier_semaphore``): each device signals its two neighbors
    per distributed axis and waits for the matching count, guaranteeing
    every peer has entered the kernel before any remote write lands
    (cf. the Pallas distributed guide).  Interpret mode cannot lower the
    barrier primitives and does not need them.

    Logical device ids are computed at trace time from
    ``lax.axis_index`` and passed through SMEM, so the kernel itself is
    mesh-agnostic (and self-targeting copies smoke-test on one chip).

    ``axis_names`` may be the per-domain-axis names (one per
    ``mesh_shape`` entry) or a SINGLE flattened device axis whose ravel
    order matches ``mesh_shape`` — device placement is identical either
    way, and interpret mode (which emulates remote DMA with an
    ``all_gather`` over one named axis) requires the flat form.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    order, stages = decomp.stage_sections(axis_order)
    table_axes = set(table_axes)

    def owner_axes(sec):
        return {decomp._tag_axis(t) for t in sec.owner}

    # --- static per-stage plan -----------------------------------------
    # plan[s] = (ax, {sign: ivs}) with ivs merged contiguous intervals;
    # remote if mesh_shape[ax] > 1, else local self-copies.
    plan = []
    n_remote = 0
    for s, ax in enumerate(order):
        if ax in table_axes:
            continue
        by_sign = {}
        for sign in (+1, -1):
            pairs = [(d, sr) for d, sr in stages[s][sign]
                     if not (owner_axes(d) & table_axes)]
            if pairs:
                by_sign[sign] = _merge_intervals(pairs)
        if by_sign:
            plan.append((ax, by_sign))
            if mesh_shape[ax] > 1:
                n_remote += len(by_sign)
    if n_remote == 0:
        # nothing crosses a device boundary: the existing in-place local
        # DMA kernel is the whole exchange (names are never consulted —
        # every exchanging axis is a 1-device self-copy)
        names = (axis_names if len(axis_names) == len(mesh_shape)
                 else (axis_names[0],) * len(mesh_shape))
        return exchange_shift(dat, decomp, names, mesh_shape,
                              axis_order, interpret, tuple(table_axes))
    if interpret and len(axis_names) > 1:
        # interpret mode emulates remote DMA with an all_gather over ONE
        # named axis; per-domain-axis names produce an obscure Pallas
        # lowering failure instead of working
        raise ValueError(
            "interpret-mode remote exchange needs a single flat device "
            "axis (LOGICAL ids over its ravel order) — build the mesh "
            "with comm.mesh.make_flat_mesh and pass its one axis name")

    # --- logical ids of the devices each (stage, sign) SENDS to --------
    # computed at trace time inside shard_map (mesh_self_coords)
    lin, coords, strides = mesh_self_coords(mesh_shape, axis_names)
    send_ids = []
    id_of = {}
    for ax, by_sign in plan:
        if mesh_shape[ax] <= 1:
            continue
        for sign in by_sign:
            id_of[(ax, sign)] = len(send_ids)
            send_ids.append(shift_send_id(lin, coords, strides,
                                          mesh_shape, ax, sign))
    ids = jnp.stack([i.astype(jnp.int32) for i in send_ids])

    def kernel(ids_ref, dat_ref, out_ref, ssem, rsem, lsem):
        if not interpret:
            # hardware: peers must be in-kernel before remote writes
            bsem = pltpu.get_barrier_semaphore()
            for j in range(n_remote):
                pltpu.semaphore_signal(
                    bsem, 1, device_id=ids_ref[j],
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(bsem, n_remote)
        for ax, by_sign in plan:
            cps = []
            for sign, ivs in by_sign.items():
                if mesh_shape[ax] > 1:
                    j = id_of[(ax, sign)]
                    for d0, d1, s0, s1 in ivs:
                        cp = pltpu.make_async_remote_copy(
                            out_ref.at[s0:s1], out_ref.at[d0:d1],
                            ssem.at[j], rsem.at[j],
                            device_id=ids_ref[j],
                            device_id_type=pltpu.DeviceIdType.LOGICAL)
                        cp.start()
                        cps.append(cp)
                else:
                    for d0, d1, s0, s1 in ivs:
                        cp = pltpu.make_async_copy(
                            out_ref.at[s0:s1], out_ref.at[d0:d1], lsem)
                        cp.start()
                        cps.append(cp)
            for cp in cps:           # stage barrier: forwarding order
                cp.wait()

    shape = dat.shape
    n, step = shape[0], int(np.prod(shape[1:]))
    if len(shape) >= 3 and shape[-1] % 128 == 0 and shape[-2] % 8 == 0:
        v = dat
    elif step % 128 == 0:
        v = dat.reshape(n, step // 128, 128)
    else:
        raise ValueError("remote exchange needs lane-tile-divisible "
                         "brick storage (step % 128 == 0)")
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_remote,)),
                        pltpu.SemaphoreType.DMA((n_remote,)),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
        interpret=interpret,
    )(ids, v)
    return out.reshape(shape)


def mesh_self_coords(mesh_shape: tuple[int, ...],
                     axis_names: tuple[str, ...]):
    """Trace-time ``(lin, coords, strides)`` of the calling device over
    the mesh's row-major ravel order (call inside ``shard_map``).
    ``axis_names`` is either one flat axis (LOGICAL linear ids) or one
    name per mesh axis.  Shared by every remote-DMA exchange — the
    ravel-order convention must stay identical across them."""
    nd = len(mesh_shape)
    strides = np.ones(nd, dtype=np.int64)
    for a in range(nd - 2, -1, -1):
        strides[a] = strides[a + 1] * mesh_shape[a + 1]
    if len(axis_names) == 1 and nd > 1:
        lin = lax.axis_index(axis_names[0])
        coords = [lax.rem(lin // int(strides[a]), mesh_shape[a])
                  for a in range(nd)]
    else:
        coords = [lax.axis_index(axis_names[a]) for a in range(nd)]
        lin = sum(coords[a] * int(strides[a]) for a in range(nd))
    return lin, coords, strides


def shift_send_id(lin, coords, strides, mesh_shape, ax: int, sign: int):
    """Logical id of the device a ``sign``-shift along mesh axis ``ax``
    SENDS to (receiver r takes from r+sign, so sender q targets q-sign;
    cf. ``_shift_perm``), periodic."""
    tgt = lax.rem(coords[ax] - sign + mesh_shape[ax], mesh_shape[ax])
    return lin + (tgt - coords[ax]) * int(strides[ax])


class PutPlan(list):
    """:func:`put_plan`'s entry list, carrying the decomp's ghost-brick
    ring counts (``ghost_rings``) so the fused sweep can derive its
    recv-gate geometry instead of trusting a caller-supplied value."""

    ghost_rings: tuple[int, ...] = (1, 1)


def put_plan(decomp: BrickDecomp, mesh_shape: tuple[int, ...],
             table_axes: tuple[int, ...] = ()):
    """Static PUT-exchange plan for the kernel-fused sweep: one entry
    per (ghost run, skin run) pair whose direction lies entirely on
    exchanged (non-table) axes — table-axis directions are never read
    (the grid table redirects them, ``BrickDecomp.periodic_grid``).

    Returns ``[(delta, d0, d1, s0, s1, remote, group)]`` where ``delta``
    is the mesh-coordinate offset of the device the ghost copies FROM
    (ref: populate(), brick-mpi.h:730-753), rows are storage intervals,
    ``remote`` marks directions crossing a device boundary, and
    ``group`` tags the first-reader gate the fused sweep waits on:
    ``"klo"``/``"khi"`` pure-k faces, ``"j"`` j faces and all corners.
    Ghost depth per exchanged axis is free (the reference's GZ,
    brick-mpi.h:304-316): each direction's runs span every ghost-brick
    ring, and the fused sweep derives its gate rows from the ring count
    (``ghost_rings``).
    """
    nd = decomp.ndim
    table = set(table_axes)
    plan = []
    for gr, sr in zip(decomp.ghost, decomp.skin):
        axes = {decomp._tag_axis(t) for t in gr.neighbor}
        if axes & table:
            continue
        delta = _delta(gr.neighbor, nd)
        remote = any(d and mesh_shape[a] > 1 for a, d in enumerate(delta))
        if axes == {0}:
            # ghost at the low-k face (owner -k) holds rows of the -k
            # neighbor; tag by which grid edge the bricks sit on
            group = "klo" if -(nd - 0) in gr.neighbor else "khi"
        else:
            group = "j"
        plan.append((delta, gr.pos, gr.pos + gr.len,
                     sr.pos, sr.pos + sr.len, remote, group))
    plan = PutPlan(plan)
    plan.ghost_rings = tuple(max(g, 1) for g in decomp.gz[:2])
    return plan


def put_send_ids(plan, mesh_shape: tuple[int, ...], axis_name: str):
    """Traced i32 vector of send-target logical device ids for the
    remote entries of a :func:`put_plan`, in plan order (the ghost at
    offset ``delta`` copies FROM me, so I SEND to ``me - delta``).
    Call inside ``shard_map`` over the flat device axis; returns None
    when the plan has no remote entries."""
    import jax.numpy as jnp

    remote = [e for e in plan if e[5]]
    if not remote:
        return None
    nd = len(mesh_shape)
    lin, coords, strides = mesh_self_coords(mesh_shape, (axis_name,))
    ids = []
    for delta, *_ in remote:
        tgt = lin
        for a in range(nd):
            if delta[a]:
                ta = lax.rem(coords[a] - delta[a] + mesh_shape[a],
                             mesh_shape[a])
                tgt = tgt + (ta - coords[a]) * int(strides[a])
        ids.append(tgt)
    return jnp.stack([i.astype(jnp.int32) for i in ids])


def exchange_array(arr, ghost: tuple[int, ...],
                   axis_names: tuple[str, ...],
                   mesh_shape: tuple[int, ...],
                   axis_order: "list[int] | None" = None):
    """Dense-array ghost exchange twin (ref: exchangeArr,
    array-mpi.h:130-212): per-axis slab swap including previously filled
    corners.  ``arr`` is the per-device array with ``ghost[a]`` shells."""
    nd = arr.ndim
    if axis_order is None:
        axis_order = list(range(nd - 1, -1, -1))
    for ax in axis_order:
        g = ghost[ax]
        if g == 0:
            continue
        S = arr.shape[ax]
        hi_own = lax.slice_in_dim(arr, S - 2 * g, S - g, axis=ax)
        lo_own = lax.slice_in_dim(arr, g, 2 * g, axis=ax)
        if mesh_shape[ax] > 1:
            # my low ghost <- -a neighbor's high owned slab
            lo_ghost = lax.ppermute(hi_own, axis_names[ax],
                                    _shift_perm(mesh_shape[ax], -1))
            hi_ghost = lax.ppermute(lo_own, axis_names[ax],
                                    _shift_perm(mesh_shape[ax], +1))
        else:
            lo_ghost, hi_ghost = hi_own, lo_own
        arr = lax.dynamic_update_slice_in_dim(arr, lo_ghost, 0, axis=ax)
        arr = lax.dynamic_update_slice_in_dim(arr, hi_ghost, S - g, axis=ax)
    return arr
