"""Two-level strong-scaling decomposition.

The reference splits the global domain into fixed-size subdomains indexed
by Z-Morton order, block-distributes them to ranks, keeps ONE BrickDecomp
for the (identical) subdomain shape, zero-copy-links same-rank neighbor
ghosts onto the source's skin, and coalesces cross-rank ghosts into one
message per peer (ref: strong/args.cpp:36-113, strong/main.cpp:37-50,
191-320).

TPU mapping: subdomains become a batched leading axis of one device's
brick storage (``[nsub_local, nbricks, step]``); devices hold 3-D blocks
of the subdomain grid (for power-of-two grids the Morton-range block
distribution of the reference IS the octant/box distribution); within a
device, subdomains sit in Morton order (ZMORT's locality role survives).
The exchange reuses the single-level SHIFT stage plan per subdomain:
- intra-device neighbor links = batch-row gathers in HBM (the analog of
  the reference's mmap remap, strong/main.cpp:204-213);
- cross-device links = one ppermute per mesh axis per sign carrying the
  face subdomains' stage sections (the analog of the per-peer coalesced
  views, strong/main.cpp:288-320), with corner forwarding across stages.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from jax import lax

from ..utils.zmort import zmort_ids
from .decomp import BrickDecomp


@dataclass
class StrongDecomp:
    """Plan: global domain -> device blocks of Morton-ordered subdomains.

    ``dom``: global domain in elements; ``sdom``: subdomain size;
    ``mesh_shape``: devices per axis; ``bdims``/``ghost_depth`` as in
    BrickDecomp (per subdomain).
    """

    dom: tuple[int, ...]
    sdom: tuple[int, ...]
    mesh_shape: tuple[int, ...]
    bdims: tuple[int, ...]
    ghost_depth: tuple[int, ...]

    sdec: BrickDecomp | None = None
    local_block: tuple[int, ...] = ()
    sub_order: np.ndarray | None = None   # [nsub_local, ndim] block coords
    coord_to_row: np.ndarray | None = None

    def initialize(self, skinlist) -> "StrongDecomp":
        nd = len(self.dom)
        self.dom = tuple(int(x) for x in self.dom)
        self.sdom = tuple(int(x) for x in self.sdom)
        self.mesh_shape = tuple(int(x) for x in self.mesh_shape)
        sub_grid = []
        for a in range(nd):
            if self.dom[a] % self.sdom[a]:
                raise ValueError("dom must be a multiple of sdom")
            sub_grid.append(self.dom[a] // self.sdom[a])
        self.sub_grid = tuple(sub_grid)
        lb = []
        for a in range(nd):
            if self.sub_grid[a] % self.mesh_shape[a]:
                raise ValueError("subdomain grid must split over the mesh")
            lb.append(self.sub_grid[a] // self.mesh_shape[a])
        self.local_block = tuple(lb)

        self.sdec = BrickDecomp(dims=self.sdom,
                                ghost_depth=self.ghost_depth,
                                bdims=self.bdims).initialize(skinlist)

        # Morton order of the local block coords (ZMORT within a device,
        # ref: strong/args.cpp ZMORT subdomain indexing)
        ids = zmort_ids(self.local_block)
        coords = np.argsort(ids.ravel(), kind="stable")
        all_coords = np.array(list(np.ndindex(*self.local_block)),
                              dtype=np.int64)
        self.sub_order = all_coords[coords]
        c2r = np.zeros(self.local_block, dtype=np.int64)
        for row, c in enumerate(self.sub_order):
            c2r[tuple(c)] = row
        self.coord_to_row = c2r
        return self

    @property
    def nsub_local(self) -> int:
        return int(np.prod(self.local_block))

    # -- plan tables ------------------------------------------------------
    def neighbor_rows(self, axis: int, sign: int):
        """For every local sub row: the batch row of its ±1 neighbor along
        ``axis``, and whether that neighbor is off-device (face sub).

        Returns (rows i64[nsub], is_remote bool[nsub], face_rows i64[nface],
        recv_order i64[nface]): ``face_rows`` are the rows THIS device
        sends (its subs on the opposite face, which are the neighbor
        device's virtual neighbors), in the same order that remote
        neighbors are consumed (``recv_order`` = local rows whose
        neighbor is remote).
        """
        L = self.local_block
        nd = len(L)
        rows = np.zeros(self.nsub_local, dtype=np.int64)
        remote = np.zeros(self.nsub_local, dtype=bool)
        recv_order = []
        for row, c in enumerate(self.sub_order):
            nc = list(c)
            nc[axis] += sign
            if 0 <= nc[axis] < L[axis]:
                rows[row] = self.coord_to_row[tuple(nc)]
            else:
                remote[row] = True
                recv_order.append(row)
        # the rows this device sends: its face at the opposite side, in
        # the order the RECEIVER iterates its remote-neighbor subs.
        # Receiver's remote subs have coord[axis] = L-1 (sign +1) and its
        # virtual neighbor is the sender's coord[axis] = 0 sub with the
        # same off-axis coords.
        send_rows = []
        for row in recv_order:
            c = list(self.sub_order[row])
            c[axis] = 0 if sign > 0 else L[axis] - 1
            send_rows.append(self.coord_to_row[tuple(c)])
        return (rows, remote, np.array(send_rows, dtype=np.int64),
                np.array(recv_order, dtype=np.int64))


def _stage_copy(flat, local_ivs, recv, recv_ivs, interpret):
    """One exchange stage as in-place DMAs on the flattened brick rows.

    ``local_ivs``: row intervals copied within the buffer (the TPU form
    of the reference's same-rank mmap links, strong/main.cpp:204-213);
    ``recv``/``recv_ivs``: the ppermuted face sections scattered into
    ghost intervals.  Writes (ghost) and reads (skin/recv) are disjoint
    within a stage, so all copies run concurrently.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not local_ivs and not recv_ivs:
        return flat
    shape = flat.shape
    dma_ok = (interpret or (len(shape) >= 3 and shape[-1] % 128 == 0
                            and shape[-2] % 8 == 0))
    if not dma_ok:
        # non-canonical folds: XLA slice updates (tests / small shapes)
        for d0, d1, s0, s1 in local_ivs:
            flat = flat.at[d0:d1].set(flat[s0:s1])
        for d0, d1, r0, r1 in recv_ivs:
            flat = flat.at[d0:d1].set(recv[r0:r1])
        return flat

    have_recv = recv is not None and len(recv_ivs) > 0

    def kernel(*refs):
        if have_recv:
            _dat_ref, recv_ref, out_ref, sem = refs
        else:
            _dat_ref, out_ref, sem = refs
        cps = []
        for d0, d1, s0, s1 in local_ivs:
            cp = pltpu.make_async_copy(out_ref.at[s0:s1],
                                       out_ref.at[d0:d1], sem)
            cp.start()
            cps.append(cp)
        if have_recv:
            for d0, d1, r0, r1 in recv_ivs:
                cp = pltpu.make_async_copy(recv_ref.at[r0:r1],
                                           out_ref.at[d0:d1], sem)
                cp.start()
                cps.append(cp)
        for cp in cps:
            cp.wait()

    ins = [flat] + ([recv] if have_recv else [])
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(ins),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(shape, flat.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*ins)


def exchange_strong_remote(batch, plan: StrongDecomp,
                           axis_names: tuple[str, ...],
                           axis_order: "list[int] | None" = None,
                           interpret: bool | None = None,
                           collective_id: int = 4):
    """Strong-scaling SHIFT exchange as ONE Pallas kernel: cross-device
    links are ``pltpu.make_async_remote_copy``s straight from the face
    subdomains' skin rows into the neighbor device's ghost rows over
    ICI — no XLA gather/ppermute/scatter staging at all (the kernel-
    level form of the reference's per-peer coalesced zero-copy views,
    strong/main.cpp:288-320).  Intra-device links and periodic 1-device
    directions stay in-kernel local DMAs; stages are ordered (all
    copies of stage s complete before stage s+1 issues) for corner
    forwarding, and the buffer updates in place via
    ``input_output_aliases``.

    Must run inside ``shard_map`` over ONE flat device axis whose ravel
    order matches ``plan.mesh_shape`` (``axis_names`` may also be the
    per-domain-axis names on hardware); every device holds the same
    ``local_block``, so the row tables are device-symmetric and the
    whole plan is static.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .exchange import _merge_intervals

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sdec = plan.sdec
    order, stages = sdec.stage_sections(axis_order)
    mesh_shape = plan.mesh_shape
    nsub = plan.nsub_local
    nb = sdec.nbricks

    # --- static per-stage plan -----------------------------------------
    # kstages[i] = (ax, [(sign, local_ivs, remote_prs)]) with intervals
    # over the flattened [nsub*nb] row axis; remote_prs = (s0,s1,d0,d1)
    # source rows HERE, destination rows on the (ax, -sign... the
    # receiver one mesh step along +sign) peer.
    kstages = []
    n_remote = 0
    for s, ax in enumerate(order):
        per_sign = []
        for sign in (+1, -1):
            pairs = stages[s][sign]
            if not pairs:
                continue
            ivs = _merge_intervals(pairs)
            rows, remote, send_rows, recv_rows = plan.neighbor_rows(
                ax, sign)
            local_ivs = []
            for r in range(nsub):
                if remote[r]:
                    continue
                nr = int(rows[r])
                for d0, d1, s0, s1 in ivs:
                    local_ivs.append((r * nb + d0, r * nb + d1,
                                      nr * nb + s0, nr * nb + s1))
            remote_prs = []
            for sr, rr in zip(send_rows, recv_rows):
                for d0, d1, s0, s1 in ivs:
                    pr = (int(sr) * nb + s0, int(sr) * nb + s1,
                          int(rr) * nb + d0, int(rr) * nb + d1)
                    if mesh_shape[ax] > 1:
                        remote_prs.append(pr)
                    else:
                        # periodic self-link: my own opposite face
                        local_ivs.append((pr[2], pr[3], pr[0], pr[1]))
            if local_ivs or remote_prs:
                per_sign.append((sign, local_ivs, remote_prs))
                if remote_prs:
                    n_remote += 1
        if per_sign:
            kstages.append((ax, per_sign))
    if n_remote == 0:
        return exchange_strong_shift(batch, plan, axis_names, axis_order,
                                     interpret)
    if interpret and len(axis_names) > 1:
        raise ValueError(
            "interpret-mode remote strong exchange needs a single flat "
            "device axis (make_flat_mesh) — see exchange_shift_remote")

    # --- send-target logical ids per remote (ax, sign) -----------------
    # shared ravel-order derivation (exchange.mesh_self_coords)
    from .exchange import mesh_self_coords, shift_send_id

    lin, coords, strides = mesh_self_coords(mesh_shape, axis_names)
    send_ids = []
    id_of = {}
    for ax, per_sign in kstages:
        for sign, _l, rp in per_sign:
            if not rp:
                continue
            id_of[(ax, sign)] = len(send_ids)
            send_ids.append(shift_send_id(lin, coords, strides,
                                          mesh_shape, ax, sign))
    ids = jnp.stack([i.astype(jnp.int32) for i in send_ids])

    def kernel(ids_ref, dat_ref, out_ref, ssem, rsem, lsem):
        if not interpret:
            bsem = pltpu.get_barrier_semaphore()
            for j in range(n_remote):
                pltpu.semaphore_signal(
                    bsem, 1, device_id=ids_ref[j],
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(bsem, n_remote)
        for ax, per_sign in kstages:
            cps = []
            for sign, local_ivs, remote_prs in per_sign:
                for d0, d1, s0, s1 in local_ivs:
                    cp = pltpu.make_async_copy(
                        out_ref.at[s0:s1], out_ref.at[d0:d1], lsem)
                    cp.start()
                    cps.append(cp)
                if remote_prs:
                    j = id_of[(ax, sign)]
                    for s0, s1, d0, d1 in remote_prs:
                        cp = pltpu.make_async_remote_copy(
                            out_ref.at[s0:s1], out_ref.at[d0:d1],
                            ssem.at[j], rsem.at[j],
                            device_id=ids_ref[j],
                            device_id_type=pltpu.DeviceIdType.LOGICAL)
                        cp.start()
                        cps.append(cp)
            for cp in cps:           # stage barrier: forwarding order
                cp.wait()

    shape0 = batch.shape
    flat = batch.reshape((nsub * nb,) + shape0[2:])
    shp = flat.shape
    if not (len(shp) >= 3 and shp[-1] % 128 == 0 and shp[-2] % 8 == 0):
        step = int(np.prod(shp[1:]))
        if step % 128:
            raise ValueError("remote strong exchange needs lane-tile-"
                             "divisible brick storage")
        flat = flat.reshape(shp[0], step // 128, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_remote,)),
                        pltpu.SemaphoreType.DMA((n_remote,)),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
        interpret=interpret,
    )(ids, flat)
    return out.reshape(shape0)


def exchange_strong_shift(batch, plan: StrongDecomp,
                          axis_names: tuple[str, ...],
                          axis_order: "list[int] | None" = None,
                          interpret: bool | None = None):
    """SHIFT exchange over the two-level decomposition.

    ``batch``: per-device ``[nsub_local, nbricks, ...]``.  Intra-device
    neighbor links move as in-place row DMAs (no full-batch
    gather/scatter); cross-device links gather ONLY the face subdomains'
    stage sections, ppermute them, and DMA-scatter into ghost rows —
    the analog of the reference's per-peer coalesced views
    (strong/main.cpp:288-320), with corner forwarding across stages.
    """
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sdec = plan.sdec
    order, stages = sdec.stage_sections(axis_order)
    mesh_shape = plan.mesh_shape
    nsub = plan.nsub_local
    nb = sdec.nbricks
    shape0 = batch.shape
    flat = batch.reshape((nsub * nb,) + shape0[2:])
    for s, ax in enumerate(order):
        for sign in (+1, -1):
            pairs = stages[s][sign]
            if not pairs:
                continue
            from .exchange import _merge_intervals
            ivs = _merge_intervals(pairs)
            rows, remote, send_rows, recv_rows = plan.neighbor_rows(
                ax, sign)

            local_ivs = []
            for r in range(nsub):
                if remote[r]:
                    continue
                nr = int(rows[r])
                for d0, d1, s0, s1 in ivs:
                    local_ivs.append((r * nb + d0, r * nb + d1,
                                      nr * nb + s0, nr * nb + s1))

            recv_buf = None
            recv_ivs = []
            nface = len(send_rows)
            if nface:
                src_idx = np.concatenate(
                    [np.arange(s0, s1) for _d0, _d1, s0, s1 in ivs]
                ).astype(np.int32)
                gather = (send_rows[:, None] * nb
                          + src_idx[None, :]).ravel()
                send = flat[jnp.asarray(gather)]
                if mesh_shape[ax] > 1:
                    perm = [((r + sign) % mesh_shape[ax], r)
                            for r in range(mesh_shape[ax])]
                    send = lax.ppermute(send, axis_names[ax], perm)
                recv_buf = send
                nsec = len(src_idx)
                for f, r in enumerate(recv_rows):
                    pos = 0
                    for d0, d1, _s0, _s1 in ivs:
                        ln = d1 - d0
                        recv_ivs.append((r * nb + d0, r * nb + d1,
                                         f * nsec + pos,
                                         f * nsec + pos + ln))
                        pos += ln

            flat = _stage_copy(flat, local_ivs, recv_buf, recv_ivs,
                               interpret)
    return flat.reshape(shape0)
