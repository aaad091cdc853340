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


def exchange_strong_shift(batch, plan: StrongDecomp,
                          axis_names: tuple[str, ...],
                          axis_order: "list[int] | None" = None):
    """SHIFT exchange over the two-level decomposition.

    ``batch``: per-device ``[nsub_local, nbricks, step]``.
    """
    import jax.numpy as jnp

    sdec = plan.sdec
    order, stages = sdec.stage_sections(axis_order)
    mesh_shape = plan.mesh_shape
    for s, ax in enumerate(order):
        for sign in (+1, -1):
            pairs = stages[s][sign]
            if not pairs:
                continue
            rows, remote, send_rows, recv_rows = plan.neighbor_rows(
                ax, sign)
            src_idx = np.concatenate(
                [np.arange(src.pos, src.pos + src.len)
                 for _d, src in pairs]).astype(np.int32)
            dst_idx = np.concatenate(
                [np.arange(dst.pos, dst.pos + dst.len)
                 for dst, _s in pairs]).astype(np.int32)

            nface = len(send_rows)
            if nface:
                recv = batch[send_rows][:, src_idx]
                if mesh_shape[ax] > 1:
                    perm = [((r + sign) % mesh_shape[ax], r)
                            for r in range(mesh_shape[ax])]
                    recv = lax.ppermute(recv, axis_names[ax], perm)
                # virtual rows: received sections scattered into zero
                # rows so local and remote neighbors index uniformly
                nb, step = batch.shape[1], batch.shape[2]
                virt = jnp.zeros((nface, nb, step), batch.dtype)
                virt = virt.at[:, src_idx].set(recv)
                ext = jnp.concatenate([batch, virt], axis=0)
                rows_ext = rows.copy()
                rows_ext[recv_rows] = plan.nsub_local + np.arange(nface)
            else:
                ext = batch
                rows_ext = rows

            src_rows = ext[jnp.asarray(rows_ext)]
            batch = batch.at[:, dst_idx].set(src_rows[:, src_idx])
    return batch
