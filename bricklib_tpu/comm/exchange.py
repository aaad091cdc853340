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


def _rows(runs) -> np.ndarray:
    """Concatenate (pos, len) runs into one row-index array (static)."""
    return np.concatenate([np.arange(r.pos, r.pos + r.len)
                           for r in runs]).astype(np.int32)


def exchange_put(dat, decomp: BrickDecomp, axis_names: tuple[str, ...],
                 mesh_shape: tuple[int, ...]):
    """PUT exchange: one ppermute per (ghost run, skin run) pair, then a
    single batched scatter of all received ghosts (a chain of per-run
    array updates would copy the full storage once per run).

    ``dat``: per-device ``[nbricks, step]`` brick storage (all interleaved
    fields move together, like the reference exchanging whole chunks).
    """
    import jax.numpy as jnp

    recvs = []
    for gr, sr in zip(decomp.ghost, decomp.skin):
        perm = neighbor_perm(gr.neighbor, mesh_shape)
        recvs.append(lax.ppermute(dat[sr.pos:sr.pos + sr.len],
                                  axis_names, perm))
    dst = _rows(decomp.ghost)
    return dat.at[jnp.asarray(dst)].set(jnp.concatenate(recvs))


def exchange_shift(dat, decomp: BrickDecomp, axis_names: tuple[str, ...],
                   mesh_shape: tuple[int, ...],
                   axis_order: "list[int] | None" = None):
    """Multi-stage SHIFT exchange: 2 ppermutes per mesh axis, corners
    forwarded (ref: MultiStageExchangeView semantics).  One gather +
    ppermute + scatter per message."""
    import jax.numpy as jnp

    order, stages = decomp.stage_sections(axis_order)
    for s, ax in enumerate(order):
        for sign in (+1, -1):
            pairs = stages[s][sign]
            if not pairs:
                continue
            src_idx = jnp.asarray(_rows([src for _d, src in pairs]))
            dst_idx = jnp.asarray(_rows([dst for dst, _s in pairs]))
            perm = _shift_perm(mesh_shape[ax], sign)
            recv = lax.ppermute(dat[src_idx], axis_names[ax], perm)
            dat = dat.at[dst_idx].set(recv)
    return dat


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
        # my low ghost <- -a neighbor's high owned slab
        lo_ghost = lax.ppermute(hi_own, axis_names[ax],
                                _shift_perm(mesh_shape[ax], -1))
        hi_ghost = lax.ppermute(lo_own, axis_names[ax],
                                _shift_perm(mesh_shape[ax], +1))
        arr = lax.dynamic_update_slice_in_dim(arr, lo_ghost, 0, axis=ax)
        arr = lax.dynamic_update_slice_in_dim(arr, hi_ghost, S - g, axis=ax)
    return arr
