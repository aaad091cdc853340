"""Distributed ghost exchange on an 8-device CPU mesh — the reference's
single-box mpirun validation (weak drivers compare brick exchange vs
array exchange under periodic wrap, weak/main.cpp:116-170,292-294)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bricklib_tpu.comm import BrickDecomp, skin3d_good
from bricklib_tpu.comm.exchange import (
    exchange_array,
    exchange_put,
    exchange_shift,
    exchange_shift_remote,
)
from bricklib_tpu.comm.mesh import make_domain_mesh, shard_map
from bricklib_tpu.core import (
    compare_arrays,
    from_bricks,
    random_array,
    to_bricks,
)

MESH_SHAPE = (2, 2, 2)
DIMS = (8, 8, 16)           # per-device owned elements
BD = (4, 4, 8)
GZ = (4, 4, 8)              # one brick of ghost per axis


def _global_and_blocks(seed=0):
    """Global periodic domain + per-device ground-truth extended blocks."""
    gshape = tuple(m * d for m, d in zip(MESH_SHAPE, DIMS))
    g = random_array(gshape, np.float32, seed)
    blocks = {}
    for c in np.ndindex(*MESH_SHAPE):
        idx = []
        for a in range(3):
            start = c[a] * DIMS[a] - GZ[a]
            idx.append(np.arange(start, start + DIMS[a] + 2 * GZ[a])
                       % gshape[a])
        blocks[c] = g[np.ix_(*idx)]
    return g, blocks


def _decomp():
    return BrickDecomp(dims=DIMS, ghost_depth=GZ, bdims=BD).initialize(
        skin3d_good)


def _stack_bricks(dec, blocks, zero_ghost=True):
    """[P..., nbricks, belems] array of per-device brick storage."""
    out = np.zeros(MESH_SHAPE + (dec.nbricks, int(np.prod(BD))),
                   dtype=np.float32)
    for c, blk in blocks.items():
        dat = np.zeros((dec.nbricks, int(np.prod(BD))), np.float32)
        to_bricks(blk, dec.grid, BD, dat=dat, offset=0)
        if zero_ghost:
            dat[dec.sep_pos[1]:] = 0.0  # wipe ghost segment
            dat[0] = 0.0
        out[c] = dat
    return out


@pytest.mark.parametrize("which", ["put", "shift", "shift-remote"])
def test_brick_exchange_fills_ghost(which):
    dec = _decomp()
    _, blocks = _global_and_blocks()
    stacked = _stack_bricks(dec, blocks, zero_ghost=True)

    if which == "shift-remote":
        # kernel-level remote DMA: interpret mode emulates the ICI
        # copies over ONE named axis, so shard over the flat device
        # axis (identical placement — ravel order matches MESH_SHAPE)
        from jax.sharding import Mesh

        ndev = int(np.prod(MESH_SHAPE))
        mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("dev",))

        def step(dat):
            d = exchange_shift_remote(dat[0], dec, ("dev",), MESH_SHAPE)
            return d[None]

        sharded = jax.device_put(
            jnp.asarray(stacked.reshape((ndev,) + stacked.shape[3:])),
            NamedSharding(mesh, P("dev")))
        out = jax.jit(shard_map(step, mesh, P("dev"), P("dev")))(sharded)
        out = np.asarray(out).reshape(stacked.shape)
    else:
        mesh = make_domain_mesh(MESH_SHAPE)
        names = mesh.axis_names
        fn = exchange_put if which == "put" else exchange_shift

        def step(dat):
            d = dat[0, 0, 0]
            d = fn(d, dec, names, MESH_SHAPE)
            return d[None, None, None]

        sharded = jax.device_put(
            jnp.asarray(stacked),
            NamedSharding(mesh, P(*names)))
        out = jax.jit(shard_map(step, mesh, P(*names), P(*names)))(sharded)
        out = np.asarray(out)

    for c, blk in blocks.items():
        got = from_bricks(out[c], dec.grid, BD)
        assert compare_arrays(got, blk, 1e-7), (which, c)


def test_remote_exchange_mixed_local_and_ici():
    """One kernel carrying both remote DMAs (distributed axes) and
    in-place local self-copies (1-device axis) must equal the XLA-level
    SHIFT exchange bit for bit — including corner forwarding through the
    mixed stages."""
    from jax.sharding import Mesh

    mesh_shape = (2, 2, 1)
    ndev = int(np.prod(mesh_shape))
    dec = _decomp()
    rng = np.random.default_rng(7)
    stacked = rng.standard_normal(
        (ndev, dec.nbricks, int(np.prod(BD)))).astype(np.float32)

    mesh3 = make_domain_mesh(mesh_shape)
    names3 = mesh3.axis_names
    want_in = jax.device_put(
        jnp.asarray(stacked.reshape(mesh_shape + stacked.shape[1:])),
        NamedSharding(mesh3, P(*names3)))

    def step3(dat):
        d = exchange_shift(dat[0, 0, 0], dec, names3, mesh_shape)
        return d[None, None, None]

    want = np.asarray(jax.jit(shard_map(
        step3, mesh3, P(*names3), P(*names3)))(want_in))
    want = want.reshape(stacked.shape)

    mesh1 = Mesh(np.asarray(jax.devices()[:ndev]), ("dev",))

    def step1(dat):
        d = exchange_shift_remote(dat[0], dec, ("dev",), mesh_shape)
        return d[None]

    got_in = jax.device_put(jnp.asarray(stacked),
                            NamedSharding(mesh1, P("dev")))
    got = np.asarray(jax.jit(shard_map(
        step1, mesh1, P("dev"), P("dev")))(got_in))
    np.testing.assert_array_equal(got, want)


def test_array_exchange_twin():
    _, blocks = _global_and_blocks(seed=3)
    ext_shape = tuple(d + 2 * g for d, g in zip(DIMS, GZ))
    stacked = np.zeros(MESH_SHAPE + ext_shape, dtype=np.float32)
    for c, blk in blocks.items():
        b = blk.copy()
        # zero the ghost shell
        core = b[GZ[0]:-GZ[0], GZ[1]:-GZ[1], GZ[2]:-GZ[2]].copy()
        b[:] = 0
        b[GZ[0]:-GZ[0], GZ[1]:-GZ[1], GZ[2]:-GZ[2]] = core
        stacked[c] = b

    mesh = make_domain_mesh(MESH_SHAPE)
    names = mesh.axis_names

    def step(arr):
        a = arr[0, 0, 0]
        a = exchange_array(a, GZ, names, MESH_SHAPE)
        return a[None, None, None]

    sharded = jax.device_put(jnp.asarray(stacked),
                             NamedSharding(mesh, P(*names)))
    out = np.asarray(jax.jit(shard_map(step, mesh, P(*names),
                                       P(*names)))(sharded))
    for c, blk in blocks.items():
        assert compare_arrays(out[c], blk, 1e-7), c


def test_weak_scaling_step_brick_vs_array():
    """Full weak-scaling step: exchange + mpi7pt stencil, brick path vs
    array path (the reference's flagship validation,
    weak/main.cpp:137-170)."""
    from bricklib_tpu.codegen import brick_apply, dense_apply
    from bricklib_tpu.stencils import DEFAULT_PARAMS, stencil_by_name

    sd = stencil_by_name("mpi7pt")[0]
    dec = _decomp()
    _, blocks = _global_and_blocks(seed=11)
    stacked = _stack_bricks(dec, blocks, zero_ghost=True)
    mesh = make_domain_mesh(MESH_SHAPE)
    names = mesh.axis_names
    adj = jnp.asarray(dec.info.adj)

    def step(dat):
        d = dat[0, 0, 0]
        d = exchange_shift(d, dec, names, MESH_SHAPE)
        view = d.reshape((-1,) + BD)
        out = brick_apply(sd, {"in": view}, adj, DEFAULT_PARAMS)
        return out.reshape(d.shape)[None, None, None]

    sharded = jax.device_put(jnp.asarray(stacked),
                             NamedSharding(mesh, P(*names)))
    out = np.asarray(jax.jit(shard_map(step, mesh, P(*names),
                                       P(*names)))(sharded))

    for c, blk in blocks.items():
        # array twin: stencil on the ground-truth extended block
        want = dense_apply(sd, {"in": blk}, DEFAULT_PARAMS, xp=np)
        lo, hi = sd.radius()
        # valid region of `want` = extended[lo : -hi]; compare the owned
        # interior (skip ghost bricks)
        own = tuple(slice(GZ[a] - lo[a], GZ[a] - lo[a] + DIMS[a])
                    for a in range(3))
        want_own = want[own]
        got = from_bricks(out[c], dec.interior_grid(), BD)
        assert compare_arrays(got, want_own, 1e-5), c


def test_remote_exchange_4d():
    """The kernel-level remote exchange is rank-generic: 4-D decomp on a
    (2,1,2,1) mesh equals the XLA SHIFT exchange bit for bit."""
    from jax.sharding import Mesh

    from bricklib_tpu.comm import skinlist_by_name

    mesh_shape = (2, 1, 2, 1)
    ndev = int(np.prod(mesh_shape))
    bd = (2, 2, 4, 16)
    dec = BrickDecomp(dims=(4, 4, 8, 32), ghost_depth=bd,
                      bdims=bd).initialize(skinlist_by_name("lex", 4))
    rng = np.random.default_rng(13)
    stacked = rng.standard_normal(
        (ndev, dec.nbricks, int(np.prod(bd)))).astype(np.float32)

    mesh4 = make_domain_mesh(mesh_shape)
    n4 = mesh4.axis_names
    want_in = jax.device_put(
        jnp.asarray(stacked.reshape(mesh_shape + stacked.shape[1:])),
        NamedSharding(mesh4, P(*n4)))

    def step4(dat):
        d = exchange_shift(dat[0, 0, 0, 0], dec, n4, mesh_shape)
        return d[None, None, None, None]

    want = np.asarray(jax.jit(shard_map(
        step4, mesh4, P(*n4), P(*n4)))(want_in)).reshape(stacked.shape)

    mesh1 = Mesh(np.asarray(jax.devices()[:ndev]), ("dev",))

    def step1(dat):
        d = exchange_shift_remote(dat[0], dec, ("dev",), mesh_shape)
        return d[None]

    got_in = jax.device_put(jnp.asarray(stacked),
                            NamedSharding(mesh1, P("dev")))
    got = np.asarray(jax.jit(shard_map(
        step1, mesh1, P("dev"), P("dev")))(got_in))
    np.testing.assert_array_equal(got, want)


def test_put_plan_deep_ghost_ring():
    """Deep ghost (2 brick rings in k) is a first-class put_plan config
    (the reference's free GZ, brick-mpi.h:304-316): every ghost/skin
    pair still lands in the plan with its gate group, and the k-face
    runs span both rings."""
    from bricklib_tpu.comm.exchange import put_plan

    dec = BrickDecomp(dims=(24, 16, 32), ghost_depth=(8, 4, 0),
                      bdims=(4, 4, 32)).initialize(skin3d_good)
    plan = put_plan(dec, (2, 2, 1), (2,))
    assert len(plan) == len([
        gr for gr in dec.ghost
        if not ({dec._tag_axis(t) for t in gr.neighbor} & {2})])
    klo = [e for e in plan if e[6] == "klo"]
    khi = [e for e in plan if e[6] == "khi"]
    assert klo and khi
    # each pure-k face moves 2 rings x owned j pencils of bricks
    nj = dec.grid.shape[1] - 2          # owned j columns (1 ring/side)
    assert sum(e[2] - e[1] for e in klo) == 2 * nj
    assert sum(e[2] - e[1] for e in khi) == 2 * nj


@pytest.mark.parametrize("seed", range(5))
def test_exchange_geometry_fuzz(seed):
    """Random decomp geometry (mesh shape, brick fold, skin ordering,
    PUT vs SHIFT) against the global-wrap ground truth — the exchange
    must be correct for ANY layout the planner accepts, not just the
    canonical test shapes."""
    from bricklib_tpu.comm import skinlist_by_name

    rng = np.random.default_rng(500 + seed)
    meshes = [(2, 2, 2), (2, 2, 1), (2, 1, 2), (1, 2, 2), (4, 2, 1),
              (1, 1, 8)]
    mesh_shape = meshes[int(rng.integers(len(meshes)))]
    bd = (int(rng.choice([2, 4])), int(rng.choice([2, 4])),
          int(rng.choice([4, 8])))
    gb = [int(rng.integers(2, 4)) for _ in range(3)]   # interior bricks
    dims = tuple(g * b for g, b in zip(gb, bd))
    order = str(rng.choice(["good", "normal", "bad"]))
    which = str(rng.choice(["put", "shift"]))

    dec = BrickDecomp(dims=dims, ghost_depth=bd, bdims=bd).initialize(
        skinlist_by_name(order, 3))
    gshape = tuple(m * d for m, d in zip(mesh_shape, dims))
    g = random_array(gshape, np.float32, seed)
    blocks = {}
    for c in np.ndindex(*mesh_shape):
        idx = [np.arange(c[a] * dims[a] - bd[a],
                         c[a] * dims[a] + dims[a] + bd[a]) % gshape[a]
               for a in range(3)]
        blocks[c] = g[np.ix_(*idx)]
    stacked = np.zeros(mesh_shape + (dec.nbricks, int(np.prod(bd))),
                       np.float32)
    for c, blk in blocks.items():
        dat = np.zeros((dec.nbricks, int(np.prod(bd))), np.float32)
        to_bricks(blk, dec.grid, bd, dat=dat)
        dat[dec.sep_pos[1]:] = 0.0
        dat[0] = 0.0
        stacked[c] = dat

    mesh = make_domain_mesh(mesh_shape)
    names = mesh.axis_names
    fn = exchange_put if which == "put" else exchange_shift

    def step(dat):
        d = dat[(0,) * 3]
        return fn(d, dec, names, mesh_shape)[None, None, None]

    sharded = jax.device_put(jnp.asarray(stacked),
                             NamedSharding(mesh, P(*names)))
    out = np.asarray(jax.jit(shard_map(step, mesh, P(*names),
                                       P(*names)))(sharded))
    for c, blk in blocks.items():
        got = from_bricks(out[c], dec.grid, bd)
        assert compare_arrays(got, blk, 1e-7), (seed, which, order, c)
