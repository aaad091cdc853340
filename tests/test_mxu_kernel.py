"""MXU-form flat-pencil sweep vs dense periodic twin (interpret).

Fast tier: tiny shapes compile in seconds.  Real-TPU alignment and the
performance question (the 125pt >= 0.90-of-SOL gate, BASELINE.md:32)
are tools/tpu_smoke.py and tools/autotune.py items.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bricklib_tpu.codegen import dense_apply
from bricklib_tpu.codegen.mxu_kernel import (
    flatten_bricks,
    pallas_pencil_sweep_mxu,
    unflatten_bricks,
)
from bricklib_tpu.core import (
    compare_arrays,
    from_bricks,
    init_grid,
    random_array,
    to_bricks,
)
from bricklib_tpu.stencils import DEFAULT_PARAMS, stencil_by_name

PARAMS = dict(DEFAULT_PARAMS)
PARAMS["coeff"] = [0.03 * (c + 1) for c in range(27)]


def _periodic(bd, g, seed):
    grid, info = init_grid(g)
    core_shape = tuple((gg - 2) * bb for gg, bb in zip(g[:-1], bd[:-1]))
    core_shape += (bd[-1],)
    core = random_array(core_shape, np.float32, seed)
    pad = [(bb, bb) for bb in bd[:-1]] + [(0, 0)]
    ext = np.pad(core, pad, mode="wrap")
    view = jnp.asarray(to_bricks(ext, grid, bd).reshape((-1,) + bd))
    return grid, info, core, view


@pytest.mark.parametrize("name,bd", [("s7pt", (2, 2, 8)),
                                     ("mpi13pt", (4, 4, 8)),
                                     ("mpi125pt", (4, 4, 8)),
                                     ("mpi25pt", (4, 8, 8))])
def test_mxu_matches_dense(name, bd):
    g = (5, 4, 1)
    grid, info, core, view = _periodic(bd, g, 31)
    sd = stencil_by_name(name)[0]
    fn = pallas_pencil_sweep_mxu(sd, grid, bd, info.nbricks, PARAMS,
                                 interpret=True)
    flat = flatten_bricks(view)
    out = unflatten_bricks(np.asarray(fn(flat)), bd)
    lo, hi = sd.radius()
    corep = np.pad(core, [(l, h) for l, h in zip(lo, hi)], mode="wrap")
    want = dense_apply(sd, {next(iter(sd.inputs)): corep}, PARAMS, xp=np)
    got = from_bricks(out, np.asarray(grid)[1:-1, 1:-1], bd)
    assert compare_arrays(got, want, 1e-5)


def test_mxu_bf16_storage():
    """bf16 storage: operands enter the MXU in bf16; tolerance is
    bf16-level (the storage itself quantizes to ~3 digits)."""
    g = (5, 4, 1)
    bd = (4, 4, 8)
    grid, info, core, view = _periodic(bd, g, 41)
    sd = stencil_by_name("mpi125pt")[0]
    fn = pallas_pencil_sweep_mxu(sd, grid, bd, info.nbricks, PARAMS,
                                 dtype=jnp.bfloat16, interpret=True)
    flat = flatten_bricks(view).astype(jnp.bfloat16)
    out = unflatten_bricks(
        np.asarray(fn(flat).astype(jnp.float32)), bd)
    lo, hi = sd.radius()
    corep = np.pad(core, [(l, h) for l, h in zip(lo, hi)], mode="wrap")
    want = dense_apply(sd, {next(iter(sd.inputs)): corep}, PARAMS,
                       xp=np)
    got = from_bricks(out, np.asarray(grid)[1:-1, 1:-1], bd)
    assert compare_arrays(got, want, 3e-2)


def test_mxu_matches_classic_sweep_chained():
    """Two chained MXU sweeps == two chained classic sweeps on the same
    periodic table (the bench's rep-chain usage)."""
    from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_sweep
    from bricklib_tpu.comm import BrickDecomp, skin3d_good

    bd = (4, 4, 8)
    dec = BrickDecomp(dims=(12, 12, 8), ghost_depth=(4, 4, 0),
                      bdims=bd).initialize(skin3d_good)
    tgrid = dec.periodic_grid((0, 1, 2))
    sd = stencil_by_name("mpi125pt")[0]
    dat = random_array((dec.nbricks,) + bd, np.float32, 37)
    mx = pallas_pencil_sweep_mxu(sd, tgrid, bd, dec.nbricks, PARAMS,
                                 interpret=True)
    cl = pallas_pencil_sweep(sd, tgrid, bd, dec.nbricks, PARAMS,
                             interpret=True)
    got = unflatten_bricks(
        np.asarray(mx(mx(flatten_bricks(jnp.asarray(dat))))), bd)
    want = np.asarray(cl(cl(jnp.asarray(dat))))
    wids = np.unique(np.asarray(tgrid)[1:-1, 1:-1])
    assert compare_arrays(got[wids], want[wids], 1e-5)
