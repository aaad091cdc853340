"""Pencil-brick streaming kernel vs dense periodic twin (interpret)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bricklib_tpu.codegen import dense_apply
from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_stencil
from bricklib_tpu.core import compare_arrays, from_bricks, init_grid, random_array, to_bricks
from bricklib_tpu.stencils import DEFAULT_PARAMS, stencil_by_name

pytestmark = pytest.mark.slow

PARAMS = dict(DEFAULT_PARAMS)
PARAMS["coeff"] = [0.03 * (c + 1) for c in range(27)]
BD = (2, 4, 16)
G = (6, 5, 1)


@pytest.fixture(scope="module")
def data():
    grid, info = init_grid(G)
    KI, JI = G[0] - 2, G[1] - 2
    core = random_array((KI * BD[0], JI * BD[1], BD[2]), np.float32, 5)
    ext = np.pad(core, ((BD[0], BD[0]), (BD[1], BD[1]), (0, 0)),
                 mode="wrap")
    dat = to_bricks(ext, grid, BD)
    return grid, info, core, jnp.asarray(dat.reshape((-1,) + BD))


@pytest.mark.parametrize("name,tj", [("s7pt", None), ("mpi13pt", None),
                                     ("s7pt", 1)])
def test_pencil_matches_dense_periodic(data, name, tj):
    grid, info, core, view = data
    sd = stencil_by_name(name)[0]
    fn = pallas_pencil_stencil(sd, grid, BD, (1, 1), info.nbricks,
                               PARAMS, tile_j=tj, interpret=True)
    out = np.asarray(fn(view))
    lo, hi = sd.radius()
    corep = np.pad(core, [(l, h) for l, h in zip(lo, hi)], mode="wrap")
    want = dense_apply(sd, {next(iter(sd.inputs)): corep}, PARAMS, xp=np)
    got = from_bricks(out, grid[1:-1, 1:-1], BD)
    assert compare_arrays(got, want, 1e-5)
