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


# full corpus incl. the i-profile factorization branch (125pt/25pt) and
# the generic-evaluator branch (cond's If/max) — the code paths behind
# the published numbers must have committed numeric tests
@pytest.mark.parametrize("name,bd", [("mpi125pt", (2, 4, 16)),
                                     ("s27pt", (2, 4, 16)),
                                     ("mpi25pt", (4, 8, 16)),
                                     ("cond", (2, 4, 16))])
def test_pencil_corpus_matches_dense(name, bd):
    grid, info = init_grid(G)
    KI, JI = G[0] - 2, G[1] - 2
    core = random_array((KI * bd[0], JI * bd[1], bd[2]), np.float32, 7)
    ext = np.pad(core, ((bd[0], bd[0]), (bd[1], bd[1]), (0, 0)),
                 mode="wrap")
    view = jnp.asarray(to_bricks(ext, grid, bd).reshape((-1,) + bd))
    sd = stencil_by_name(name)[0]
    fn = pallas_pencil_stencil(sd, grid, bd, (1, 1), info.nbricks,
                               PARAMS, interpret=True)
    out = np.asarray(fn(view))
    lo, hi = sd.radius()
    corep = np.pad(core, [(l, h) for l, h in zip(lo, hi)], mode="wrap")
    want = dense_apply(sd, {next(iter(sd.inputs)): corep}, PARAMS, xp=np)
    got = from_bricks(out, grid[1:-1, 1:-1], bd)
    assert compare_arrays(got, want, 1e-5)


def test_deep_ghost_st_iter_composition(data):
    """Ghost-inclusive sweep (skip=0) then owned sweep (skip=1) — two
    iterations per exchange; contamination from clamped edge windows
    must stay inside the ghost ring (ref: weak/main.cpp:203-212)."""
    from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_sweep

    grid, info, core, view = data
    sd = stencil_by_name("s7pt")[0]
    GK, GJ = grid.shape[0], grid.shape[1]
    fn0 = pallas_pencil_sweep(sd, grid, BD, info.nbricks, PARAMS,
                              k_range=(0, GK), j_range=(0, GJ),
                              interpret=True)
    fn1 = pallas_pencil_sweep(sd, grid, BD, info.nbricks, PARAMS,
                              k_range=(1, GK - 1), j_range=(1, GJ - 1),
                              interpret=True)
    out = np.asarray(fn1(fn0(view)))

    gname = next(iter(sd.inputs))
    lo, hi = sd.radius()
    KI, JI = GK - 2, GJ - 2
    ext = np.pad(core, ((BD[0], BD[0]), (BD[1], BD[1]), (0, 0)),
                 mode="wrap")
    b = ext
    for _ in range(2):
        bp = np.pad(b, [(l, h) for l, h in zip(lo, hi)], mode="wrap")
        b = dense_apply(sd, {gname: bp}, PARAMS, xp=np)
    want = b[BD[0]:BD[0] + KI * BD[0], BD[1]:BD[1] + JI * BD[1], :]
    got = from_bricks(out, grid[1:-1, 1:-1], BD)
    assert compare_arrays(got, want, 1e-5)


def test_weak_driver_distributed_pencil_st_iter():
    """Deep-ghost pencil on a real (2,1,1) mesh with ST_ITER=2,
    validated against the array twin inside the driver."""
    from bricklib_tpu.drivers import weak

    weak.run(dims=(16, 16, 32), bdim=(8, 8, 8), stencil="mpi7pt",
             st_iter=2, mesh_shape=(2, 1, 1), iters=1, validate=True,
             backend="pencil")


def test_weak_driver_overlap_pencil():
    """Interior/ring split (sep_pos interior-first, brick-mpi.h:196):
    inner sweep from pre-exchange data + in-place ring sweeps after the
    exchange must equal the monolithic step."""
    from bricklib_tpu.drivers import weak

    weak.run(dims=(32, 32, 32), bdim=(8, 8, 8), stencil="mpi7pt",
             st_iter=1, mesh_shape=(2, 2, 1), iters=1, validate=True,
             backend="pencil", overlap=True)
    weak.run(dims=(32, 16, 32), bdim=(8, 8, 8), stencil="mpi7pt",
             st_iter=4, mesh_shape=(2, 1, 1), iters=1, validate=True,
             backend="pencil", overlap=True)
