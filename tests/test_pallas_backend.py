"""Pallas emitter vs jnp oracle, interpret mode (CPU).

Interpret-mode kernels carry a large one-time XLA compile cost (~2 min for
the first pallas_call in a process), so this module keeps one tiny config
and few stencils; full-size numerics run on real TPU via bench.py and the
TPU smoke flow in the verify skill.  NOTE: interpret mode does NOT check
Mosaic's DMA tile-alignment rules — only a real TPU compile does.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bricklib_tpu.codegen import brick_apply, dense_apply
from bricklib_tpu.codegen.pallas_backend import (
    pallas_brick_stencil,
    pallas_dense_stencil,
)
from bricklib_tpu.core import compare_arrays, init_grid, random_array, to_bricks
from bricklib_tpu.stencils import DEFAULT_PARAMS, stencil_by_name

pytestmark = pytest.mark.slow

PARAMS = dict(DEFAULT_PARAMS)
PARAMS["coeff"] = [0.03 * (c + 1) for c in range(27)]
BD = (4, 4, 8)
G = (4, 4, 4)


@pytest.fixture(scope="module")
def data():
    arr = random_array(tuple(g * b for g, b in zip(G, BD)), np.float32, 21)
    grid, info = init_grid(G)
    dat = to_bricks(arr, grid, BD)
    return arr, grid, info, jnp.asarray(dat.reshape((-1,) + BD))


@pytest.mark.parametrize("name", ["s7pt", "cond"])
def test_pallas_brick_matches_oracle(data, name):
    arr, grid, info, view = data
    sd = stencil_by_name(name)[0]
    gname = next(iter(sd.inputs))
    fn = pallas_brick_stencil(sd, grid, BD, (1, 1, 1), info.nbricks,
                              PARAMS, tile=(2, 2), interpret=True)
    out = np.asarray(fn(view))
    oracle = brick_apply(sd, {gname: np.asarray(view)}, info.adj, PARAMS,
                         xp=np)
    inner = grid[1:-1, 1:-1, 1:-1].ravel()
    assert compare_arrays(out[inner], oracle[inner], 1e-5)


def test_pallas_dense_matches_twin(data):
    # pad[1] must cover the sublane-rounded j halo (8 for radius 2)
    sd = stencil_by_name("mpi13pt")[0]
    arr = random_array((24, 32, 128), np.float32, 3)
    fn = pallas_dense_stencil(sd, arr.shape, (4, 8, 48), PARAMS,
                              tile_elems=(8, 8), interpret=True)
    out = np.asarray(fn(jnp.asarray(arr)))
    want = dense_apply(sd, {"in": arr}, PARAMS, xp=np)
    lo, hi = sd.radius()
    got = out[4:-4, 8:-8, 48:-48]
    want_c = want[tuple(slice(p - l, p - l + s) for p, l, s in
                        zip((4, 8, 48), lo, got.shape))]
    assert compare_arrays(got, want_c, 1e-5)


def test_auto_tile_selection(data):
    """tile=None goes through choose_tile (regression: it once returned
    a single axis)."""
    from bricklib_tpu.codegen.pallas_backend import choose_tile

    assert choose_tile((32, 32), (8, 8)) == (4, 4)
    assert choose_tile((3, 5), (4, 4)) == (3, 5)  # small grids: full axis
    arr, grid, info, view = data
    sd = stencil_by_name("s7pt")[0]
    fn = pallas_brick_stencil(sd, grid, BD, (1, 1, 1), info.nbricks,
                              PARAMS, tile=None, interpret=True)
    assert callable(fn)
