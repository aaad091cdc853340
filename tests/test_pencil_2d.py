"""2-D streaming pencil kernel vs dense periodic twin (interpret).

Dimension generality for the fast path (the reference's templates are
dim-generic, ref: include/brick.h:96-127).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bricklib_tpu.codegen import dense_apply
from bricklib_tpu.codegen.pencil_kernel_2d import pallas_pencil_sweep_2d
from bricklib_tpu.core import (
    compare_arrays,
    from_bricks,
    init_grid,
    random_array,
    to_bricks,
)
from bricklib_tpu.st import ConstRef, Func, Grid, Index, If
from bricklib_tpu.st.loader import load_stencil_module


def _lin5():
    i, j = Index(0), Index(1)       # i = x (innermost), j = y
    g, o = Grid("in", 2), Grid("out", 2)
    o(i, j).assign(ConstRef("a") * g(i, j)
                   + ConstRef("b") * (g(i + 1, j) + g(i - 1, j)
                                      + g(i, j + 1) + g(i, j - 1)))
    return load_stencil_module({"STENCIL": [o]})[0]


def _asym9():
    """Radius-2 asymmetric: distinct y-profiles + 4 lane rolls."""
    i, j = Index(0), Index(1)
    g, o = Grid("in", 2), Grid("out", 2)
    o(i, j).assign(1.0 * g(i, j) + 0.6 * g(i + 2, j)
                   - 0.3 * g(i - 1, j + 1) + 0.2 * g(i, j - 2)
                   + 0.9 * g(i + 1, j + 1) - 0.4 * g(i - 2, j - 1))
    return load_stencil_module({"STENCIL": [o]})[0]


def _nonlin():
    i, j = Index(0), Index(1)
    g, o = Grid("in", 2), Grid("out", 2)
    mx = Func("max", 2)
    o(i, j).assign(If(g(i, j) > 0,
                      mx(g(i + 1, j), g(i, j + 1)) * 0.5,
                      g(i - 1, j - 1)))
    return load_stencil_module({"STENCIL": [o]})[0]


def _run_case(sd, params, by=4, X=16, ny=12, seed=7, steps=1):
    grid, info = init_grid((ny // by + 2, 1))
    core = random_array((ny, X), np.float32, seed)
    ext = np.pad(core, ((by, by), (0, 0)), mode="wrap")
    view = jnp.asarray(to_bricks(ext, grid, (by, X)).reshape(-1, by, X))
    fn = pallas_pencil_sweep_2d(sd, grid, (by, X), info.nbricks,
                                params, interpret=True)
    out = view
    want = core
    lo, hi = sd.radius()
    for _ in range(steps):
        out = fn(out)
        wp = np.pad(want, [(l, h) for l, h in zip(lo, hi)], mode="wrap")
        want = dense_apply(sd, {next(iter(sd.inputs)): wp}, params,
                           xp=np)
        if steps > 1:   # refresh periodic ghost rows between steps
            ng = np.asarray(out)
            g2 = np.asarray(grid)[:, 0]
            ng[g2[0]] = ng[g2[-2]]
            ng[g2[-1]] = ng[g2[1]]
            out = jnp.asarray(ng)
    got = from_bricks(np.asarray(out).reshape(info.nbricks, -1),
                      np.asarray(grid)[1:-1], (by, X))
    assert compare_arrays(got, want, 1e-5)


def test_2d_linear_5pt():
    _run_case(_lin5(), {"a": 0.4, "b": 0.15})


def test_2d_linear_asym_radius2():
    _run_case(_asym9(), {}, by=4, X=16, ny=16, seed=9)


def test_2d_nonlinear_generic():
    _run_case(_nonlin(), {}, seed=11)


def test_2d_periodic_table_chained():
    """Fully periodic via table redirection: two chained sweeps equal
    two dense periodic steps with no host ghost refresh."""
    sd = _lin5()
    params = {"a": 0.4, "b": 0.15}
    by, X, ny = 4, 16, 12
    grid, info = init_grid((ny // by + 2, 1))
    g2 = np.asarray(grid)[:, 0].copy()
    g2[0] = g2[-2]          # periodic redirection table
    g2[-1] = g2[1]
    core = random_array((ny, X), np.float32, 3)
    ext = np.pad(core, ((by, by), (0, 0)), mode="wrap")
    view = jnp.asarray(to_bricks(ext, grid, (by, X)).reshape(-1, by, X))
    fn = pallas_pencil_sweep_2d(sd, g2, (by, X), info.nbricks, params,
                                interpret=True)
    out = np.asarray(fn(fn(view)))
    lo, hi = sd.radius()
    want = core
    for _ in range(2):
        wp = np.pad(want, [(l, h) for l, h in zip(lo, hi)], mode="wrap")
        want = dense_apply(sd, {"in": wp}, params, xp=np)
    got = from_bricks(out.reshape(info.nbricks, -1),
                      np.asarray(grid)[1:-1], (by, X))
    assert compare_arrays(got, want, 1e-5)
