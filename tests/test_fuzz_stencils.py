"""Randomized stencil fuzz: the pencil emitter vs the dense twin.

The corpus stencils are all symmetric stars/boxes; the factorization
(fold_linear: k-profiles -> j-shifts -> lane rolls, with W/V sharing by
structural equality) has branches only asymmetric or degenerate
stencils reach — asymmetric radii, repeated taps, zero/negative and
coincidentally-equal coefficients, single-axis stencils.  This fuzz
generates seeded random linear stencils across those shapes and checks
the pencil kernel against the dense twin (the reference's
array-vs-brick self-validation idea, stencils/3axis.cpp:78-86, applied
property-style).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bricklib_tpu.codegen import dense_apply
from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_stencil
from bricklib_tpu.core import (
    compare_arrays,
    from_bricks,
    init_grid,
    random_array,
    to_bricks,
)
from bricklib_tpu.st import FloatLiteral, Grid, Index
from bricklib_tpu.st.loader import load_stencil_module

pytestmark = pytest.mark.slow

BD = (4, 8, 16)
G = (5, 5, 1)


def _random_stencil(rng):
    """Random linear stencil with asymmetric per-axis radii <= (2,2,2)
    (brick-fitting), possibly repeated taps and degenerate coeffs."""
    inp, out = Grid("in", 3), Grid("out", 3)
    i, j, k = Index(0), Index(1), Index(2)
    ntap = int(rng.integers(1, 12))
    lo = [int(rng.integers(0, 3)) for _ in range(3)]   # numpy order k,j,i
    hi = [int(rng.integers(0, 3)) for _ in range(3)]
    calc = None
    for _ in range(ntap):
        dk = int(rng.integers(-lo[0], hi[0] + 1))
        dj = int(rng.integers(-lo[1], hi[1] + 1))
        di = int(rng.integers(-lo[2], hi[2] + 1))
        c = float(rng.choice(
            [0.0, 1.0, -1.0, 0.5, round(float(rng.normal()), 3)]))
        t = FloatLiteral(c) * inp(i + di, j + dj, k + dk)
        calc = t if calc is None else calc + t
    out(i, j, k).assign(calc)
    return load_stencil_module({"STENCIL": [out]})[0]


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_pencil_matches_dense(seed):
    rng = np.random.default_rng(1000 + seed)
    sd = _random_stencil(rng)
    grid, info = init_grid(G)
    KI, JI = G[0] - 2, G[1] - 2
    core = random_array((KI * BD[0], JI * BD[1], BD[2]), np.float32,
                        seed)
    ext = np.pad(core, ((BD[0], BD[0]), (BD[1], BD[1]), (0, 0)),
                 mode="wrap")
    view = jnp.asarray(to_bricks(ext, grid, BD).reshape((-1,) + BD))
    fn = pallas_pencil_stencil(sd, grid, BD, (1, 1), info.nbricks, {},
                               interpret=True)
    out = np.asarray(fn(view))
    lo, hi = sd.radius()
    corep = np.pad(core, [(l, h) for l, h in zip(lo, hi)], mode="wrap")
    want = dense_apply(sd, {"in": corep}, {}, xp=np)
    got = from_bricks(out, grid[1:-1, 1:-1], BD)
    assert compare_arrays(got, want, 1e-4), f"seed {seed}"
