"""Problem(backend="mxu"): the flat-pencil MXU sweep as a first-class
user backend — single-device table-periodic and distributed, vs the
dense twin.
"""

import numpy as np
import pytest

from bricklib_tpu.api import Problem
from bricklib_tpu.codegen import dense_apply
from bricklib_tpu.core import compare_arrays, random_array
from bricklib_tpu.stencils import stencil_by_name


def _dense_steps(g, name, n, params):
    sd = stencil_by_name(name)[0]
    lo, hi = sd.radius()
    w = g
    for _ in range(n):
        wp = np.pad(w, [(l, h) for l, h in zip(lo, hi)], mode="wrap")
        w = dense_apply(sd, {next(iter(sd.inputs)): wp}, params, xp=np)
    return w


def test_mxu_backend_single_device():
    g = random_array((16, 16, 32), np.float32, 51)
    p = Problem(dims=(16, 16, 32), stencil="mpi125pt",
                bdims=(4, 4, 32), backend="mxu", st_iter=2)
    assert p.describe()["backend"] == "mxu"
    p.init(array=g).step(1)
    want = _dense_steps(g, "mpi125pt", 2, p.params)
    assert compare_arrays(p.result(), want, 1e-4)


def test_mxu_backend_distributed_deep_ghost():
    g = random_array((16, 16, 32), np.float32, 52)
    p = Problem(dims=(8, 8, 32), stencil="mpi7pt", mesh=(2, 2, 1),
                bdims=(4, 4, 32), backend="mxu", st_iter=2)
    p.init(array=g).step(2)
    want = _dense_steps(g, "mpi7pt", 4, p.params)
    assert compare_arrays(p.result(), want, 1e-4)


def test_mxu_backend_rollout_and_checkpoint(tmp_path):
    g = random_array((16, 16, 32), np.float32, 53)
    p = Problem(dims=(8, 8, 32), stencil="mpi7pt", mesh=(2, 2, 1),
                bdims=(4, 4, 32), backend="mxu")
    p.init(array=g)
    p.save(str(tmp_path / "ck"))
    p.rollout(3)
    q = Problem(dims=(8, 8, 32), stencil="mpi7pt", mesh=(2, 2, 1),
                bdims=(4, 4, 32), backend="mxu")
    q.load(str(tmp_path / "ck"))
    q.step(3)
    assert compare_arrays(q.result(), p.result(), 1e-6)
    want = _dense_steps(g, "mpi7pt", 3, p.params)
    assert compare_arrays(p.result(), want, 1e-4)


def test_mxu_backend_guards():
    from bricklib_tpu.st import ConstRef, Grid, Index
    from bricklib_tpu.st.loader import load_stencil_module

    i, j, k = Index(0), Index(1), Index(2)
    u, c, o = Grid("u", 3), Grid("c", 3), Grid("out", 3)
    o(i, j, k).assign(c(i, j, k) * u(i + 1, j, k))
    sd2 = load_stencil_module({"STENCIL": [o]})[0]
    with pytest.raises(ValueError, match="single-input"):
        Problem(dims=(8, 8, 32), stencil=sd2, field="u",
                backend="mxu", bdims=(4, 4, 32))
    with pytest.raises(NotImplementedError, match="linear"):
        Problem(dims=(8, 8, 32), stencil="cond", backend="mxu",
                bdims=(4, 4, 32))
