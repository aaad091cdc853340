"""Variable-coefficient diffusion: a stencil reading TWO grids — the
evolving field u and a static spatially-varying coefficient c — on the
pencil fast path via the Problem API (multi-input support; ref: the
codegen's per-grid prologues, codegen/st/codegen/backend/base.py:93-123).

    u' = u + dt * div(c grad u)   (flux form, 7-point)

    python examples/varcoeff_diffusion.py     # runs on whatever jax sees
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))   # repo root, for uninstalled checkouts

from bricklib_tpu.api import Problem
from bricklib_tpu.st import ConstRef, Grid, Index, load_stencil_module

# -- define the two-grid stencil ---------------------------------------
i, j, k = Index(0), Index(1), Index(2)
u = Grid("u", 3)
c = Grid("c", 3)
out = Grid("out", 3)
dt = ConstRef("dt")

# face-centered flux: flux_+ = (c0 + c+)/2 * (u+ - u0), summed over axes
flux = None
for args_p in ([i + 1, j, k], [i, j + 1, k], [i, j, k + 1]):
    f = (c(i, j, k) + c(*args_p)) * (u(*args_p) - u(i, j, k))
    flux = f if flux is None else flux + f
for args_m in ([i - 1, j, k], [i, j - 1, k], [i, j, k - 1]):
    f = (c(i, j, k) + c(*args_m)) * (u(*args_m) - u(i, j, k))
    flux = flux + f
out(i, j, k).assign(u(i, j, k) + dt * flux)
STENCIL = [out]


def main():
    sdef = load_stencil_module({"STENCIL": STENCIL})[0]
    params = {"dt": 0.05}

    # pencil folds need i % 128 == 0 on hardware (lane tiles);
    # BRICK_EXAMPLE_N shrinks interpret-mode runs (tests)
    n = int(os.environ.get("BRICK_EXAMPLE_N", "128"))
    rng = np.random.default_rng(0)
    u0 = rng.random((n, n, n), dtype=np.float32)
    # smooth, positive coefficient field
    x = np.linspace(0, 2 * np.pi, n, endpoint=False, dtype=np.float32)
    cf = (1.2 + np.sin(x)[:, None, None] * np.cos(x)[None, :, None]
          * 0.5).astype(np.float32) * np.ones((n, n, n), np.float32)

    p = Problem(dims=(n, n, n), stencil=sdef, field="u", params=params,
                bdims=(8, 8, n), backend="pencil")
    p.init(array=u0, aux={"c": cf}).step(3)
    got = p.result()

    # numpy twin
    w = u0
    for _ in range(3):
        up = np.pad(w, 1, mode="wrap")
        cp = np.pad(cf, 1, mode="wrap")
        acc = np.zeros_like(w)
        ctr = (slice(1, -1),) * 3
        for ax in range(3):
            for s in (1, -1):
                sl = [slice(1, -1)] * 3
                sl[ax] = slice(1 + s, None if s > 0 else -2)
                sl = tuple(sl)
                acc += (cp[ctr] + cp[sl]) * (up[sl] - up[ctr])
        w = w + params["dt"] * acc
    err = np.abs(got - w).max()
    print(f"max |err| vs numpy after 3 steps: {err:.2e}")
    assert err < 1e-3
    print("OK")


if __name__ == "__main__":
    main()
