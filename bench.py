#!/usr/bin/env python
"""Headline benchmark: 512^3 7pt star stencil on bricks, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` is achieved GStencil/s over the speed-of-light GStencil/s
implied by a measured HBM copy roofline (2 x 4 B moved per element), i.e.
the fraction of the BASELINE.md target ("512^3 7pt at >= 90% of
HBM-bandwidth roofline").  Protocol: warm-up excluded, fixed-iteration
averaging (ref: stencils/stencils.h:40-53; weak/main.cpp:229-251 derives
GStencil/s the same way).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_stencil
    from bricklib_tpu.core import init_grid
    from bricklib_tpu.stencils import DEFAULT_PARAMS, stencil_by_name

    from bricklib_tpu.comm import BrickDecomp, skinlist_by_name

    on_tpu = jax.default_backend() in ("tpu", "axon")
    N = 512 if on_tpu else 64
    BD = (8, 8, N)  # pencil bricks: the TPU-canonical fast-path fold
    iters = 20 if on_tpu else 3

    # single-chip periodicity through the grid table (zero-copy links):
    # ghost cells redirect to wrapped owned bricks, no exchange needed
    dec = BrickDecomp(dims=(N, N, N), ghost_depth=(BD[0], BD[1], 0),
                      bdims=BD).initialize(skinlist_by_name("good", 3))
    grid = dec.periodic_grid((0, 1, 2))
    info = dec.info
    params = dict(DEFAULT_PARAMS)
    params["coeff"] = [0.03 * (c + 1) for c in range(27)]

    key = jax.random.PRNGKey(0)
    view = jax.random.uniform(key, (info.nbricks,) + BD, jnp.float32)

    def timeit(fn, x, n):
        # chained dependent iterations + scalar readback: on the axon
        # tunnel, block_until_ready alone does not guarantee execution
        # completed, so the barrier is a data readback
        out = fn(x)
        float(jnp.sum(out[:1]))
        t0 = time.perf_counter()
        out = x
        for _ in range(n):
            out = fn(out)
        float(jnp.sum(out[:1]))
        return (time.perf_counter() - t0) / n

    # measured copy roofline: 1 read + 1 write of the domain
    dom = jax.random.uniform(key, (N, N, N), jnp.float32)
    copy = jax.jit(lambda x: x + 1.0)
    t_copy = timeit(copy, dom, iters)
    sol_bw = 2 * dom.size * 4 / t_copy          # B/s
    sol_gst = sol_bw / (2 * 4) / 1e9            # GStencil/s at 8 B/elem

    sd = stencil_by_name("s7pt")[0]
    fn = jax.jit(pallas_pencil_stencil(
        sd, grid, BD, (1, 1), info.nbricks, params))
    dt = timeit(fn, view, iters)
    elems = N ** 3
    gst = elems / dt / 1e9

    # secondary headline config (BASELINE.md names both 7pt and 125pt)
    sd125 = stencil_by_name("mpi125pt")[0]
    fn125 = jax.jit(pallas_pencil_stencil(
        sd125, grid, BD, (1, 1), info.nbricks, params))
    dt125 = timeit(fn125, view, max(iters // 2, 2))
    gst125 = elems / dt125 / 1e9

    print(json.dumps({
        "metric": "7pt_512cubed_brick_stencil",
        "value": round(gst, 3),
        "unit": "GStencil/s",
        "vs_baseline": round(gst / sol_gst, 4),
        "details": {
            "step_ms": round(dt * 1e3, 3),
            "domain": N,
            "brick": list(BD),
            "sol_gstencil_s": round(sol_gst, 3),
            "sol_copy_gb_s": round(sol_bw / 1e9, 1),
            "125pt_gstencil_s": round(gst125, 3),
            "125pt_step_ms": round(dt125 * 1e3, 3),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
