#!/usr/bin/env python
"""Coupled-system benchmark: a two-field reaction-diffusion step
(Gray-Scott shape: 7pt diffusion per field + cross coupling) as ONE
multi-output pencil kernel, unfused vs temporally fused.

Measurement discipline shared with bench.py (bricklib_tpu.bench.
roofline): interleaved min-of-rounds, in-jit chains, scalar-readback
barriers, Pallas DMA-copy roofline.  The system's speed-of-light is
TWO field copies per iteration (each field read + written once), so
``vs_sol`` = 2 x copy_time / step_time on identical per-field storage.

Ref: the reference amortizes ST_ITER for every stencil it ships
(weak/main.cpp:203-212); this records that the rebuild's system path
keeps that property with measured numbers.
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--domain", type=int, default=None)
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of {copy,sys,sys_f2,sys_f4} to run")
    a = ap.parse_args()
    known = {"copy", "sys", "sys_f2", "sys_f4"}
    if a.only and not set(a.only) <= known:
        ap.error(f"--only: unknown items {sorted(set(a.only) - known)} "
                 f"(choose from {sorted(known)})")

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])

    from bricklib_tpu.bench.roofline import ensure_live_backend

    if ensure_live_backend() is False:
        print("WARNING: TPU backend init dead/hung; fell back to CPU "
              "interpret mode", file=sys.stderr)

    from bricklib_tpu.bench.roofline import chain, make_dma_copy, rep
    from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_sweep
    from bricklib_tpu.comm import BrickDecomp, skinlist_by_name
    from bricklib_tpu.st import ConstRef, Grid, Index
    from bricklib_tpu.st.loader import load_stencil_module

    on_tpu = jax.default_backend() in ("tpu", "axon")
    N = a.domain or (512 if on_tpu else 32)
    BD = (8, 8, N) if on_tpu else (4, 4, N)
    iters, R = (3, 4) if on_tpu else (1, 2)
    rounds = a.rounds or (4 if on_tpu else 1)

    gu, gv = Grid("u", 3), Grid("v", 3)
    gou, gov = Grid("ou", 3), Grid("ov", 3)
    i, j, k = Index(0), Index(1), Index(2)

    def star7(g):
        return (ConstRef("c0") * g(i, j, k)
                + ConstRef("c1") * (g(i + 1, j, k) + g(i - 1, j, k)
                                    + g(i, j + 1, k) + g(i, j - 1, k)
                                    + g(i, j, k + 1) + g(i, j, k - 1)))

    gou(i, j, k).assign(star7(gu) + ConstRef("f") * gv(i, j, k))
    gov(i, j, k).assign(star7(gv) + ConstRef("f") * gu(i, j, k))
    sds = load_stencil_module({"STENCIL": [gou, gov]})
    params = {"c0": 0.4, "c1": 0.09, "f": 0.02}

    dec = BrickDecomp(dims=(N, N, N), ghost_depth=(BD[0], BD[1], 0),
                      bdims=BD).initialize(skinlist_by_name("good", 3))
    nb = dec.nbricks
    tgrid = dec.periodic_grid((0, 1, 2))
    kw = dict(interpret=not on_tpu)

    def sysrep(fuse):
        fk = dict(fuse=fuse) if fuse > 1 else dict(lookahead=2)
        kern = pallas_pencil_sweep(sds, tgrid, BD, nb, params,
                                   evolve=("u", "v"), **fk, **kw)

        def g(uv):
            u, v = uv
            for _ in range(R):
                u, v = kern(u, v)
            return u, v          # tuple through the chain: no stack
        return jax.jit(g)        # copy polluting the timed region

    # sys_f4 is TPU-default only: four interpret-mode compiles make a
    # CPU smoke run take >10 min; CPU covers copy/sys/sys_f2.
    sel = set(a.only) if a.only else (
        known if on_tpu else {"copy", "sys", "sys_f2"})
    items = {}
    if "copy" in sel:
        items["copy"] = (rep(make_dma_copy(nb, BD, jnp.float32,
                                           interpret=not on_tpu), R), R)
    if "sys" in sel:
        items["sys"] = (sysrep(1), R)
    if "sys_f2" in sel:
        items["sys_f2"] = (sysrep(2), 2 * R)
    # fused-sweep constraint: fuse x stencil j/k-radius (1 here) must
    # fit the brick j/k depth (pallas_pencil_sweep enforces the same)
    if "sys_f4" in sel and 4 * 1 <= min(BD[0], BD[1]):
        items["sys_f4"] = (sysrep(4), 4 * R)

    times = {k_: [] for k_ in items}
    bufs = {}
    for s, k_ in enumerate(items):
        one = jax.random.uniform(jax.random.PRNGKey(s), (nb,) + BD,
                                 jnp.float32)
        bufs[k_] = one if k_ == "copy" else (one, one * 0.5)
    for _ in range(rounds):
        for k_, (fn, per) in items.items():
            dt, bufs[k_] = chain(fn, bufs[k_], iters)
            times[k_].append(dt / per)
    best = {k_: min(v) for k_, v in times.items()}
    spread = {k_: (max(v) - min(v)) / min(v) for k_, v in times.items()}

    elems = N ** 3
    steps = [k_ for k_ in best if k_ != "copy"]
    ref = min(steps, key=lambda k_: best[k_]) if steps else "copy"
    sol = 2 * best["copy"] if "copy" in best else None
    out = {
        "metric": "coupled_system_2field",
        "value": round(elems / best[ref] / 1e9, 3),
        "unit": f"GStencil/s per field ({ref}, per iteration)",
        "vs_baseline": round(sol / best[ref], 4) if sol else 0.0,
        "details": {"domain": N, "brick": list(BD), "rounds": rounds,
                    "sol": "2 field copies per iteration",
                    "backend": jax.default_backend()},
    }
    d = out["details"]
    for k_ in items:
        d[f"{k_}_ms"] = round(best[k_] * 1e3, 3)
        d[f"{k_}_spread"] = round(spread[k_], 3)
        if k_ != "copy" and sol:
            d[f"{k_}_vs_sol"] = round(sol / best[k_], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
