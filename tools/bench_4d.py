#!/usr/bin/env python
"""4-D pencil sweep benchmark: mpi9pt, unfused vs temporally fused.

Same measurement discipline as bench.py (see CLAUDE.md rules): every
item is an R-iteration dependent loop inside ONE jit call, items are
measured in interleaved rounds keeping minima, the roofline is a
Pallas DMA copy of the same storage, and every chain ends in a scalar
readback.  Prints one JSON line.

Caveat on the ratios: 4-D ghost-brick inflation is large (~2x here —
every outer axis is short), so the two reported rooflines BRACKET the
truth: ``vs_copy`` (same-storage copy) is generous because the copy
moves ghost bricks the sweep never writes; ``vs_sol_interior``
(copy time scaled by the interior byte fraction) is strict because
the sweep still must READ the ghost halo.  The decisive comparison is
BETWEEN the sweep variants on identical storage (unfused / F=2 /
F=4).

Ref: weak/main-4d.cpp:36-53 (the reference's 4-D 9pt weak benchmark).
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of {copy,9pt,9pt_f2,9pt_f4} to measure")
    ap.add_argument("--rounds", type=int, default=None)
    a = ap.parse_args()
    known = {"copy", "9pt", "9pt_f2", "9pt_f4"}
    if a.only and not set(a.only) <= known:
        ap.error(f"--only: unknown items {sorted(set(a.only) - known)} "
                 f"(choose from {sorted(known)})")

    sys.path.insert(0, __file__.rsplit("/", 2)[0])

    from bricklib_tpu.bench.roofline import ensure_live_backend

    if ensure_live_backend() is False:
        print("WARNING: TPU backend init dead/hung; fell back to CPU "
              "interpret mode", file=sys.stderr)

    import jax
    import jax.numpy as jnp

    from bricklib_tpu.bench.roofline import chain, make_dma_copy
    from bricklib_tpu.bench.roofline import rep as _rep
    from bricklib_tpu.codegen.pencil_kernel_4d import pallas_pencil_sweep_4d
    from bricklib_tpu.core import init_grid
    from bricklib_tpu.stencils import DEFAULT_PARAMS, stencil_by_name

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        BD = (4, 8, 8, 512)
        G = (6, 10, 18, 1)          # interior (16, 64, 128, 512) elems
        iters, R, rounds = 3, 4, 4
    else:
        BD = (2, 2, 4, 128)
        G = (4, 4, 4, 1)
        iters, R, rounds = 1, 2, 1

    grid, info = init_grid(G)
    nb = info.nbricks
    sd = stencil_by_name("mpi9pt")[0]
    interior = 1
    for g, b in zip(G[:-1], BD[:-1]):
        interior *= (g - 2) * b
    interior *= BD[-1]

    def rep(f, r=R):
        return _rep(f, r)

    kw = dict(interpret=not on_tpu)
    # 9pt_f4 is opt-in (--only): at 512-class sizes its Mosaic compile
    # hangs (>9 min, zero output), and the w recompute amplification
    # makes it unprofitable anyway — see api.py's 4-D auto-fuse cap
    sel = set(a.only) if a.only else {"copy", "9pt", "9pt_f2"}
    if a.rounds:
        rounds = a.rounds
    k1 = (rep(pallas_pencil_sweep_4d(sd, grid, BD, nb, DEFAULT_PARAMS,
                                     lookahead=2, **kw))
          if "9pt" in sel else None)
    k2 = (rep(pallas_pencil_sweep_4d(sd, grid, BD, nb, DEFAULT_PARAMS,
                                     fuse=2, **kw))
          if "9pt_f2" in sel else None)
    k4 = None
    if "9pt_f4" in sel and all(4 <= b for b in BD[:-1]):
        k4 = rep(pallas_pencil_sweep_4d(sd, grid, BD, nb, DEFAULT_PARAMS,
                                        fuse=4, **kw))

    dma_copy = rep(make_dma_copy(nb, BD, jnp.float32,
                                 interpret=not on_tpu))

    # per nominal stencil iteration: R for unfused/copy, R*F for fused
    items = {}
    if "copy" in sel:
        items["copy"] = (dma_copy, R)
    if k1 is not None:
        items["9pt"] = (k1, R)
    if k2 is not None:
        items["9pt_f2"] = (k2, 2 * R)
    if k4 is not None:
        items["9pt_f4"] = (k4, 4 * R)
    times = {k: [] for k in items}
    bufs = {k: jax.random.uniform(jax.random.PRNGKey(s), (nb,) + BD,
                                  jnp.float32)
            for s, k in enumerate(items)}
    for _ in range(rounds):
        for k, (fn, per) in items.items():
            dt, bufs[k] = chain(fn, bufs[k], iters)
            times[k].append(dt / per)
    best = {k: min(v) for k, v in times.items()}
    spread = {k: (max(v) - min(v)) / min(v) for k, v in times.items()}

    ref = next(k for k in ("9pt_f2", "9pt_f4", "9pt", "copy")
               if k in best)
    out = {
        "metric": "9pt_4d_pencil",
        "value": round(interior / best[ref] / 1e9, 3),
        "unit": f"GStencil/s ({ref}, per iteration)",
        "details": {
            "domain": [(g - 2) * b for g, b in zip(G[:-1], BD[:-1])]
            + [BD[-1]],
            "brick": list(BD),
            "rounds": rounds,
            "backend": jax.default_backend(),
        },
    }
    d = out["details"]
    # interior-normalized SOL: the whole-storage copy moves ghost
    # bricks the sweeps never write, so scale its time by the interior
    # byte fraction — vs_sol_interior is the honest per-element ratio,
    # vs_copy the same-storage one (generous by the inflation factor)
    total = nb * 1
    for b in BD:
        total *= b
    copy_int = (best["copy"] * interior / total if "copy" in best
                else None)
    if copy_int is not None:
        d["sol_interior_ms"] = round(copy_int * 1e3, 3)
        d["ghost_inflation"] = round(total / interior, 3)
    for k in items:
        d[f"{k}_ms"] = round(best[k] * 1e3, 3)
        d[f"{k}_spread"] = round(spread[k], 3)
        if "copy" in best and k != "copy":
            d[f"{k}_vs_copy"] = round(best["copy"] / best[k], 4)
            d[f"{k}_vs_sol_interior"] = round(copy_int / best[k], 4)
    if "copy" in best and ref != "copy":
        out["vs_baseline"] = round(copy_int / best[ref], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
