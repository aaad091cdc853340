"""Diagnose the 2-D copy-roofline denominator (round-5 VERDICT item 1).

The round-4 bench judged the 2-D fast path against a storage-shape DMA
copy that read 83-112 GB/s while the 3-D copy read 343-380 GB/s on the
same chip.  Hypothesis: the 4096^2 grid is 64 MB total, so its ideal
copy is ~0.32 ms and a fixed per-pallas-call cost dominates; a larger
grid amortizes it.  This tool measures, in interleaved rounds with
minima kept (CLAUDE.md rule 0):

- the 3-D 512^3 copy (the quiet-window gate: >= ~330 GB/s means quiet),
- the 2-D storage copy at N2 in {4096, 8192, 16384},
- each 2-D size at inner-repeat R in {1, 8} to expose the fixed cost
  (GB/s that rises with R and with size => overhead-dominated config).

Hardware-only (fail fast, no CPU fallback) — ratios on the CPU
interpreter mean nothing.  Protocol anchor for the reference's repeat
scheme: /root/reference/stencils/stencils.h:40-53.
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from bricklib_tpu.bench.roofline import chain, make_dma_copy, rep

    if jax.devices()[0].platform != "tpu":
        raise SystemExit("diag_2d_copy is hardware-only; no TPU")

    N3 = 512
    BD3 = (8, 8, N3)
    nb3 = (N3 // 8) * (N3 // 8)
    sizes2 = (4096, 8192, 16384)
    R = 8
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    items = {}
    bufs = {}
    items["copy_3d"] = (rep(make_dma_copy(nb3, BD3, jnp.float32), R), R,
                        2 * nb3 * 8 * 8 * N3 * 4)
    bufs["copy_3d"] = jax.random.uniform(
        jax.random.PRNGKey(0), (nb3,) + BD3, jnp.float32)
    for n2 in sizes2:
        nb2 = n2 // 8
        bd2 = (8, n2)
        nbytes = 2 * nb2 * 8 * n2 * 4
        for r in (1, R):
            key = f"copy_2d_{n2}_r{r}"
            items[key] = (rep(make_dma_copy(nb2, bd2, jnp.float32), r),
                          r, nbytes)
            bufs[key] = jax.random.uniform(
                jax.random.PRNGKey(n2 + r), (nb2,) + bd2, jnp.float32)

    times = {k: [] for k in items}
    for rnd in range(rounds):
        for k, (fn, per, _) in items.items():
            dt, bufs[k] = chain(fn, bufs[k], 3)
            times[k].append(dt / per)
        gb3 = items["copy_3d"][2] / min(times["copy_3d"]) / 1e9
        print(f"round {rnd}: 3d copy {gb3:.1f} GB/s", flush=True)

    out = {"rounds": rounds, "inner": R}
    for k, (fn, per, nbytes) in items.items():
        best = min(times[k])
        spread = (max(times[k]) - best) / best
        out[k] = {"ms": round(best * 1e3, 4),
                  "gb_s": round(nbytes / best / 1e9, 1),
                  "spread": round(spread, 3)}
    out["quiet"] = out["copy_3d"]["gb_s"] >= 330.0
    # fixed per-call cost estimate from the R=1 vs R=8 split at each
    # size: t1 - t8 ~= (1 - 1/R) * overhead  (DMA time is size-bound)
    for n2 in sizes2:
        t1 = out[f"copy_2d_{n2}_r1"]["ms"]
        t8 = out[f"copy_2d_{n2}_r{R}"]["ms"]
        out[f"overhead_ms_{n2}"] = round((t1 - t8) / (1 - 1 / R), 4)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
