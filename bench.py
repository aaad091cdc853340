#!/usr/bin/env python
"""Headline benchmark: 512^3 7pt star stencil on bricks, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` is achieved GStencil/s over the speed-of-light GStencil/s
implied by a measured HBM copy roofline (2 x 4 B moved per element) —
the BASELINE.md target ("512^3 7pt at >= 90% of HBM-bandwidth roofline").

Measurement rules learned the hard way on this runtime (see CLAUDE.md):

- the tunnel chip is multi-tenant: absolute times swing >2x between
  minutes, so the roofline copy and every kernel are measured in
  INTERLEAVED rounds and the minimum per item is kept (noise only adds
  time); vs_baseline is a ratio of adjacently-measured minima;
- the roofline copy is a Pallas DMA copy, not an XLA elementwise op —
  XLA composes chained elementwise iterations into fewer passes, which
  once inflated the "measured bandwidth" 2x;
- every chain is dependent calls ending in a scalar readback
  (block_until_ready is not a barrier here).

Reports the honest distributed configuration too: ghost bricks + SHIFT
exchange + deep-ghost ST_ITER=8 (7 ghost-inclusive sweeps + 1 owned
sweep per exchange, ref: weak/main.cpp:203-212), per-iteration.
"""

import json
import os
import sys


def _supervise() -> int:
    """Run the real bench in a BOUNDED child; rerun on CPU if it dies.

    The axon tunnel flaps: backend init can hang forever, and a
    successful subprocess probe does not protect the very next claim
    (both observed 2026-08-17).  So the only robust shape is a
    watchdog AROUND the whole measurement: one child does the real
    TPU run with a hard deadline; if it times out or fails, a second
    child repins to CPU.  Either way the driver gets its one JSON
    line (a labeled CPU number is honest; a hung zero-output round is
    not)."""
    from bricklib_tpu.bench.roofline import run_bounded

    env = dict(os.environ, BRICK_BENCH_INNER="1")
    # budget covers ~21 Mosaic first-compiles (round 4 added the
    # 125pt-MXU, strong and 2-D legs; round 5 the fused-training leg:
    # fused fwd + fused adjoint + unfused fwd/adjoint) + 4 interleaved
    # measurement rounds
    budget = int(os.environ.get("BRICK_BENCH_TPU_TIMEOUT_S", "2300"))
    rc, out, err = run_bounded([sys.executable, os.path.abspath(__file__)],
                               budget, env=env)
    if rc == 0 and out.strip():
        sys.stdout.write(out)
        return 0
    note = f"timeout>{budget}s" if rc is None else f"rc={rc}"
    # if a round-4 leg's (125pt-MXU, strong, 2-D) first compile
    # killed the full run, retry once on TPU with
    # only the round-3-proven legs so a single bad Mosaic compile
    # cannot cost the round its on-chip artifact
    if os.environ.get("BRICK_BENCH_MINIMAL") != "1":
        print(f"WARNING: TPU bench attempt failed ({note}); retrying "
              f"on TPU with the round-3-proven legs only",
              file=sys.stderr)
        sys.stderr.write(err[-2000:])
        env_min = dict(env, BRICK_BENCH_MINIMAL="1")
        rc, out, err = run_bounded(
            [sys.executable, os.path.abspath(__file__)], budget,
            env=env_min)
        if rc == 0 and out.strip():
            sys.stdout.write(out)
            return 0
        note = f"timeout>{budget}s" if rc is None else f"rc={rc}"
    print(f"WARNING: TPU bench attempt failed ({note}); "
          f"rerunning on CPU", file=sys.stderr)
    sys.stderr.write(err[-2000:])
    env["BRICK_BENCH_FORCE_CPU"] = "1"
    budget = int(os.environ.get("BRICK_BENCH_CPU_TIMEOUT_S", "2400"))
    rc, out, err = run_bounded([sys.executable, os.path.abspath(__file__)],
                               budget, env=env)
    if rc == 0 and out.strip():
        sys.stdout.write(out)
        return 0
    sys.stderr.write(err[-2000:])
    print(json.dumps({
        "metric": "7pt_512cubed_brick_stencil", "value": 0.0,
        "unit": "GStencil/s", "vs_baseline": 0.0,
        "details": {"error": f"tpu attempt {note}; cpu rerun "
                             f"{'timeout' if rc is None else rc}"}}))
    return 1


def main():
    import jax

    if os.environ.get("BRICK_BENCH_INNER") != "1":
        from bricklib_tpu.bench.roofline import preferred_platform

        if preferred_platform() != "cpu":
            return _supervise()
        # already pinned to CPU (tests / manual runs): measure inline
    elif os.environ.get("BRICK_BENCH_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    tpu_fallback = os.environ.get("BRICK_BENCH_FORCE_CPU") == "1"

    import jax.numpy as jnp

    from bricklib_tpu.bench.roofline import chain, make_dma_copy
    from bricklib_tpu.bench.roofline import rep as _rep
    from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_sweep
    from bricklib_tpu.comm import BrickDecomp, skinlist_by_name
    from bricklib_tpu.comm.exchange import exchange_shift
    from bricklib_tpu.stencils import DEFAULT_PARAMS, stencil_by_name

    on_tpu = jax.default_backend() in ("tpu", "axon")
    N = 512 if on_tpu else 64
    BD = (8, 8, N)  # pencil bricks: the TPU-canonical fast-path fold
    iters = 3 if on_tpu else 1    # outer chained jit calls per round
    R = 8 if on_tpu else 2        # sweeps inside one jit call
    rounds = 4 if on_tpu else 1
    ST_ITER = 8

    dec = BrickDecomp(dims=(N, N, N), ghost_depth=(BD[0], BD[1], 0),
                      bdims=BD).initialize(skinlist_by_name("good", 3))
    params = dict(DEFAULT_PARAMS)
    params["coeff"] = [0.03 * (c + 1) for c in range(27)]
    nb = dec.nbricks
    GK, GJ = dec.grid.shape[0], dec.grid.shape[1]

    # headline config: single-chip periodicity through the grid table
    # (zero-copy links) — ghost cells redirect to wrapped owned bricks
    # every item is an R-iteration dependent loop inside ONE jit call:
    # per-call dispatch on the tunnel costs ~1-2 ms and would otherwise
    # pollute both sides of the ratio.  Pallas calls cannot be composed
    # by XLA, so the loop measures R true passes.
    # donation policy (CLAUDE.md rule 8, re-measured in-jit this round):
    # donate ONLY the step containing the in-place exchange (helps
    # ~0.25 ms/iter); donating pure-output sweep chains COSTS
    # ~0.24 ms/iter on this runtime
    def rep(f, r=R):
        return _rep(f, r)

    tgrid = dec.periodic_grid((0, 1, 2))
    k7 = rep(pallas_pencil_sweep(
        stencil_by_name("s7pt")[0], tgrid, BD, nb, params))
    # lookahead=2: one extra window slot + one row deeper DMA prefetch.
    # Memory-bound radius-2 sweeps gain ~4% of roofline from the extra
    # transfer slack (measured; fused/VPU-bound configs gain nothing)
    k125 = rep(pallas_pencil_sweep(
        stencil_by_name("mpi125pt")[0], tgrid, BD, nb, params,
        lookahead=2))
    # MXU k-profile contraction over flat-pencil storage (the round-4
    # candidate against the 125pt >= 0.90-of-SOL gate, BASELINE.md:32):
    # the W stage runs as three small matmuls on the otherwise-idle
    # matrix unit, j-shifts become aligned lane slices
    # BRICK_BENCH_MINIMAL: round-3-proven legs only (the supervised
    # retry path when a new leg's first hardware compile kills the run)
    minimal = os.environ.get("BRICK_BENCH_MINIMAL") == "1"
    if on_tpu and not minimal:
        from bricklib_tpu.codegen.mxu_kernel import pallas_pencil_sweep_mxu

        k125mxu = rep(pallas_pencil_sweep_mxu(
            stencil_by_name("mpi125pt")[0], tgrid, BD, nb, params))
        # F=2 temporal fusion: the config that MEETS the >=0.90 gate —
        # two quiet-window campaigns (docs/AUTOTUNE_125_r05_quiet*.json,
        # copy 392.7/395.3 GB/s) read 2.80 ms/iter = 1.03-1.04x SOL,
        # and f2's absolute time is tenancy-SENSITIVE (2.8 quiet ->
        # 3.7 ms contended), i.e. DMA-bound — not the rule-11 mirage
        k125f2 = rep(pallas_pencil_sweep(
            stencil_by_name("mpi125pt")[0], tgrid, BD, nb, params,
            fuse=2))
    # bf16 items are TPU-only: on the CPU fallback they triple the
    # interpret-mode compile count for numbers nobody reads
    if on_tpu:
        k7bf = rep(pallas_pencil_sweep(
            stencil_by_name("s7pt")[0], tgrid, BD, nb, params,
            dtype=jnp.bfloat16, compute_dtype=jnp.float32))

    # fused TRAINING step (round 5): forward + exact pullback of the
    # F=4 fused linear step vs the unfused one — the linear fused
    # adjoint is the F-fused adjoint sweep, so fwd AND bwd keep the
    # 1/F HBM traffic; one call = 1 VJP covering F iterations
    if on_tpu and not minimal:
        from bricklib_tpu.codegen.autodiff import (
            differentiable_pencil_sweep)

        dk_f4 = differentiable_pencil_sweep(
            stencil_by_name("s7pt")[0], tgrid, BD, nb, params, fuse=4)
        dk_f1 = differentiable_pencil_sweep(
            stencil_by_name("s7pt")[0], tgrid, BD, nb, params,
            lookahead=2)

        TR = max(R // 2, 1)   # VJP evaluations per chained call

        def train_of(kern):
            def one(d):
                out, vjp = jax.vjp(kern, d)
                return vjp(out)[0]
            return rep(one, TR)

        train_f4, train_f1 = train_of(dk_f4), train_of(dk_f1)

    # honest distributed config — THE HEADLINE: real ghost bricks +
    # SHIFT exchange + deep-ghost ST_ITER=8 run as two temporally-FUSED
    # sweeps (fuse=4: four stencil iterations per HBM pass; the
    # reference's ST_ITER amortization carried into VMEM).  i stays
    # periodic via lane rolls.
    FUSE = 4 if on_tpu else 2
    g_skip = pallas_pencil_sweep(
        stencil_by_name("s7pt")[0], dec.grid, BD, nb, params, fuse=FUSE)
    g_ghost = pallas_pencil_sweep(
        stencil_by_name("s7pt")[0], dec.grid, BD, nb, params,
        k_range=(0, GK), j_range=(0, GJ), fuse=FUSE)

    def honest_step(d):
        d = exchange_shift(d, dec, ("x", "y", "z"), (1, 1, 1),
                           table_axes=(2,))
        for _ in range(ST_ITER // FUSE - 1):
            d = g_ghost(d)
        return g_skip(d)

    honest = jax.jit(honest_step, donate_argnums=0)

    def noex_step(d):
        for _ in range(ST_ITER // FUSE - 1):
            d = g_ghost(d)
        return g_skip(d)

    noex = jax.jit(noex_step)   # pure-output: no donation (rule 8)

    # the same honest distributed config on bfloat16 storage: HBM
    # traffic halves, so it is judged against a bf16 DMA-copy roofline
    if on_tpu:
        bkw = dict(dtype=jnp.bfloat16, compute_dtype=jnp.float32)
        gb_skip = pallas_pencil_sweep(
            stencil_by_name("s7pt")[0], dec.grid, BD, nb, params,
            fuse=FUSE, **bkw)
        gb_ghost = pallas_pencil_sweep(
            stencil_by_name("s7pt")[0], dec.grid, BD, nb, params,
            k_range=(0, GK), j_range=(0, GJ), fuse=FUSE, **bkw)

        def honest_step_bf16(d):
            d = exchange_shift(d, dec, ("x", "y", "z"), (1, 1, 1),
                               table_axes=(2,))
            for _ in range(ST_ITER // FUSE - 1):
                d = gb_ghost(d)
            return gb_skip(d)

        honest_bf16 = jax.jit(honest_step_bf16, donate_argnums=0)

    # strong-scaling leg (TPU only): the reference's canonical strong
    # config 512^3 -> 128^3-class subdomains (strong/args.cpp:32) in
    # pencil form (128, 128, 512) x 16 per chip, batched sweeps over
    # the subdomain stack + the one-kernel remote-DMA exchange
    # (self-targeted on one chip) under a flat 1-device mesh
    if on_tpu and not minimal:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from bricklib_tpu.comm.mesh import make_flat_mesh, shard_map
        from bricklib_tpu.comm.strong import (StrongDecomp,
                                              exchange_strong_remote)

        SDOM = (N // 4, N // 4, N)
        splan = StrongDecomp(dom=(N, N, N), sdom=SDOM,
                             mesh_shape=(1, 1, 1), bdims=BD,
                             ghost_depth=(BD[0], BD[1], 0)).initialize(
                                 skinlist_by_name("good", 3))
        snb = splan.sdec.nbricks
        nloc = splan.nsub_local
        skg = splan.sdec.periodic_grid((2,))
        GKs, GJs = skg.shape[0], skg.shape[1]
        s_skip = pallas_pencil_sweep(
            stencil_by_name("s7pt")[0], skg, BD, nloc * snb, params,
            batch=nloc, batch_stride=snb, fuse=FUSE)
        s_ghost = pallas_pencil_sweep(
            stencil_by_name("s7pt")[0], skg, BD, nloc * snb, params,
            batch=nloc, batch_stride=snb, fuse=FUSE,
            k_range=(0, GKs), j_range=(0, GJs))
        smesh = make_flat_mesh((1, 1, 1))

        def strong_step(b):
            x = b[0]
            x = exchange_strong_remote(x, splan, smesh.axis_names)
            flat = x.reshape((nloc * snb,) + BD)
            for _ in range(ST_ITER // FUSE - 1):
                flat = s_ghost(flat)
            flat = s_skip(flat)
            return flat.reshape(x.shape)[None]

        strong = jax.jit(shard_map(
            strong_step, smesh, P(smesh.axis_names[0]),
            P(smesh.axis_names[0])), donate_argnums=0)

    # 2-D leg (TPU only): the round-4 2-D rank's artifact number — a
    # 9pt box on whole-row pencils with the in-window F=4 trapezoid
    # fusion (MXU per-level banded matmuls), judged against its own
    # storage-shape DMA copy
    if on_tpu and not minimal:
        import numpy as _np

        from bricklib_tpu.codegen.pencil_kernel_2d import (
            pallas_pencil_sweep_2d)
        from bricklib_tpu.core import init_grid as _init_grid
        from bricklib_tpu.st import (ConstRef as _C, Grid as _G,
                                     Index as _I)
        from bricklib_tpu.st.loader import load_stencil_module as _lsm

        # 16384^2 (2 GB storage): the 4096^2 grid was 64 MB — small
        # enough that fixed per-pallas-call cost dominated its copy
        # (97 GB/s in-jit vs 459 at 16384^2 on the same quiet window,
        # tools/diag_2d_copy.py) and the round-4 "vs 2-D SOL" ratio
        # stood on that soft denominator (round-4 verdict item 1).
        # BY=32 (round 5, autotune --rank 2 BYx{f1,f2,f4} campaign):
        # taller bricks cut per-row grid overhead AND trapezoid
        # recompute (1+(F-1)*2/BY: 1.75x at BY=8 -> 1.19x at BY=32) —
        # by32_f4 5.06 ms/iter vs by8_f4 6.97 interleaved same rounds
        N2 = 16384
        BD2 = (32, N2)
        _i2, _j2 = _I(0), _I(1)
        _g2, _o2 = _G("in", 2), _G("out", 2)
        _o2(_i2, _j2).assign(
            _C("0.4") * _g2(_i2, _j2)
            + _C("0.1") * (_g2(_i2 + 1, _j2) + _g2(_i2 - 1, _j2)
                           + _g2(_i2, _j2 + 1) + _g2(_i2, _j2 - 1))
            + _C("0.02") * (_g2(_i2 + 1, _j2 + 1)
                            + _g2(_i2 - 1, _j2 + 1)
                            + _g2(_i2 + 1, _j2 - 1)
                            + _g2(_i2 - 1, _j2 - 1)))
        _sd2 = _lsm({"STENCIL": [_o2]})[0]
        grid2, info2 = _init_grid((N2 // BD2[0], 1))
        t2d = _np.asarray(grid2)[:, 0].copy()
        t2d[0], t2d[-1] = t2d[-2], t2d[1]     # periodic y table
        nb2 = info2.nbricks
        k2d_f4 = rep(pallas_pencil_sweep_2d(_sd2, t2d, BD2, nb2, {},
                                            fuse=4))
        dma_copy_2d = rep(make_dma_copy(nb2, BD2, jnp.float32))

    # composition-immune roofline: Pallas DMA copy of the same storage
    # (shared machinery: bricklib_tpu.bench.roofline)
    dma_copy = rep(make_dma_copy(nb, BD, jnp.float32,
                                 interpret=not on_tpu))
    if on_tpu:
        dma_copy_bf16 = rep(make_dma_copy(nb, BD, jnp.bfloat16))

    def fresh(seed):
        return jax.random.uniform(jax.random.PRNGKey(seed), (nb,) + BD,
                                  jnp.float32)

    # per nominal iteration: R for rep-items, ST_ITER for the honest step
    items = {"copy": (dma_copy, R), "7pt": (k7, R), "125pt": (k125, R),
             "honest": (honest, ST_ITER), "noex": (noex, ST_ITER)}
    if on_tpu:
        items.update({"7pt_bf16": (k7bf, R),
                      "copy_bf16": (dma_copy_bf16, R),
                      "honest_bf16": (honest_bf16, ST_ITER)})
        if not minimal:
            items.update({"125pt_mxu": (k125mxu, R),
                          # one fused call = 2 stencil iterations
                          "125pt_f2": (k125f2, 2 * R),
                          "strong": (strong, ST_ITER),
                          "2d_9pt_f4": (k2d_f4, 4 * R),
                          "copy_2d": (dma_copy_2d, R),
                          # per TRAINING iteration = one fwd+bwd of one
                          # stencil step; the F=4 call covers 4 of them
                          "train_f4": (train_f4, 4 * TR),
                          "train_f1": (train_f1, TR)})
    times = {k: [] for k in items}
    bufs = {k: fresh(s) for s, k in enumerate(items)}
    for k in ("7pt_bf16", "copy_bf16", "honest_bf16"):
        if k in bufs:
            bufs[k] = bufs[k].astype(jnp.bfloat16)
    if "125pt_mxu" in bufs:
        bufs["125pt_mxu"] = bufs["125pt_mxu"].reshape(
            nb, BD[0], BD[1] * BD[2])
    for k in ("2d_9pt_f4", "copy_2d"):
        if k in bufs:
            bufs[k] = jax.random.uniform(
                jax.random.PRNGKey(hash(k) % 2 ** 31),
                (nb2,) + BD2, jnp.float32)
    if "strong" in bufs:
        bufs["strong"] = jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(99),
                               (1, nloc, snb) + BD, jnp.float32),
            NamedSharding(smesh, P(smesh.axis_names[0])))
    for _ in range(rounds):
        for k, (fn, per) in items.items():
            dt, bufs[k] = chain(fn, bufs[k], iters)
            times[k].append(dt / per)
    best = {k: min(v) for k, v in times.items()}
    spread = {k: (max(v) - min(v)) / min(v) for k, v in times.items()}

    elems = N ** 3
    sol_bw = 2 * elems * 4 / best["copy"]
    sol_gst = sol_bw / (2 * 4) / 1e9
    honest_iter = best["honest"]
    noex_iter = best["noex"]
    # unclipped differential: min-of-rounds honest minus min-of-rounds
    # noex CAN go negative on this multi-tenant chip — report the raw
    # delta and both spreads so the noise floor is visible (a clipped
    # share reads as "measured zero" when it is really "below noise")
    exch_delta = honest_iter - noex_iter
    exch_share = max(0.0, exch_delta / honest_iter)
    gst = elems / honest_iter / 1e9

    print(json.dumps({
        "metric": "7pt_512cubed_brick_stencil",
        "value": round(gst, 3),
        "unit": "GStencil/s",
        "vs_baseline": round(gst / sol_gst, 4),
        "details": {
            "config": (f"ghost bricks + SHIFT exchange, ST_ITER="
                       f"{ST_ITER} as {ST_ITER // FUSE} fused sweeps "
                       f"(fuse={FUSE}), per-iteration"),
            "per_iter_ms": round(honest_iter * 1e3, 3),
            "exchange_share": round(exch_share, 4),
            "exchange_delta_ms": round(exch_delta * 1e3, 3),
            "spread_noex": round(spread["noex"], 3),
            "domain": N,
            "brick": list(BD),
            "sol_gstencil_s": round(sol_gst, 3),
            "sol_copy_gb_s": round(sol_bw / 1e9, 1),
            "spread_honest": round(spread["honest"], 3),
            "spread_copy": round(spread["copy"], 3),
            "rounds": rounds,
            "plain_sweep": {
                "gstencil_s": round(elems / best["7pt"] / 1e9, 3),
                "sweep_ms": round(best["7pt"] * 1e3, 3),
                "vs_sol": round(best["copy"] / best["7pt"], 4),
            },
            "125pt_gstencil_s": round(elems / best["125pt"] / 1e9, 3),
            "125pt_step_ms": round(best["125pt"] * 1e3, 3),
            "125pt_vs_sol": round(best["copy"] / best["125pt"], 4),
            **({"125pt_mxu_step_ms": round(best["125pt_mxu"] * 1e3, 3),
                "125pt_mxu_vs_sol": round(
                    best["copy"] / best["125pt_mxu"], 4),
                } if "125pt_mxu" in best else {}),
            **({"125pt_f2_step_ms": round(best["125pt_f2"] * 1e3, 3),
                "125pt_f2_vs_sol": round(
                    best["copy"] / best["125pt_f2"], 4),
                } if "125pt_f2" in best else {}),
            **({"pencil_2d": {
                    "config": (f"{N2}^2 9pt box, fuse=4, brick "
                               f"({BD2[0]}, {N2})"),
                    "gstencil_s": round(
                        N2 * N2 / best["2d_9pt_f4"] / 1e9, 3),
                    "per_iter_ms": round(best["2d_9pt_f4"] * 1e3, 3),
                    "vs_2d_sol": round(
                        best["copy_2d"] / best["2d_9pt_f4"], 4),
                    "sol_copy_2d_gb_s": round(
                        2 * N2 * N2 * 4 / best["copy_2d"] / 1e9, 1),
                }} if "2d_9pt_f4" in best else {}),
            **({"training": {
                    "config": ("7pt fwd+exact-VJP per stencil step; "
                               "f4 = one fused fwd + fused adjoint "
                               "sweep covering 4 steps"),
                    "f4_per_iter_ms": round(best["train_f4"] * 1e3, 3),
                    "f1_per_iter_ms": round(best["train_f1"] * 1e3, 3),
                    "fused_speedup": round(
                        best["train_f1"] / best["train_f4"], 3),
                }} if "train_f4" in best else {}),
            # strong vs_sol is judged against the WEAK-storage ideal
            # stencil rate, so ghost-shell read amplification counts
            # as real strong-decomposition overhead
            **({"strong": {
                    "config": (f"{N}^3 -> {N // 4}x{N // 4}x{N} x "
                               f"16/chip, remote exchange, ST_ITER="
                               f"{ST_ITER} fused {FUSE}"),
                    "gstencil_s": round(elems / best["strong"] / 1e9, 3),
                    "per_iter_ms": round(best["strong"] * 1e3, 3),
                    "vs_sol": round(best["copy"] / best["strong"], 4),
                }} if "strong" in best else {}),
            **({"bf16_sweep_gstencil_s": round(
                    elems / best["7pt_bf16"] / 1e9, 3),
                "bf16_honest": {
                    "gstencil_s": round(
                        elems / best["honest_bf16"] / 1e9, 3),
                    "per_iter_ms": round(best["honest_bf16"] * 1e3, 3),
                    "vs_bf16_sol": round(
                        best["copy_bf16"] / best["honest_bf16"], 4),
                    "sol_copy_gb_s": round(
                        2 * elems * 2 / best["copy_bf16"] / 1e9, 1),
                }} if on_tpu else {}),
            "backend": jax.default_backend(),
            # True: the supervised TPU attempt died and this is the
            # CPU rerun (see _supervise)
            "tpu_fallback": tpu_fallback,
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
