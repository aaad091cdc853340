#!/usr/bin/env python
"""Quiet-chip autotuner: measure schedule variants against an
adjacently-measured DMA-copy roofline, refusing to conclude from a
contended window.

The axon chip is multi-tenant and VMEM/VPU-bound kernels keep their
absolute time under tenant HBM contention while the copy roofline (and
every DMA-bound kernel) degrades ~2x — so an interleaved vs-copy ratio
measured on a busy chip can inflate by 2x for compute-bound variants
(CLAUDE.md rule 11; a 125pt fuse=2 config once "measured" 1.39x SOL
busy but is 0.7x quiet).  This tool encodes the discipline:

1. measure the copy roofline; a window is QUIET when the quiet
   SENTINEL (the 512^3 3-D storage DMA copy — large enough that fixed
   per-call cost is negligible) hits ``--quiet-gbs`` (default 330
   GB/s, the known quiet-chip floor);
2. interleave variants with the copy, min-of-rounds, in-jit chains
   with scalar-readback barriers (rules 0/1);
3. only report ``vs_sol`` verdicts from rounds whose adjacent copy was
   quiet; otherwise retry up to ``--max-wait`` seconds and, failing
   that, mark every ratio ``contended`` so nobody wires it in.

Ranks (round-5: one tool tunes every rank's schedule):

- ``--rank 3`` (default): ``--stencil`` x {la1, la2, fuse F in
  --fuse-list that fit the brick, mxu (125pt), la2_bf16 (bf16 storage,
  f32 compute, judged vs the bf16 copy SOL)}.
- ``--rank 2``: the bench's 9pt box on (BY, N) row pencils for each
  BY in ``--by`` x {f1, trapezoid F in --fuse-list} (+ f1_bf16 at the
  first BY); default domain 16384 (the 4096^2 config's copy was
  fixed-cost-dominated, tools/diag_2d_copy) and BY 8,32,64 (taller
  bricks cut per-row grid overhead and trapezoid recompute).
- ``--rank 4``: mpi9pt at the bench_4d config (brick (4,8,8,512),
  interior (16,64,128,512)) x {la1, la2, f2}; F=4 excluded (Mosaic
  compile hangs at this size, CLAUDE.md).  vs_sol is generous here
  (the same-storage copy moves ghost bricks the sweep never writes —
  see tools/bench_4d.py's bracket discussion).

The reference's tuning story is compile-time (MSIZE/THRES scans in the
SC'19 codegen, ref: codegen/st/codegen/base.py:108-170; per-ISA VFOLD
choices, ref: stencils/cpuvfold.h:8-42); on TPU the schedule is a
trace-time choice, so tuning is a runtime measurement loop instead.

    python tools/autotune.py --stencil mpi13pt --domain 512
    python tools/autotune.py --stencil mpi125pt --fuse-list 2,4
    python tools/autotune.py --rank 2
    python tools/autotune.py --rank 4 --rounds 3
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_rank3(args, fuse_list):
    """3-D variants over the --stencil: {la1, la2, fF, mxu, la2_bf16}.
    Returns (items, datas, sols, meta); items: name -> (fn,
    iters_per_call, data_key, sol_key)."""
    import jax.numpy as jnp
    import numpy as np

    from bricklib_tpu.api import _passes
    from bricklib_tpu.bench.roofline import make_dma_copy, rep
    from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_sweep
    from bricklib_tpu.comm import BrickDecomp, skinlist_by_name
    from bricklib_tpu.stencils import bench_params, stencil_by_name

    R = 8
    N = args.domain or 512
    bk, bj, bi = (int(x) for x in args.bdim.split(","))
    BD = (bk, bj, bi or N)
    params = bench_params()
    dec = BrickDecomp(dims=(N, N, N), ghost_depth=(BD[0], BD[1], 0),
                      bdims=BD).initialize(skinlist_by_name("good", 3))
    nb = dec.nbricks
    sd = stencil_by_name(args.stencil)[0]
    lo, hi = sd.radius()
    rad = max(max(lo), max(hi))
    tgrid = dec.periodic_grid((0, 1, 2))

    datas = {"f32": np.random.default_rng(0).standard_normal(
        (nb,) + BD).astype(np.float32)}
    datas["flat"] = datas["f32"].reshape(nb, BD[0], BD[1] * BD[2])
    datas["bf16"] = datas["f32"].astype(jnp.bfloat16)
    items = {
        "la1": (rep(pallas_pencil_sweep(sd, tgrid, BD, nb, params),
                    R), R, "f32", "copy"),
        "la2": (rep(pallas_pencil_sweep(sd, tgrid, BD, nb, params,
                                        lookahead=2), R), R, "f32",
                "copy"),
    }
    for F in fuse_list:
        if F * rad > min(BD[0], BD[1]):
            print(f"# fuse={F}: {F}x radius {rad} exceeds brick "
                  f"{BD[:2]} — skipped", file=sys.stderr)
            continue
        items[f"f{F}"] = (rep(pallas_pencil_sweep(
            sd, tgrid, BD, nb, params, fuse=F), R), F * R, "f32",
            "copy")
    try:
        from bricklib_tpu.codegen.mxu_kernel import pallas_pencil_sweep_mxu

        # MXU k-profile contraction over flat-pencil storage (the
        # round-4 125pt >= 0.90 gate candidate); runs on a reshaped
        # copy of the same data, made once outside the timed chain
        items["mxu"] = (rep(pallas_pencil_sweep_mxu(
            sd, tgrid, BD, nb, params), R), R, "flat", "copy")
    except NotImplementedError as e:
        print(f"# mxu: {e} — skipped", file=sys.stderr)
    # bf16 STORAGE, f32 compute (the honest halved-traffic config the
    # 7pt bf16_honest bench item already ships) — judged against the
    # bf16 copy SOL (round-4 verdict item 3: the last unmeasured
    # honest config of the 125pt >= 0.90 gate)
    items["la2_bf16"] = (rep(pallas_pencil_sweep(
        sd, tgrid, BD, nb, params, lookahead=2, dtype=jnp.bfloat16),
        R), R, "bf16", "copy_bf16")
    sols = {
        "copy": (rep(make_dma_copy(nb, BD, jnp.float32), R), R, "f32",
                 2 * nb * int(np.prod(BD)) * 4),
        "copy_bf16": (rep(make_dma_copy(nb, BD, jnp.bfloat16), R), R,
                      "bf16", 2 * nb * int(np.prod(BD)) * 2),
    }
    meta = {"stencil": args.stencil, "domain": N, "brick": list(BD),
            "vpu_passes": _passes(sd, params), "sentinel": "copy"}
    return items, datas, sols, meta


def build_rank2(args, fuse_list):
    """2-D bench-config 9pt box on (BY, N) row pencils: {f1, trapezoid
    fF} per ``--by`` brick depth, plus f1_bf16 at the first BY, vs the
    2-D storage copy.  Taller bricks cut BOTH the per-row pallas-grid
    overhead (GY = N/BY steps) and the trapezoid recompute
    amplification ``1 + (F-1)*(lo+hi)/BY`` — the round-5 lever for the
    honest-denominator 2-D ratio."""
    import jax.numpy as jnp
    import numpy as np

    from bricklib_tpu.bench.roofline import make_dma_copy, rep
    from bricklib_tpu.codegen.pencil_kernel_2d import (
        pallas_pencil_sweep_2d)
    from bricklib_tpu.core import init_grid
    from bricklib_tpu.st import ConstRef, Grid, Index
    from bricklib_tpu.st.loader import load_stencil_module

    R = 8
    N2 = args.domain or 16384
    by_list = [int(b) for b in args.by.split(",") if b]
    i, j = Index(0), Index(1)
    g, o = Grid("in", 2), Grid("out", 2)
    o(i, j).assign(
        ConstRef("0.4") * g(i, j)
        + ConstRef("0.1") * (g(i + 1, j) + g(i - 1, j)
                             + g(i, j + 1) + g(i, j - 1))
        + ConstRef("0.02") * (g(i + 1, j + 1) + g(i - 1, j + 1)
                              + g(i + 1, j - 1) + g(i - 1, j - 1)))
    sd = load_stencil_module({"STENCIL": [o]})[0]
    items, datas, sols = {}, {}, {}
    for n_by, BY in enumerate(by_list):
        BD = (BY, N2)
        grid2, info2 = init_grid((N2 // BY, 1))
        t2d = np.asarray(grid2)[:, 0].copy()
        t2d[0], t2d[-1] = t2d[-2], t2d[1]     # periodic y table
        nb = info2.nbricks
        dk = f"f32_by{BY}"
        datas[dk] = np.random.default_rng(1).standard_normal(
            (nb,) + BD).astype(np.float32)
        ck = f"copy_by{BY}"
        sols[ck] = (rep(make_dma_copy(nb, BD, jnp.float32), R), R, dk,
                    2 * nb * BY * N2 * 4)
        items[f"by{BY}_f1"] = (rep(pallas_pencil_sweep_2d(
            sd, t2d, BD, nb, {}), R), R, dk, ck)
        for F in fuse_list:
            if F > BY:    # trapezoid needs F * rad <= BY (rad = 1)
                print(f"# fuse={F} exceeds BY={BY} — skipped",
                      file=sys.stderr)
                continue
            items[f"by{BY}_f{F}"] = (rep(pallas_pencil_sweep_2d(
                sd, t2d, BD, nb, {}, fuse=F), R), F * R, dk, ck)
        if n_by == 0:     # bf16 honest config at the first BY only
            datas[f"bf16_by{BY}"] = datas[dk].astype(jnp.bfloat16)
            sols[f"copy_bf16_by{BY}"] = (
                rep(make_dma_copy(nb, BD, jnp.bfloat16), R), R,
                f"bf16_by{BY}", 2 * nb * BY * N2 * 2)
            items[f"by{BY}_f1_bf16"] = (rep(pallas_pencil_sweep_2d(
                sd, t2d, BD, nb, {}, dtype=jnp.bfloat16), R), R,
                f"bf16_by{BY}", f"copy_bf16_by{BY}")
    meta = {"stencil": "9pt_box_2d", "domain": N2,
            "by_list": by_list, "sentinel": "sentinel_3d"}
    return items, datas, sols, meta


def build_rank4(args, fuse_list):
    """4-D mpi9pt at the bench_4d config: {la1, la2, f2} vs the same-
    storage copy (generous — ghost-brick inflation ~2x, see
    tools/bench_4d.py)."""
    import jax.numpy as jnp
    import numpy as np

    from bricklib_tpu.bench.roofline import make_dma_copy, rep
    from bricklib_tpu.codegen.pencil_kernel_4d import (
        pallas_pencil_sweep_4d)
    from bricklib_tpu.core import init_grid
    from bricklib_tpu.stencils import DEFAULT_PARAMS, stencil_by_name

    R = 4
    BD = (4, 8, 8, 512)
    G = (6, 10, 18, 1)
    grid, info = init_grid(G)
    nb = info.nbricks
    sd = stencil_by_name("mpi9pt")[0]
    params = dict(DEFAULT_PARAMS)

    datas = {"f32": np.random.default_rng(2).standard_normal(
        (nb,) + BD).astype(np.float32)}
    items = {
        "la1": (rep(pallas_pencil_sweep_4d(sd, grid, BD, nb, params),
                    R), R, "f32", "copy"),
        "la2": (rep(pallas_pencil_sweep_4d(sd, grid, BD, nb, params,
                                           lookahead=2), R), R, "f32",
                "copy"),
    }
    for F in fuse_list:
        if F != 2:
            # F=4's Mosaic compile hangs >9 min at 512-class sizes and
            # its w-recompute amplification cannot pay (CLAUDE.md)
            print(f"# 4-D fuse={F}: only F=2 is tuned (F=4 compile "
                  f"hangs at this size) — skipped", file=sys.stderr)
            continue
        items["f2"] = (rep(pallas_pencil_sweep_4d(
            sd, grid, BD, nb, params, fuse=2), R), 2 * R, "f32",
            "copy")
    sols = {"copy": (rep(make_dma_copy(nb, BD, jnp.float32), R), R,
                     "f32", 2 * nb * int(np.prod(BD)) * 4)}
    meta = {"stencil": "mpi9pt", "domain": list(G), "brick": list(BD),
            "sentinel": "sentinel_3d",
            "note": ("vs_sol is generous: the same-storage copy moves "
                     "ghost bricks the sweep never writes "
                     "(tools/bench_4d.py brackets this)")}
    return items, datas, sols, meta


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="quiet-chip schedule autotuner")
    ap.add_argument("--rank", type=int, default=3, choices=(2, 3, 4))
    ap.add_argument("--stencil", default="mpi7pt",
                    help="rank-3 stencil name (ranks 2/4 are fixed "
                         "bench configs)")
    ap.add_argument("--domain", type=int, default=0,
                    help="domain edge (default: 512 rank 3, 16384 "
                         "rank 2; rank 4 is fixed)")
    ap.add_argument("--bdim", default="8,8,0",
                    help="rank-3 BK,BJ,BI (BI 0 = full-domain pencil)")
    ap.add_argument("--fuse-list", default="2,4")
    ap.add_argument("--by", default="8,32,64",
                    help="rank-2 brick depths BY to cross with the "
                         "fuse list (taller = less trapezoid "
                         "recompute + fewer grid steps)")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--quiet-gbs", type=float, default=330.0,
                    help="sentinel copy bandwidth that counts as a "
                         "quiet chip")
    ap.add_argument("--max-wait", type=float, default=600.0,
                    help="seconds to keep retrying for a quiet window")
    ap.add_argument("--json", dest="as_json", action="store_true")
    args = ap.parse_args(argv)

    sys.path.insert(0, __file__.rsplit("/", 2)[0])

    from bricklib_tpu.bench.roofline import ensure_live_backend

    if ensure_live_backend() is False:
        # quiet-chip tuner: CPU numbers cannot produce a schedule
        # verdict, and the copy roofline is a hardware Pallas kernel —
        # fail fast like tpu_smoke instead of crashing at first trace
        print("ERROR: TPU backend init dead/hung; autotune needs the "
              "real chip — retry when the tunnel answers",
              file=sys.stderr)
        return 2

    import jax.numpy as jnp
    import numpy as np

    from bricklib_tpu.bench.roofline import chain, make_dma_copy, rep

    fuse_list = [int(x) for x in args.fuse_list.split(",") if x]
    build = {2: build_rank2, 3: build_rank3, 4: build_rank4}[args.rank]
    items, datas, sols, meta = build(args, fuse_list)
    datas = {k: jnp.asarray(v) for k, v in datas.items()}

    # quiet SENTINEL: ranks whose own storage is small (2-D/4-D) gate
    # quietness on a 512^3 3-D copy measured in the same rounds — the
    # large DMA-bound transfer is the reliable chip-state probe
    if meta["sentinel"] == "sentinel_3d":
        snb, sBD = (512 // 8) ** 2, (8, 8, 512)
        sols["sentinel_3d"] = (
            rep(make_dma_copy(snb, sBD, jnp.float32), 2), 2,
            "sentinel_3d", 2 * snb * 8 * 8 * 512 * 4)
        datas["sentinel_3d"] = jnp.asarray(
            np.random.default_rng(3).standard_normal(
                (snb,) + sBD).astype(np.float32))
    sentinel = meta["sentinel"]

    def timed(f, d, r):
        # 3 BACK-TO-BACK timed calls after one warmup (bench.py's
        # protocol): chained dependent dispatches pipeline, so
        # per-call dispatch latency amortizes to ~D/3 instead of D —
        # with the tunnel's D ~10 ms a single-call timing under-read
        # the 512^3 copy by ~30% and the quiet gate NEVER fired while
        # bench (3-call chains) read 368-380 GB/s in the same hours
        # (docs/BENCH_onchip_r05.md anomaly, now explained)
        dt, _ = chain(f, d, 3)
        return dt / r

    best = {k: (float("inf"), False) for k in items}
    best_sol = {k: float("inf") for k in sols}
    t_start = time.perf_counter()
    rnd = 0
    quiet_rounds = 0
    while True:
        for k, (f, r, dk, nbytes) in sols.items():
            best_sol[k] = min(best_sol[k], timed(f, datas[dk], r))
        sf, sr, sdk, sbytes = sols[sentinel]
        sent_s = timed(sf, datas[sdk], sr)
        best_sol[sentinel] = min(best_sol[sentinel], sent_s)
        q = sbytes / sent_s / 1e9 >= args.quiet_gbs
        quiet_rounds += q
        for k, (f, per, dk, _sk) in items.items():
            dt = timed(f, datas[dk], per)
            if dt < best[k][0]:
                best[k] = (dt, q)
            print(f"# r{rnd} {k}: {dt*1e3:.3f} ms/iter "
                  f"(sentinel {sbytes / sent_s / 1e9:.0f} GB/s, "
                  f"{'quiet' if q else 'contended'})",
                  file=sys.stderr, flush=True)
        rnd += 1
        elapsed = time.perf_counter() - t_start
        if rnd >= args.rounds and (quiet_rounds >= 2
                                   or elapsed > args.max_wait):
            break

    res = dict(meta)
    res.pop("sentinel", None)
    res.update({
        "rank": args.rank,
        "quiet_rounds": quiet_rounds, "rounds": rnd,
        "variants": {},
    })
    for k, (f, r, dk, nbytes) in sols.items():
        if k == "sentinel_3d":
            res["sentinel_3d_gb_s"] = round(
                nbytes / best_sol[k] / 1e9, 1)
        else:
            res[f"sol_{k}_gb_s"] = round(nbytes / best_sol[k] / 1e9, 1)
    winner, wtime = None, float("inf")
    for k, (dt, q) in best.items():
        sk = items[k][3]
        res["variants"][k] = {
            "ms_per_iter": round(dt * 1e3, 3),
            "vs_sol": round(best_sol[sk] / dt, 4),
            "quiet": bool(q and quiet_rounds >= 2),
        }
        if sk != "copy":
            res["variants"][k]["sol"] = sk
        if dt < wtime:
            winner, wtime = k, dt
    res["winner"] = winner
    res["verdict"] = ("ok" if quiet_rounds >= 2 else
                      "contended: ratios unreliable for compute-bound "
                      "variants (CLAUDE.md rule 11)")
    print(json.dumps(res) if args.as_json
          else json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
