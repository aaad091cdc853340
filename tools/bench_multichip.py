#!/usr/bin/env python
"""One-command multi-chip exchange/overlap measurement.

Measures, on whatever device mesh it finds (real TPU chips when
present; ``--cpu N`` re-execs onto N virtual CPU host devices — the
reference's single-box ``mpirun -np N`` CI trick):

- the HONEST distributed step (SHIFT ghost exchange + ST_ITER sweeps,
  one jit), per-iteration;
- the same step with the exchange removed -> **exchange share**
  (the <10%-overlap gate of BASELINE.md:33 is judged on this number);
- the exchange alone (calltime+waittime analog — ICI/DCN collectives
  have no pack phase, the layout is pack-free by construction);
- the FUSED exchange-in-sweep form (remote DMAs overlapped with the
  first sweep's interior k-stream) when the config supports it ->
  **overlap benefit** = shift-form step minus fused-form step.

Emits one JSON object with the reference's phase taxonomy
(packtime/calltime/waittime/movetime/calctime, min/avg/max/sigma —
ref: include/brick-mpi.h:23,758-793; weak/main.cpp:229-251) and the
derived GStencil/s.  Protocol: MPI_ITER=25 dependent-chained
iterations after warm-up (ref: stencils/fake.h:393-404).

    python tools/bench_multichip.py                 # real mesh
    python tools/bench_multichip.py --cpu 8         # CI dryrun
    python tools/bench_multichip.py --mesh 4,2,1 --domain 64,64,512
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", type=int, metavar="N", default=0,
                    help="run on N virtual CPU host devices (CI mode)")
    ap.add_argument("--mesh", default=None,
                    help="mesh shape mz,my,mx (default: all devices "
                         "along the outermost axis)")
    ap.add_argument("--slices", type=int, default=1,
                    help="multi-slice (DCN) topology: slices x ICI "
                         "mesh, slice axis composed with domain axis 0")
    ap.add_argument("--domain", default=None,
                    help="PER-DEVICE owned elements kz,ky,kx (default "
                         "64,64,512 on TPU / 16,16,32 on CPU — the "
                         "reference's 64^3-per-rank weak default, "
                         "weak/args.cpp:82-86)")
    ap.add_argument("--stencil", default="s7pt")
    ap.add_argument("--st-iter", type=int, default=8)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--no-fused", action="store_true",
                    help="skip the fused-exchange overlap leg (its "
                         "interpret-mode compile dominates CPU dryruns)")
    ap.add_argument("--json", dest="as_json", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu and os.environ.get("BRICK_MC_REEXEC") != "1":
        # host device count must be fixed before jax initializes; the
        # image's sitecustomize pins the axon platform, so re-exec
        env = dict(os.environ)
        env["BRICK_MC_REEXEC"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_"
                                f"device_count={args.cpu}").strip()
        return subprocess.call([sys.executable, os.path.abspath(
            __file__)] + [a for a in (argv or sys.argv[1:])], env=env)

    sys.path.insert(0, __file__.rsplit("/", 2)[0])

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from bricklib_tpu.bench.roofline import ensure_live_backend

        if ensure_live_backend() is False:
            print("ERROR: TPU backend dead/hung; use --cpu N for the "
                  "CI dryrun or retry when the tunnel answers",
                  file=sys.stderr)
            return 2

    import numpy as np
    import jax.numpy as jnp

    from bricklib_tpu.bench.timing import (PhaseTimers, mpi_statistics,
                                           time_mpi)
    from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_sweep
    from bricklib_tpu.comm import BrickDecomp, skinlist_by_name
    from bricklib_tpu.comm.exchange import exchange_shift
    from bricklib_tpu.comm.mesh import (make_domain_mesh, make_flat_mesh,
                                        shard_map)
    from bricklib_tpu.stencils import bench_params, stencil_by_name

    ndev = len(jax.devices())
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if args.mesh:
        mesh_shape = tuple(int(x) for x in args.mesh.split(","))
    else:
        mesh_shape = (ndev, 1, 1)
    slices = max(1, int(args.slices))
    eff_shape = (slices * mesh_shape[0],) + mesh_shape[1:]
    n = int(np.prod(eff_shape))
    if n > ndev:
        print(f"ERROR: {slices} slices x mesh {mesh_shape} needs {n} "
              f"devices, have {ndev}", file=sys.stderr)
        return 2
    if args.domain:
        dims = tuple(int(x) for x in args.domain.split(","))
    else:
        dims = (64, 64, 512) if on_tpu else (16, 16, 32)
    BD = (8, 8, dims[2]) if on_tpu else (4, 4, dims[2])
    interp = not on_tpu
    params = bench_params()
    sd = stencil_by_name(args.stencil)[0]
    ST = args.st_iter

    dec = BrickDecomp(dims=dims, ghost_depth=(BD[0], BD[1], 0),
                      bdims=BD).initialize(skinlist_by_name("good", 3))
    nb = dec.nbricks
    GK, GJ = dec.grid.shape[0], dec.grid.shape[1]
    table_axes = tuple(a for a in range(3) if eff_shape[a] == 1)
    kgrid = dec.periodic_grid(table_axes)
    if slices > 1:
        from bricklib_tpu.comm.mesh import make_multislice_mesh

        mesh, xnames, _eff = make_multislice_mesh(slices, mesh_shape)
    else:
        mesh = make_domain_mesh(mesh_shape)
        xnames = mesh.axis_names
    names = mesh.axis_names
    from jax.sharding import NamedSharding, PartitionSpec as P
    P_ = P(tuple(names))

    def rng(skip):
        return dict(k_range=((1, GK - 1) if 0 in table_axes
                             else (skip, GK - skip)),
                    j_range=((1, GJ - 1) if 1 in table_axes
                             else (skip, GJ - skip)))

    k_skip = pallas_pencil_sweep(sd, kgrid, BD, nb, params,
                                 interpret=interp, **rng(1))
    k_ghost = pallas_pencil_sweep(sd, kgrid, BD, nb, params,
                                  interpret=interp, **rng(0))

    def honest(d):
        d = exchange_shift(d, dec, xnames, eff_shape,
                           table_axes=table_axes, interpret=interp)
        for _ in range(ST - 1):
            d = k_ghost(d)
        return k_skip(d)

    def noex(d):
        for _ in range(ST - 1):
            d = k_ghost(d)
        return k_skip(d)

    def exch_only(d):
        return exchange_shift(d, dec, xnames, eff_shape,
                              table_axes=table_axes, interpret=interp)

    def wrap(f, donate=False):
        g = shard_map(f, mesh, P_, P_)
        return jax.jit(g, **(dict(donate_argnums=0) if donate else {}))

    sharding = NamedSharding(mesh, P_)
    rng_ = np.random.default_rng(0)

    def fresh():
        return jax.device_put(jnp.asarray(rng_.standard_normal(
            (n * nb,) + BD).astype(np.float32)), sharding)

    legs = {
        "honest": (wrap(honest, donate=True), ST),
        "noex": (wrap(noex), ST),
        "exchange": (wrap(exch_only, donate=True), 1),
    }

    # fused exchange-in-sweep (overlap form): ICI single-level meshes,
    # distributed, single linear input
    fused_ok = len(table_axes) < 3 and not args.no_fused and slices == 1
    if fused_ok:
        try:
            from bricklib_tpu.codegen.fused_exchange import (
                pallas_pencil_sweep_fusedx)
            from bricklib_tpu.comm.exchange import put_plan, put_send_ids

            plan = put_plan(dec, mesh_shape, table_axes)
            fx = pallas_pencil_sweep_fusedx(
                sd, kgrid, BD, nb, plan, mesh_shape, params,
                interpret=interp, **rng(0 if ST > 1 else 1))
            fmesh = make_flat_mesh(mesh_shape)

            def fused_step(d):
                d, _ = fx(d, put_send_ids(plan, mesh_shape,
                                          fmesh.axis_names[0]))
                for _ in range(ST - 2):
                    d = k_ghost(d)
                return k_skip(d) if ST > 1 else d

            legs["honest_fused"] = (jax.jit(shard_map(
                fused_step, fmesh, P(fmesh.axis_names[0]),
                P(fmesh.axis_names[0])), donate_argnums=0), ST)
        except (NotImplementedError, ValueError) as e:
            print(f"# fused form skipped: {e}", file=sys.stderr)

    res_legs = {}
    samples = {}
    for name, (fn, per) in legs.items():
        avg, samp = time_mpi(fn, fresh(), iters=args.iters)
        res_legs[name] = avg / per
        samples[name] = [s / per for s in samp]

    t = PhaseTimers()
    # pack-free layout (the reference's central claim is the TPU
    # default) and no host staging: pack/move are structurally zero
    t.calltime = res_legs["exchange"]
    t.calctime = res_legs["noex"]
    t.waittime = max(0.0, res_legs["honest"] - res_legs["noex"]
                     - res_legs["exchange"])
    t.samples["calltime"] = samples["exchange"]
    t.samples["calctime"] = samples["noex"]

    elems = n * int(np.prod(dims))
    honest_it = res_legs["honest"]
    share = max(0.0, (honest_it - res_legs["noex"]) / honest_it)
    out = {
        "devices": n, "mesh": list(mesh_shape), "slices": slices,
        "backend": jax.default_backend(),
        "domain_per_device": list(dims), "brick": list(BD),
        "stencil": args.stencil, "st_iter": ST, "iters": args.iters,
        "per_iter_ms": round(honest_it * 1e3, 3),
        "gstencil_s": round(elems / honest_it / 1e9, 3),
        "exchange_share": round(share, 4),
        "exchange_ms": round(res_legs["exchange"] * 1e3, 3),
        "noex_ms": round(res_legs["noex"] * 1e3, 3),
        **({"fused_per_iter_ms": round(
                res_legs["honest_fused"] * 1e3, 3),
            "overlap_benefit_ms": round(
                (res_legs["honest"] - res_legs["honest_fused"]) * 1e3,
                3)} if "honest_fused" in res_legs else {}),
        "phases": t.report(),
        "honest_spread": mpi_statistics(samples["honest"]),
        "gate": {"target_exchange_share": 0.10,
                 "met": bool(share < 0.10),
                 "note": ("CPU dryrun: shares are not hardware "
                          "evidence" if not on_tpu else
                          "real-mesh measurement")},
    }
    print(json.dumps(out) if args.as_json else json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
