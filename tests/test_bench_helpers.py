"""Shared bench machinery (bricklib_tpu.bench.roofline).

The measurement helpers are load-bearing for the round record (bench.py
prints the judged JSON line through them), so the cheap invariants get
fast-tier coverage: pytree-aware barrier/chain semantics and the
dead-tunnel CPU-fallback guard.
"""

import sys
import time

import jax
import jax.numpy as jnp

from bricklib_tpu.bench.roofline import (barrier, chain,
                                         ensure_live_backend,
                                         preferred_platform, rep,
                                         run_bounded)


def test_ensure_live_backend_noop_on_cpu_pin():
    # conftest pins jax_platforms=cpu: the guard must not probe (probing
    # costs seconds and would claim the shared real chip) and must
    # report None ("already pinned")
    t0 = time.monotonic()
    assert ensure_live_backend() is None
    assert time.monotonic() - t0 < 1.0


def test_preferred_platform_is_first_entry():
    # the axon sitecustomize pins "axon,cpu"; only the FIRST entry
    # counts (a substring test once disabled every tunnel guard)
    assert preferred_platform() == "cpu"  # conftest pin


def test_run_bounded_completes_and_captures():
    rc, out, err = run_bounded(
        [sys.executable, "-c", "print('o'); import sys; "
                               "print('e', file=sys.stderr)"], 30)
    assert rc == 0 and out.strip() == "o" and err.strip() == "e"


def test_run_bounded_kills_on_deadline():
    # contract: hard deadline, rc None — never hangs (in-process
    # backend init on a dead tunnel blocks forever and cannot be
    # cancelled, so callers rely on this bound). Plain sleep child:
    # the probe itself would claim the shared real TPU from the test
    # tier and its outcome would depend on tunnel state.
    t0 = time.monotonic()
    rc, _, _ = run_bounded([sys.executable, "-c",
                            "import time; time.sleep(60)"], 1)
    assert rc is None
    assert time.monotonic() - t0 < 30


def test_chain_pytree_carry_and_count():
    # chain() = 1 warm-up + `it` timed dependent calls, pytree carries
    # work (the coupled-system benches time (u, v) tuples)
    calls = []

    @jax.jit
    def step(uv):
        u, v = uv
        return u + 1.0, v + 2.0

    def counted(uv):
        calls.append(1)
        return step(uv)

    x = (jnp.zeros((2, 2)), jnp.zeros((2, 2)))
    dt, (u, v) = chain(counted, x, 3)
    assert dt > 0 and len(calls) == 4
    assert float(u[0, 0]) == 4.0 and float(v[0, 0]) == 8.0


def test_rep_composes_iterations():
    f = rep(lambda d: d * 2.0, 3)
    out = f(jnp.ones((2,)))
    assert float(out[0]) == 8.0
    barrier(out)  # smoke: scalar readback on an array leaf


def test_autotune_rank_builders_construct():
    """tools/autotune.py rank builders assemble their variant tables
    without tracing (hardware-only measurement stays on the chip; this
    guards the plumbing: item shapes, data keys, SOL wiring)."""
    import importlib.util
    import types

    spec = importlib.util.spec_from_file_location(
        "autotune", "tools/autotune.py")
    at = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(at)

    args = types.SimpleNamespace(stencil="mpi7pt", domain=0,
                                 bdim="4,4,0", by="8,32")
    for rank, build, nmin in ((3, at.build_rank3, 4),
                              (2, at.build_rank2, 3),
                              (4, at.build_rank4, 3)):
        if rank == 3:
            args.domain = 32
        elif rank == 2:
            args.domain = 512
        items, datas, sols, meta = build(args, [2])
        assert len(items) >= nmin, (rank, sorted(items))
        for k, (fn, per, dk, sk) in items.items():
            assert callable(fn) and per >= 1
            assert dk in datas, (rank, k, dk)
            assert sk in sols or sk == meta["sentinel"], (rank, k, sk)
        for k, (fn, r, dk, nbytes) in sols.items():
            assert dk in datas and nbytes > 0
