"""Shared measurement machinery for the multi-tenant axon chip.

One home for the load-bearing pieces every perf tool repeats (CLAUDE.md
rules 0/1 — learned the hard way):

- :func:`barrier` — scalar-readback execution barrier
  (``block_until_ready`` is NOT a barrier on this runtime; a
  ravel/sum would dispatch a full-array relayout inside the timed
  region, so it indexes one element);
- :func:`chain` — dependent-call timing loop ending in that barrier;
- :func:`rep` — R iterations INSIDE one jit call (per-dispatch costs
  ~1-2 ms on the tunnel and would pollute both sides of any ratio);
- :func:`make_dma_copy` — the composition-immune Pallas DMA copy
  roofline (XLA composes chained elementwise iterations into fewer
  passes: an ``x+1`` loop once "measured" 827 GB/s on a ~430 GB/s
  chip).

Used by ``bench.py``, ``tools/autotune.py`` and ``tools/bench_4d.py``;
a fix here (chunking, vmem limit, barrier discipline) fixes all three.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def run_bounded(argv, timeout_s: int, env=None, cwd=None):
    """Run a child process with a HARD deadline; returns
    ``(returncode_or_None, stdout, stderr)`` (None = killed on
    timeout).

    Not ``subprocess.run(capture_output=True, timeout=...)``: that
    blocks FOREVER after killing the child if anything the child
    spawned still holds the stdout/stderr pipes (post-kill
    ``communicate()`` waits for EOF, and the axon sitecustomize path
    can leave such processes behind — observed 2026-08-17: a dryrun
    parent sat 80+ s past its own timeout in epoll).  IO goes to temp
    files instead of pipes, and the kill targets the child's whole
    process group (``start_new_session``), never a name pattern."""
    import signal
    import tempfile

    with tempfile.TemporaryFile() as fo, tempfile.TemporaryFile() as fe:
        p = subprocess.Popen(argv, stdout=fo, stderr=fe, env=env,
                             cwd=cwd, start_new_session=True)
        try:
            rc = p.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except OSError:
                pass
            try:
                # bounded reap: a child stuck in uninterruptible kernel
                # sleep swallows even SIGKILL until its syscall returns,
                # and an unbounded wait would resurrect the hang this
                # helper exists to prevent
                p.wait(timeout=30)
            except subprocess.TimeoutExpired:
                pass
            rc = None
        fo.seek(0)
        fe.seek(0)
        return (rc, fo.read().decode(errors="replace"),
                fe.read().decode(errors="replace"))


def preferred_platform() -> str:
    """First entry of the platform priority list, without initializing
    any backend.  CAREFUL: the axon sitecustomize pins jax_platforms to
    ``"axon,cpu"`` — a substring test for "cpu" reads that as
    CPU-pinned and silently disables every tunnel guard (it did,
    2026-08-17); only the first entry is the preferred platform."""
    import jax

    platforms = str(getattr(jax.config, "jax_platforms", None)
                    or os.environ.get("JAX_PLATFORMS") or "")
    return platforms.split(",")[0].strip().lower()


def device_init_ok(timeout_s: int) -> bool:
    """Probe default-backend init in a SUBPROCESS.

    The axon tunnel can hang indefinitely at backend init (observed
    2026-08-17: ``jax.devices()`` blocked >10 min while the chip was
    unreachable) — and a hung init in-process cannot be cancelled, so
    the probe must be a child process.  NOTE a positive probe is no
    guarantee for the caller's own init: the tunnel flaps (a 20 s
    probe succeeded while the very next claim hung), which is why
    bench.py supervises its real work in a bounded child instead of
    trusting this probe."""
    rc, _, _ = run_bounded(
        [sys.executable, "-c", "import jax; jax.devices()"], timeout_s)
    return rc == 0


def ensure_live_backend():
    """CPU-fallback guard for entry points the round driver runs
    unattended: if the configured platform is TPU but backend init is
    hung/dead, repin to CPU so the caller completes with a labeled
    CPU result instead of hanging with zero output.

    Returns None when already pinned to CPU, else the probe verdict.
    Probe budget: ``BRICK_BENCH_PROBE_S`` (default 420 s; a healthy
    tunnel answers in well under a minute)."""
    import jax

    if preferred_platform() == "cpu":
        return None
    ok = device_init_ok(int(os.environ.get("BRICK_BENCH_PROBE_S",
                                           "420")))
    if not ok:
        jax.config.update("jax_platforms", "cpu")
    return ok


def barrier(out):
    """Scalar-readback execution barrier (pytree-aware: reads one
    element of the first leaf — with dependent chains that is enough,
    every earlier step is ordered before it)."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf[(0,) * leaf.ndim])


def chain(fn, x, it):
    """(avg seconds, last output) for a dependent chain with a scalar
    readback barrier; donation-safe (never reuses a consumed buffer)."""
    out = fn(x)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(it):
        out = fn(out)
    barrier(out)
    return (time.perf_counter() - t0) / it, out


def rep(fn, r):
    """jit of ``r`` dependent iterations of ``fn`` in ONE dispatch."""
    import jax

    def g(d):
        for _ in range(r):
            d = fn(d)
        return d

    return jax.jit(g)


def make_dma_copy(nbricks: int, bdims, dtype,
                  interpret: bool = False,
                  vmem_limit_bytes: int = 110 * 2 ** 20):
    """Pallas whole-storage DMA copy ``fn(view) -> view'`` over
    ``[nbricks, *bdims]`` — the roofline every kernel ratio is judged
    against (2 x itemsize bytes moved per element)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def copy_kernel(dat_ref, out_ref, sem):
        cps = []
        for w in range(0, nbricks, 128):
            e = min(w + 128, nbricks)
            cp = pltpu.make_async_copy(dat_ref.at[w:e], out_ref.at[w:e],
                                       sem)
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

    return pl.pallas_call(
        copy_kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nbricks,) + tuple(bdims),
                                       jnp.dtype(dtype)),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret)
