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

import time


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
