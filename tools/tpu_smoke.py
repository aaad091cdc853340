#!/usr/bin/env python
"""Mosaic compile-smoke of every Pallas kernel variant on the real chip.

Interpret mode does not check DMA tile-alignment rules (CLAUDE.md rule
7), so every kernel variant must compile and execute on hardware once
before its results are trusted.  Runs tiny canonical-fold configs of
each variant and prints PASS/FAIL per item; exits nonzero on failure.

Usage: python tools/tpu_smoke.py    (on the default — axon/TPU — platform)
"""

import sys
import traceback


def main():
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from bricklib_tpu.bench.roofline import ensure_live_backend

    if ensure_live_backend() is False:
        # this is a HARDWARE smoke: interpret mode does not check DMA
        # alignment (CLAUDE.md rule 7), so a CPU fallback run proves
        # nothing — fail fast instead of interpreting every variant
        print("ERROR: TPU backend init dead/hung; tpu_smoke is "
              "hardware-only (interpret mode cannot check DMA "
              "alignment) — retry when the tunnel answers",
              file=sys.stderr)
        return 2

    import numpy as np
    import jax
    import jax.numpy as jnp

    from bricklib_tpu.codegen.pallas_backend import (
        pallas_brick_stencil, pallas_dense_stencil)
    from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_sweep
    from bricklib_tpu.codegen.pencil_kernel_4d import pallas_pencil_sweep_4d
    from bricklib_tpu.comm import BrickDecomp, skin3d_good
    from bricklib_tpu.comm.exchange import exchange_shift
    from bricklib_tpu.comm.strong import StrongDecomp, exchange_strong_shift
    from bricklib_tpu.core import init_grid
    from bricklib_tpu.stencils import DEFAULT_PARAMS, stencil_by_name

    params = dict(DEFAULT_PARAMS)
    params["coeff"] = [0.03 * (c + 1) for c in range(27)]
    results = {}

    def check(name, fn):
        try:
            out = fn()
            if hasattr(out, "block_until_ready"):
                float(jnp.sum(out.ravel()[:1]))
            results[name] = "PASS"
        except Exception:
            results[name] = "FAIL"
            traceback.print_exc()

    BD = (8, 8, 128)
    grid3, info3 = init_grid((4, 4, 1))
    view = jnp.zeros((info3.nbricks, 8, 8, 128), jnp.float32)
    sd7 = stencil_by_name("s7pt")[0]
    sdc = stencil_by_name("cond")[0]
    sd125 = stencil_by_name("mpi125pt")[0]

    check("pencil skip", lambda: jax.jit(pallas_pencil_sweep(
        sd7, grid3, BD, info3.nbricks, params))(view))
    check("pencil ghost-incl", lambda: jax.jit(pallas_pencil_sweep(
        sd7, grid3, BD, info3.nbricks, params,
        k_range=(0, 4), j_range=(0, 4)))(view))
    check("pencil inplace ring", lambda: jax.jit(pallas_pencil_sweep(
        sd7, grid3, BD, info3.nbricks, params,
        k_range=(0, 2), j_range=(0, 4), inplace=True))(
            view, jnp.zeros_like(view)))
    check("pencil 125pt factorized", lambda: jax.jit(pallas_pencil_sweep(
        sd125, grid3, BD, info3.nbricks, params))(view))
    check("pencil cond (generic)", lambda: jax.jit(pallas_pencil_sweep(
        sdc, grid3, BD, info3.nbricks, params))(view))
    from bricklib_tpu.st import ConstRef, Grid, Index
    from bricklib_tpu.st.loader import load_stencil_module

    ga, gb, gout = Grid("a", 3), Grid("b", 3), Grid("out", 3)
    i_, j_, k_ = Index(0), Index(1), Index(2)
    gout(i_, j_, k_).assign(
        ConstRef("alpha") * ga(i_, j_, k_)
        + ConstRef("beta") * (ga(i_ + 1, j_, k_) + gb(i_, j_ + 1, k_)
                              + gb(i_, j_, k_ - 1)))
    sd2 = load_stencil_module({"STENCIL": [gout]})[0]
    check("pencil two-grid", lambda: jax.jit(pallas_pencil_sweep(
        sd2, grid3, BD, info3.nbricks, {"alpha": 0.4, "beta": 0.1}))(
            view, view))
    check("pencil bf16 storage", lambda: jax.jit(pallas_pencil_sweep(
        sd7, grid3, BD, info3.nbricks, params,
        dtype=jnp.bfloat16, compute_dtype=jnp.float32))(
            view.astype(jnp.bfloat16)))
    check("pencil batched (strong)", lambda: jax.jit(pallas_pencil_sweep(
        sd7, grid3, BD, 2 * info3.nbricks, params,
        batch=2, batch_stride=info3.nbricks))(
            jnp.zeros((2 * info3.nbricks, 8, 8, 128), jnp.float32)))
    check("pencil fused F=4", lambda: jax.jit(pallas_pencil_sweep(
        sd7, grid3, BD, info3.nbricks, params, fuse=4))(view))
    check("pencil fused ghost-incl F=2", lambda: jax.jit(
        pallas_pencil_sweep(sd7, grid3, BD, info3.nbricks, params,
                            fuse=2, k_range=(0, 4), j_range=(0, 4)))(
            view))
    check("pencil lookahead=2", lambda: jax.jit(pallas_pencil_sweep(
        sd7, grid3, BD, info3.nbricks, params, lookahead=2))(view))

    def pencil_2d():
        from bricklib_tpu.codegen.pencil_kernel_2d import (
            pallas_pencil_sweep_2d)
        from bricklib_tpu.st import ConstRef, Grid, Index
        from bricklib_tpu.st.loader import load_stencil_module

        i2, j2 = Index(0), Index(1)
        g2d, o2d = Grid("in", 2), Grid("out", 2)
        o2d(i2, j2).assign(ConstRef("0.4") * g2d(i2, j2)
                           + ConstRef("0.1") * (g2d(i2 + 1, j2)
                                                + g2d(i2, j2 - 1)))
        sd2d = load_stencil_module({"STENCIL": [o2d]})[0]
        g1, info1 = init_grid((4, 1))
        fn = pallas_pencil_sweep_2d(sd2d, g1, (8, 256), info1.nbricks,
                                    {})
        return jax.jit(fn)(jnp.zeros((info1.nbricks, 8, 256),
                                     jnp.float32))

    check("pencil 2-D (MXU y-contraction)", pencil_2d)

    def pencil_2d_adjoint():
        # 2-D exact linear pullback: forward + adjoint row-pencil
        # sweeps on a periodic y table (distributive rhs exercises the
        # linear_taps canonicalization)
        from bricklib_tpu.codegen.autodiff import (
            differentiable_pencil_sweep_2d)
        from bricklib_tpu.st import ConstRef, Grid, Index
        from bricklib_tpu.st.loader import load_stencil_module

        i2, j2 = Index(0), Index(1)
        g2d, o2d = Grid("in", 2), Grid("out", 2)
        o2d(i2, j2).assign(ConstRef("0.4") * g2d(i2, j2)
                           + ConstRef("0.1") * (g2d(i2 + 1, j2)
                                                + g2d(i2, j2 - 1)
                                                + g2d(i2, j2 + 1)))
        sd2d = load_stencil_module({"STENCIL": [o2d]})[0]
        g1, info1 = init_grid((4, 1))
        t1 = np.asarray(g1)[:, 0].copy()
        t1[0], t1[-1] = t1[-2], t1[1]   # periodic y redirection
        dstep = differentiable_pencil_sweep_2d(sd2d, t1, (8, 256),
                                               info1.nbricks, {})
        av = jnp.ones((info1.nbricks, 8, 256), jnp.float32)
        return jax.jit(jax.grad(lambda d: jnp.sum(dstep(d))))(av)

    check("pencil 2-D adjoint grads", pencil_2d_adjoint)

    def pencil_2d_multi_input():
        # variable-coefficient 2-D: one window ring per input field
        from bricklib_tpu.codegen.pencil_kernel_2d import (
            pallas_pencil_sweep_2d)
        from bricklib_tpu.st import Grid, Index
        from bricklib_tpu.st.loader import load_stencil_module

        i2, j2 = Index(0), Index(1)
        g2d, c2d, o2d = Grid("in", 2), Grid("c", 2), Grid("out", 2)
        o2d(i2, j2).assign(c2d(i2, j2) * g2d(i2 + 1, j2)
                           + c2d(i2, j2 + 1) * g2d(i2, j2 - 1))
        sd2d = load_stencil_module({"STENCIL": [o2d]})[0]
        g1, info1 = init_grid((4, 1))
        fn = pallas_pencil_sweep_2d(sd2d, g1, (8, 256), info1.nbricks,
                                    {})
        z = jnp.zeros((info1.nbricks, 8, 256), jnp.float32)
        return jax.jit(fn)(*((z,) * len(fn.fields)))

    check("pencil 2-D multi-input", pencil_2d_multi_input)

    def pencil_2d_poly_adjoint():
        # 2-D var-coeff EXACT pullback: multi-input adjoint sweeps at
        # up to 2x the forward radius on the row-pencil emitter
        from bricklib_tpu.codegen.autodiff import (
            differentiable_poly_sweep_2d)
        from bricklib_tpu.st import Grid, Index
        from bricklib_tpu.st.loader import load_stencil_module

        i2, j2 = Index(0), Index(1)
        g2d, c2d, o2d = Grid("in", 2), Grid("c", 2), Grid("out", 2)
        o2d(i2, j2).assign(c2d(i2, j2) * g2d(i2 + 1, j2)
                           + c2d(i2, j2 + 1) * g2d(i2, j2 - 1)
                           + 0.3 * g2d(i2, j2) * g2d(i2, j2))
        sd2d = load_stencil_module({"STENCIL": [o2d]})[0]
        g1, info1 = init_grid((4, 1))
        t1 = np.asarray(g1)[:, 0].copy()
        t1[0], t1[-1] = t1[-2], t1[1]   # periodic y redirection
        dstep = differentiable_poly_sweep_2d(sd2d, t1, (8, 256),
                                             info1.nbricks, {})
        av = jnp.ones((info1.nbricks, 8, 256), jnp.float32)
        return jax.jit(jax.grad(
            lambda a, b: jnp.sum(dstep(a, b)), argnums=(0, 1)))(
                av, av)[0]

    check("pencil 2-D poly adjoint grads", pencil_2d_poly_adjoint)

    def pencil_2d_system():
        # coupled 2-D SYSTEM: one multi-output kernel, shared windows
        from bricklib_tpu.codegen.pencil_kernel_2d import (
            pallas_pencil_sweep_2d)
        from bricklib_tpu.st import Grid, Index
        from bricklib_tpu.st.loader import load_stencil_module

        i2, j2 = Index(0), Index(1)
        u2, v2 = Grid("u", 2), Grid("v", 2)
        ou2, ov2 = Grid("ou", 2), Grid("ov", 2)
        uv2 = u2(i2, j2) * v2(i2, j2)
        ou2(i2, j2).assign(u2(i2, j2) + 0.1 * u2(i2 + 1, j2) - uv2)
        ov2(i2, j2).assign(v2(i2, j2) + 0.05 * v2(i2, j2 + 1) + uv2)
        sds2 = load_stencil_module({"STENCIL": [ou2, ov2]})
        g1, info1 = init_grid((4, 1))
        fn = pallas_pencil_sweep_2d(sds2, g1, (8, 256), info1.nbricks,
                                    {})
        z = jnp.zeros((info1.nbricks, 8, 256), jnp.float32)
        return fn(*((z,) * len(fn.fields)))[0]

    check("pencil 2-D system", pencil_2d_system)

    def pencil_2d_system_adjoint():
        # coupled 2-D system EXACT pullback (adjoints read the output
        # cotangent grids + original inputs)
        from bricklib_tpu.codegen.autodiff import (
            differentiable_poly_system_sweep_2d)
        from bricklib_tpu.st import Grid, Index
        from bricklib_tpu.st.loader import load_stencil_module

        i2, j2 = Index(0), Index(1)
        u2, v2 = Grid("u", 2), Grid("v", 2)
        ou2, ov2 = Grid("ou", 2), Grid("ov", 2)
        uv2 = u2(i2, j2) * v2(i2, j2)
        ou2(i2, j2).assign(u2(i2, j2) + 0.1 * u2(i2 + 1, j2) - uv2)
        ov2(i2, j2).assign(v2(i2, j2) + 0.05 * v2(i2, j2 + 1) + uv2)
        sds2 = load_stencil_module({"STENCIL": [ou2, ov2]})
        g1, info1 = init_grid((4, 1))
        t1 = np.asarray(g1)[:, 0].copy()
        t1[0], t1[-1] = t1[-2], t1[1]
        dstep = differentiable_poly_system_sweep_2d(
            sds2, t1, (8, 256), info1.nbricks, ("u", "v"), {})
        av = jnp.ones((info1.nbricks, 8, 256), jnp.float32)
        return jax.jit(jax.grad(
            lambda a, b: jnp.sum(dstep(a, b)[0]),
            argnums=(0, 1)))(av, av)[0]

    check("pencil 2-D system adjoint grads", pencil_2d_system_adjoint)

    def pencil_2d_fused():
        # in-window trapezoid fusion (F=4): per-level banded matmuls
        from bricklib_tpu.codegen.pencil_kernel_2d import (
            pallas_pencil_sweep_2d)
        from bricklib_tpu.st import ConstRef, Grid, Index
        from bricklib_tpu.st.loader import load_stencil_module

        i2, j2 = Index(0), Index(1)
        g2d, o2d = Grid("in", 2), Grid("out", 2)
        o2d(i2, j2).assign(ConstRef("0.4") * g2d(i2, j2)
                           + ConstRef("0.1") * (g2d(i2 + 1, j2)
                                                + g2d(i2, j2 - 1)
                                                + g2d(i2, j2 + 1)))
        sd2d = load_stencil_module({"STENCIL": [o2d]})[0]
        g1, info1 = init_grid((4, 1))
        t1 = np.asarray(g1)[:, 0].copy()
        t1[0], t1[-1] = t1[-2], t1[1]
        fn = pallas_pencil_sweep_2d(sd2d, t1, (8, 256), info1.nbricks,
                                    {}, fuse=4)
        return jax.jit(fn)(jnp.zeros((info1.nbricks, 8, 256),
                                     jnp.float32))

    check("pencil 2-D fused F=4", pencil_2d_fused)

    def pencil_2d_tall_by32():
        # the round-5 bench config: BY=32 tall bricks (less per-row
        # grid overhead, 1.19x trapezoid recompute) + F=4
        from bricklib_tpu.codegen.pencil_kernel_2d import (
            pallas_pencil_sweep_2d)
        from bricklib_tpu.st import ConstRef, Grid, Index
        from bricklib_tpu.st.loader import load_stencil_module

        i2, j2 = Index(0), Index(1)
        g2d, o2d = Grid("in", 2), Grid("out", 2)
        o2d(i2, j2).assign(ConstRef("0.4") * g2d(i2, j2)
                           + ConstRef("0.1") * (g2d(i2 + 1, j2)
                                                + g2d(i2, j2 - 1)
                                                + g2d(i2, j2 + 1)))
        sd2d = load_stencil_module({"STENCIL": [o2d]})[0]
        g1, info1 = init_grid((4, 1))
        t1 = np.asarray(g1)[:, 0].copy()
        t1[0], t1[-1] = t1[-2], t1[1]
        fn = pallas_pencil_sweep_2d(sd2d, t1, (32, 256),
                                    info1.nbricks, {}, fuse=4)
        return jax.jit(fn)(jnp.zeros((info1.nbricks, 32, 256),
                                     jnp.float32))

    check("pencil 2-D tall BY=32 F=4", pencil_2d_tall_by32)

    def mxu_flat_125():
        from bricklib_tpu.codegen.mxu_kernel import (
            flatten_bricks, pallas_pencil_sweep_mxu)

        fn = pallas_pencil_sweep_mxu(sd125, grid3, BD, info3.nbricks,
                                     params)
        return jax.jit(fn)(flatten_bricks(view))

    check("mxu flat-pencil 125pt", mxu_flat_125)
    check("pencil two-grid fused F=2", lambda: jax.jit(
        pallas_pencil_sweep(sd2, grid3, BD, info3.nbricks,
                            {"alpha": 0.4, "beta": 0.1}, fuse=2,
                            evolve="a"))(view, view))

    gu, gv = Grid("u", 3), Grid("v", 3)
    gou, gov = Grid("ou", 3), Grid("ov", 3)
    gou(i_, j_, k_).assign(ConstRef("alpha") * gu(i_, j_, k_)
                           + ConstRef("beta") * gv(i_ + 1, j_, k_))
    gov(i_, j_, k_).assign(ConstRef("alpha") * gv(i_, j_, k_)
                           + ConstRef("beta") * gu(i_, j_ - 1, k_))
    sds_sys = load_stencil_module({"STENCIL": [gou, gov]})
    check("pencil system F=2", lambda: jax.jit(pallas_pencil_sweep(
        sds_sys, grid3, BD, info3.nbricks,
        {"alpha": 0.4, "beta": 0.1}, fuse=2, evolve=("u", "v")))(
            view, view)[0])

    grid4, info4 = init_grid((4, 4, 4, 1))
    sd9 = stencil_by_name("mpi9pt")[0]
    check("pencil 4-D", lambda: jax.jit(pallas_pencil_sweep_4d(
        sd9, grid4, (2, 8, 8, 128), info4.nbricks, DEFAULT_PARAMS))(
            jnp.zeros((info4.nbricks, 2, 8, 8, 128), jnp.float32)))
    check("pencil 4-D F=2", lambda: jax.jit(pallas_pencil_sweep_4d(
        sd9, grid4, (2, 8, 8, 128), info4.nbricks, DEFAULT_PARAMS,
        fuse=2))(
            jnp.zeros((info4.nbricks, 2, 8, 8, 128), jnp.float32)))

    def poly_adjoint_grads_4d():
        # 4-D variable-coefficient EXACT pullback: per-field rolling
        # windows with their own thin w-halo DMA slices (forward) and
        # the multi-input adjoint sweeps at up to 2x the radius — a
        # distinct 4-D DMA/alignment surface
        from bricklib_tpu.codegen.autodiff import (
            differentiable_poly_sweep_4d)
        from bricklib_tpu.comm import BrickDecomp, skinlist_by_name

        iw, jw, kw, ww = Index(0), Index(1), Index(2), Index(3)
        gg_, ga_, go4 = Grid("g", 4), Grid("a", 4), Grid("out", 4)
        go4(iw, jw, kw, ww).assign(
            ga_(iw, jw, kw, ww) * gg_(iw, jw, kw, ww)
            + ConstRef("dt") * gg_(iw + 1, jw, kw - 1, ww)
            + ga_(iw, jw - 1, kw, ww - 1) * gg_(iw, jw + 1, kw, ww + 1))
        sdp4 = load_stencil_module({"STENCIL": [go4]})[0]
        bd4 = (2, 8, 8, 128)
        pdec = BrickDecomp(dims=(4, 16, 16, 128),
                           ghost_depth=(2, 8, 8, 0),
                           bdims=bd4).initialize(
                               skinlist_by_name("good", 4))
        step = differentiable_poly_sweep_4d(
            sdp4, pdec.periodic_grid((0, 1, 2, 3)), bd4, pdec.nbricks,
            {"dt": 0.05})
        msk = jnp.asarray(pdec.owned_mask().reshape((-1, 1, 1, 1, 1)))
        gv = jnp.ones((pdec.nbricks,) + bd4, jnp.float32)
        av = jnp.full((pdec.nbricks,) + bd4, 1.2, jnp.float32)
        args = tuple(gv if n == "g" else av for n in step.fields)
        g_g, a_g = jax.jit(jax.grad(
            lambda a, b: jnp.sum(jnp.where(msk, step(a, b), 0.0)),
            argnums=(0, 1)))(*args)
        return g_g + a_g

    check("pencil 4-D poly adjoint grads", poly_adjoint_grads_4d)

    def system_adjoint_grads_4d():
        # coupled polynomial 4-D SYSTEM exact pullback: per-output
        # multi-input forwards + adjoint sweeps reading BOTH
        # cotangent windows (multi-ct 4-D DMA surface)
        from bricklib_tpu.codegen.autodiff import (
            differentiable_poly_system_sweep_4d)
        from bricklib_tpu.comm import BrickDecomp, skinlist_by_name

        iw, jw, kw, ww = Index(0), Index(1), Index(2), Index(3)
        gu4, gv4 = Grid("u", 4), Grid("v", 4)
        ou4, ov4 = Grid("ou", 4), Grid("ov", 4)
        uv4 = gu4(iw, jw, kw, ww) * gv4(iw, jw, kw, ww)
        ou4(iw, jw, kw, ww).assign(
            gu4(iw, jw, kw, ww)
            + 0.1 * gu4(iw + 1, jw, kw - 1, ww) - uv4)
        ov4(iw, jw, kw, ww).assign(
            gv4(iw, jw, kw, ww)
            + 0.05 * gv4(iw, jw - 1, kw, ww + 1) + uv4)
        sds4 = load_stencil_module({"STENCIL": [ou4, ov4]})
        bd4 = (2, 8, 8, 128)
        qdec = BrickDecomp(dims=(4, 16, 16, 128),
                           ghost_depth=(2, 8, 8, 0),
                           bdims=bd4).initialize(
                               skinlist_by_name("good", 4))
        step = differentiable_poly_system_sweep_4d(
            sds4, qdec.periodic_grid((0, 1, 2, 3)), bd4, qdec.nbricks,
            ("u", "v"), {})
        msk = jnp.asarray(qdec.owned_mask().reshape((-1, 1, 1, 1, 1)))
        uv_ = jnp.ones((qdec.nbricks,) + bd4, jnp.float32)
        vv_ = jnp.full((qdec.nbricks,) + bd4, 0.3, jnp.float32)
        args = tuple(uv_ if n == "u" else vv_ for n in step.fields)
        gu_g, gv_g = jax.jit(jax.grad(
            lambda a, b: jnp.sum(jnp.where(msk, step(a, b)[0], 0.0)),
            argnums=(0, 1)))(*args)
        return gu_g + gv_g

    check("pencil 4-D system adjoint grads", system_adjoint_grads_4d)

    gridb, infob = init_grid((4, 4, 4))
    check("generic brick streaming", lambda: jax.jit(pallas_brick_stencil(
        sd7, gridb, BD, (1, 1, 1), infob.nbricks, params))(
            jnp.zeros((infob.nbricks, 8, 8, 128), jnp.float32)))
    check("generic brick ghost-incl i", lambda: jax.jit(
        pallas_brick_stencil(
            sd7, gridb, BD, (1, 1, 1), infob.nbricks, params,
            k_range=(0, 4), j_range=(0, 4), i_range=(0, 4)))(
            jnp.zeros((infob.nbricks, 8, 8, 128), jnp.float32)))

    check("dense twin", lambda: jax.jit(pallas_dense_stencil(
        sd7, (32, 32, 256), (8, 8, 64), params))(
            jnp.zeros((32, 32, 256), jnp.float32)))
    check("dense twin two-grid", lambda: jax.jit(pallas_dense_stencil(
        sd2, (32, 32, 256), (8, 8, 64), {"alpha": 0.4, "beta": 0.1}))(
            jnp.zeros((32, 32, 256), jnp.float32),
            jnp.zeros((32, 32, 256), jnp.float32)))

    dec = BrickDecomp(dims=(16, 16, 128), ghost_depth=(8, 8, 0),
                      bdims=(8, 8, 128)).initialize(skin3d_good)
    check("exchange local in-place DMA", lambda: jax.jit(
        lambda d: exchange_shift(d, dec, ("x", "y", "z"), (1, 1, 1),
                                 table_axes=(2,)), donate_argnums=0)(
            jnp.zeros((dec.nbricks, 8, 8, 128), jnp.float32)))

    plan = StrongDecomp(dom=(32, 32, 128), sdom=(16, 16, 128),
                        mesh_shape=(1, 1, 1), bdims=(8, 8, 128),
                        ghost_depth=(8, 8, 0)).initialize(skin3d_good)
    check("strong stage-copy DMA", lambda: jax.jit(
        lambda b: exchange_strong_shift(b, plan, ("x", "y", "z")),
        donate_argnums=0)(
            jnp.zeros((plan.nsub_local, plan.sdec.nbricks, 8, 8, 128),
                      jnp.float32)))

    def remote_dma_self():
        # Mosaic lowering smoke of the primitives exchange_shift_remote
        # relies on (interpret mode can't lower them): the collective
        # barrier semaphore + a LOGICAL-device-id remote DMA, self-
        # targeted on the single chip.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from jax.sharding import Mesh, PartitionSpec as P

        from bricklib_tpu.comm.mesh import shard_map as sm

        def kern(ids_ref, x_ref, out_ref, ssem, rsem):
            bsem = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(
                bsem, 2, device_id=ids_ref[0],
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(bsem, 2)
            cp = pltpu.make_async_remote_copy(
                x_ref.at[:8], out_ref.at[8:16], ssem, rsem,
                device_id=ids_ref[0],
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            cp.start()
            cp.wait()

        mesh = Mesh(np.asarray(jax.devices()[:1]), ("dev",))

        def step(x):
            me = jax.lax.axis_index("dev").astype(jnp.int32)
            return pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                scratch_shapes=[pltpu.SemaphoreType.DMA,
                                pltpu.SemaphoreType.DMA],
                input_output_aliases={1: 0},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True, collective_id=3),
            )(me[None], x)

        x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
        y = jax.jit(sm(step, mesh, P(), P()))(x)
        np.testing.assert_array_equal(np.asarray(y)[8:16],
                                      np.asarray(x)[:8])
        return y

    check("remote DMA + barrier (self)", remote_dma_self)

    def fusedx_local():
        # fused exchange-in-sweep kernel on one chip: all-local plan
        # (periodic self copies), reordered j-tiles/k-stream, epilogue
        # window refill — the DMA-alignment surface interpret can't check
        from bricklib_tpu.codegen.fused_exchange import (
            pallas_pencil_sweep_fusedx)
        from bricklib_tpu.comm.exchange import put_plan

        decf = BrickDecomp(dims=(48, 32, 128), ghost_depth=(8, 8, 0),
                           bdims=(8, 8, 128)).initialize(skin3d_good)
        planf = put_plan(decf, (1, 1, 1), (2,))
        fn = pallas_pencil_sweep_fusedx(
            sd7, decf.periodic_grid((2,)), (8, 8, 128), decf.nbricks,
            planf, (1, 1, 1), params)
        out, _d2 = jax.jit(fn)(
            jnp.zeros((decf.nbricks, 8, 8, 128), jnp.float32))
        return out

    check("fused exchange-in-sweep", fusedx_local)

    def fusedx_deep_ghost():
        # deep-ghost (2 brick rings/axis) fused exchange: bigger NW,
        # shifted gates, epilogue burst over nepi+2F distinct slots
        from bricklib_tpu.codegen.fused_exchange import (
            pallas_pencil_sweep_fusedx)
        from bricklib_tpu.comm.exchange import put_plan

        decf = BrickDecomp(dims=(64, 32, 128), ghost_depth=(16, 16, 0),
                           bdims=(8, 8, 128)).initialize(skin3d_good)
        planf = put_plan(decf, (1, 1, 1), (2,))
        fn = pallas_pencil_sweep_fusedx(
            sd7, decf.periodic_grid((2,)), (8, 8, 128), decf.nbricks,
            planf, (1, 1, 1), params, ghost_rings=(2, 2))
        out, _d2 = jax.jit(fn)(
            jnp.zeros((decf.nbricks, 8, 8, 128), jnp.float32))
        return out

    check("fused exchange deep ghost", fusedx_deep_ghost)

    def aot_roundtrip():
        import tempfile

        fn = pallas_pencil_sweep(sd7, grid3, BD, info3.nbricks, params)
        spec = jax.ShapeDtypeStruct((info3.nbricks,) + BD, jnp.float32)
        blob = jax.export.export(jax.jit(fn))(spec).serialize()
        with tempfile.NamedTemporaryFile(suffix=".jaxexport") as f:
            f.write(blob)
            f.flush()
            ex = jax.export.deserialize(bytearray(open(f.name,
                                                       "rb").read()))
        return ex.call(view)

    def autodiff_grads():
        from bricklib_tpu.codegen.autodiff import (
            differentiable_pencil_sweep, oracle_vjp_sweep)
        from bricklib_tpu.comm import BrickDecomp, skinlist_by_name

        adec = BrickDecomp(dims=(16, 16, 128), ghost_depth=(8, 8, 0),
                           bdims=BD).initialize(
                               skinlist_by_name("good", 3))
        tg = adec.periodic_grid((0, 1, 2))
        dstep = differentiable_pencil_sweep(sd7, tg, BD, adec.nbricks,
                                            params)
        msk = jnp.asarray(adec.owned_mask().reshape((-1, 1, 1, 1)))
        av = jnp.ones((adec.nbricks,) + BD, jnp.float32)
        g1 = jax.jit(jax.grad(lambda d: jnp.sum(
            jnp.where(msk, dstep(d), 0.0))))(av)
        ostep = oracle_vjp_sweep(sd2, adec, BD,
                                 {"alpha": 0.4, "beta": 0.1},
                                 fields=("a",))
        g2 = jax.jit(jax.grad(lambda d: jnp.sum(jnp.where(
            msk, ostep(*(d if n == "a" else av
                         for n in ostep.fields)), 0.0))))(av)
        return g1 + g2

    check("autodiff grads (adjoint + oracle)", autodiff_grads)

    def poly_adjoint_grads():
        # variable-coefficient EXACT pullback: Pallas forward + one
        # adjoint pencil sweep per field (multi-input generic path at
        # up to 2x the forward radius — a distinct DMA/alignment
        # surface from the linear adjoint)
        from bricklib_tpu.codegen.autodiff import differentiable_poly_sweep
        from bricklib_tpu.comm import BrickDecomp, skinlist_by_name

        iu, ju, ku = Index(0), Index(1), Index(2)
        gu_, gc_, go_ = Grid("u", 3), Grid("c", 3), Grid("out", 3)
        go_(iu, ju, ku).assign(
            gu_(iu, ju, ku) + ConstRef("dt")
            * (gc_(iu, ju, ku) + gc_(iu + 1, ju, ku))
            * (gu_(iu + 1, ju, ku) - gu_(iu, ju, ku)))
        sdp = load_stencil_module({"STENCIL": [go_]})[0]
        pdec = BrickDecomp(dims=(16, 16, 128), ghost_depth=(8, 8, 0),
                           bdims=BD).initialize(
                               skinlist_by_name("good", 3))
        step = differentiable_poly_sweep(
            sdp, pdec.periodic_grid((0, 1, 2)), BD, pdec.nbricks,
            {"dt": 0.05})
        msk = jnp.asarray(pdec.owned_mask().reshape((-1, 1, 1, 1)))
        uv = jnp.ones((pdec.nbricks,) + BD, jnp.float32)
        cv = jnp.full((pdec.nbricks,) + BD, 1.2, jnp.float32)
        args = tuple(uv if n == "u" else cv for n in step.fields)
        gu_g, gc_g = jax.jit(jax.grad(
            lambda a, b: jnp.sum(jnp.where(msk, step(a, b), 0.0)),
            argnums=(0, 1)))(*args)
        return gu_g + gc_g

    check("poly adjoint grads (varcoeff)", poly_adjoint_grads)

    def system_adjoint_grads():
        # coupled polynomial SYSTEM exact pullback: one multi-output
        # Pallas forward, adjoint sweeps reading BOTH cotangent grids
        # (new multi-ct multi-input DMA surface)
        from bricklib_tpu.codegen.autodiff import (
            differentiable_poly_system_sweep)
        from bricklib_tpu.comm import BrickDecomp, skinlist_by_name

        iu, ju, ku = Index(0), Index(1), Index(2)
        gu_, gv_ = Grid("u", 3), Grid("v", 3)
        ou_, ov_ = Grid("ou", 3), Grid("ov", 3)
        uvv = gu_(iu, ju, ku) * gv_(iu, ju, ku) * gv_(iu, ju, ku)
        ou_(iu, ju, ku).assign(
            gu_(iu, ju, ku) + 0.1 * (gu_(iu + 1, ju, ku)
                                     + gu_(iu, ju, ku - 1)) - uvv)
        ov_(iu, ju, ku).assign(
            gv_(iu, ju, ku) + 0.05 * gv_(iu, ju + 1, ku) + uvv)
        sds_ = load_stencil_module({"STENCIL": [ou_, ov_]})
        qdec = BrickDecomp(dims=(16, 16, 128), ghost_depth=(8, 8, 0),
                           bdims=BD).initialize(
                               skinlist_by_name("good", 3))
        step = differentiable_poly_system_sweep(
            sds_, qdec.periodic_grid((0, 1, 2)), BD, qdec.nbricks,
            ("u", "v"), {})
        msk = jnp.asarray(qdec.owned_mask().reshape((-1, 1, 1, 1)))
        uv = jnp.ones((qdec.nbricks,) + BD, jnp.float32)
        vv = jnp.full((qdec.nbricks,) + BD, 0.3, jnp.float32)
        args = tuple(uv if n == "u" else vv for n in step.fields)
        gu_g, gv_g = jax.jit(jax.grad(
            lambda a, b: jnp.sum(jnp.where(msk, step(a, b)[0], 0.0)),
            argnums=(0, 1)))(*args)
        return gu_g + gv_g

    check("system adjoint grads (coupled poly)", system_adjoint_grads)

    def cond_piecewise_adjoint():
        # exact If/max pullback (round 5): the symbolic-diff adjoint
        # stencil contains If gates over the residual input — a fresh
        # in-kernel surface (select lanes in the generic evaluator's
        # adjoint) that must compile on hardware
        from bricklib_tpu.codegen.autodiff import differentiable_poly_sweep
        from bricklib_tpu.comm import BrickDecomp, skinlist_by_name

        cdec = BrickDecomp(dims=(16, 16, 128), ghost_depth=(8, 8, 0),
                           bdims=BD).initialize(
                               skinlist_by_name("good", 3))
        sdc = stencil_by_name("cond")[0]
        cp = {"coeff": [0.1, 0.2, 0.05, 0.15, 0.12, 0.08, 0.3]}
        step = differentiable_poly_sweep(
            sdc, cdec.periodic_grid((0, 1, 2)), BD, cdec.nbricks, cp)
        msk = jnp.asarray(cdec.owned_mask().reshape((-1, 1, 1, 1)))
        av = jnp.asarray(np.random.default_rng(0).standard_normal(
            (cdec.nbricks,) + BD).astype(np.float32))
        return jax.jit(jax.grad(lambda d: jnp.sum(
            jnp.where(msk, step(d), 0.0))))(av)

    check("cond exact If/max adjoint", cond_piecewise_adjoint)

    def fused_poly_adjoint():
        # fused differentiable poly step (round 5): F=2 fused Pallas
        # forward + recompute pullback (_fuse_by_recompute)
        from bricklib_tpu.codegen.autodiff import differentiable_poly_sweep
        from bricklib_tpu.comm import BrickDecomp, skinlist_by_name

        iu, ju, ku = Index(0), Index(1), Index(2)
        gu_, go_ = Grid("u", 3), Grid("out", 3)
        go_(iu, ju, ku).assign(
            gu_(iu, ju, ku) + ConstRef("dt")
            * (gu_(iu + 1, ju, ku) + gu_(iu - 1, ju, ku)
               + gu_(iu, ju + 1, ku) + gu_(iu, ju - 1, ku)
               - 4.0 * gu_(iu, ju, ku))
            + ConstRef("dt") * gu_(iu, ju, ku) * gu_(iu, ju, ku))
        sdf = load_stencil_module({"STENCIL": [go_]})[0]
        fdec = BrickDecomp(dims=(16, 16, 128), ghost_depth=(8, 8, 0),
                           bdims=BD).initialize(
                               skinlist_by_name("good", 3))
        step = differentiable_poly_sweep(
            sdf, fdec.periodic_grid((0, 1, 2)), BD, fdec.nbricks,
            {"dt": 0.05}, fuse=2)
        msk = jnp.asarray(fdec.owned_mask().reshape((-1, 1, 1, 1)))
        av = jnp.full((fdec.nbricks,) + BD, 0.2, jnp.float32)
        return jax.jit(jax.grad(lambda d: jnp.sum(
            jnp.where(msk, step(d), 0.0))))(av)

    check("fused poly adjoint (F=2 recompute)", fused_poly_adjoint)

    check("AOT export roundtrip", aot_roundtrip)

    width = max(len(k) for k in results)
    lines = [f"{k:{width}s}  {v}" for k, v in results.items()]
    for ln in lines:
        print(ln)
    ok = not any(v == "FAIL" for v in results.values())
    summary = (f"all {len(results)} kernel variants compile + run on "
               f"{jax.default_backend()}" if ok else
               f"{sum(v == 'FAIL' for v in results.values())} of "
               f"{len(results)} items FAILED on "
               f"{jax.default_backend()}")
    print(summary)
    # self-capturing artifact (round-5 verdict item 7): the committed
    # log is written by the run itself so it cannot drift from the
    # tool's item list
    import datetime
    import os

    log = os.path.join(__file__.rsplit("/", 2)[0], "docs", "SMOKE.log")
    with open(log, "w") as f:
        f.write(f"# tools/tpu_smoke.py — {len(results)} items on "
                f"backend={jax.default_backend()} "
                f"(jax {jax.__version__}), "
                f"{datetime.datetime.now().isoformat(timespec='seconds')}\n")
        f.write("\n".join(lines) + "\n" + summary + "\n")
    print(f"# log written: {log}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
