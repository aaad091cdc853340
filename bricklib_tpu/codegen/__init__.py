from .autodiff import (adjoint_stencil, differentiable_pencil_sweep,
                       differentiable_pencil_sweep_4d,
                       oracle_vjp_sweep)
from .evaluate import evaluate, resolve_const_from_params
from .ir import StencilIR, linear_decomposition
from .jnp_backend import dense_apply, brick_apply

__all__ = [
    "evaluate",
    "resolve_const_from_params",
    "StencilIR",
    "linear_decomposition",
    "dense_apply",
    "brick_apply",
    "adjoint_stencil",
    "differentiable_pencil_sweep",
    "differentiable_pencil_sweep_4d",
    "oracle_vjp_sweep",
]
