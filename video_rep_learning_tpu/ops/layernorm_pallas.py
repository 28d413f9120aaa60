"""Fused LayerNorm (Pallas, TPU).

XLA lowers flax's LayerNorm over a bf16 stream as convert(fp32) -> reduce ->
normalize fusions: profiling the MV-Former step showed 26 of them costing
~52 ms/step (~4 HBM passes each over the 125k x 768 token stream,
`tools/profile_step.py`). This kernel does the whole thing in ONE pass:
load a row block, fp32 statistics in VMEM, scale/bias, write bf16.

Backward falls back to the XLA vjp of the reference math (the hot call site
is the FROZEN ViT backbone — `transformer.py:186-188` runs it under no_grad —
so the backward only exists for finetuned-ViT-block configs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _ln_reference(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)  # (N, D)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _ln_forward(x, scale, bias, eps):
    B, N, D = x.shape
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, D), lambda b: (0, 0)),
                pl.BlockSpec((1, D), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, scale[None], bias[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_layernorm_vjp(x, scale, bias, eps=1e-6):
    if jax.default_backend() == "tpu" and x.ndim == 3 and x.shape[-1] % _LANES == 0:
        return _ln_forward(x, scale, bias, eps)
    return _ln_reference(x, scale, bias, eps)


def _fused_ln_fwd(x, scale, bias, eps):
    return _fused_layernorm_vjp(x, scale, bias, eps), (x, scale, bias)


def _fused_ln_bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda a, s, b: _ln_reference(a, s, b, eps),
                     x, scale, bias)
    return vjp(g)


_fused_layernorm_vjp.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def fused_layernorm(x, scale, bias, eps=1e-6):
    """LayerNorm over the last dim of (B, N, D). fp32 statistics, one HBM
    pass. Falls back to plain XLA math off-TPU or for lane-unfriendly D.
    Under a multi-device pure-DP mesh the kernel runs per batch shard via
    `parallel.sharding.dp_kernel_call` (GSPMD would otherwise replicate the
    Mosaic custom call)."""
    from ..parallel.sharding import dp_kernel_call

    return dp_kernel_call(
        lambda a, s, b: _fused_layernorm_vjp(a, s, b, eps),
        (x,), (scale, bias))
