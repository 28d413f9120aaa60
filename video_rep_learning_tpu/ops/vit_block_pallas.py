"""Fused ViT attention half-block (Pallas, TPU).

Computes  y = x + proj(MHA(LayerNorm(x)))  in one kernel per (image, head
slab): the LN output, the packed qkv tensor, and the attention scores never
touch HBM. Grid (B, H/hp) with the x block and fp32 accumulator constant
across the slab axis; per-slab weight columns stream in as (D, 128) blocks.

This replaces, per ViT block on the frozen-backbone hot path: the LN kernel,
the qkv projection, the packed attention kernel, and the proj matmul —
saving their intermediate HBM round-trips and launch overheads
(`tools/profile_step.py` breakdown).

Backward (finetuned-ViT-block configs only — the hot caller is frozen under
stop_gradient) is the XLA vjp of the reference composition.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_pallas import _packed_heads_per_program

_LANES = 128


def _kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
            o_ref, qkv_scratch, acc_ref, *, sm_scale, hp, dh, nG, eps):
    g = pl.program_id(1)
    x = x_ref[0]  # (N, D)
    D = x.shape[1]
    w = hp * dh

    @pl.when(g == 0)
    def _():
        # LN + FULL-WIDTH qkv once per image (the 3D-wide matmul keeps the
        # MXU fully fed; per-slab 128-wide projections measured slower)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=1, keepdims=True)
        xn = (xc * jax.lax.rsqrt(var + eps) * lns_ref[0].astype(jnp.float32)
              + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)
        qkv = jax.lax.dot(xn, wqkv_ref[...],
                          preferred_element_type=jnp.float32)
        qkv_scratch[...] = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(
            qkv_scratch.dtype)

    off = pl.multiple_of(g * w, w)
    qs = qkv_scratch[:, pl.ds(off, w)]
    ks = qkv_scratch[:, pl.ds(D + off, w)]
    vs = qkv_scratch[:, pl.ds(2 * D + off, w)]

    outs = []
    for t in range(hp):  # static unroll over the slab's heads
        q = qs[:, t * dh:(t + 1) * dh]
        k = ks[:, t * dh:(t + 1) * dh]
        v = vs[:, t * dh:(t + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # (N, N) fp32
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32) / l
        outs.append(o.astype(x.dtype))
    o_slab = outs[0] if hp == 1 else jnp.concatenate(outs, axis=1)  # (N, w)

    part = jax.lax.dot(o_slab, wp_ref[...],
                       preferred_element_type=jnp.float32)  # (N, D)

    @pl.when(g == 0)
    def _():
        acc_ref[...] = (x.astype(jnp.float32)
                        + bp_ref[0].astype(jnp.float32) + part)

    @pl.when(g > 0)
    def _():
        acc_ref[...] += part

    @pl.when(g == nG - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _forward(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads, eps):
    B, N, D = x.shape
    dh = D // num_heads
    hp = _packed_heads_per_program(num_heads, dh)
    w = hp * dh
    nG = num_heads // hp
    sm_scale = 1.0 / math.sqrt(dh)

    cast = x.dtype
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, hp=hp, dh=dh, nG=nG,
                          eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, nG),
            in_specs=[
                pl.BlockSpec((1, N, D), lambda b, g: (b, 0, 0)),
                pl.BlockSpec((1, D), lambda b, g: (0, 0)),
                pl.BlockSpec((1, D), lambda b, g: (0, 0)),
                pl.BlockSpec((D, 3 * D), lambda b, g: (0, 0)),
                pl.BlockSpec((1, 3 * D), lambda b, g: (0, 0)),
                pl.BlockSpec((w, D), lambda b, g: (g, 0)),
                pl.BlockSpec((1, D), lambda b, g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, N, D), lambda b, g: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((N, 3 * D), cast),
                            pltpu.VMEM((N, D), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # resident wqkv + qkv scratch + fp32 accumulator + score tile
            # exceed the compiler's conservative 16 MB default scoped limit
            vmem_limit_bytes=32 * 1024 * 1024),
    )(x, ln_scale[None].astype(jnp.float32), ln_bias[None].astype(jnp.float32),
      wqkv.astype(cast), bqkv[None].astype(jnp.float32), wproj.astype(cast),
      bproj[None].astype(jnp.float32))


def _reference(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads, eps):
    """XLA composition (backward remat + numerical oracle)."""
    B, N, D = x.shape
    dh = D // num_heads
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias).astype(x.dtype)
    qkv = (jnp.einsum("bnd,de->bne", xn, wqkv.astype(x.dtype),
                      preferred_element_type=jnp.float32)
           + bqkv).astype(x.dtype)

    def heads(a):
        return a.reshape(B, N, num_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = (heads(qkv[..., i * D:(i + 1) * D]) for i in range(3))
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(dh)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
    y = (jnp.einsum("bnd,de->bne", o, wproj.astype(x.dtype),
                    preferred_element_type=jnp.float32) + bproj)
    return (x.astype(jnp.float32) + y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def vit_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                        num_heads, eps=1e-6):
    """y = x + proj(MHA(LN(x))) fully fused."""
    return _forward(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                    num_heads, eps)


def _fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads, eps):
    out = _forward(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                   num_heads, eps)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)


def _bwd(num_heads, eps, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj = res
    _, vjp = jax.vjp(lambda *a: _reference(*a, num_heads, eps),
                     x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)
    return vjp(g)


vit_attention_block.defvjp(_fwd, _bwd)


def vit_block_eligible(num_heads: int, dh: int, N: int, D: int,
                       itemsize: int) -> bool:
    """VMEM budget: x block (double-buffered) + fp32 accumulator + score
    tile + xn + slab weights."""
    if _packed_heads_per_program(num_heads, dh) is None:
        return False
    Np = -(-N // 8) * 8
    need = (2 * Np * D * itemsize      # x in (double buffered)
            + Np * D * itemsize        # out
            + 4 * Np * D               # fp32 accumulator scratch
            + Np * D * itemsize        # xn
            + 4 * Np * -(-Np // _LANES) * _LANES  # score tile
            + 8 * D * _LANES * itemsize)          # weight slabs (buffered)
    return need <= 14 * 1024 * 1024
