"""Fused ViT attention half-block (Pallas, TPU).

Computes  y = x + proj(MHA(LayerNorm(x)))  in ONE program per image: LN,
the full-width qkv projection (into VMEM scratch), all attention heads, and
the full-width proj + residual — the LN output, the packed qkv tensor, the
attention scores, and the attention output never touch HBM.

History (tools/bench_packed_attn.py + CLAUDE.md perf notes): the r2 slab
version (grid (B, H/hp), per-slab 128-wide proj, classic softmax) measured
~2% SLOWER than separate kernels — the per-image serial LN+qkv section
stalled slab pipelining and narrow per-slab matmuls lose to full-width.
This rework applies the r3 packed-attention winners to the fused form:
ALL heads in one program (more independent MXU/VPU chains to overlap),
max-free exp2 softmax (exact for |logits| <= 76 — see
`attention_pallas._NOMAX_CLAMP`; VRL_ATTN_MAXSUB=1 restores classic), and
full-width qkv/proj matmuls with the attention output concatenated in a
VMEM scratch. On-chip A/B (v5e, repeated): MVF step 5.64 vs 5.51 clips/s
(+2.3%) over the separate-kernel path (ln_matmul qkv + packed attention +
XLA proj) — the win is the saved qkv/attn-out HBM round-trips
(~9.6 MB/frame/block) and launch overheads; the MXU work is identical.
DEFAULT on TPU since r3; VRL_FUSED_VIT_BLOCK=0 restores separate kernels.

r4 rework: the TRANSPOSED attention schedule (`_kernel_t`) computes
o^T = v^T p^T so the second attention matmul runs at full MXU lane width
and proj consumes the transposed scratch directly — +4.0% MVF e2e on-chip
(5.945 vs 5.714 clips/s); now the default (VRL_VIT_BLOCK_T=0 restores the
row-major schedule).

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

from .attention_pallas import (_LOG2E, _NOMAX_CLAMP, _NOMAX_FLOOR,
                               _packed_heads_per_program, _use_maxsub)

_LANES = 128


def _kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
            o_ref, qkv_scratch, attn_scratch, *, sm_scale, hp, dh, groups,
            eps, maxsub, prescale):
    x = x_ref[0]  # (N, D)
    D = x.shape[1]

    # LN (fp32 stats) + FULL-WIDTH qkv once per image — the 3D-wide matmul
    # keeps the MXU fully fed (per-slab 128-wide projections measured slower)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps) * lns_ref[0].astype(jnp.float32)
          + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)
    qkv = jax.lax.dot(xn, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv_scratch[...] = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(
        qkv_scratch.dtype)

    scale = sm_scale if maxsub else sm_scale * _LOG2E
    w = hp * dh  # 128-aligned lane slab holding `hp` heads
    for g in range(groups):
        off = pl.multiple_of(g * w, _LANES)
        qs = qkv_scratch[:, pl.ds(off, w)]
        if prescale:  # one (N, w) pass instead of hp (N, N) passes
            qs = qs * qs.dtype.type(scale)
        ks = qkv_scratch[:, pl.ds(D + off, w)]
        vs = qkv_scratch[:, pl.ds(2 * D + off, w)]
        outs = []
        for t in range(hp):  # static unroll: value-level head split
            q = qs[:, t * dh:(t + 1) * dh]
            k = ks[:, t * dh:(t + 1) * dh]
            v = vs[:, t * dh:(t + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (N, N) fp32
            if not prescale:
                s = s * scale
            if maxsub:
                p = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
            else:
                p = jnp.exp2(jnp.clip(s, _NOMAX_FLOOR, _NOMAX_CLAMP))
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            outs.append((o * (1.0 / l)).astype(attn_scratch.dtype))
        attn_scratch[:, pl.ds(off, w)] = (
            outs[0] if hp == 1 else jnp.concatenate(outs, axis=1))

    part = jax.lax.dot(attn_scratch[...], wp_ref[...],
                       preferred_element_type=jnp.float32)  # (N, D) fp32
    o_ref[0] = (xf + bp_ref[0].astype(jnp.float32) + part).astype(o_ref.dtype)


def _kernel_t(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
              o_ref, qkv_scratch, attn_t_scratch, *, sm_scale, hp, dh, groups,
              eps, maxsub, prescale):
    """Transposed-output attention schedule — the TPU DEFAULT since r4
    (VRL_VIT_BLOCK_T=0 restores the classic row-major schedule).

    The classic per-head p @ v is a width-dh (=64) matmul: only half of the
    MXU's 128 output lanes do work. Computing o^T = v^T @ p^T instead makes
    the second matmul's output (dh, N) — FULL lane width N — and the proj
    matmul consumes the transposed attention scratch directly via a
    dim-0-contracting dot (part[n,e] = sum_d attnT[d,n] wproj[d,e]), so no
    transpose-back ever materializes. Softmax is computed on s^T: the
    normalizing sum runs over the SUBLANE axis (cheaper than the lane-axis
    row sum). MXU ceiling at dh=64 moves from ~1/2 rate on both attention
    matmuls to ~1/2 on scores only: ~98 -> ~131 TF/s. Measured on-chip
    (tools/ab_env.py, MVF e2e, 3 alternating reps x 16 steps): 5.945 vs
    5.714 clips/s = +4.0%, sd <= 0.010."""
    x = x_ref[0]
    D = x.shape[1]

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps) * lns_ref[0].astype(jnp.float32)
          + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)
    qkv = jax.lax.dot(xn, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv_scratch[...] = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(
        qkv_scratch.dtype)

    scale = sm_scale if maxsub else sm_scale * _LOG2E
    w = hp * dh
    for g in range(groups):
        off = pl.multiple_of(g * w, _LANES)
        qs = qkv_scratch[:, pl.ds(off, w)]
        if prescale:  # one (N, w) pass instead of hp (N, N) passes
            qs = qs * qs.dtype.type(scale)
        ks = qkv_scratch[:, pl.ds(D + off, w)]
        vs = qkv_scratch[:, pl.ds(2 * D + off, w)]
        outs = []
        for t in range(hp):
            q = qs[:, t * dh:(t + 1) * dh]
            k = ks[:, t * dh:(t + 1) * dh]
            v = vs[:, t * dh:(t + 1) * dh]
            sT = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (Nk, Nq) fp32
            if not prescale:
                sT = sT * scale
            if maxsub:
                p = jnp.exp(sT - jnp.max(sT, axis=0, keepdims=True))
            else:
                p = jnp.exp2(jnp.clip(sT, _NOMAX_FLOOR, _NOMAX_CLAMP))
            l = jnp.sum(p, axis=0, keepdims=True)  # (1, Nq) sublane reduce
            oT = jax.lax.dot_general(
                v, p.astype(v.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (dh, Nq), full lanes
            outs.append((oT * (1.0 / l)).astype(attn_t_scratch.dtype))
        attn_t_scratch[pl.ds(off, w), :] = (
            outs[0] if hp == 1 else jnp.concatenate(outs, axis=0))

    part = jax.lax.dot_general(
        attn_t_scratch[...], wp_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (N, D) fp32
    o_ref[0] = (xf + bp_ref[0].astype(jnp.float32) + part).astype(o_ref.dtype)


def _use_transposed():
    import os
    return os.environ.get("VRL_VIT_BLOCK_T", "1") == "1"


def _use_prescale():
    """Scale the q slab (N, 128) once per head group instead of the (N, N)
    score matrix per head — 12x less VPU work on the softmax-scale pass.
    Rounding moves from fp32-scores-scale to a bf16 q multiply: same 2^-9
    relative error class as the existing bf16 q rounding.

    TPU DEFAULT since r5: on-chip e2e A/B (tools/ab_env.py, MVF, 3
    alternating reps) measured 5.983 vs 5.965 clips/s (+0.30%, prescale
    winning every rep with sd 0.003). VRL_ATTN_PRESCALE=0 restores the
    per-head score scale."""
    import os
    return os.environ.get("VRL_ATTN_PRESCALE", "1") == "1"


def _forward(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads, eps):
    B, N, D = x.shape
    dh = D // num_heads
    hp = _packed_heads_per_program(num_heads, dh)
    sm_scale = 1.0 / math.sqrt(dh)

    cast = x.dtype
    transposed = _use_transposed()
    kern = _kernel_t if transposed else _kernel
    attn_scratch = (pltpu.VMEM((D, N), cast) if transposed
                    else pltpu.VMEM((N, D), cast))
    return pl.pallas_call(
        functools.partial(kern, sm_scale=sm_scale, hp=hp, dh=dh,
                          groups=num_heads // hp, eps=eps,
                          maxsub=_use_maxsub(), prescale=_use_prescale()),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, D), lambda b: (0, 0)),
                pl.BlockSpec((1, D), lambda b: (0, 0)),
                pl.BlockSpec((D, 3 * D), lambda b: (0, 0)),
                pl.BlockSpec((1, 3 * D), lambda b: (0, 0)),
                pl.BlockSpec((D, D), lambda b: (0, 0)),
                pl.BlockSpec((1, D), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((N, 3 * D), cast), attn_scratch],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # resident wqkv/wproj + qkv/attn scratch + live fp32 score tiles
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
def _vit_attention_block_vjp(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                             num_heads, eps=1e-6):
    return _forward(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                    num_heads, eps)


def vit_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                        num_heads, eps=1e-6):
    """y = x + proj(MHA(LN(x))) fully fused. Runs per batch shard under a
    multi-device pure-DP mesh (see `parallel.sharding.dp_kernel_call`);
    weight cotangents are psum'd by shard_map's transpose."""
    from ..parallel.sharding import dp_kernel_call

    return dp_kernel_call(
        lambda a, *w: _vit_attention_block_vjp(a, *w, num_heads, eps),
        (x,), (ln_scale, ln_bias, wqkv, bqkv, wproj, bproj))


def _fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads, eps):
    out = _forward(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                   num_heads, eps)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)


def _bwd(num_heads, eps, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj = res
    _, vjp = jax.vjp(lambda *a: _reference(*a, num_heads, eps),
                     x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)
    return vjp(g)


_vit_attention_block_vjp.defvjp(_fwd, _bwd)


def vit_block_eligible(num_heads: int, dh: int, N: int, D: int,
                       itemsize: int) -> bool:
    """VMEM budget for the one-program-per-image schedule: x (double
    buffered) + out + qkv/attn scratch + resident weights + ~4 live fp32
    score tiles (the all-heads schedule keeps several head pipelines in
    flight — same accounting as `packed_vit_eligible`)."""
    if _packed_heads_per_program(num_heads, dh) is None:
        return False
    Np = -(-N // 8) * 8
    need = (2 * Np * D * itemsize          # x in (double buffered)
            + Np * D * itemsize            # out
            + Np * 3 * D * itemsize        # qkv scratch
            + Np * D * itemsize            # attn-out scratch
            + 4 * Np * -(-Np // _LANES) * _LANES * 4  # live score tiles
            + 4 * D * D * itemsize)        # wqkv + wproj resident
    return need <= 28 * 1024 * 1024
