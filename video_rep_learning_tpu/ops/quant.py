"""int8 dynamic-quantization matmul path for the FROZEN backbone.

Why: the v5e MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate
(394 vs 197 T/s). The r2 profile showed the MVF step's bf16 matmul floor
(~115 ms) makes the >=3x throughput target arithmetically unreachable in
bf16 — and the backbone is frozen, so its matmuls are a pure-inference
quantization problem (the best case for int8: no quantized gradients).

Scheme (standard W8A8 dynamic PTQ):
- weights: per-output-channel symmetric int8, scale_j = max_i |w_ij| / 127;
- activations: per-token (row) symmetric int8 computed on the fly,
  scale_r = max_k |x_rk| / 127 — a single VPU pass XLA fuses with the
  producer (LayerNorm / GELU epilogue);
- matmul in int8 with int32 accumulation on the MXU;
- dequant in the epilogue: y = acc * scale_r * scale_j + bias (fp32),
  which XLA fuses with the consumer.

Accuracy: per-token dynamic + per-channel weights is the strongest
practical PTQ configuration; the embedding-drift study (tools/quant_study.py,
tests/test_quant.py) gates the path by a measured drift budget instead of
assuming it. The reference has no counterpart (pure-CUDA bf16/fp16 via
autocast, `CARL_MVF/train.py:31-44`); this is a TPU-native extension and is
OFF by default (cfg MODEL.QUANTIZE_BACKBONE / env VRL_INT8_BACKBONE=1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_QMAX = 127.0
_EPS = 1e-12


def quantize_weight(w: jax.Array):
    """Per-output-channel symmetric int8. w: (K, F) fp32/bf16 ->
    (wq int8 (K, F), scale fp32 (F,))."""
    w = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), _EPS) / _QMAX
    wq = jnp.round(w / scale[None, :]).astype(jnp.int8)
    return wq, scale


def quantize_rows(x: jax.Array):
    """Per-row (token) symmetric int8. x: (..., K) -> (xq int8, scale fp32
    (..., 1))."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(ax, _EPS) / _QMAX
    xq = jnp.round(x.astype(jnp.float32) / scale).astype(jnp.int8)
    return xq, scale


def int8_matmul(xq: jax.Array, wq: jax.Array) -> jax.Array:
    """(..., K) int8 @ (K, F) int8 -> (..., F) int32 on the MXU."""
    return jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def int8_dense(x: jax.Array, kernel: jax.Array, bias: jax.Array | None,
               out_dtype=None) -> jax.Array:
    """Drop-in for `x @ kernel + bias` with W8A8 dynamic quantization.

    x: (..., K) activations (bf16/fp32); kernel: (K, F) master weights
    (quantized here, inside jit — for a frozen backbone XLA still runs the
    weight quantization once per step, O(K*F) elementwise, which is noise
    next to the O(N*K*F) matmul it enables at 2x rate).
    """
    out_dtype = out_dtype or x.dtype
    wq, wscale = quantize_weight(kernel)
    xq, xscale = quantize_rows(x)
    acc = int8_matmul(xq, wq)
    y = acc.astype(jnp.float32) * xscale * wscale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def dense_reference(x, kernel, bias, out_dtype=None):
    """The unquantized computation (numerics oracle for the drift study)."""
    out_dtype = out_dtype or x.dtype
    y = jnp.einsum("...k,kf->...f", x, kernel.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
