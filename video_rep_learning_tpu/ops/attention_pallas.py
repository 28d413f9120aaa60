"""Pallas flash attention (TPU) for the hot attention sites.

Where it's used (SURVEY.md §5 long-context notes):
- the frozen ViT backbone's spatial attention — 785 tokens x 12 heads x
  40-frame chunks is the FLOP-dominant attention; never materializing the
  (S, S) scores tile in HBM removes the largest transient buffer;
- the multi-entity temporal encoder — up to ntok*T = 6*240 = 1440 tokens
  (`mvformer.py:170`).

Design: non-causal flash forward (online softmax, fp32 statistics, bf16
matmul inputs) with optional per-key masking (the video padding mask). The
backward pass is a rematerialized XLA vjp of the reference attention — flash
memory behaviour in forward, standard (correct) gradients on the trainable
paths, and zero extra residuals for the frozen backbone.

Kernel layout follows the canonical JAX flash kernel: grid (B, H, nQ, nKV)
with VMEM scratch (m, l, acc) persisting across the KV (arbitrary) axis.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _attention_reference(q, k, v, kv_mask, sm_scale):
    """XLA reference (used for the rematerialized backward and as the
    numerical oracle in tests)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch, *, sm_scale, nkv):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]  # (bq, d)
    k = k_ref[0, 0]  # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (bq, bk)

    mask = mask_ref[0, 0]  # (bk,)
    s = jnp.where(mask[None, :] != 0, s, NEG_INF)

    m_prev = m_scratch[...]  # (bq, LANES)
    l_prev = l_scratch[...]
    m_curr = jnp.max(s, axis=1)[:, None]  # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])  # broadcast (bq,1) over (bq,bk)
    l_corr = alpha * l_prev
    l_next = jnp.sum(p, axis=1)[:, None] + l_corr[:, :1]
    l_next = jnp.broadcast_to(l_next, l_prev.shape)
    m_scratch[...] = m_next
    l_scratch[...] = l_next

    acc_scratch[...] = acc_scratch[...] * alpha[:, :1]
    v = v_ref[0, 0]  # (bk, d)
    acc_scratch[...] += jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == nkv - 1)
    def _():
        l_final = l_scratch[...][:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_forward(q, k, v, kv_mask, sm_scale, block_q, block_k):
    B, H, Sq, d = q.shape
    Sk = k.shape[2]
    bq = min(block_q, max(_LANES, 1 << (Sq - 1).bit_length()))
    bk = min(block_k, max(_LANES, 1 << (Sk - 1).bit_length()))
    nq = -(-Sq // bq)
    nkv = -(-Sk // bk)

    qp = _pad_to(q, nq * bq, 2)
    kp = _pad_to(k, nkv * bk, 2)
    vp = _pad_to(v, nkv * bk, 2)
    if kv_mask is None:
        kv_mask = jnp.ones((B, Sk), jnp.float32)
    maskp = _pad_to(kv_mask.astype(jnp.float32), nkv * bk, 1)[:, None, :]

    kernel = functools.partial(_flash_kernel, sm_scale=sm_scale, nkv=nkv)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, H, nq, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik: (b, h, ik, 0)),
                pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik: (b, h, ik, 0)),
                pl.BlockSpec((1, 1, bk), lambda b, h, iq, ik: (b, 0, ik)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, d),
                                   lambda b, h, iq, ik: (b, h, iq, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, _LANES), jnp.float32),
                pltpu.VMEM((bq, _LANES), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(qp, kp, vp, maskp)
    return out[:, :, :Sq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, kv_mask=None, sm_scale=1.0, block_q=1024,
                    block_k=1024):
    """softmax(q k^T * sm_scale) v with optional per-key mask.

    q, k, v: (B, H, S, d); kv_mask: (B, Sk) nonzero = attend. Forward runs
    the Pallas flash kernel; backward rematerializes via the XLA reference.
    """
    return _flash_forward(q, k, v, kv_mask, sm_scale, block_q, block_k)


def _fwd(q, k, v, kv_mask, sm_scale, block_q, block_k):
    out = _flash_forward(q, k, v, kv_mask, sm_scale, block_q, block_k)
    return out, (q, k, v, kv_mask)


def _bwd(sm_scale, block_q, block_k, res, g):
    q, k, v, kv_mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _attention_reference(
        q_, k_, v_, kv_mask, sm_scale), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)


def mha_with_flash(q, k, v, kv_mask=None):
    """Drop-in scaled-dot-product attention: scale = 1/sqrt(d)."""
    d = q.shape[-1]
    return flash_attention(q, k, v, kv_mask, 1.0 / math.sqrt(d))
