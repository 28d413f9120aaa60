"""Pallas flash attention (TPU) for the hot attention sites.

Where it's used (SURVEY.md §5 long-context notes):
- the frozen ViT backbone's spatial attention — 785 tokens x 12 heads x
  40-frame chunks is the FLOP-dominant attention (`transformer.py:186-214`);
  the (S, S) fp32 score tensor never touches HBM;
- the multi-entity temporal encoder — up to ntok*T = 6*240 = 1440 tokens
  (`mvformer.py:170`) — and the CARL embedder encoder.

Two kernels, dispatched by KV length:

1. FUSED (the default for every real workload shape, Sk_padded <= ~8K):
   grid (B, H, nQ); K and V stay resident in VMEM for the whole (b, h)
   program, each q-block computes its full score row-block in VMEM
   (bf16 matmul inputs, fp32 accumulation), does an exact one-shot softmax
   (no online rescaling), and writes the output plus the log-sum-exp rows.
   The BACKWARD is an equally fused Pallas kernel: probabilities are
   recomputed from the saved LSE, dq is written per q-block and dk/dv
   accumulate in VMEM scratch across the (arbitrary) q axis — training
   never materializes an (S, S) buffer either.

2. STREAMING (memory valve for Sk beyond VMEM): the classic online-softmax
   flash kernel with m/l running statistics; backward rematerializes via the
   XLA reference (this path is only reachable far beyond the model family's
   shapes).

Shapes are padded to lane (128) multiples; padded keys are masked with a
finite NEG_INF (fully-masked rows softmax to uniform instead of NaN, same as
the XLA reference path in `models/layers.py`).
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

# VMEM budgets for choosing between the fused and streaming kernels
_FUSED_MAX_KV_BYTES = 4 * 1024 * 1024   # K + V resident per (b, h)
_FUSED_MAX_SCORE_BYTES = 6 * 1024 * 1024  # one q-block's fp32 score tile


def _attention_reference(q, k, v, kv_mask, sm_scale):
    """XLA reference (numerical oracle in tests; backward for the streaming
    kernel)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(n, m):
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# fused kernel (K/V resident in VMEM) — forward + real Pallas backward
# ---------------------------------------------------------------------------

def _fused_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                      sm_scale):
    q = q_ref[0, 0]  # (bq, d)
    k = k_ref[0, 0]  # (Sk, d)
    v = v_ref[0, 0]  # (Sk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (bq, Sk) fp32
    mask = mask_ref[0, 0]  # (Sk,)
    s = jnp.where(mask[None, :] != 0, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)  # (bq, 1), > 0 (finite NEG_INF)
    o = jax.lax.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)  # (bq, d) fp32
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)
    lse_ref[0, 0, 0] = (m + jnp.log(l))[:, 0]


def _fused_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      mask_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                      sm_scale, nq):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]    # (bq, d)
    k = k_ref[0, 0]    # (Sk, d)
    v = v_ref[0, 0]    # (Sk, d)
    do = do_ref[0, 0]  # (bq, d)
    lse = lse_ref[0, 0, 0][:, None]      # (bq, 1)
    delta = delta_ref[0, 0, 0][:, None]  # (bq, 1) = rowsum(do * o)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    mask = mask_ref[0, 0]
    s = jnp.where(mask[None, :] != 0, s, NEG_INF)
    p = jnp.exp(s - lse)  # normalized probabilities, (bq, Sk) fp32

    pc = p.astype(do.dtype)
    # dv += p^T @ do
    dv_acc[...] += jax.lax.dot_general(
        pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # dp = do @ v^T
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * sm_scale  # (bq, Sk) fp32
    dsc = ds.astype(k.dtype)
    dq_ref[0, 0] = jax.lax.dot(
        dsc, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    # dk += ds^T @ q
    dk_acc[...] += jax.lax.dot_general(
        dsc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _fused_block_q(Sqp: int, Skp: int) -> int:
    """Largest q block (multiple of 128, <= Sqp) whose fp32 score tile fits
    the VMEM budget."""
    bq_max = max(_LANES, (_FUSED_MAX_SCORE_BYTES // (4 * Skp)) // _LANES * _LANES)
    return min(Sqp, bq_max)


def _fused_fits(Sk: int, d: int, itemsize: int) -> bool:
    Skp = _round_up(Sk, _LANES)
    return 2 * Skp * max(d, _LANES) * itemsize <= _FUSED_MAX_KV_BYTES


def _single_q_block(Sq: int, Sk: int) -> bool:
    """True when one q block covers the whole sequence within the score
    budget — then every BlockSpec equals the array dims and NO padding ops
    are emitted (profiling showed pad/slice copies costing ~45 ms/step on
    the MVF workload at the padded-block layout)."""
    Skp = _round_up(Sk, _LANES)
    return Sq * Skp * 4 <= _FUSED_MAX_SCORE_BYTES


def _fused_forward(q, k, v, kv_mask, sm_scale):
    B, H, Sq, d = q.shape
    Sk = k.shape[2]
    if _single_q_block(Sq, Sk):
        Sqp, Skp, bq, nq = Sq, Sk, Sq, 1
        qp, kp, vp = q, k, v
    else:
        Skp = _round_up(Sk, _LANES)
        bq = _fused_block_q(_round_up(Sq, _LANES), Skp)
        nq = -(-Sq // bq)
        Sqp = nq * bq  # pad q to a whole number of blocks: no tail rows lost
        qp = _pad_to(q, Sqp, 2)
        kp = _pad_to(k, Skp, 2)
        vp = _pad_to(v, Skp, 2)
    if kv_mask is None:
        kv_mask = jnp.ones((B, Sk), jnp.float32)
    maskp = _pad_to(kv_mask.astype(jnp.float32), Skp, 1)[:, None, :]

    out, lse = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, sm_scale=sm_scale),
        out_shape=(jax.ShapeDtypeStruct(qp.shape, q.dtype),
                   jax.ShapeDtypeStruct((B, H, 1, Sqp), jnp.float32)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, H, nq),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b, h, iq: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, Skp, d), lambda b, h, iq: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Skp, d), lambda b, h, iq: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Skp), lambda b, h, iq: (b, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, bq, d), lambda b, h, iq: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, 1, bq), lambda b, h, iq: (b, h, 0, iq)),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(qp, kp, vp, maskp)
    return out[:, :, :Sq], lse


def _fused_backward(q, k, v, kv_mask, o, lse, g, sm_scale):
    B, H, Sq, d = q.shape
    Sk = k.shape[2]
    if _single_q_block(Sq, Sk):
        Sqp, Skp, bq, nq = Sq, Sk, Sq, 1
        qp, kp, vp, gp = q, k, v, g
    else:
        Skp = _round_up(Sk, _LANES)
        bq = _fused_block_q(_round_up(Sq, _LANES), Skp)
        nq = -(-Sq // bq)
        Sqp = nq * bq  # matches _fused_forward: lse already has these rows
        qp = _pad_to(q, Sqp, 2)
        kp = _pad_to(k, Skp, 2)
        vp = _pad_to(v, Skp, 2)
        gp = _pad_to(g, Sqp, 2)  # zero cotangents on padded rows
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    deltap = _pad_to(delta, Sqp, 2)[:, :, None, :]  # (B, H, 1, Sqp)
    lsep = lse  # already (B, H, 1, Sqp) from forward
    if kv_mask is None:
        kv_mask = jnp.ones((B, Sk), jnp.float32)
    maskp = _pad_to(kv_mask.astype(jnp.float32), Skp, 1)[:, None, :]

    dq, dk, dv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, sm_scale=sm_scale, nq=nq),
        out_shape=(jax.ShapeDtypeStruct(qp.shape, q.dtype),
                   jax.ShapeDtypeStruct(kp.shape, k.dtype),
                   jax.ShapeDtypeStruct(vp.shape, v.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, H, nq),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b, h, iq: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, Skp, d), lambda b, h, iq: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Skp, d), lambda b, h, iq: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, bq, d), lambda b, h, iq: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, 1, bq), lambda b, h, iq: (b, h, 0, iq)),
                pl.BlockSpec((1, 1, 1, bq), lambda b, h, iq: (b, h, 0, iq)),
                pl.BlockSpec((1, 1, Skp), lambda b, h, iq: (b, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, bq, d), lambda b, h, iq: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, Skp, d), lambda b, h, iq: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Skp, d), lambda b, h, iq: (b, h, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((Skp, d), jnp.float32),
                pltpu.VMEM((Skp, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qp, kp, vp, gp, lsep, deltap, maskp)
    return dq[:, :, :Sq], dk[:, :, :Sk], dv[:, :, :Sk]


# ---------------------------------------------------------------------------
# streaming kernel (online softmax) — memory valve for huge Sk
# ---------------------------------------------------------------------------

def _stream_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
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

    m_prev = m_scratch[...]  # (bq, 1)
    l_prev = l_scratch[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = jnp.sum(p, axis=1, keepdims=True) + alpha * l_prev
    m_scratch[...] = m_next
    l_scratch[...] = l_next

    acc_scratch[...] = acc_scratch[...] * alpha
    v = v_ref[0, 0]  # (bk, d)
    acc_scratch[...] += jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == nkv - 1)
    def _():
        l_final = l_scratch[...]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _stream_forward(q, k, v, kv_mask, sm_scale, block_q, block_k):
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

    kernel = functools.partial(_stream_kernel, sm_scale=sm_scale, nkv=nkv)
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
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(qp, kp, vp, maskp)
    return out[:, :, :Sq]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attention_vjp(q, k, v, kv_mask=None, sm_scale=1.0, block_q=1024,
                         block_k=1024):
    if _fused_fits(k.shape[2], q.shape[3], q.dtype.itemsize):
        out, _ = _fused_forward(q, k, v, kv_mask, sm_scale)
        return out
    return _stream_forward(q, k, v, kv_mask, sm_scale, block_q, block_k)


def flash_attention(q, k, v, kv_mask=None, sm_scale=1.0, block_q=1024,
                    block_k=1024):
    """softmax(q k^T * sm_scale) v with optional per-key mask.

    q, k, v: (B, H, S, d); kv_mask: (B, Sk) nonzero = attend. Dispatches to
    the fused VMEM-resident kernel (with a fully fused Pallas backward) for
    every realistic Sk; the streaming online-softmax kernel (XLA-remat
    backward) is the valve beyond VMEM capacity. Runs per batch shard under
    a multi-device pure-DP mesh (see `parallel.sharding.dp_kernel_call`).
    """
    from ..parallel.sharding import dp_kernel_call

    if kv_mask is None:
        return dp_kernel_call(
            lambda a, b, c: _flash_attention_vjp(a, b, c, None, sm_scale,
                                                 block_q, block_k),
            (q, k, v))
    return dp_kernel_call(
        lambda a, b, c, m: _flash_attention_vjp(a, b, c, m, sm_scale,
                                                block_q, block_k),
        (q, k, v, kv_mask))


def _fwd(q, k, v, kv_mask, sm_scale, block_q, block_k):
    if _fused_fits(k.shape[2], q.shape[3], q.dtype.itemsize):
        out, lse = _fused_forward(q, k, v, kv_mask, sm_scale)
        return out, (q, k, v, kv_mask, out, lse)
    out = _stream_forward(q, k, v, kv_mask, sm_scale, block_q, block_k)
    return out, (q, k, v, kv_mask, None, None)


def _bwd(sm_scale, block_q, block_k, res, g):
    q, k, v, kv_mask, o, lse = res
    if lse is not None:
        dq, dk, dv = _fused_backward(q, k, v, kv_mask, o, lse, g, sm_scale)
        return dq, dk, dv, None
    _, vjp = jax.vjp(lambda q_, k_, v_: _attention_reference(
        q_, k_, v_, kv_mask, sm_scale), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention_vjp.defvjp(_fwd, _bwd)


def mha_with_flash(q, k, v, kv_mask=None):
    """Drop-in scaled-dot-product attention: scale = 1/sqrt(d)."""
    d = q.shape[-1]
    return flash_attention(q, k, v, kv_mask, 1.0 / math.sqrt(d))


# ---------------------------------------------------------------------------
# packed-QKV attention for the ViT backbone
# ---------------------------------------------------------------------------
#
# The ViT's qkv projection emits (B, N, 3D). The standard layout needs three
# (B, N, H, dh) -> (B, H, N, dh) transposes in and one out, plus lane padding
# — profiling the MVF step showed those copies/pads costing more than the
# attention math itself. This kernel consumes the packed tensor directly:
# grid (B, H) with the head axis INNERMOST and index maps constant in h, so
# the (N, 3D) block is DMA'd once per image and each head program slices its
# d-wide lanes in VMEM. Output lanes accumulate per head into one (N, D)
# block. Forward-only in spirit (the backbone is frozen); the custom_vjp
# backward falls back to the XLA reference for the rare finetuned-ViT-block
# configs.

def _packed_heads_per_program(num_heads: int, dh: int):
    """Heads grouped per grid step so every dynamic lane offset is a multiple
    of 128 (Mosaic's lane-slice provability requirement). dh == 64 for every
    supported ViT (S/B/L/G all use 64-wide heads) -> 2 heads per program."""
    if dh >= _LANES:
        return 1 if dh % _LANES == 0 else None
    if _LANES % dh != 0:
        return None
    hp = _LANES // dh
    return hp if num_heads % hp == 0 else None


def packed_vit_eligible(num_heads: int, dh: int, N: int = 0,
                        itemsize: int = 2) -> bool:
    if _packed_heads_per_program(num_heads, dh) is None:
        return False
    # VMEM budget: double-buffered (N, 3D) input + (N, D) output + ~4 live
    # fp32 score tiles (the all-heads-per-program schedule keeps several
    # head pipelines in flight — ViT-B/8 bf16 measures 17.45 MB scoped).
    # fp32 ViT-B/8 (no-AMP) overflows -> standard flash path.
    D = num_heads * dh
    Np = _round_up(max(N, 1), 8)
    need = (2 * Np * 3 * D * itemsize + 2 * Np * D * itemsize
            + 4 * Np * _round_up(Np, _LANES) * 4)
    return need <= _PACKED_VMEM_CAP


# Max-free softmax bound: exp2(clip(s2, -_NOMAX_FLOOR, _NOMAX_CLAMP)) is
# EXACT softmax (the row-max shift cancels algebraically) for every row
# whose scaled logits s2 = s*log2(e) land inside the clip — i.e. |logits|
# <= ~76-83 — because 2^110 * N ~ 3e35 stays finite in fp32 and entries
# 120+ octaves below their row max contribute < 2^-120/l < fp32 epsilon of
# the sum either way. LN'd ViT activations keep attention logits well under
# ~30; beyond the bounds softmax is saturated (one-hot above, uniform-tie
# below) where the clip's tie-flattening error is immeasurable. The FLOOR
# also guarantees l >= N * 2^-120 > 0, so a pathological all-very-negative
# row degrades to uniform attention (the max-subtracted behavior) instead
# of 0/0 = NaN. Skipping the row-max pass + subtract removes ~2 of the 5
# VPU passes over the (N, N) tile: measured 61 -> 75 T/s at the ViT-B/8
# shape (tools/bench_packed_attn.py). VRL_ATTN_MAXSUB=1 restores the
# classic max-subtracted softmax.
_NOMAX_CLAMP = 110.0
_NOMAX_FLOOR = -120.0
_LOG2E = 1.4426950408889634
# Scoped-VMEM ceiling granted to the packed kernel (default limit is 16 MB;
# ViT-B/8 bf16 needs 17.45 MB under the all-heads schedule). Eligibility
# keeps a margin below the grant so compile can never stack-OOM.
_PACKED_VMEM_LIMIT = 32 * 1024 * 1024
_PACKED_VMEM_CAP = 28 * 1024 * 1024


def _use_maxsub():
    import os
    return os.environ.get("VRL_ATTN_MAXSUB", "0") == "1"


def _packed_kernel(qkv_ref, o_ref, *, hp, groups, dh, D, sm_scale, maxsub):
    # One program per image computes ALL heads: 12 independent
    # matmul->softmax->matmul chains in one schedule give Mosaic the freedom
    # to overlap head t+1's MXU score matmul with head t's VPU softmax
    # (measured ~8% over the 2-head-per-program grid).
    scale = sm_scale if maxsub else sm_scale * _LOG2E
    for g in range(groups):
        off = pl.multiple_of(g * hp * dh, _LANES)
        w = hp * dh  # 128-aligned lane slab holding `hp` heads
        qs = qkv_ref[0, :, pl.ds(off, w)]            # (N, w)
        ks = qkv_ref[0, :, pl.ds(D + off, w)]
        vs = qkv_ref[0, :, pl.ds(2 * D + off, w)]
        outs = []
        for t in range(hp):  # static unroll: value-level head split
            q = qs[:, t * dh:(t + 1) * dh]
            k = ks[:, t * dh:(t + 1) * dh]
            v = vs[:, t * dh:(t + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (N, N) fp32
            if maxsub:
                p = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
            else:
                p = jnp.exp2(jnp.clip(s, _NOMAX_FLOOR, _NOMAX_CLAMP))
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            # divide only the (N, 1) row sums; broadcast-multiply the
            # (N, dh) tile (VPU divide is multi-pass, multiply is one)
            outs.append((o * (1.0 / l)).astype(o_ref.dtype))
        o_ref[0, :, pl.ds(off, w)] = (
            outs[0] if hp == 1 else jnp.concatenate(outs, axis=1))


def _packed_forward(qkv, num_heads):
    B, N, threeD = qkv.shape
    D = threeD // 3
    dh = D // num_heads
    hp = _packed_heads_per_program(num_heads, dh)
    sm_scale = 1.0 / math.sqrt(dh)
    return pl.pallas_call(
        functools.partial(_packed_kernel, hp=hp, groups=num_heads // hp,
                          dh=dh, D=D, sm_scale=sm_scale,
                          maxsub=_use_maxsub()),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, N, threeD), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_PACKED_VMEM_LIMIT),
    )(qkv)


def _packed_split(qkv, num_heads):
    B, N, threeD = qkv.shape
    D = threeD // 3

    def heads(x):
        return x.reshape(B, N, num_heads, D // num_heads).transpose(0, 2, 1, 3)

    return heads(qkv[..., :D]), heads(qkv[..., D:2 * D]), heads(qkv[..., 2 * D:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _packed_vit_attention_vjp(qkv, num_heads):
    return _packed_forward(qkv, num_heads)


def packed_vit_attention(qkv, num_heads):
    """Multi-head self-attention straight from the packed (B, N, 3D) qkv
    projection output, returning (B, N, D) — zero layout copies on the
    frozen-backbone hot path. Runs per batch shard under a multi-device
    pure-DP mesh (see `parallel.sharding.dp_kernel_call`)."""
    from ..parallel.sharding import dp_kernel_call

    return dp_kernel_call(
        lambda a: _packed_vit_attention_vjp(a, num_heads), (qkv,))


def _packed_fwd(qkv, num_heads):
    return _packed_forward(qkv, num_heads), qkv


def _packed_bwd(num_heads, qkv, g):
    B, N, threeD = qkv.shape
    D = threeD // 3
    dh = D // num_heads
    q, k, v = _packed_split(qkv, num_heads)
    _, vjp = jax.vjp(lambda a, b, c: _attention_reference(
        a, b, c, None, 1.0 / math.sqrt(dh)), q, k, v)
    gh = g.reshape(B, N, num_heads, dh).transpose(0, 2, 1, 3)
    dq, dk, dv = vjp(gh.astype(q.dtype))

    def unheads(x):
        return x.transpose(0, 2, 1, 3).reshape(B, N, D)

    return (jnp.concatenate([unheads(dq), unheads(dk), unheads(dv)], axis=-1),)


_packed_vit_attention_vjp.defvjp(_packed_fwd, _packed_bwd)
