"""Transformer primitives (flax) for the temporal fusion heads.

Functional parity targets (reference file:line):
- scaled dot-product attention with key masking and optional "disjoint"
  argmax-one-hot masking: `models/utils.py:11-44`
- MultiheadedAttention with separate Q/K/V input dims: `models/utils.py:47-108`
- sin-cos positional embedding with train-length interpolation (long-video
  eval support): `models/utils.py:113-145`
- pre-LN residual encoder stack with xavier-init layers: `models/utils.py:147-242`

TPU-first notes: attention here is the XLA reference path, written so the
(B, H, S, S) score tensor fuses; the Pallas flash-attention kernel in
`ops/attention_pallas.py` is used for long sequences where materializing the
score matrix is wasteful. All matmuls request fp32 accumulation so bf16
inputs still accumulate in fp32 on the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Large-negative mask fill. The reference uses -inf (`models/utils.py:21`);
# a finite value avoids NaN propagation under bf16 while being exactly
# equivalent post-softmax for any row with at least one unmasked key.
NEG_INF = -1e9


def torch_linear_kernel_init():
    """Match torch.nn.Linear default weight init: kaiming_uniform(a=sqrt(5))
    == uniform(+-1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear's default initialization so parameter
    distributions match the reference at init."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel_init = self.kernel_init or torch_linear_kernel_init()
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
        )(x)


def scaled_dot_attention(q, k, v, mask=None, disjoint: bool = False,
                         return_attn: bool = False):
    """(B, H, Sq, d) x (B, H, Sk, d) attention. `models/utils.py:11-44`.

    mask: broadcastable to (B, 1, 1, Sk); nonzero = keep.
    disjoint: post-softmax argmax-over-queries one-hot masking
    (`models/utils.py:26-33` — each *key* attends only via its argmax query).
    """
    d_k = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d_k)
    if mask is not None:
        scores = jnp.where(mask == 0, NEG_INF, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    if disjoint:
        # argmax over the query axis (dim=2 in the reference), one-hot, and
        # gate the attention matrix with it.
        nq = attn.shape[2]
        pred = jnp.argmax(attn, axis=2)  # (B, H, Sk)
        dis_mask = jax.nn.one_hot(pred, nq, dtype=attn.dtype)  # (B, H, Sk, nq)
        attn = attn * jnp.moveaxis(dis_mask, -1, -2)  # (B, H, nq, Sk)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    if return_attn:
        return out, jax.lax.stop_gradient(attn)
    return out


def _flash_eligible(seq_len_k: int, mask, batch_heads: int = 1,
                    seq_len_q: Optional[int] = None,
                    d_head: Optional[int] = None) -> bool:
    """Use the Pallas flash kernel on TPU. Measured on v5e (r2,
    tools/bench_attention.py): the fused VMEM-resident kernel beats XLA's
    attention at every model-family shape — ViT-B/8 785 tokens 1.4x fwd,
    MVF/CARL encoders 240-1440 tokens 1.1-9x fwd+bwd — so flash is the
    DEFAULT for self-attention-sized sequences. Tiny-query cross-attention
    (LSTP: ntok queries) stays on the XLA path where lane padding would
    dominate. Override with VRL_FLASH_ATTENTION=0/1."""
    import os

    flag = os.environ.get("VRL_FLASH_ATTENTION", "auto")
    if flag == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    if mask is not None and (mask.ndim != 3 or mask.shape[1] != 1):
        return False
    if flag == "1":
        return True
    if d_head is not None and d_head > 256:
        return False
    sq = seq_len_k if seq_len_q is None else seq_len_q
    return sq >= 128 and seq_len_k >= 128


class MultiheadedAttention(nn.Module):
    """MHA with independent Q/K/V model dims. `models/utils.py:47-108`."""

    d_model_Q: int
    d_model_K: int
    d_model_V: int
    H: int
    d_model: Optional[int] = None
    d_out: Optional[int] = None
    dout_p: float = 0.0
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, Q, K, V, mask=None, deterministic: bool = True):
        d_model = self.d_model or self.d_model_Q
        d_out = self.d_out or self.d_model_Q
        assert d_model % self.H == 0
        d_k = d_model // self.H
        B, Sq, _ = Q.shape

        lin = lambda feats, name: TorchLinear(feats, kernel_init=self.kernel_init, name=name)
        q = lin(d_model, "linear_Q2d")(Q)
        k = lin(d_model, "linear_K2d")(K)
        v = lin(d_model, "linear_V2d")(V)

        from ..parallel.sharding import shard_heads

        q = shard_heads(q.reshape(B, -1, self.H, d_k).transpose(0, 2, 1, 3))
        k = shard_heads(k.reshape(B, -1, self.H, d_k).transpose(0, 2, 1, 3))
        v = shard_heads(v.reshape(B, -1, self.H, d_k).transpose(0, 2, 1, 3))

        out = None
        if _flash_eligible(k.shape[2], mask, batch_heads=B * self.H,
                           seq_len_q=q.shape[2], d_head=d_k):
            from ..ops.attention_pallas import mha_with_flash

            kv_mask = None if mask is None else mask[:, 0]  # (B, Sk)
            out = mha_with_flash(q, k, v, kv_mask)
        if out is None:
            m = mask[:, None] if mask is not None else None  # (B,1,1|Sq,Sk)
            out = scaled_dot_attention(q, k, v, m)
        # Reference applies dropout to the attention *output* (`models/utils.py:37-38`).
        out = nn.Dropout(self.dout_p)(out, deterministic=deterministic)
        out = out.transpose(0, 2, 1, 3).reshape(B, Sq, d_model)
        return lin(d_out, "linear_d2Q")(out)


def sincos_embedding(seq_len: int, d_model: int, train_len: Optional[int] = None):
    """Sin/cos positional matrix; when `train_len` is given, positions are
    linspace(0, train_len-1, seq_len) so longer-than-train sequences map into
    the trained positional range. `models/utils.py:113-126`.

    NOTE the reference's index convention: sin lands on EVEN feature indices
    (variable named `odds`) and cos on ODD indices.
    """
    even = jnp.arange(0, d_model, 2)
    odd = jnp.arange(1, d_model, 2)
    if train_len is None:
        pos = jnp.arange(seq_len, dtype=jnp.float32)
    else:
        pos = jnp.linspace(0.0, float(train_len - 1), num=seq_len)
    mat = jnp.zeros((seq_len, d_model), dtype=jnp.float32)
    mat = mat.at[:, even].set(jnp.sin(pos[:, None] / (10000.0 ** (even[None, :] / d_model))))
    mat = mat.at[:, odd].set(jnp.cos(pos[:, None] / (10000.0 ** (odd[None, :] / d_model))))
    return mat[None]  # (1, S, D)


def sincos_embedding_dynamic(S: int, d_model: int, train_len: int, true_n):
    """Positional matrix for a length-S padded buffer whose TRUE sequence
    length is the traced scalar `true_n`: positions follow the reference's
    rule (`models/utils.py:136-144`) applied to `true_n` — arange when
    true_n == train_len, else linspace(0, train_len-1, true_n). Positions at
    indices >= true_n are arbitrary (those frames are key-masked).

    `true_n` may also be a (B,) vector (packed eval: several videos of
    different true lengths share one bucket forward as batch entries) —
    the matrix is then (B, S, d_model), one positional ramp per entry."""
    idx = jnp.arange(S, dtype=jnp.float32)
    true_n = jnp.asarray(true_n, jnp.float32)
    batched = true_n.ndim == 1
    tn = true_n[:, None] if batched else true_n  # (B, 1) | scalar
    interp = idx[None] * (train_len - 1) / jnp.maximum(tn - 1.0, 1.0)
    pos = jnp.where(tn == train_len, idx[None], interp)  # (B|1, S)
    even = jnp.arange(0, d_model, 2)
    odd = jnp.arange(1, d_model, 2)
    mat = jnp.zeros(pos.shape + (d_model,), dtype=jnp.float32)
    mat = mat.at[..., even].set(
        jnp.sin(pos[..., None] / (10000.0 ** (even / d_model))))
    mat = mat.at[..., odd].set(
        jnp.cos(pos[..., None] / (10000.0 ** (odd / d_model))))
    return mat  # (B, S, D) batched, (1, S, D) scalar


class PositionalEncoder(nn.Module):
    """Adds (interpolated) sin-cos positions + dropout. `models/utils.py:128-145`.

    `true_len`: optional traced true sequence length when x is padded to a
    bucketed static shape (eval-time chunking, `evaluate.py:45-63`)."""

    d_model: int
    dout_p: float
    seq_len: int = 3660

    @nn.compact
    def __call__(self, x, deterministic: bool = True, true_len=None):
        S = x.shape[1]
        if true_len is not None:
            pe = sincos_embedding_dynamic(S, x.shape[2], self.seq_len,
                                          true_len).astype(x.dtype)
        else:
            train_len = self.seq_len if S != self.seq_len else None
            pe = sincos_embedding(S, x.shape[2], train_len).astype(x.dtype)
        x = x + pe
        return nn.Dropout(self.dout_p)(x, deterministic=deterministic)


class PositionwiseFeedForward(nn.Module):
    """`models/utils.py:176-194`."""

    d_model: int
    d_ff: int
    dout_p: float
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TorchLinear(self.d_ff, kernel_init=self.kernel_init, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dout_p)(x, deterministic=deterministic)
        return TorchLinear(self.d_model, kernel_init=self.kernel_init, name="fc2")(x)


class EncoderLayer(nn.Module):
    """Pre-LN residual encoder layer, xavier-uniform init on weight matrices
    (`models/utils.py:196-226`): x + Dropout(SelfAtt(LN(x))) then
    x + Dropout(FF(LN(x))). FF's internal dropout is 0 in the reference
    (`models/utils.py:205`)."""

    d_model: int
    dout_p: float
    H: int = 8
    d_ff: Optional[int] = None

    @nn.compact
    def __call__(self, x, src_mask=None, deterministic: bool = True):
        d_ff = self.d_ff or 4 * self.d_model
        xavier = nn.initializers.xavier_uniform()

        from ..parallel.sharding import shard_tokens

        # Ulysses mode: LN/FFN/projections run token-sharded; attention
        # re-shards to head-parallel (shard_heads in MultiheadedAttention) —
        # XLA inserts the all-to-alls at the two layout switches
        x = shard_tokens(x)
        res = nn.LayerNorm(name="norm0")(x)
        res = MultiheadedAttention(
            self.d_model, self.d_model, self.d_model, self.H,
            kernel_init=xavier, name="self_att",
        )(res, res, res, mask=src_mask, deterministic=deterministic)
        x = shard_tokens(x + nn.Dropout(self.dout_p)(res,
                                                     deterministic=deterministic))

        res = nn.LayerNorm(name="norm1")(x)
        res = PositionwiseFeedForward(
            self.d_model, d_ff, dout_p=0.0, kernel_init=xavier, name="feed_forward",
        )(res, deterministic=deterministic)
        return x + nn.Dropout(self.dout_p)(res, deterministic=deterministic)


class Encoder(nn.Module):
    """N-layer encoder. `models/utils.py:228-242`."""

    d_model: int
    dout_p: float
    H: int
    d_ff: int
    N: int

    @nn.compact
    def __call__(self, x, src_mask=None, deterministic: bool = True):
        for i in range(self.N):
            x = EncoderLayer(self.d_model, self.dout_p, self.H, self.d_ff,
                             name=f"layer{i}")(x, src_mask, deterministic)
        return x


class TorchBatchNorm(nn.Module):
    """BatchNorm matching torch BatchNorm1d semantics (momentum 0.1 torch ==
    0.9 flax, eps 1e-5). Under pjit-style data parallelism the batch axis is
    globally sharded, so batch-stat reductions are global means — XLA inserts
    the cross-replica collectives, giving SyncBatchNorm parity
    (`train.py:283`) without explicit psum. `axis_name` additionally supports
    shard_map contexts."""

    axis_name: Optional[str] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None  # computation/output dtype (bf16 under AMP)

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            axis_name=self.axis_name if not use_running_average else None,
        )(x)


class FCBNStack(nn.Module):
    """The Dropout -> Linear -> BatchNorm1d -> ReLU stacks used by the fusion
    embedders (`transformer.py:264-272`, `mvformer.py:73-81`)."""

    channels: tuple  # already capacity-scaled
    drop_rate: float
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate(self.channels):
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
            x = TorchLinear(ch, name=f"fc{i}")(x)
            x = TorchBatchNorm(self.axis_name, name=f"bn{i}")(
                x, use_running_average=not train)
            x = nn.relu(x)
        return x
