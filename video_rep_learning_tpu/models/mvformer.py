"""MV-Former modules: Learnable Spatial Token Pooling (LSTP) and the
Multi-entity Temporal Fusion head.

Parity targets (reference `models/mvformer.py`):
- MultiEntityTransformerEmbModel: :15-200
- LearnableTokenPooling + LSTPCrossAtt: :207-414
- FWBPooling (fixed-width baseline): :421-463

TPU-first divergence: the reference loops over the batch in Python to keep
views separate (`mvformer.py:251-265`); LSTP attention is *per-frame* (keys =
one frame's spatial tokens), so we run one batched attention over all frames
— identical math, no host loop, fully vectorized on the MXU. Per-video query
grouping (DYNAMIC_CTRL first/average) is done with reshapes.

Note `SMART_LN_KEYS` applies *L2 normalization* to keys, not LayerNorm —
faithfully reproducing `mvformer.py:404-405` (`F.normalize(K, dim=-1)`).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (Encoder, FCBNStack, PositionalEncoder, TorchLinear,
                     scaled_dot_attention)


def _kaiming_a5_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTPCrossAtt(nn.Module):
    """Cross-attention pooling with learned static and/or dynamic queries
    (`mvformer.py:275-414`). Single-head.

    Call with per-frame spatial tokens `tokens` (F, S, C_in) where F = number
    of frames across the flattened (video x view) batch, and optionally
    per-frame dynamic-query inputs `dyn_in` (F, C_dyn) plus `frames_per_video`
    for the first/average DYNAMIC_CTRL grouping.

    Returns (pooled (F, nq, C_out), attn (F, nq, S)).
    """

    num_static: int
    num_dynamic: int
    d_model: int  # SMART_POOL_CHANNELS
    d_dyn_in: Optional[int] = None
    val_pass: bool = False
    disjoint: bool = False
    ln_keys: bool = False
    dyn_ctrl: str = "separate"  # separate | first | average

    @nn.compact
    def __call__(self, tokens, dyn_in=None, frames_per_video: Optional[int] = None):
        if self.num_static == 0 and self.num_dynamic == 0:
            raise ValueError("need static and/or dynamic tokens (`mvformer.py:315-317`)")
        F = tokens.shape[0]

        K = TorchLinear(self.d_model, name="linear_K2d")(tokens)
        V = tokens if self.val_pass else TorchLinear(self.d_model, name="linear_V2d")(tokens)

        queries = []
        if self.num_static > 0:
            # Q_s + broadcast bias, kaiming_uniform(a=sqrt(5)) with torch's
            # fan-in convention for a (1, nst, d) tensor (`mvformer.py:322-329`).
            fan_in = self.num_static * self.d_model
            Q_s = self.param("Q_s", _kaiming_a5_init(fan_in),
                             (1, self.num_static, self.d_model))
            Q_s_b = self.param("Q_s_b", _kaiming_a5_init(fan_in), (self.d_model,))
            q = (Q_s + Q_s_b).astype(tokens.dtype)
            queries.append(jnp.broadcast_to(q, (F, self.num_static, self.d_model)))
        if self.num_dynamic > 0:
            assert dyn_in is not None
            if self.dyn_ctrl != "separate":
                assert frames_per_video is not None and F % frames_per_video == 0
                grouped = dyn_in.reshape(F // frames_per_video, frames_per_video, -1)
                if self.dyn_ctrl == "first":
                    per_video = grouped[:, 0]
                elif self.dyn_ctrl == "average":
                    per_video = jnp.mean(grouped, axis=1)
                else:
                    raise ValueError(self.dyn_ctrl)
                dyn_in = jnp.repeat(per_video, frames_per_video, axis=0)
            q_d = TorchLinear(self.d_model * self.num_dynamic, name="in2dynQ")(dyn_in)
            queries.append(q_d.reshape(F, self.num_dynamic, self.d_model))
        Q = jnp.concatenate(queries, axis=1)

        if self.ln_keys:
            K = K / jnp.maximum(jnp.linalg.norm(K, axis=-1, keepdims=True), 1e-12)

        out, attn = scaled_dot_attention(
            Q[:, None], K[:, None], V[:, None], mask=None,
            disjoint=self.disjoint, return_attn=True)
        return out[:, 0], attn[:, 0]


class LearnableTokenPooling(nn.Module):
    """LSTP wrapper (`mvformer.py:207-266`): projects each frame's spatial
    token grid to `num_static + num_dynamic` entity tokens."""

    num_static: int
    num_dynamic: int
    d_model: int
    d_dyn_in: Optional[int] = None
    val_pass: bool = False
    disjoint: bool = False
    ln_keys: bool = False
    dyn_ctrl: str = "separate"

    @nn.compact
    def __call__(self, tokens, dyn_in=None, frames_per_video=None):
        return LSTPCrossAtt(
            self.num_static, self.num_dynamic, self.d_model, self.d_dyn_in,
            self.val_pass, self.disjoint, self.ln_keys, self.dyn_ctrl,
            name="cross_att")(tokens, dyn_in, frames_per_video)


class FWBPooling(nn.Module):
    """Fixed-width baseline (`mvformer.py:421-463`): Linear from CLS features
    to spc*ntok channels, reshaped (spc, ntok) then token-major."""

    num_tokens: int
    d_model: int

    @nn.compact
    def __call__(self, tokens, dyn_in=None, frames_per_video=None):
        F = dyn_in.shape[0]
        x = TorchLinear(self.d_model * self.num_tokens, name="lin_conv")(dyn_in)
        x = x.reshape(F, -1, self.num_tokens)  # (F, spc, ntok) as in reference
        return jnp.moveaxis(x, 2, 1), None  # (F, ntok, spc)


class MultiEntityTransformerEmbModel(nn.Module):
    """Multi-entity temporal fusion (`mvformer.py:15-200`).

    Input: backbone feature grids (BV, T, h, w, C) NHWC and optional CLS
    features (BV*T, C_cls). Output: (BV, T, embedding_size).
    """

    hidden_channels: int
    embedding_size: int
    fc_channels: Tuple[int, ...]  # capacity-scaled; empty = identity
    drop_rate: float
    num_layers: int
    num_heads: int
    d_ff: int
    train_num_frames: int
    num_static: int
    num_dynamic: int
    pool_channels: int  # SMART_POOL_CHANNELS (or OUT_CHANNEL under VAL_PASS)
    d_dyn_in: Optional[int] = None
    one_hot_pos: str = "none"  # none | pool | enc
    smart_final: str = "max"  # max | one | avg | lin
    fixed_width_baseline: bool = False
    val_pass: bool = False
    disjoint: bool = False
    ln_keys: bool = False
    dyn_ctrl: str = "separate"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, video_masks=None, cls_emb=None, train: bool = False,
                 backbone_warmup_active: bool = False, true_len=None):
        deterministic = not train
        if backbone_warmup_active:
            # stop fine-tuning of the backbone during warmup (`mvformer.py:130-132`)
            x = jax.lax.stop_gradient(x)

        BV, T = x.shape[0], x.shape[1]
        ntok = self.num_static + self.num_dynamic
        tokens = x.reshape(BV * T, -1, x.shape[-1])  # (F, S, C)

        if self.fixed_width_baseline:
            pooling = FWBPooling(ntok, self.pool_channels, name="pooling")
        else:
            pooling = LearnableTokenPooling(
                self.num_static, self.num_dynamic, self.pool_channels,
                self.d_dyn_in, self.val_pass, self.disjoint, self.ln_keys,
                self.dyn_ctrl, name="pooling")
        x, attn = pooling(tokens, cls_emb, frames_per_video=T)
        # x: (F, ntok, Cp). Stash LSTP attention for the visualizer
        # (reference attn_holder hook, `mvformer.py:347-349,408-411`).
        if attn is not None:
            self.sow("intermediates", "lstp_attention", attn)

        if self.one_hot_pos == "pool":
            eye = jnp.eye(ntok, dtype=x.dtype)
            x = jnp.concatenate(
                [x, jnp.broadcast_to(eye[None], (x.shape[0], ntok, ntok))], axis=2)

        x = x.reshape(BV * T * ntok, -1)
        if self.fc_channels:
            x = FCBNStack(self.fc_channels, self.drop_rate, self.axis_name,
                          name="fc_layers")(x, train)
        hidden = self.hidden_channels
        if self.one_hot_pos == "enc":
            hidden -= self.num_static  # reference uses nst here (`mvformer.py:83-91`)
        x = TorchLinear(hidden, name="video_emb")(x)

        # (BV*T*ntok, hid) -> per-token temporal sequences (BV*ntok, T, hid)
        x = x.reshape(BV, T, ntok, -1)
        x = jnp.moveaxis(x, 2, 1).reshape(BV * ntok, T, x.shape[-1])
        if true_len is not None and getattr(true_len, "ndim", 0) == 1:
            # per-video true lengths (packed eval): batch-major, token-minor
            true_len = jnp.repeat(true_len, ntok)
        x = PositionalEncoder(hidden, self.drop_rate,
                              seq_len=self.train_num_frames,
                              name="video_pos_enc")(x, deterministic,
                                                    true_len=true_len)
        x = x.reshape(BV, ntok, T, x.shape[-1])

        if self.one_hot_pos == "enc":
            eye = jnp.eye(ntok, dtype=x.dtype)  # (ntok, ntok)
            oh = jnp.broadcast_to(eye[None, :, None, :], (BV, ntok, T, ntok))
            x = jnp.concatenate([x, oh], axis=3)

        x = x.reshape(BV, ntok * T, x.shape[-1])
        if self.num_layers > 0:
            vm = video_masks
            if vm is not None:
                # (BV, 1, T) -> (BV, 1, ntok*T), token-major like x
                vm = jnp.broadcast_to(vm[:, :, None, :], (BV, 1, ntok, T))
                vm = vm.reshape(BV, 1, ntok * T)
            x = Encoder(x.shape[-1], self.drop_rate, self.num_heads, self.d_ff,
                        self.num_layers, name="video_encoder")(
                            x, src_mask=vm, deterministic=deterministic)
        x = x.reshape(BV, ntok, T, x.shape[-1])

        if self.smart_final == "max":
            x = jnp.max(x, axis=1)
        elif self.smart_final == "one":
            x = x[:, 0]
        elif self.smart_final == "avg":
            x = jnp.mean(x, axis=1)
        elif self.smart_final == "lin":
            x = jnp.moveaxis(x, 1, 2).reshape(BV, T, -1)
            x = TorchLinear(x.shape[-1] // ntok, name="lin_final")(x)
        else:
            raise ValueError(self.smart_final)

        x = TorchLinear(self.embedding_size, name="embedding_layer")(x)
        return x
