"""Temporal fusion heads and small output heads.

Parity targets:
- TransformerEmbModel (CARL late fusion): `models/transformer.py:248-300`
- VanillaEmbed / EmbedModel (conv) for TCC/TCN legacy: `models/resnet_c2d.py:34-110`
- Classifier: `models/resnet_c2d.py:11-32`
- MLPHead (SimCLR projection): `models/resnet_c2d.py:112-126` — NOTE the
  reference uses PROJECTION_SIZE as the *hidden* width and outputs
  EMBEDDING_SIZE; we reproduce that exactly for checkpoint parity.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (Encoder, FCBNStack, PositionalEncoder, TorchBatchNorm,
                     TorchLinear)


class TransformerEmbModel(nn.Module):
    """Late-fusion head: spatial pool -> FC+BN stack -> linear -> pos-enc ->
    temporal transformer -> embedding. `transformer.py:248-300`.

    Input: (B, T, H, W, C) backbone features (NHWC).
    Output: (B, T, embedding_size).
    """

    hidden_channels: int
    embedding_size: int
    fc_channels: Tuple[int, ...]  # capacity-scaled
    drop_rate: float
    flatten_method: str  # max_pool | avg_pool
    num_layers: int
    num_heads: int
    d_ff: int
    train_num_frames: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, video_masks=None, train: bool = False, true_len=None):
        B, T = x.shape[0], x.shape[1]
        x = x.reshape((B * T,) + x.shape[2:])
        # AdaptiveMax/AvgPool2d(1) over the spatial grid (`transformer.py:258-262`).
        if self.flatten_method == "max_pool":
            x = jnp.max(x, axis=(1, 2))
        elif self.flatten_method == "avg_pool":
            x = jnp.mean(x, axis=(1, 2))
        else:
            raise ValueError(self.flatten_method)

        x = FCBNStack(self.fc_channels, self.drop_rate, self.axis_name,
                      name="fc_layers")(x, train)
        x = TorchLinear(self.hidden_channels, name="video_emb")(x)
        x = x.reshape(B, T, -1)
        x = PositionalEncoder(self.hidden_channels, self.drop_rate,
                              seq_len=self.train_num_frames,
                              name="video_pos_enc")(x, deterministic=not train,
                                                    true_len=true_len)
        if self.num_layers > 0:
            x = Encoder(self.hidden_channels, self.drop_rate, self.num_heads,
                        self.d_ff, self.num_layers, name="video_encoder")(
                            x, src_mask=video_masks, deterministic=not train)
        x = TorchLinear(self.embedding_size, name="embedding_layer")(x)
        return x


class VanillaEmbed(nn.Module):
    """Max-pool context embedder (`resnet_c2d.py:34-65`). Input
    (B, T*num_contexts, h, w, c); pools jointly over context frames and space."""

    embedding_size: int
    fc_channels: Tuple[int, ...]
    drop_rate: float
    num_contexts: int

    @nn.compact
    def __call__(self, x, num_frames: int, train: bool = False):
        B, total = x.shape[0], x.shape[1]
        assert total // num_frames == self.num_contexts
        x = x.reshape((B * num_frames, self.num_contexts) + x.shape[2:])
        x = jnp.max(x, axis=(1, 2, 3))  # AdaptiveMaxPool3d(1) over (ctx, h, w)
        for i, ch in enumerate(self.fc_channels):
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
            x = TorchLinear(ch, name=f"fc{i}")(x)
            x = nn.relu(x)
        x = TorchLinear(self.embedding_size, name="embedding_layer")(x)
        return x.reshape(B, num_frames, self.embedding_size)


class ConvEmbed(nn.Module):
    """3D-conv temporal context embedder (`resnet_c2d.py:67-110`).

    conv_params: sequence of (channels, kernel, tpad) — capacity-scaled
    channels; Conv3d with padding (tpad, 0, 0) like the reference.
    """

    embedding_size: int
    conv_params: Tuple[Tuple[int, int, int], ...]
    fc_channels: Tuple[int, ...]
    drop_rate: float
    num_contexts: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, num_frames: int, train: bool = False):
        B, total = x.shape[0], x.shape[1]
        assert total // num_frames == self.num_contexts
        # (B*T, ctx, h, w, c) -> conv over (ctx, h, w) with NDHWC layout.
        x = x.reshape((B * num_frames, self.num_contexts) + x.shape[2:])
        for i, (ch, k, tpad) in enumerate(self.conv_params):
            x = nn.Conv(ch, (k, k, k),
                        padding=[(tpad, tpad), (0, 0), (0, 0)],
                        name=f"conv{i}")(x)
            x = TorchBatchNorm(self.axis_name, name=f"convbn{i}")(
                x, use_running_average=not train)
            x = nn.relu(x)
        x = jnp.max(x, axis=(1, 2, 3))
        for i, ch in enumerate(self.fc_channels):
            x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
            x = TorchLinear(ch, name=f"fc{i}")(x)
            x = nn.relu(x)
        x = TorchLinear(self.embedding_size, name="embedding_layer")(x)
        return x.reshape(B, num_frames, self.embedding_size)


class Classifier(nn.Module):
    """Per-frame linear classifier (`resnet_c2d.py:11-32`)."""

    num_classes: int
    drop_rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dropout(self.drop_rate)(x, deterministic=not train)
        return TorchLinear(self.num_classes, name="fc")(x)


class MLPHead(nn.Module):
    """SimCLR projection head (`resnet_c2d.py:112-126`): Linear(emb ->
    PROJECTION_SIZE) -> BN -> ReLU -> Linear(-> emb)."""

    projection_hidden: int  # = cfg.MODEL.PROJECTION_SIZE (reference behaviour)
    embedding_size: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, l, c = x.shape
        x = x.reshape(-1, c)
        x = TorchLinear(self.projection_hidden, name="fc1")(x)
        x = TorchBatchNorm(self.axis_name, name="bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = TorchLinear(self.embedding_size, name="fc2")(x)
        return x.reshape(b, l, self.embedding_size)
