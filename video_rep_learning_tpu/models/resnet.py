"""ResNet-50 frame backbone (flax, NHWC) for the CARL workloads.

Architecture-parity with torchvision resnet50 as used by the reference
(`models/transformer.py:118-133`): conv7x7/2 - BN - ReLU - maxpool3x3/2 -
layer1..layer4 (bottleneck v1, downsample conv in the first block of each
stage). The reference splits at LAYER:
  3 -> backbone = stem..layer3 (frozen), res_finetune = layer4 (trainable)
  2 -> backbone = stem..layer2, res_finetune = layer3+layer4
  else -> backbone = stem..layer4, res_finetune = identity
Output channels are 2048 either way (`transformer.py:125,129,133`).

TPU-first: NHWC layout (XLA:TPU's native conv layout), bf16-friendly. The
frozen trunk always runs inference-mode BN (reference `backbone.eval()`,
`transformer.py:186`); the finetuned tail updates batch stats when training.
Weight import from torchvision / BYOL / SimCLR / MoCo-v2 checkpoints is in
`models/import_torch.py`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import TorchBatchNorm


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 (planes) -> 3x3/stride (planes) -> 1x1
    (4*planes), BN after each, ReLU, identity or downsample shortcut."""

    planes: int
    stride: int = 1
    downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None  # computation dtype (bf16 under USE_AMP)

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        bn = lambda name: TorchBatchNorm(self.axis_name, dtype=self.dtype,
                                         name=name)
        conv = lambda feats, k, s, name: nn.Conv(
            feats, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name)

        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x), use_running_average))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, "conv2")(out), use_running_average))
        out = bn("bn3")(conv(self.planes * 4, 1, 1, "conv3")(out), use_running_average)
        if self.downsample:
            identity = bn("downsample_bn")(
                conv(self.planes * 4, 1, self.stride, "downsample_conv")(x),
                use_running_average)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        x = Bottleneck(self.planes, self.stride, downsample=True,
                       axis_name=self.axis_name, dtype=self.dtype,
                       name="block0")(x, use_running_average)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, 1, downsample=False,
                           axis_name=self.axis_name, dtype=self.dtype,
                           name=f"block{i}")(x, use_running_average)
        return x


_STAGES = ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))


def _s2d_weights(w):
    """Exact space-to-depth reparameterization of the 7x7/2 stem kernel.

    out[i,j,o] = sum_{u,v,c} w[u,v,c,o] * x[2i+u-3, 2j+v-3, c]. Writing input
    row r = 2a+dy (a = r//2, dy = r%2), the receptive rows r in [2i-3, 2i+3]
    span s2d rows a in [i-2, i+1]; with ka = a-(i-2) in [0,4) we get
    u = 2*ka + dy - 1 (u = -1, i.e. ka=dy=0, falls outside the 7-tap kernel
    -> zero). So a 4x4 stride-1 conv over the (H/2, W/2, 4C) space-to-depth
    input with padding ((2,1),(2,1)) reproduces conv1 exactly, with
    w4[ka,kb,(dy,dx,c),o] = wpad[2ka+dy, 2kb+dx, c, o].
    """
    C = w.shape[2]
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, C, O)
    w4 = wp.reshape(4, 2, 4, 2, C, w.shape[3])         # (ka, dy, kb, dx, C, O)
    w4 = w4.transpose(0, 2, 1, 3, 4, 5)                # (ka, kb, dy, dx, C, O)
    return w4.reshape(4, 4, 4 * C, w.shape[3])


def _space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C) with channel order (dy, dx, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


class StemConv(nn.Module):
    """ResNet stem conv1 (7x7/2, pad 3, no bias) with an optional exact
    space-to-depth compute path (`VRL_S2D_STEM=1`).

    The parameter is ALWAYS the torchvision-layout (7, 7, 3, 64) HWIO kernel
    (checkpoint import/export unchanged); the s2d path derives the 4x4
    stride-1 kernel from it at trace time (tiny transform, fused by XLA).
    Motivation: the direct stem contracts only K = 7*7*3 = 147 with stride 2
    — the least MXU-friendly conv in the trunk; s2d raises it to a dense
    K = 192 stride-1 conv on a 2x2-packed input (the standard TPU ResNet
    trick, e.g. MLPerf submissions). Parity is exact by construction and
    tested (`tests/test_models.py::test_s2d_stem_matches_direct_conv`).
    """

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, x.shape[-1], 64))
        dt = self.dtype or x.dtype
        xc = x.astype(dt)
        s2d = (os.environ.get("VRL_S2D_STEM", "0") == "1"
               and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if s2d:
            return jax.lax.conv_general_dilated(
                _space_to_depth(xc), _s2d_weights(w).astype(dt),
                window_strides=(1, 1), padding=((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            xc, w.astype(dt), window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet50Trunk(nn.Module):
    """Stem + layer1..layer`upto` of ResNet-50. Input NHWC float. Always
    inference-mode BN (this is the frozen part)."""

    upto: int = 3  # last stage index included (1..4)
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = StemConv(dtype=self.dtype, name="conv1")(x)
        x = TorchBatchNorm(self.axis_name, dtype=self.dtype, name="bn1")(
            x, use_running_average=True)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, (planes, blocks, stride) in enumerate(_STAGES[: self.upto], start=1):
            x = ResNetStage(planes, blocks, stride, axis_name=self.axis_name,
                            dtype=self.dtype,
                            name=f"layer{i}")(x, use_running_average=True)
        return x


class ResNet50Stages(nn.Module):
    """layer`start`..layer`end` of ResNet-50 (the finetuned tail); BN follows
    the train flag like the reference's non-eval res_finetune
    (`transformer.py:189`)."""

    start: int
    end: int = 4
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.start, self.end + 1):
            planes, blocks, stride = _STAGES[i - 1]
            x = ResNetStage(planes, blocks, stride, axis_name=self.axis_name,
                            dtype=self.dtype,
                            name=f"layer{i}")(x, use_running_average=not train)
        return x
