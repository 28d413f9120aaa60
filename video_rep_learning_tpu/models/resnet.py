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

from typing import Any, Optional

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


class ResNet50Trunk(nn.Module):
    """Stem + layer1..layer`upto` of ResNet-50. Input NHWC float. Always
    inference-mode BN (this is the frozen part)."""

    upto: int = 3  # last stage index included (1..4)
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
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
