"""Torch checkpoint -> flax parameter import.

Covers the reference's pretrained-weight surface (SURVEY.md §2.2):
- torchvision ResNet-50 state dicts, including the BYOL / SimCLR / MoCo-v2
  key remappings (`models/resnet_c2d.py:128-183`) — used to warm-start the
  frame backbone (`transformer.py:120-121`);
- timm VisionTransformer state dicts (DINO ViT-S/B, DINOv2 L/g) — the frozen
  MV-Former backbone (`transformer.py:59`);
- full reference training checkpoints (checkpoint_epoch_*.pth with
  {epoch, model_state, optimizer_state, cfg}) for bit-parity validation of
  the eval pipeline against released CARL checkpoints.

Conventions: torch Linear weight (out, in) -> flax kernel (in, out);
torch Conv2d (O, I, kH, kW) -> flax (kH, kW, I, O); BatchNorm
weight/bias/running_mean/running_var -> scale/bias + batch_stats mean/var.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from flax import traverse_util


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _linear(sd, prefix):
    out = {("Dense_0", "kernel"): _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out[("Dense_0", "bias")] = _np(sd[prefix + ".bias"])
    return out


def _conv(sd, key):
    return np.transpose(_np(sd[key]), (2, 3, 1, 0))


def _bn(sd, prefix) -> Tuple[Dict, Dict]:
    params = {("BatchNorm_0", "scale"): _np(sd[prefix + ".weight"]),
              ("BatchNorm_0", "bias"): _np(sd[prefix + ".bias"])}
    stats = {("BatchNorm_0", "mean"): _np(sd[prefix + ".running_mean"]),
             ("BatchNorm_0", "var"): _np(sd[prefix + ".running_var"])}
    return params, stats


# ---------------------------------------------------------------------------
# ResNet-50
# ---------------------------------------------------------------------------

_RESNET_BLOCKS = {1: 3, 2: 4, 3: 6, 4: 3}


def convert_resnet50(sd, trunk_upto: int, finetune_start: int = 0):
    """torchvision resnet50 state dict -> (backbone_params, backbone_stats,
    finetune_params, finetune_stats) flat dicts keyed by tuple paths matching
    ResNet50Trunk / ResNet50Stages."""
    bb_p, bb_s, ft_p, ft_s = {}, {}, {}, {}

    # stem
    bb_p[("conv1", "kernel")] = _conv(sd, "conv1.weight")
    p, s = _bn(sd, "bn1")
    for k, v in p.items():
        bb_p[("bn1",) + k] = v
    for k, v in s.items():
        bb_s[("bn1",) + k] = v

    for layer in range(1, 5):
        in_backbone = layer <= trunk_upto
        dst_p = bb_p if in_backbone else ft_p
        dst_s = bb_s if in_backbone else ft_s
        if not in_backbone and (finetune_start == 0 or layer < finetune_start):
            continue
        for block in range(_RESNET_BLOCKS[layer]):
            tpre = f"layer{layer}.{block}"
            base = (f"layer{layer}", f"block{block}")
            for ci in (1, 2, 3):
                dst_p[base + (f"conv{ci}", "kernel")] = _conv(sd, f"{tpre}.conv{ci}.weight")
                p, s = _bn(sd, f"{tpre}.bn{ci}")
                for k, v in p.items():
                    dst_p[base + (f"bn{ci}",) + k] = v
                for k, v in s.items():
                    dst_s[base + (f"bn{ci}",) + k] = v
            if f"{tpre}.downsample.0.weight" in sd:
                dst_p[base + ("downsample_conv", "kernel")] = _conv(
                    sd, f"{tpre}.downsample.0.weight")
                p, s = _bn(sd, f"{tpre}.downsample.1")
                for k, v in p.items():
                    dst_p[base + ("downsample_bn",) + k] = v
                for k, v in s.items():
                    dst_s[base + ("downsample_bn",) + k] = v
    return bb_p, bb_s, ft_p, ft_s


def remap_byol(checkpoint) -> Dict:
    """`resnet_c2d.py:142-150`."""
    out = {}
    for key, value in checkpoint["model"].items():
        if "encoder_k" in key:
            continue
        if "encoder" in key:
            out[key.split("module.encoder.")[-1]] = value
    return out


def remap_simclr(checkpoint) -> Dict:
    """`resnet_c2d.py:128-140`."""
    out = {}
    for key, value in checkpoint["state_dict"].items():
        if "num_batches_track" in key or "momentum_encoder" in key:
            continue
        if "encoder" in key:
            key = key.split("encoder.")[-1]
            key = key.replace("v1.weight", "conv1.weight")
            key = key.replace("conconv1", "conv1")
            out[key] = value
    return out


def remap_mocov2(checkpoint) -> Dict:
    """`resnet_c2d.py:152-159`."""
    out = {}
    for key, value in checkpoint["state_dict"].items():
        if "encoder_q" in key:
            out[key.split("module.encoder_q.")[-1]] = value
    return out


def load_resnet50_backbone(cfg, path: str):
    """Load + remap a pretrained ResNet-50 checkpoint per
    MODEL.BASE_MODEL.NETWORK (`resnet_c2d.py:162-183`). Returns flat param /
    stat dicts for (backbone, res_finetune)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    network = cfg.MODEL.BASE_MODEL.NETWORK.lower()
    if "byol" in network:
        sd = remap_byol(ckpt)
    elif "simclr" in network:
        sd = remap_simclr(ckpt)
    elif "mocov2" in network:
        sd = remap_mocov2(ckpt)
    else:
        sd = ckpt if not isinstance(ckpt, dict) or "state_dict" not in ckpt \
            else ckpt["state_dict"]
    layer = cfg.MODEL.BASE_MODEL.LAYER
    trunk_upto = {3: 3, 2: 2}.get(layer, 4)
    finetune_start = {3: 4, 2: 3}.get(layer, 0)
    return convert_resnet50(sd, trunk_upto, finetune_start)


# ---------------------------------------------------------------------------
# timm ViT
# ---------------------------------------------------------------------------

def convert_vit(sd, num_frozen_blocks: int, depth: int):
    """timm VisionTransformer state dict -> (front_params, back_params) flat
    dicts matching ViTFrontEnd / ViTBackEnd. `back_params` is empty when the
    model is fully frozen (front owns the final norm)."""
    fully_frozen = num_frozen_blocks >= depth
    front, back = {}, {}
    front[("cls_token",)] = _np(sd["cls_token"])
    front[("pos_embed",)] = _np(sd["pos_embed"])
    # patch embed runs as space-to-depth + Dense (vit.py): conv kernel
    # (O, C, p, p) -> (p, p, C) row-major flattened x O
    pk = _np(sd["patch_embed.proj.weight"])  # (O, C, p, p)
    o, c, p1, p2 = pk.shape
    front[("patch_embed", "kernel")] = (
        pk.transpose(2, 3, 1, 0).reshape(p1 * p2 * c, o))
    front[("patch_embed", "bias")] = _np(sd["patch_embed.proj.bias"])

    def block_params(i):
        p = {}
        pre = f"blocks.{i}"
        p[("norm1", "scale")] = _np(sd[pre + ".norm1.weight"])
        p[("norm1", "bias")] = _np(sd[pre + ".norm1.bias"])
        p[("attn", "qkv", "kernel")] = _np(sd[pre + ".attn.qkv.weight"]).T
        p[("attn", "qkv", "bias")] = _np(sd[pre + ".attn.qkv.bias"])
        p[("attn", "proj", "kernel")] = _np(sd[pre + ".attn.proj.weight"]).T
        p[("attn", "proj", "bias")] = _np(sd[pre + ".attn.proj.bias"])
        p[("norm2", "scale")] = _np(sd[pre + ".norm2.weight"])
        p[("norm2", "bias")] = _np(sd[pre + ".norm2.bias"])
        p[("mlp_fc1", "kernel")] = _np(sd[pre + ".mlp.fc1.weight"]).T
        p[("mlp_fc1", "bias")] = _np(sd[pre + ".mlp.fc1.bias"])
        p[("mlp_fc2", "kernel")] = _np(sd[pre + ".mlp.fc2.weight"]).T
        p[("mlp_fc2", "bias")] = _np(sd[pre + ".mlp.fc2.bias"])
        return p

    for i in range(depth):
        dst = front if i < num_frozen_blocks else back
        for k, v in block_params(i).items():
            dst[(f"block{i}",) + k] = v
    norm_dst = front if fully_frozen else back
    norm_dst[("norm", "scale")] = _np(sd["norm.weight"])
    norm_dst[("norm", "bias")] = _np(sd["norm.bias"])
    return front, back


def load_vit_backbone(path: str, num_frozen_blocks: int, depth: int):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt)) if isinstance(ckpt, dict) else ckpt
    return convert_vit(sd, num_frozen_blocks, depth)


def apply_backbone_weights(params, batch_stats, backbone_p, backbone_s,
                           finetune_p=None, finetune_s=None):
    """Merge imported flat dicts into an initialized variables tree."""
    flat_p = traverse_util.flatten_dict(params)
    flat_s = traverse_util.flatten_dict(batch_stats)

    def merge(flat, sub, root):
        for path, v in sub.items():
            key = (root,) + path
            if key not in flat:
                raise KeyError(f"imported weight {key} not in model tree")
            if flat[key].shape != v.shape:
                raise ValueError(f"shape mismatch at {key}: "
                                 f"{flat[key].shape} vs {v.shape}")
            flat[key] = v.astype(np.asarray(flat[key]).dtype)

    merge(flat_p, backbone_p, "backbone")
    if backbone_s:
        merge(flat_s, backbone_s, "backbone")
    if finetune_p:
        merge(flat_p, finetune_p, "res_finetune")
    if finetune_s:
        merge(flat_s, finetune_s, "res_finetune")
    return (traverse_util.unflatten_dict(flat_p),
            traverse_util.unflatten_dict(flat_s))
