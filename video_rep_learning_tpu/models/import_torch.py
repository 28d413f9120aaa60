"""Torch checkpoint <-> flax parameter import/export.

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


# ---------------------------------------------------------------------------
# full reference CARL checkpoints (`checkpoint_epoch_*.pth`)
# ---------------------------------------------------------------------------

def convert_carl_checkpoint(model_state, layer: int):
    """Reference `TransformerModel` (ResNet CARL family) checkpoint
    `model_state` dict -> (params_flat, stats_flat) tuple-path dicts over the
    CARLModel tree — enables evaluating the reference's released checkpoints
    (`CARL_MVF/README.md:121-131`) for real parity.

    Key layout (from `models/transformer.py:118-139` + `models/__init__.py:17-29`):
    - backbone.* is an nn.Sequential slice of torchvision resnet50 children:
      0=conv1, 1=bn1, 4=layer1, 5=layer2, 6=layer3(, 7=layer4 when fully
      frozen); res_finetune.* is layer4 (LAYER=3) or Sequential(layer3,
      layer4) (LAYER=2)
    - embed.* is TransformerEmbModel (`transformer.py:248-283`): fc_layers
      Sequential groups [Dropout, Linear, BN, ReLU] (Linear at 4g+1, BN at
      4g+2), video_emb, video_encoder.enc_layers.N.{res_layer0.norm,
      self_att.linear_*, res_layer1.norm, feed_forward.fc*}, embedding_layer
    - ssl_projection.net.{0,1,3} = MLPHead Linear/BN/Linear (`resnet_c2d.py:112-126`)
    - classifier.fc_layers.1 (`resnet_c2d.py:11-32`)

    Returns dicts mapping tuple paths (for `traverse_util`) to numpy arrays;
    any state-dict key NOT consumed raises (protects against silent drops).
    """
    sd = dict(model_state)
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    # -- backbone / res_finetune: rebuild canonical torchvision names -------
    seq_to_name = {0: "conv1", 1: "bn1", 4: "layer1", 5: "layer2",
                   6: "layer3", 7: "layer4"}
    canon = {}
    for k in list(sd):
        if k.startswith("backbone."):
            idx, rest = k[len("backbone."):].split(".", 1)
            canon[f"{seq_to_name[int(idx)]}.{rest}"] = take(k)
        elif k.startswith("res_finetune."):
            rest = k[len("res_finetune."):]
            if layer == 3:
                canon["layer4." + rest] = take(k)
            elif layer == 2:
                idx, tail = rest.split(".", 1)
                canon[f"layer{3 + int(idx)}.{tail}"] = take(k)
            else:
                raise ValueError(
                    f"unexpected res_finetune weights for LAYER={layer}")
    trunk_upto = {3: 3, 2: 2}.get(layer, 4)
    ft_start = {3: 4, 2: 3}.get(layer, 0)
    bb_p, bb_s, ft_p, ft_s = convert_resnet50(canon, trunk_upto, ft_start)

    params, stats = {}, {}
    for path, v in bb_p.items():
        params[("backbone",) + path] = v
    for path, v in bb_s.items():
        stats[("backbone",) + path] = v
    for path, v in ft_p.items():
        params[("res_finetune",) + path] = v
    for path, v in ft_s.items():
        stats[("res_finetune",) + path] = v

    def put_linear(prefix, dst):
        params[dst + ("Dense_0", "kernel")] = _np(take(prefix + ".weight")).T
        if prefix + ".bias" in sd:
            params[dst + ("Dense_0", "bias")] = _np(take(prefix + ".bias"))

    def put_bn(prefix, dst):
        params[dst + ("BatchNorm_0", "scale")] = _np(take(prefix + ".weight"))
        params[dst + ("BatchNorm_0", "bias")] = _np(take(prefix + ".bias"))
        stats[dst + ("BatchNorm_0", "mean")] = _np(take(prefix + ".running_mean"))
        stats[dst + ("BatchNorm_0", "var")] = _np(take(prefix + ".running_var"))
        if prefix + ".num_batches_tracked" in sd:
            take(prefix + ".num_batches_tracked")  # no flax equivalent

    def put_layernorm(prefix, dst):
        params[dst + ("scale",)] = _np(take(prefix + ".weight"))
        params[dst + ("bias",)] = _np(take(prefix + ".bias"))

    # -- embed: TransformerEmbModel, or MultiEntityTransformerEmbModel when
    # the checkpoint carries LSTP pooling keys (smart fusion on a ResNet
    # backbone — the `ablate_rn50_lstp*` family) ----------------------------
    ca_pre = "embed.pooling.cross_att"
    ca_dst = ("embed", "pooling", "cross_att")
    if ca_pre + ".linear_K2d.weight" in sd:
        put_linear(ca_pre + ".linear_K2d", ca_dst + ("linear_K2d",))
        if ca_pre + ".linear_V2d.weight" in sd:  # absent under VAL_PASS
            put_linear(ca_pre + ".linear_V2d", ca_dst + ("linear_V2d",))
        if ca_pre + ".Q_s" in sd:
            params[ca_dst + ("Q_s",)] = _np(take(ca_pre + ".Q_s"))
            params[ca_dst + ("Q_s_b",)] = _np(take(ca_pre + ".Q_s_b"))
        if ca_pre + ".in2dynQ.weight" in sd:
            put_linear(ca_pre + ".in2dynQ", ca_dst + ("in2dynQ",))
    if "embed.pooling.lin_conv.weight" in sd:  # FWBPooling baseline
        put_linear("embed.pooling.lin_conv", ("embed", "pooling", "lin_conv"))

    g = 0
    while f"embed.fc_layers.{4 * g + 1}.weight" in sd:
        put_linear(f"embed.fc_layers.{4 * g + 1}", ("embed", "fc_layers", f"fc{g}"))
        put_bn(f"embed.fc_layers.{4 * g + 2}", ("embed", "fc_layers", f"bn{g}"))
        g += 1
    put_linear("embed.video_emb", ("embed", "video_emb"))
    n = 0
    while f"embed.video_encoder.enc_layers.{n}.res_layer0.norm.weight" in sd:
        base = ("embed", "video_encoder", f"layer{n}")
        pre = f"embed.video_encoder.enc_layers.{n}"
        put_layernorm(f"{pre}.res_layer0.norm", base + ("norm0",))
        put_layernorm(f"{pre}.res_layer1.norm", base + ("norm1",))
        for ln in ("linear_Q2d", "linear_K2d", "linear_V2d", "linear_d2Q"):
            put_linear(f"{pre}.self_att.{ln}", base + ("self_att", ln))
        for fc in ("fc1", "fc2"):
            put_linear(f"{pre}.feed_forward.{fc}", base + ("feed_forward", fc))
        n += 1
    if "embed.lin_final.weight" in sd:
        put_linear("embed.lin_final", ("embed", "lin_final"))
    put_linear("embed.embedding_layer", ("embed", "embedding_layer"))

    # -- ssl_projection: MLPHead -------------------------------------------
    if "ssl_projection.net.0.weight" in sd:
        put_linear("ssl_projection.net.0", ("ssl_projection", "fc1"))
        put_bn("ssl_projection.net.1", ("ssl_projection", "bn"))
        put_linear("ssl_projection.net.3", ("ssl_projection", "fc2"))

    # -- classifier ---------------------------------------------------------
    if "classifier.fc_layers.1.weight" in sd:
        put_linear("classifier.fc_layers.1", ("classifier", "fc"))

    # -- optional CLS residual ----------------------------------------------
    if "cls_res_res.weight" in sd:
        put_linear("cls_res_res", ("cls_res_res",))

    leftovers = set(sd) - consumed
    if leftovers:
        raise KeyError(f"unconverted reference weights: {sorted(leftovers)[:8]}"
                       f" (+{max(0, len(leftovers) - 8)} more)")
    return params, stats


def _merge_strict(variables, params_flat, stats_flat, optional_roots=()):
    """Merge converted flat dicts into initialized variables. Every imported
    weight must land shape-exactly, EXCEPT subtrees rooted at
    `optional_roots` that the flax config did not materialize (e.g. the
    reference's always-present `classifier` head when the eval config never
    traces classification) — those are skipped."""
    flat_p = traverse_util.flatten_dict(variables["params"])
    flat_s = traverse_util.flatten_dict(variables.get("batch_stats", {}))
    for src, flat in ((params_flat, flat_p), (stats_flat, flat_s)):
        for key, v in src.items():
            if key not in flat:
                if key[0] in optional_roots and not any(
                        k[0] == key[0] for k in flat):
                    continue
                raise KeyError(f"imported weight {key} not in model tree")
            if flat[key].shape != v.shape:
                raise ValueError(f"shape mismatch at {key}: "
                                 f"{flat[key].shape} vs {v.shape}")
            flat[key] = v.astype(np.asarray(flat[key]).dtype)
    return {"params": traverse_util.unflatten_dict(flat_p),
            "batch_stats": traverse_util.unflatten_dict(flat_s)}


def load_carl_checkpoint(path: str, variables, layer: int,
                         optional_roots=()):
    """torch.load a reference CARL checkpoint and merge it (strictly: every
    weight must land, shapes must match, modulo `optional_roots` — see
    `_merge_strict`) into initialized CARLModel variables. Returns new
    {params, batch_stats}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt) if isinstance(ckpt, dict) else ckpt
    params_flat, stats_flat = convert_carl_checkpoint(sd, layer)
    return _merge_strict(variables, params_flat, stats_flat, optional_roots)


# ---------------------------------------------------------------------------
# full reference MV-Former checkpoints (smart fusion, frozen timm backbone)
# ---------------------------------------------------------------------------

_TIMM_BLOCK_KEYS = ("norm1.weight", "norm1.bias", "attn.qkv.weight",
                    "attn.qkv.bias", "attn.proj.weight", "attn.proj.bias",
                    "norm2.weight", "norm2.bias", "mlp.fc1.weight",
                    "mlp.fc1.bias", "mlp.fc2.weight", "mlp.fc2.bias")


def _timm_vit_keys(depth: int):
    keys = {"cls_token", "pos_embed", "patch_embed.proj.weight",
            "patch_embed.proj.bias", "norm.weight", "norm.bias"}
    for i in range(depth):
        keys.update(f"blocks.{i}.{k}" for k in _TIMM_BLOCK_KEYS)
    return keys


def convert_mvf_checkpoint(model_state, depth: int):
    """Reference MV-Former `TransformerModel` checkpoint `model_state`
    (smart fusion + FULLY-FROZEN timm backbone — the flagship
    penn/fg99/fg288 MVF shape; `transformer.py:94-99` wraps the timm model
    as `backbone.model.*` via FeatureExtractor, `res_finetune` is Identity)
    -> (params_flat, stats_flat) over the CARLModel tree. The
    partially-frozen ViT split is NOT importable: the reference's
    ViTFrontEnd/ViTBackEnd hold the full model plus duplicated block refs
    (`transformer.py:342-392`), so its checkpoints carry aliased duplicates.
    Any unconsumed key raises (same strictness as the CARL converter)."""
    sd = dict(model_state)
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    if any(k.startswith("res_finetune.") for k in sd):
        raise ValueError(
            "partially-frozen ViT checkpoints are not importable "
            "(reference ViTFrontEnd/ViTBackEnd duplicate block tensors)")

    # smart fusion / late-spatial wrap the timm model in FeatureExtractor
    # (`transformer.py:94-99`) -> backbone.model.*; late-cls assigns the
    # bare model -> backbone.*
    pre = ("backbone.model." if "backbone.model.cls_token" in sd
           else "backbone.")
    vit_sd = {k[len(pre):]: take(k) for k in list(sd) if k.startswith(pre)}
    expected = _timm_vit_keys(depth)
    extra = set(vit_sd) - expected
    if extra:
        raise KeyError(f"unexpected timm backbone keys: {sorted(extra)[:8]}")
    front, back = convert_vit(vit_sd, depth, depth)
    assert not back
    params = {("backbone",) + path: v for path, v in front.items()}
    stats = {}

    def put_linear(prefix, dst):
        params[dst + ("Dense_0", "kernel")] = _np(take(prefix + ".weight")).T
        if prefix + ".bias" in sd:
            params[dst + ("Dense_0", "bias")] = _np(take(prefix + ".bias"))

    def put_bn(prefix, dst):
        params[dst + ("BatchNorm_0", "scale")] = _np(take(prefix + ".weight"))
        params[dst + ("BatchNorm_0", "bias")] = _np(take(prefix + ".bias"))
        stats[dst + ("BatchNorm_0", "mean")] = _np(
            take(prefix + ".running_mean"))
        stats[dst + ("BatchNorm_0", "var")] = _np(
            take(prefix + ".running_var"))
        if prefix + ".num_batches_tracked" in sd:
            take(prefix + ".num_batches_tracked")

    # -- embed: MultiEntityTransformerEmbModel (`mvformer.py:60-121`) -------
    ca_pre = "embed.pooling.cross_att"
    ca_dst = ("embed", "pooling", "cross_att")
    if ca_pre + ".linear_K2d.weight" in sd:
        put_linear(ca_pre + ".linear_K2d", ca_dst + ("linear_K2d",))
        if ca_pre + ".linear_V2d.weight" in sd:  # absent under VAL_PASS
            put_linear(ca_pre + ".linear_V2d", ca_dst + ("linear_V2d",))
        if ca_pre + ".Q_s" in sd:
            params[ca_dst + ("Q_s",)] = _np(take(ca_pre + ".Q_s"))
            params[ca_dst + ("Q_s_b",)] = _np(take(ca_pre + ".Q_s_b"))
        if ca_pre + ".in2dynQ.weight" in sd:
            put_linear(ca_pre + ".in2dynQ", ca_dst + ("in2dynQ",))
    if "embed.pooling.lin_conv.weight" in sd:  # FWBPooling baseline
        put_linear("embed.pooling.lin_conv", ("embed", "pooling", "lin_conv"))

    g = 0
    while f"embed.fc_layers.{4 * g + 1}.weight" in sd:
        put_linear(f"embed.fc_layers.{4 * g + 1}",
                   ("embed", "fc_layers", f"fc{g}"))
        put_bn(f"embed.fc_layers.{4 * g + 2}",
               ("embed", "fc_layers", f"bn{g}"))
        g += 1
    put_linear("embed.video_emb", ("embed", "video_emb"))

    def put_layernorm(prefix, dst):
        params[dst + ("scale",)] = _np(take(prefix + ".weight"))
        params[dst + ("bias",)] = _np(take(prefix + ".bias"))

    n = 0
    while f"embed.video_encoder.enc_layers.{n}.res_layer0.norm.weight" in sd:
        base = ("embed", "video_encoder", f"layer{n}")
        pre_n = f"embed.video_encoder.enc_layers.{n}"
        put_layernorm(f"{pre_n}.res_layer0.norm", base + ("norm0",))
        put_layernorm(f"{pre_n}.res_layer1.norm", base + ("norm1",))
        for ln in ("linear_Q2d", "linear_K2d", "linear_V2d", "linear_d2Q"):
            put_linear(f"{pre_n}.self_att.{ln}", base + ("self_att", ln))
        for fc in ("fc1", "fc2"):
            put_linear(f"{pre_n}.feed_forward.{fc}",
                       base + ("feed_forward", fc))
        n += 1
    if "embed.lin_final.weight" in sd:
        put_linear("embed.lin_final", ("embed", "lin_final"))
    put_linear("embed.embedding_layer", ("embed", "embedding_layer"))

    if "ssl_projection.net.0.weight" in sd:
        put_linear("ssl_projection.net.0", ("ssl_projection", "fc1"))
        put_bn("ssl_projection.net.1", ("ssl_projection", "bn"))
        put_linear("ssl_projection.net.3", ("ssl_projection", "fc2"))
    if "classifier.fc_layers.1.weight" in sd:
        put_linear("classifier.fc_layers.1", ("classifier", "fc"))
    if "cls_res_res.weight" in sd:
        put_linear("cls_res_res", ("cls_res_res",))

    leftovers = set(sd) - consumed
    if leftovers:
        raise KeyError(f"unconverted reference weights: {sorted(leftovers)[:8]}"
                       f" (+{max(0, len(leftovers) - 8)} more)")
    return params, stats


def load_mvf_checkpoint(path: str, variables, depth: int,
                        optional_roots=()):
    """torch.load a reference MV-Former checkpoint and merge it strictly
    into initialized CARLModel variables (cf. `load_carl_checkpoint`)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt) if isinstance(ckpt, dict) else ckpt
    params_flat, stats_flat = convert_mvf_checkpoint(sd, depth)
    return _merge_strict(variables, params_flat, stats_flat, optional_roots)


# ---------------------------------------------------------------------------
# flax -> reference checkpoint EXPORT (inverse of convert_carl_checkpoint)
# ---------------------------------------------------------------------------

def _inv_conv(v):
    """flax conv kernel (kH, kW, I, O) -> torch (O, I, kH, kW)."""
    return np.transpose(np.asarray(v, np.float32), (3, 2, 0, 1))


def _inv_linear(sd, prefix, flat_p, base, consumed):
    sd[prefix + ".weight"] = np.asarray(
        flat_p[base + ("Dense_0", "kernel")], np.float32).T
    consumed.add(base + ("Dense_0", "kernel"))
    bkey = base + ("Dense_0", "bias")
    if bkey in flat_p:
        sd[prefix + ".bias"] = np.asarray(flat_p[bkey], np.float32)
        consumed.add(bkey)


def _inv_bn(sd, prefix, flat_p, flat_s, base, consumed):
    sd[prefix + ".weight"] = np.asarray(
        flat_p[base + ("BatchNorm_0", "scale")], np.float32)
    sd[prefix + ".bias"] = np.asarray(
        flat_p[base + ("BatchNorm_0", "bias")], np.float32)
    sd[prefix + ".running_mean"] = np.asarray(
        flat_s[base + ("BatchNorm_0", "mean")], np.float32)
    sd[prefix + ".running_var"] = np.asarray(
        flat_s[base + ("BatchNorm_0", "var")], np.float32)
    # flax keeps no step counter; torch strict loads require the buffer
    sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)
    consumed.update({base + ("BatchNorm_0", "scale"),
                     base + ("BatchNorm_0", "bias")})


def convert_to_carl_state_dict(params, batch_stats, layer: int):
    """CARLModel variables -> reference-layout `model_state` dict (the exact
    inverse of `convert_carl_checkpoint`): numpy arrays keyed by the
    reference `TransformerModel` state-dict names
    (`models/transformer.py:118-139`), so a model trained HERE can be
    evaluated/visualized with the reference's own tooling. Every BatchNorm
    emits `num_batches_tracked = 0` so `load_state_dict(strict=True)`
    passes. Covers ResNet backbones with either embed head (late
    TransformerEmbModel or smart LSTP); timm-backbone families go through
    `convert_to_mvf_state_dict`. Raises on any param the reference layout
    cannot carry."""
    flat_p = traverse_util.flatten_dict(params)
    flat_s = traverse_util.flatten_dict(batch_stats or {})
    sd = {}
    consumed = set()

    def export_resnet(root):
        """Emit a flax ResNet subtree under torchvision-canonical names."""
        canon = {}
        sub = sorted(k for k in flat_p if k[0] == root)
        for key in sub:
            path = key[1:]
            if path == ("conv1", "kernel"):
                canon["conv1.weight"] = _inv_conv(flat_p[key])
                consumed.add(key)
            elif path[0] == "bn1":
                pass  # handled via _inv_bn below
            elif path[0].startswith("layer") and path[2].startswith("conv"):
                lay, blk = path[0], path[1][len("block"):]
                canon[f"{lay}.{blk}.{path[2]}.weight"] = _inv_conv(flat_p[key])
                consumed.add(key)
            elif path[0].startswith("layer") and path[2] == "downsample_conv":
                lay, blk = path[0], path[1][len("block"):]
                canon[f"{lay}.{blk}.downsample.0.weight"] = _inv_conv(
                    flat_p[key])
                consumed.add(key)
        if (root, "conv1", "kernel") in flat_p:
            canon_bn = {"bn1": ("bn1",)}
        else:
            canon_bn = {}
        for key in sub:
            path = key[1:]
            if (path[0].startswith("layer") and path[2].startswith("bn")
                    and path[-1] == "scale"):
                lay, blk = path[0], path[1][len("block"):]
                canon_bn[f"{lay}.{blk}.{path[2]}"] = (lay, path[1], path[2])
            elif (path[0].startswith("layer") and path[2] == "downsample_bn"
                  and path[-1] == "scale"):
                lay, blk = path[0], path[1][len("block"):]
                canon_bn[f"{lay}.{blk}.downsample.1"] = (lay, path[1],
                                                         "downsample_bn")
        bn_sd = {}
        for name, base in canon_bn.items():
            _inv_bn(bn_sd, name, flat_p, flat_s, (root,) + base, consumed)
            consumed.update({(root,) + base + ("BatchNorm_0", "mean"),
                             (root,) + base + ("BatchNorm_0", "var")})
        canon.update(bn_sd)
        return canon

    # -- backbone / res_finetune under the reference's Sequential names -----
    seq_of = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
              "layer3": "6", "layer4": "7"}
    for name, v in export_resnet("backbone").items():
        head, rest = name.split(".", 1)
        sd[f"backbone.{seq_of[head]}.{rest}"] = v
    if any(k[0] == "res_finetune" for k in flat_p):
        for name, v in export_resnet("res_finetune").items():
            head, rest = name.split(".", 1)
            if layer == 3:
                assert head == "layer4", name
                sd[f"res_finetune.{rest}"] = v
            elif layer == 2:
                sd[f"res_finetune.{int(head[len('layer'):]) - 3}.{rest}"] = v
            else:
                raise ValueError(
                    f"unexpected res_finetune subtree for LAYER={layer}")

    _inv_embed_head(sd, flat_p, flat_s, consumed)
    _inv_tail_heads(sd, flat_p, flat_s, consumed)

    left_p = set(flat_p) - consumed
    left_s = set(flat_s) - consumed
    if left_p or left_s:
        left = sorted(left_p | left_s)
        raise KeyError(
            "model has weights the reference CARL checkpoint layout cannot "
            f"carry: {left[:8]} (+{max(0, len(left) - 8)} more)")
    return sd


def _inv_embed_head(sd, flat_p, flat_s, consumed):
    """Emit the embed.* head — TransformerEmbModel or (when LSTP pooling
    params are present) MultiEntityTransformerEmbModel — shared by both
    backbone families' exporters."""
    def lin(prefix, base):
        _inv_linear(sd, prefix, flat_p, base, consumed)

    ca_dst = ("embed", "pooling", "cross_att")
    if ca_dst + ("linear_K2d", "Dense_0", "kernel") in flat_p:
        lin("embed.pooling.cross_att.linear_K2d", ca_dst + ("linear_K2d",))
        if ca_dst + ("linear_V2d", "Dense_0", "kernel") in flat_p:
            lin("embed.pooling.cross_att.linear_V2d",
                ca_dst + ("linear_V2d",))
        if ca_dst + ("Q_s",) in flat_p:
            sd["embed.pooling.cross_att.Q_s"] = np.asarray(
                flat_p[ca_dst + ("Q_s",)], np.float32)
            sd["embed.pooling.cross_att.Q_s_b"] = np.asarray(
                flat_p[ca_dst + ("Q_s_b",)], np.float32)
            consumed.update({ca_dst + ("Q_s",), ca_dst + ("Q_s_b",)})
        if ca_dst + ("in2dynQ", "Dense_0", "kernel") in flat_p:
            lin("embed.pooling.cross_att.in2dynQ", ca_dst + ("in2dynQ",))
    if ("embed", "pooling", "lin_conv", "Dense_0", "kernel") in flat_p:
        lin("embed.pooling.lin_conv", ("embed", "pooling", "lin_conv"))

    g = 0
    while ("embed", "fc_layers", f"fc{g}", "Dense_0", "kernel") in flat_p:
        lin(f"embed.fc_layers.{4 * g + 1}", ("embed", "fc_layers", f"fc{g}"))
        base = ("embed", "fc_layers", f"bn{g}")
        _inv_bn(sd, f"embed.fc_layers.{4 * g + 2}", flat_p, flat_s, base,
                consumed)
        consumed.update({base + ("BatchNorm_0", "mean"),
                         base + ("BatchNorm_0", "var")})
        g += 1
    lin("embed.video_emb", ("embed", "video_emb"))
    n = 0
    while ("embed", "video_encoder", f"layer{n}", "norm0",
           "scale") in flat_p:
        base = ("embed", "video_encoder", f"layer{n}")
        pre = f"embed.video_encoder.enc_layers.{n}"
        for norm, res in (("norm0", "res_layer0"), ("norm1", "res_layer1")):
            sd[f"{pre}.{res}.norm.weight"] = np.asarray(
                flat_p[base + (norm, "scale")], np.float32)
            sd[f"{pre}.{res}.norm.bias"] = np.asarray(
                flat_p[base + (norm, "bias")], np.float32)
            consumed.update({base + (norm, "scale"), base + (norm, "bias")})
        for ln in ("linear_Q2d", "linear_K2d", "linear_V2d", "linear_d2Q"):
            lin(f"{pre}.self_att.{ln}", base + ("self_att", ln))
        for fc in ("fc1", "fc2"):
            lin(f"{pre}.feed_forward.{fc}", base + ("feed_forward", fc))
        n += 1
    if ("embed", "lin_final", "Dense_0", "kernel") in flat_p:
        lin("embed.lin_final", ("embed", "lin_final"))
    lin("embed.embedding_layer", ("embed", "embedding_layer"))


def _inv_tail_heads(sd, flat_p, flat_s, consumed):
    """ssl_projection / classifier / CLS residual (shared)."""
    def lin(prefix, base):
        _inv_linear(sd, prefix, flat_p, base, consumed)

    if ("ssl_projection", "fc1", "Dense_0", "kernel") in flat_p:
        lin("ssl_projection.net.0", ("ssl_projection", "fc1"))
        base = ("ssl_projection", "bn")
        _inv_bn(sd, "ssl_projection.net.1", flat_p, flat_s, base, consumed)
        consumed.update({base + ("BatchNorm_0", "mean"),
                         base + ("BatchNorm_0", "var")})
        lin("ssl_projection.net.3", ("ssl_projection", "fc2"))
    if ("classifier", "fc", "Dense_0", "kernel") in flat_p:
        lin("classifier.fc_layers.1", ("classifier", "fc"))
    if ("cls_res_res", "Dense_0", "kernel") in flat_p:
        lin("cls_res_res", ("cls_res_res",))


def reference_optimizer_state(model_state, train_base="frozen",
                              optim_type="AdamOptimizer", lr=1e-4,
                              weight_decay=1e-5):
    """Structurally-valid torch optimizer state for an exported checkpoint:
    empty per-param state + param_groups with the reference's exact
    [bn, non-bn] grouping and TRAIN_BASE filtering
    (`utils/optimizer.py:10-52`), built by constructing that torch optimizer
    over dummy leaves. The reference loads optimizer state UNCONDITIONALLY
    on resume — including in `evaluate.py:184-185` — so exporting None would
    crash its tooling; with this, `optimizer.load_state_dict` validates the
    group structure and the moments simply start fresh."""
    import torch

    buffers = ("running_mean", "running_var", "num_batches_tracked")
    bn, non_bn = [], []
    for k in model_state:
        leaf = k.rsplit(".", 1)[-1]
        if leaf in buffers:
            continue
        mod = k.rsplit(".", 1)[0] if "." in k else ""
        is_bn = (mod + ".running_mean") in model_state and leaf in (
            "weight", "bias")
        if "backbone" in k and train_base != "train_all":
            if train_base == "frozen":
                continue
            if train_base == "only_bn" and not is_bn:
                continue
        (bn if is_bn else non_bn).append(k)

    def dummy(n):
        return [torch.zeros(1, requires_grad=True) for _ in range(n)]

    groups = [{"params": dummy(len(bn)), "weight_decay": weight_decay},
              {"params": dummy(len(non_bn)), "weight_decay": weight_decay}]
    if optim_type == "MomentumOptimizer":
        opt = torch.optim.SGD(groups, lr=lr, momentum=0.9,
                              weight_decay=weight_decay)
    elif optim_type == "AdamWOptimizer":
        opt = torch.optim.AdamW(groups, lr=lr, betas=(0.9, 0.999),
                                weight_decay=weight_decay)
    else:
        opt = torch.optim.Adam(groups, lr=lr, betas=(0.9, 0.999),
                               weight_decay=weight_decay)
    return opt.state_dict()


def _auto_optimizer_state(optimizer_state, model_state, cfg):
    """Resolve the exported optimizer_state: pass-through when given, else
    build the reference-structured empty state from cfg (plain dict or
    ConfigNode) with the reference's defaults."""
    if optimizer_state is not None:
        return optimizer_state

    def get(d, *path, default=None):
        node = d or {}
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return default
            node = node[p]
        return node if node is not None else default

    return reference_optimizer_state(
        model_state,
        train_base=get(cfg, "MODEL", "TRAIN_BASE", default="frozen"),
        optim_type=get(cfg, "OPTIMIZER", "TYPE", default="AdamOptimizer"),
        lr=get(cfg, "OPTIMIZER", "LR", "INITIAL_LR", default=1e-4),
        weight_decay=get(cfg, "OPTIMIZER", "WEIGHT_DECAY", default=1e-5))


def export_carl_checkpoint(path: str, variables, layer: int, epoch: int = 0,
                           cfg=None, optimizer_state=None):
    """Save CARLModel variables as a reference-format
    `checkpoint_epoch_*.pth` ({epoch, model_state, optimizer_state, cfg} —
    `models/__init__.py:17-29`) loadable by the reference's own
    `load_checkpoint`/`evaluate.py` with `strict=True`. The inverse of
    `load_carl_checkpoint`; round-trip tested in
    tests/test_import_torch.py."""
    import torch

    sd = convert_to_carl_state_dict(variables["params"],
                                    variables.get("batch_stats", {}), layer)
    model_state = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
                   for k, v in sd.items()}
    torch.save({"epoch": int(epoch), "model_state": model_state,
                "optimizer_state": _auto_optimizer_state(
                    optimizer_state, sd, cfg), "cfg": cfg}, path)
    return path


def convert_to_mvf_state_dict(params, batch_stats, depth: int,
                              patch_size: int, wrapped: bool = True):
    """CARLModel variables (timm-ViT-backbone families: MV-Former smart
    fusion and the late-cls/late-spatial ViT baselines, fully frozen) ->
    reference-layout `model_state` dict — the inverse of
    `convert_mvf_checkpoint`. `wrapped` picks the backbone key prefix:
    smart fusion / late-spatial wrap the timm model in FeatureExtractor
    (`transformer.py:94-99`) -> `backbone.model.*`; late-cls assigns the
    bare model -> `backbone.*`. Raises on any weight the reference layout
    cannot carry."""
    flat_p = traverse_util.flatten_dict(params)
    flat_s = traverse_util.flatten_dict(batch_stats or {})
    sd = {}
    consumed = set()
    root = "backbone.model" if wrapped else "backbone"

    # -- backbone: invert convert_vit ----------------------------------------
    def bb(*path):
        key = ("backbone",) + path
        consumed.add(key)
        return np.asarray(flat_p[key], np.float32)

    sd[f"{root}.cls_token"] = bb("cls_token")
    sd[f"{root}.pos_embed"] = bb("pos_embed")
    pk = bb("patch_embed", "kernel")  # (p*p*C, O) row-major (p, p, C)
    o = pk.shape[1]
    c = 3
    p = int(round((pk.shape[0] // c) ** 0.5))
    assert p * p * c == pk.shape[0], pk.shape
    sd[f"{root}.patch_embed.proj.weight"] = (
        pk.reshape(p, p, c, o).transpose(3, 2, 0, 1))
    assert p == patch_size, (p, patch_size)
    sd[f"{root}.patch_embed.proj.bias"] = bb("patch_embed", "bias")
    for i in range(depth):
        blk = f"block{i}"
        pre = f"{root}.blocks.{i}"
        for norm in ("norm1", "norm2"):
            sd[f"{pre}.{norm}.weight"] = bb(blk, norm, "scale")
            sd[f"{pre}.{norm}.bias"] = bb(blk, norm, "bias")
        for mod in ("attn.qkv", "attn.proj", "mlp_fc1", "mlp_fc2"):
            fpath = tuple(mod.split("."))
            tname = mod.replace("mlp_", "mlp.fc").replace("fcfc", "fc")
            sd[f"{pre}.{tname}.weight"] = bb(blk, *fpath, "kernel").T
            sd[f"{pre}.{tname}.bias"] = bb(blk, *fpath, "bias")
    sd[f"{root}.norm.weight"] = bb("norm", "scale")
    sd[f"{root}.norm.bias"] = bb("norm", "bias")

    _inv_embed_head(sd, flat_p, flat_s, consumed)
    _inv_tail_heads(sd, flat_p, flat_s, consumed)

    left = sorted((set(flat_p) - consumed) | (set(flat_s) - consumed))
    if left:
        raise KeyError(
            "model has weights the reference MVF checkpoint layout cannot "
            f"carry: {left[:8]} (+{max(0, len(left) - 8)} more)")
    return sd


def export_mvf_checkpoint(path: str, variables, depth: int, patch_size: int,
                          epoch: int = 0, cfg=None, optimizer_state=None,
                          wrapped: bool = True):
    """Save timm-backbone-family CARLModel variables as a reference-format
    `checkpoint_epoch_*.pth` (cf. `export_carl_checkpoint`)."""
    import torch

    sd = convert_to_mvf_state_dict(variables["params"],
                                   variables.get("batch_stats", {}), depth,
                                   patch_size, wrapped=wrapped)
    model_state = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
                   for k, v in sd.items()}
    torch.save({"epoch": int(epoch), "model_state": model_state,
                "optimizer_state": _auto_optimizer_state(
                    optimizer_state, sd, cfg), "cfg": cfg}, path)
    return path
