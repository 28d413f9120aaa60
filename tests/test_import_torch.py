"""Weight importer tests: a synthetic torchvision-shaped ResNet-50 state
dict and a timm-shaped ViT state dict must convert into the model's exact
parameter tree (every imported tensor lands on a matching path/shape), and a
known BN statistic must flow through to the forward pass."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_rep_learning_tpu.config import get_cfg
from video_rep_learning_tpu.models import build_model
from video_rep_learning_tpu.models.import_torch import (apply_backbone_weights,
                                                        convert_resnet50,
                                                        convert_vit)

_RESNET_BLOCKS = {1: 3, 2: 4, 3: 6, 4: 3}


def synthetic_resnet50_sd(seed=0):
    """State dict with torchvision resnet50 keys/shapes (random values)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def conv(key, o, i, k):
        sd[key] = rng.randn(o, i, k, k).astype(np.float32) * 0.01

    def bn(prefix, c):
        sd[prefix + ".weight"] = np.ones(c, np.float32)
        sd[prefix + ".bias"] = np.zeros(c, np.float32)
        sd[prefix + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[prefix + ".running_var"] = np.abs(rng.randn(c).astype(np.float32)) + 1

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    in_c = 64
    for layer, planes in ((1, 64), (2, 128), (3, 256), (4, 512)):
        for block in range(_RESNET_BLOCKS[layer]):
            pre = f"layer{layer}.{block}"
            conv(pre + ".conv1.weight", planes, in_c if block == 0 else planes * 4, 1)
            bn(pre + ".bn1", planes)
            conv(pre + ".conv2.weight", planes, planes, 3)
            bn(pre + ".bn2", planes)
            conv(pre + ".conv3.weight", planes * 4, planes, 1)
            bn(pre + ".bn3", planes * 4)
            if block == 0:
                conv(pre + ".downsample.0.weight", planes * 4,
                     in_c if layer > 1 else 64, 1)
                bn(pre + ".downsample.1", planes * 4)
        in_c = planes * 4
    return sd


def test_resnet50_import_full_tree():
    cfg = get_cfg()
    cfg.IMAGE_SIZE = 64
    cfg.TRAIN.NUM_FRAMES = 2
    cfg.MODEL.BASE_MODEL.NETWORK = "Resnet50_byol"
    cfg.MODEL.BASE_MODEL.LAYER = 3
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 4
    e = cfg.MODEL.EMBEDDER_MODEL
    e.NUM_LAYERS = 1
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION = False

    model = build_model(cfg)
    x = jnp.zeros((1, 2, 64, 64, 3))
    masks = jnp.ones((1, 1, 2))
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x, 2, video_masks=masks)

    sd = synthetic_resnet50_sd()
    bb_p, bb_s, ft_p, ft_s = convert_resnet50(sd, trunk_upto=3,
                                              finetune_start=4)
    # layer4 (3 blocks) goes to the finetune tree
    assert any(p[0] == "layer4" for p in ft_p)
    params, stats = apply_backbone_weights(
        variables["params"], variables["batch_stats"], bb_p, bb_s, ft_p, ft_s)

    # a known running stat actually landed
    got = stats["backbone"]["bn1"]["BatchNorm_0"]["mean"]
    np.testing.assert_allclose(np.asarray(got), sd["bn1.running_mean"])

    out = model.apply({"params": params, "batch_stats": stats}, x, 2,
                      video_masks=masks, train=False)
    assert np.isfinite(np.asarray(out)).all()


def synthetic_vit_sd(embed_dim=32, depth=2, patch=8, img=32, seed=0):
    rng = np.random.RandomState(seed)
    n_patches = (img // patch) ** 2
    sd = {
        "cls_token": rng.randn(1, 1, embed_dim).astype(np.float32) * 0.02,
        "pos_embed": rng.randn(1, 1 + n_patches, embed_dim).astype(np.float32) * 0.02,
        "patch_embed.proj.weight": rng.randn(embed_dim, 3, patch, patch).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(embed_dim, np.float32),
        "norm.weight": np.ones(embed_dim, np.float32),
        "norm.bias": np.zeros(embed_dim, np.float32),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        sd[p + ".norm1.weight"] = np.ones(embed_dim, np.float32)
        sd[p + ".norm1.bias"] = np.zeros(embed_dim, np.float32)
        sd[p + ".attn.qkv.weight"] = rng.randn(3 * embed_dim, embed_dim).astype(np.float32) * 0.02
        sd[p + ".attn.qkv.bias"] = np.zeros(3 * embed_dim, np.float32)
        sd[p + ".attn.proj.weight"] = rng.randn(embed_dim, embed_dim).astype(np.float32) * 0.02
        sd[p + ".attn.proj.bias"] = np.zeros(embed_dim, np.float32)
        sd[p + ".norm2.weight"] = np.ones(embed_dim, np.float32)
        sd[p + ".norm2.bias"] = np.zeros(embed_dim, np.float32)
        sd[p + ".mlp.fc1.weight"] = rng.randn(4 * embed_dim, embed_dim).astype(np.float32) * 0.02
        sd[p + ".mlp.fc1.bias"] = np.zeros(4 * embed_dim, np.float32)
        sd[p + ".mlp.fc2.weight"] = rng.randn(embed_dim, 4 * embed_dim).astype(np.float32) * 0.02
        sd[p + ".mlp.fc2.bias"] = np.zeros(embed_dim, np.float32)
    return sd


@pytest.mark.parametrize("frozen_blocks", [2, 1])
def test_vit_import_full_tree(frozen_blocks):
    cfg = get_cfg()
    cfg.IMAGE_SIZE = 32
    cfg.TRAIN.NUM_FRAMES = 2
    cfg.MODEL.BASE_MODEL.NETWORK = "TIMM-vit_tiny_test"
    cfg.MODEL.BASE_MODEL.LAYER = frozen_blocks if frozen_blocks < 2 else 12
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 4
    e = cfg.MODEL.EMBEDDER_MODEL
    e.FUSION_TYPE = "smart"
    e.NUM_LAYERS = 1
    e.NUM_HEADS = 2
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    e.SMART_POOL_CHANNELS = 16
    e.SMART_TOKENS = 2
    e.SMART_FEATS = "1"
    cfg.MODEL.PROJECTION = False

    model = build_model(cfg)
    x = jnp.zeros((1, 2, 32, 32, 3))
    masks = jnp.ones((1, 1, 2))
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x, 2, video_masks=masks)

    sd = synthetic_vit_sd()
    front, back = convert_vit(sd, frozen_blocks, depth=2)
    params, stats = apply_backbone_weights(
        variables["params"], variables.get("batch_stats", {}), front, {},
        back or None, None)
    out = model.apply({"params": params, "batch_stats": stats}, x, 2,
                      video_masks=masks, train=False)
    assert np.isfinite(np.asarray(out)).all()
