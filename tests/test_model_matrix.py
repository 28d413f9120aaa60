"""Shape/jit coverage of the model option matrix (SURVEY.md §4 item (b)):
every FUSION_TYPE / SMART_* / LATE_TYPE / embedder combination the reference
supports must build, init, and produce (BV, T, emb) embeddings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_rep_learning_tpu.config import get_cfg
from video_rep_learning_tpu.models import build_model


def base_cfg():
    cfg = get_cfg()
    cfg.IMAGE_SIZE = 32
    cfg.TRAIN.NUM_FRAMES = 4
    cfg.EVAL.NUM_FRAMES = 4
    cfg.MODEL.BASE_MODEL.NETWORK = "TIMM-vit_tiny_test"
    cfg.MODEL.BASE_MODEL.LAYER = 12  # fully frozen (>= depth 2)
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 8
    e = cfg.MODEL.EMBEDDER_MODEL
    e.NUM_LAYERS = 1
    e.NUM_HEADS = 2
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    e.SMART_POOL_CHANNELS = 16
    e.SMART_TOKENS = 2
    cfg.MODEL.PROJECTION_SIZE = 8
    return cfg


def run_model(cfg, project=True, classification=False):
    model = build_model(cfg)
    T = cfg.TRAIN.NUM_FRAMES
    S = cfg.IMAGE_SIZE
    x = jnp.asarray(np.random.RandomState(0).rand(2, T, S, S, 3), jnp.float32)
    masks = jnp.ones((2, 1, T), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x, T, video_masks=masks, project=project,
                           classification=classification)
    out = model.apply(variables, x, T, video_masks=masks, project=project,
                      classification=classification, train=False)
    return model, np.asarray(out)


CASES = {
    "late_cls": {},
    "late_spatial": {"MODEL.EMBEDDER_MODEL.LATE_TYPE": "spatial",
                     "MODEL.EMBEDDER_MODEL.SMART_FEATS": "0,1"},
    "smart_pool_one": {"MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                       "MODEL.EMBEDDER_MODEL.SMART_ONE_HOT": "pool",
                       "MODEL.EMBEDDER_MODEL.SMART_FINAL": "one",
                       "MODEL.EMBEDDER_MODEL.SMART_FEATS": "0,1"},
    "smart_enc_max": {"MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                      "MODEL.EMBEDDER_MODEL.SMART_ONE_HOT": "enc",
                      "MODEL.EMBEDDER_MODEL.SMART_FINAL": "max"},
    "smart_avg_valpass": {"MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                          "MODEL.EMBEDDER_MODEL.SMART_FINAL": "avg",
                          "MODEL.EMBEDDER_MODEL.VAL_PASS": True},
    "smart_lin": {"MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                  "MODEL.EMBEDDER_MODEL.SMART_FINAL": "lin"},
    "smart_fwb": {"MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                  "MODEL.EMBEDDER_MODEL.FIXED_WIDTH_BASELINE": True},
    "smart_disjoint_lnkeys": {"MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                              "MODEL.EMBEDDER_MODEL.SMART_DISJOINT": True,
                              "MODEL.EMBEDDER_MODEL.SMART_LN_KEYS": True},
    "smart_dynamic_separate": {"MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                               "MODEL.EMBEDDER_MODEL.SMART_DYNAMIC_TOKENS": 1},
    "smart_dynamic_first": {"MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                            "MODEL.EMBEDDER_MODEL.SMART_DYNAMIC_TOKENS": 1,
                            "MODEL.EMBEDDER_MODEL.DYNAMIC_CTRL": "first"},
    "smart_dynamic_average": {"MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                              "MODEL.EMBEDDER_MODEL.SMART_DYNAMIC_TOKENS": 1,
                              "MODEL.EMBEDDER_MODEL.DYNAMIC_CTRL": "average"},
    "smart_dynamic_only": {"MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                           "MODEL.EMBEDDER_MODEL.SMART_TOKENS": 0,
                           "MODEL.EMBEDDER_MODEL.SMART_DYNAMIC_TOKENS": 2},
    "cls_res": {"MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                "MODEL.CLS_RES": True},
    "vit_partial_freeze": {"MODEL.BASE_MODEL.LAYER": 1,
                           "MODEL.EMBEDDER_MODEL.FUSION_TYPE": "smart",
                           "MODEL.EMBEDDER_MODEL.SMART_FEATS": "1"},
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_model_variant(name):
    cfg = base_cfg()
    for k, v in CASES[name].items():
        cfg.set_path(k, v)
    _, out = run_model(cfg)
    assert out.shape == (2, 4, 8)
    assert np.isfinite(out).all()
    # projection + L2 normalize -> unit norm embeddings
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_resnet_conv_and_vanilla_embedders():
    for etype in ("conv", "vanilla"):
        cfg = base_cfg()
        cfg.MODEL.BASE_MODEL.NETWORK = "Resnet50_byol"
        cfg.MODEL.BASE_MODEL.LAYER = 3
        cfg.MODEL.EMBEDDER_TYPE = etype
        # 32px test input -> 2x2 layer3 grid; kernel 1 keeps VALID conv alive
        cfg.MODEL.EMBEDDER_MODEL.CONV_LAYERS = [[8, 1, 0]]
        cfg.MODEL.PROJECTION = False
        _, out = run_model(cfg, project=False)
        assert out.shape == (2, 4, 8)
        assert np.isfinite(out).all()


def test_classification_head():
    cfg = base_cfg()
    cfg.TRAINING_ALGO = "classification"
    cfg.DATASETS = ["pouring"]  # 5 classes
    _, out = run_model(cfg, project=False, classification=True)
    assert out.shape == (2, 4, 5)


def test_remat_trainable_tail_grads():
    """MODEL.REMAT wraps the trainable tail in jax.checkpoint; grads must
    still flow and match the non-remat values."""
    grads = {}
    for remat in (False, True):
        cfg = base_cfg()
        cfg.MODEL.BASE_MODEL.LAYER = 1  # partial freeze -> trainable back
        cfg.MODEL.EMBEDDER_MODEL.FUSION_TYPE = "smart"
        cfg.MODEL.EMBEDDER_MODEL.SMART_FEATS = "1"
        cfg.MODEL.REMAT = remat
        model = build_model(cfg)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 32, 32, 3),
                        jnp.float32)
        masks = jnp.ones((2, 1, 4))
        variables = model.init({"params": jax.random.key(0),
                                "dropout": jax.random.key(1)},
                               x, 4, video_masks=masks, project=True)

        def loss(p):
            out = model.apply(
                {"params": p,
                 "batch_stats": variables.get("batch_stats", {})},
                x, 4, video_masks=masks, project=True)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(variables["params"])
        grads[remat] = jax.device_get(g["res_finetune"])
    flat_a = jax.tree_util.tree_leaves(grads[False])
    flat_b = jax.tree_util.tree_leaves(grads[True])
    assert any(np.abs(l).sum() > 0 for l in flat_a)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_invalid_configs_raise():
    cfg = base_cfg()
    cfg.MODEL.CLS_RES = True  # with late fusion -> error (`transformer.py:34-36`)
    with pytest.raises(ValueError):
        build_model(cfg)

    cfg = base_cfg()
    cfg.MODEL.EMBEDDER_MODEL.FUSION_TYPE = "smart"
    cfg.MODEL.BASE_MODEL.LAYER = 1
    cfg.MODEL.EMBEDDER_MODEL.SMART_FEATS = "0,1"  # tap below split
    with pytest.raises(ValueError):
        build_model(cfg)

    cfg = base_cfg()
    cfg.MODEL.EMBEDDER_MODEL.FUSION_CLS = True
    cfg.MODEL.BASE_MODEL.NETWORK = "Resnet50_byol"  # not timm
    with pytest.raises(ValueError):
        build_model(cfg)


def test_s2d_stem_matches_direct_conv(monkeypatch):
    """VRL_S2D_STEM=1 (space-to-depth 4x4/1 stem) is an exact
    reparameterization of the 7x7/2 conv1 — same params, same output."""
    from video_rep_learning_tpu.models.resnet import StemConv

    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 30, 3),
                    jnp.float32)
    mod = StemConv()
    params = mod.init(jax.random.key(0), x)
    monkeypatch.delenv("VRL_S2D_STEM", raising=False)
    direct = mod.apply(params, x)
    monkeypatch.setenv("VRL_S2D_STEM", "1")
    s2d = jax.jit(mod.apply)(params, x)
    assert direct.shape == s2d.shape == (2, 16, 15, 64)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct),
                               rtol=2e-5, atol=2e-5)

    # odd spatial dims fall back to the direct conv (no crash, same result)
    xo = x[:, :31, :29]
    np.testing.assert_allclose(
        np.asarray(mod.apply(params, xo)),
        np.asarray(jax.jit(mod.apply)(params, xo)), rtol=0, atol=0)


@pytest.mark.parametrize("name", sorted(CASES))
def test_flat_split_matches_full_forward(name):
    """backbone_flat + head_embs must reproduce the full __call__ forward for
    EVERY head variant — the invariant the TPU-default flat extraction
    (`evaluation/embedding._iter_frameflat`) rests on. Guards against a head
    option that __call__ wires but head_embs misses."""
    cfg = base_cfg()
    for k, v in CASES[name].items():
        cfg.set_path(k, v)
    model = build_model(cfg)
    T = cfg.TRAIN.NUM_FRAMES
    S = cfg.IMAGE_SIZE
    x = jnp.asarray(np.random.RandomState(3).rand(1, T, S, S, 3), jnp.float32)
    masks = jnp.ones((1, 1, T), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x, T, video_masks=masks, project=False)
    full = model.apply(variables, x, T, video_masks=masks, project=False,
                       train=False, true_seq_len=jnp.int32(T))

    feats, cls = model.apply(variables, x.reshape(T, S, S, 3),
                             method="backbone_flat")
    flat = model.apply(variables, feats[None], cls, video_masks=masks,
                       project=False, train=False,
                       true_seq_len=jnp.int32(T), method="head_embs")
    np.testing.assert_allclose(np.asarray(full), np.asarray(flat),
                               atol=2e-6)


@pytest.mark.parametrize("name", ["rn_smart_lstp", "rn_late"])
def test_flat_split_matches_full_forward_resnet(name):
    """Same flat-split invariant through the ResNet trunk (needs_cls=False
    branch): the ablate_rn50_lstp* family shape and the released-checkpoint
    late-fusion shape."""
    cfg = base_cfg()
    cfg.MODEL.BASE_MODEL.NETWORK = "resnet18_tiny_test"
    cfg.MODEL.BASE_MODEL.LAYER = 3
    if name == "rn_smart_lstp":
        cfg.MODEL.EMBEDDER_MODEL.FUSION_TYPE = "smart"
        cfg.MODEL.EMBEDDER_MODEL.SMART_FINAL = "one"
        cfg.MODEL.EMBEDDER_MODEL.SMART_ONE_HOT = "pool"
        cfg.MODEL.EMBEDDER_MODEL.SMART_TOKENS = 1
    model = build_model(cfg)
    T = cfg.TRAIN.NUM_FRAMES
    S = cfg.IMAGE_SIZE
    x = jnp.asarray(np.random.RandomState(5).rand(1, T, S, S, 3), jnp.float32)
    masks = jnp.ones((1, 1, T), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x, T, video_masks=masks, project=False)
    full = model.apply(variables, x, T, video_masks=masks, project=False,
                       train=False, true_seq_len=jnp.int32(T))
    feats, cls = model.apply(variables, x.reshape(T, S, S, 3),
                             method="backbone_flat")
    assert cls is None
    flat = model.apply(variables, feats[None], cls, video_masks=masks,
                       project=False, train=False,
                       true_seq_len=jnp.int32(T), method="head_embs")
    np.testing.assert_allclose(np.asarray(full), np.asarray(flat), atol=2e-6)
