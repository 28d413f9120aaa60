"""Weight importer tests: a synthetic torchvision-shaped ResNet-50 state
dict and a timm-shaped ViT state dict must convert into the model's exact
parameter tree (every imported tensor lands on a matching path/shape), and a
known BN statistic must flow through to the forward pass."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.golden

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


def _reference_carl_state_dict(cfg, seed=0):
    """A full reference-layout `model_state` dict (`models/__init__.py:17-29`)
    for the ResNet CARL family at LAYER=3: torchvision-canonical resnet keys
    rewrapped as the reference's nn.Sequential `backbone.{N}` slices +
    `res_finetune` (layer4), an `embed.*` TransformerEmbModel whose
    video_encoder keys come from the REFERENCE'S OWN Encoder module
    (imported in place), MLPHead projection and classifier."""
    import importlib.util

    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_mutils_sd", "/root/reference/CARL_MVF/models/utils.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.RandomState(seed)
    e = cfg.MODEL.EMBEDDER_MODEL
    sd = {}

    # backbone.{0,1,4,5,6} / res_finetune.{block} from canonical resnet keys
    rsd = synthetic_resnet50_sd(seed)
    seq_of = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
              "layer3": "6"}
    for k, v in rsd.items():
        head = k.split(".", 1)[0]
        if head == "layer4":
            sd["res_finetune." + k.split(".", 1)[1]] = torch.from_numpy(v)
        else:
            rest = k.split(".", 1)[1]
            sd[f"backbone.{seq_of[head]}.{rest}"] = torch.from_numpy(v)

    def lin(prefix, i, o):
        sd[prefix + ".weight"] = torch.from_numpy(
            rng.randn(o, i).astype(np.float32) * 0.05)
        sd[prefix + ".bias"] = torch.from_numpy(
            rng.randn(o).astype(np.float32) * 0.05)

    def bn1d(prefix, c):
        sd[prefix + ".weight"] = torch.from_numpy(
            1 + 0.1 * rng.randn(c).astype(np.float32))
        sd[prefix + ".bias"] = torch.from_numpy(
            0.1 * rng.randn(c).astype(np.float32))
        sd[prefix + ".running_mean"] = torch.from_numpy(
            0.1 * rng.randn(c).astype(np.float32))
        sd[prefix + ".running_var"] = torch.from_numpy(
            np.abs(rng.randn(c).astype(np.float32)) + 1)
        sd[prefix + ".num_batches_tracked"] = torch.tensor(7)

    fc_ch = e.FC_LAYERS[0][0] * e.CAPACITY_SCALAR
    lin("embed.fc_layers.1", 2048, fc_ch)
    bn1d("embed.fc_layers.2", fc_ch)
    lin("embed.video_emb", fc_ch, e.HIDDEN_SIZE)
    enc = ref.Encoder(e.HIDDEN_SIZE, 0.0, e.NUM_HEADS, e.D_FF, e.NUM_LAYERS)
    for k, v in enc.state_dict().items():
        sd["embed.video_encoder." + k] = v
    lin("embed.embedding_layer", e.HIDDEN_SIZE, e.EMBEDDING_SIZE)

    lin("ssl_projection.net.0", e.EMBEDDING_SIZE, cfg.MODEL.PROJECTION_SIZE)
    bn1d("ssl_projection.net.1", cfg.MODEL.PROJECTION_SIZE)
    lin("ssl_projection.net.3", cfg.MODEL.PROJECTION_SIZE, e.EMBEDDING_SIZE)
    lin("classifier.fc_layers.1", e.EMBEDDING_SIZE, 5)  # pouring: 5 classes
    return sd, enc


def test_full_carl_checkpoint_import(tmp_path):
    """Round-trips a full reference-format checkpoint through
    convert/load_carl_checkpoint: strict key coverage, and the imported
    temporal encoder must match the REFERENCE'S torch Encoder forward."""
    torch = pytest.importorskip("torch")
    from video_rep_learning_tpu.models.import_torch import load_carl_checkpoint

    cfg = get_cfg()
    cfg.DATASETS = ["pouring"]
    cfg.IMAGE_SIZE = 64
    cfg.TRAIN.NUM_FRAMES = 4
    cfg.MODEL.BASE_MODEL.NETWORK = "Resnet50_byol"
    cfg.MODEL.BASE_MODEL.LAYER = 3
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 4
    e = cfg.MODEL.EMBEDDER_MODEL
    e.NUM_LAYERS = 2
    e.NUM_HEADS = 4
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION = True
    cfg.MODEL.PROJECTION_SIZE = 12

    sd, ref_encoder = _reference_carl_state_dict(cfg)
    ckpt_path = tmp_path / "checkpoint_epoch_00003.pth"
    torch.save({"epoch": 3, "model_state": sd, "optimizer_state": {},
                "cfg": None}, str(ckpt_path))

    model = build_model(cfg)
    x = jnp.zeros((1, 4, 64, 64, 3))
    masks = jnp.ones((1, 1, 4))

    def init_all(mdl, x, masks):
        # trace projection AND classifier so every head materializes in the
        # param tree (like Trainer.init_state)
        mdl(x, 4, video_masks=masks, project=True)
        return mdl(x, 4, video_masks=masks, classification=True)

    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x, masks, method=init_all)
    loaded = load_carl_checkpoint(str(ckpt_path), variables,
                                  cfg.MODEL.BASE_MODEL.LAYER)

    # spot-check: a backbone running stat and an encoder weight landed
    got = loaded["batch_stats"]["backbone"]["bn1"]["BatchNorm_0"]["mean"]
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(sd["backbone.1.running_mean"]))

    # GOLDEN: our imported temporal encoder == the reference's torch Encoder
    from video_rep_learning_tpu.models.layers import Encoder as JEncoder

    xin = np.random.RandomState(1).randn(2, 4, e.HIDDEN_SIZE).astype(np.float32)
    with torch.no_grad():
        want = ref_encoder.eval()(torch.from_numpy(xin)).numpy()
    jenc = JEncoder(e.HIDDEN_SIZE, 0.0, e.NUM_HEADS, e.D_FF, e.NUM_LAYERS)
    got = np.asarray(jenc.apply(
        {"params": loaded["params"]["embed"]["video_encoder"]},
        jnp.asarray(xin)))
    np.testing.assert_allclose(got, want, atol=3e-4)

    # full-model forward with every imported weight
    out = model.apply(loaded, x, 4, video_masks=masks, project=True,
                      train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_full_carl_checkpoint_export_roundtrip(tmp_path):
    """The EXPORT direction (`export_carl_checkpoint`): our trained variables
    must serialize to the reference's exact `checkpoint_epoch_*.pth` layout —
    (a) key set identical to a reference-layout state dict (so the reference
    model's `load_state_dict(strict=True)` passes), (b) the exported temporal
    encoder strict-loads into the REFERENCE'S own torch Encoder and
    reproduces our forward, (c) export -> `load_carl_checkpoint` round-trips
    every leaf bit-exactly."""
    torch = pytest.importorskip("torch")
    from flax import traverse_util

    from video_rep_learning_tpu.models.import_torch import (
        export_carl_checkpoint, load_carl_checkpoint)

    cfg = get_cfg()
    cfg.DATASETS = ["pouring"]
    cfg.IMAGE_SIZE = 64
    cfg.TRAIN.NUM_FRAMES = 4
    cfg.MODEL.BASE_MODEL.NETWORK = "Resnet50_byol"
    cfg.MODEL.BASE_MODEL.LAYER = 3
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 4
    e = cfg.MODEL.EMBEDDER_MODEL
    e.NUM_LAYERS = 2
    e.NUM_HEADS = 4
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION = True
    cfg.MODEL.PROJECTION_SIZE = 12

    model = build_model(cfg)
    x = jnp.zeros((1, 4, 64, 64, 3))
    masks = jnp.ones((1, 1, 4))

    def init_all(mdl, x, masks):
        mdl(x, 4, video_masks=masks, project=True)
        return mdl(x, 4, video_masks=masks, classification=True)

    variables = model.init({"params": jax.random.key(7),
                            "dropout": jax.random.key(8)},
                           x, masks, method=init_all)

    path = str(tmp_path / "checkpoint_epoch_00005.pth")
    export_carl_checkpoint(path, variables, cfg.MODEL.BASE_MODEL.LAYER,
                           epoch=5)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 5
    sd = ckpt["model_state"]

    # (a) exported keys == the reference layout's keys (synthetic reference
    # state dict built from the reference's own Encoder module); resnet BNs
    # additionally carry num_batches_tracked (real torchvision checkpoints
    # have it; the synthetic fixture omits it)
    ref_sd, _ = _reference_carl_state_dict(cfg)
    nbt = lambda keys: {k for k in keys if k.endswith("num_batches_tracked")}
    assert set(sd) - nbt(sd) == set(ref_sd) - nbt(ref_sd)
    for k in list(sd):
        if k.endswith("running_mean"):
            base = k[: -len("running_mean")]
            assert base + "num_batches_tracked" in sd, k

    # (b) the exported encoder strict-loads into the reference's torch
    # Encoder and reproduces our forward
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_mutils_exp", "/root/reference/CARL_MVF/models/utils.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    enc = ref.Encoder(e.HIDDEN_SIZE, 0.0, e.NUM_HEADS, e.D_FF, e.NUM_LAYERS)
    pre = "embed.video_encoder."
    enc.load_state_dict({k[len(pre):]: v for k, v in sd.items()
                         if k.startswith(pre)}, strict=True)
    from video_rep_learning_tpu.models.layers import Encoder as JEncoder

    xin = np.random.RandomState(3).randn(2, 4, e.HIDDEN_SIZE).astype(np.float32)
    with torch.no_grad():
        want = enc.eval()(torch.from_numpy(xin)).numpy()
    got = np.asarray(JEncoder(e.HIDDEN_SIZE, 0.0, e.NUM_HEADS, e.D_FF,
                              e.NUM_LAYERS).apply(
        {"params": variables["params"]["embed"]["video_encoder"]},
        jnp.asarray(xin)))
    np.testing.assert_allclose(got, want, atol=3e-4)

    # (c) export -> import round-trip is bit-exact on every leaf
    loaded = load_carl_checkpoint(path, variables,
                                  cfg.MODEL.BASE_MODEL.LAYER)
    for col, name in ((loaded["params"], "params"),
                      (loaded["batch_stats"], "batch_stats")):
        want_flat = traverse_util.flatten_dict(variables[name])
        got_flat = traverse_util.flatten_dict(col)
        assert set(got_flat) == set(want_flat)
        for key in want_flat:
            np.testing.assert_array_equal(
                np.asarray(got_flat[key]), np.asarray(want_flat[key]),
                err_msg=str((name,) + key))


def test_export_torch_checkpoint_cli(tmp_path, monkeypatch):
    """tools/export_torch_checkpoint.py end-to-end: restore the newest orbax
    checkpoint in LOGDIR (evaluate.py wiring) and write the reference-format
    .pth; a trained leaf must round-trip into the exported state dict."""
    torch = pytest.importorskip("torch")
    yaml = pytest.importorskip("yaml")

    from video_rep_learning_tpu.train import Trainer
    from video_rep_learning_tpu.train.checkpoint import save_checkpoint

    logdir = str(tmp_path / "logs")
    os.makedirs(logdir)
    from tests.test_train import micro_cfg

    cfg = micro_cfg(str(tmp_path), logdir)
    tr = Trainer(cfg, no_eval=True, build_loaders=False)
    tr.init_state()
    save_checkpoint(cfg.LOGDIR, jax.device_get(tr.state), 3)

    cfg_file = str(tmp_path / "cfg.yml")
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg.to_plain(), f)

    import tools.export_torch_checkpoint as tool

    out = str(tmp_path / "exported.pth")
    monkeypatch.setattr("sys.argv", [
        "export_torch_checkpoint.py", "--cfg_file", cfg_file,
        "--logdir", logdir, "--out", out])
    tool.main()

    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 3
    sd = ckpt["model_state"]
    want = np.asarray(jax.device_get(
        tr.variables["params"]["embed"]["video_emb"]["Dense_0"]["kernel"]))
    np.testing.assert_array_equal(sd["embed.video_emb.weight"].numpy().T,
                                  want)


def _load_ref_mvformer():
    """Import the reference's mvformer.py in place (it does
    `from models.utils import *`; alias a fake `models` package first)."""
    import importlib.util
    import sys
    import types

    def load(relpath, name):
        spec = importlib.util.spec_from_file_location(
            name, "/root/reference/CARL_MVF/" + relpath)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    utils = load("models/utils.py", "ref_models_utils_imp")
    pkg = types.ModuleType("models")
    pkg.utils = utils
    sys.modules.setdefault("models", pkg)
    sys.modules.setdefault("models.utils", utils)
    return load("models/mvformer.py", "ref_mvformer_imp")


class _AD(dict):
    __getattr__ = dict.__getitem__


def test_full_mvf_checkpoint_import_export_roundtrip(tmp_path):
    """MV-Former-family checkpoint interop: export our smart-fusion model
    (fully-frozen tiny timm ViT) to the reference layout — key set equal to
    {timm state dict under backbone.model.* + the REFERENCE'S OWN
    MultiEntityTransformerEmbModel state dict under embed.* + MLPHead +
    classifier}, the exported head strict-loads into the reference module —
    then import back bit-exactly via load_mvf_checkpoint."""
    torch = pytest.importorskip("torch")
    from flax import traverse_util

    from video_rep_learning_tpu.models.import_torch import (
        export_mvf_checkpoint, load_mvf_checkpoint)

    cfg = get_cfg()
    cfg.DATASETS = ["pouring"]
    cfg.IMAGE_SIZE = 32
    cfg.TRAIN.NUM_FRAMES = 4
    cfg.EVAL.NUM_FRAMES = 4
    cfg.MODEL.BASE_MODEL.NETWORK = "TIMM-vit_tiny_test"
    cfg.MODEL.BASE_MODEL.LAYER = 12  # fully frozen (>= depth 2)
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 8
    e = cfg.MODEL.EMBEDDER_MODEL
    e.FUSION_TYPE = "smart"
    e.SMART_ONE_HOT = "pool"
    e.SMART_FINAL = "one"
    e.SMART_TOKENS = 2
    e.SMART_POOL_CHANNELS = 16
    e.NUM_LAYERS = 1
    e.NUM_HEADS = 2
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION = True
    cfg.MODEL.PROJECTION_SIZE = 8

    model = build_model(cfg)
    x = jnp.zeros((1, 4, 32, 32, 3))
    masks = jnp.ones((1, 1, 4))

    def init_all(mdl, x, masks):
        mdl(x, 4, video_masks=masks, project=True)
        return mdl(x, 4, video_masks=masks, classification=True)

    variables = model.init({"params": jax.random.key(11),
                            "dropout": jax.random.key(12)},
                           x, masks, method=init_all)

    path = str(tmp_path / "checkpoint_epoch_00004.pth")
    export_mvf_checkpoint(path, variables, depth=2, patch_size=8, epoch=4)
    sd = torch.load(path, map_location="cpu",
                    weights_only=False)["model_state"]

    # (a) key-set parity with the reference layout
    ref_mvf = _load_ref_mvformer()
    emb_cfg = _AD(FC_DROPOUT_RATE=0.0, SMART_POOL_CHANNELS=16,
                  SMART_TOKENS=2, CAPACITY_SCALAR=1, FC_LAYERS=[[16, True]],
                  EMBEDDING_SIZE=8, HIDDEN_SIZE=16, NUM_LAYERS=1,
                  NUM_HEADS=2, D_FF=32, SMART_FINAL="one",
                  SMART_ONE_HOT="pool")
    ref_cfg = _AD(MODEL=_AD(EMBEDDER_MODEL=emb_cfg,
                            BASE_MODEL=_AD(OUT_CHANNEL=32)),
                  TRAIN=_AD(NUM_FRAMES=4))
    torch.manual_seed(0)
    tmod = ref_mvf.MultiEntityTransformerEmbModel(ref_cfg)
    want_keys = {"backbone.model." + k for k in synthetic_vit_sd()}
    want_keys |= {"embed." + k for k in tmod.state_dict()}
    want_keys |= {"ssl_projection.net.0.weight", "ssl_projection.net.0.bias",
                  "ssl_projection.net.3.weight", "ssl_projection.net.3.bias",
                  "classifier.fc_layers.1.weight",
                  "classifier.fc_layers.1.bias"}
    want_keys |= {"ssl_projection.net.1." + s for s in
                  ("weight", "bias", "running_mean", "running_var")}
    nbt = lambda keys: {k for k in keys if k.endswith("num_batches_tracked")}
    assert set(sd) - nbt(sd) == want_keys - nbt(want_keys)

    # (b) the exported head strict-loads into the reference's own module
    tmod.load_state_dict({k[len("embed."):]: v for k, v in sd.items()
                          if k.startswith("embed.")}, strict=True)

    # (c) export -> import round-trips every leaf bit-exactly
    loaded = load_mvf_checkpoint(path, variables, depth=2)
    for col, name in ((loaded["params"], "params"),
                      (loaded["batch_stats"], "batch_stats")):
        want_flat = traverse_util.flatten_dict(variables[name])
        got_flat = traverse_util.flatten_dict(col)
        assert set(got_flat) == set(want_flat)
        for key in want_flat:
            np.testing.assert_array_equal(
                np.asarray(got_flat[key]), np.asarray(want_flat[key]),
                err_msg=str((name,) + key))


def test_import_torch_checkpoint_cli(tmp_path, monkeypatch):
    """tools/import_torch_checkpoint.py end-to-end: a reference-format .pth
    becomes an orbax checkpoint that a fresh Trainer auto-restores (the
    evaluate.py path for released reference checkpoints) with the imported
    weights and epoch."""
    torch = pytest.importorskip("torch")
    yaml = pytest.importorskip("yaml")

    cfg = get_cfg()
    cfg.DATASETS = ["pouring"]
    cfg.LOGDIR = str(tmp_path / "logs")
    os.makedirs(cfg.LOGDIR)
    cfg.IMAGE_SIZE = 64
    cfg.TRAIN.NUM_FRAMES = 4
    cfg.EVAL.NUM_FRAMES = 4
    cfg.MODEL.BASE_MODEL.NETWORK = "Resnet50_byol"
    cfg.MODEL.BASE_MODEL.LAYER = 3
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 4
    e = cfg.MODEL.EMBEDDER_MODEL
    e.NUM_LAYERS = 2
    e.NUM_HEADS = 4
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION = True
    cfg.MODEL.PROJECTION_SIZE = 12

    sd, _ = _reference_carl_state_dict(cfg)
    pth = str(tmp_path / "checkpoint_epoch_00009.pth")
    torch.save({"epoch": 9, "model_state": sd, "optimizer_state": {},
                "cfg": None}, pth)
    cfg_file = str(tmp_path / "cfg.yml")
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg.to_plain(), f)

    import tools.import_torch_checkpoint as tool

    monkeypatch.setattr("sys.argv", [
        "import_torch_checkpoint.py", "--cfg_file", cfg_file,
        "--logdir", cfg.LOGDIR, "--pth", pth])
    tool.main()

    # a fresh trainer (the evaluate.py wiring) restores the imported weights
    from video_rep_learning_tpu.train import Trainer

    tr = Trainer(cfg, no_eval=True, build_loaders=False)
    tr.init_state()
    assert tr.start_epoch == 10  # resume semantics: epoch+1
    got = np.asarray(jax.device_get(
        tr.variables["batch_stats"]["backbone"]["bn1"]["BatchNorm_0"]["mean"]))
    np.testing.assert_allclose(got, np.asarray(sd["backbone.1.running_mean"]))
    got_w = np.asarray(jax.device_get(
        tr.variables["params"]["embed"]["video_emb"]["Dense_0"]["kernel"]))
    np.testing.assert_allclose(
        got_w, np.asarray(sd["embed.video_emb.weight"]).T, rtol=1e-6)


def _torch_tiny_vit(dim=32, depth=2, heads=2, patch=8, img=32, seed=0):
    """Plain-torch ViT implementing EXACTLY timm VisionTransformer forward
    semantics for the DINO configuration (class token, learned pos embed
    added after cls concat, pre-norm blocks with fused-qkv attention and
    exact-GELU MLP, final norm, token pooling, head=Identity), with
    state-dict key names matching timm's layout — an independently-derived
    functional oracle for `convert_vit` + ViTFrontEnd/ViTBackEnd (timm
    itself is not installed here). Returns (module, forward_with_taps)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    torch.manual_seed(seed)
    N = (img // patch) ** 2

    class Attn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = tnn.Linear(dim, 3 * dim)
            self.proj = tnn.Linear(dim, dim)

        def forward(self, x):
            B, S, C = x.shape
            d = C // heads
            qkv = (self.qkv(x).reshape(B, S, 3, heads, d)
                   .permute(2, 0, 3, 1, 4))
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)) * d ** -0.5
            y = (att.softmax(-1) @ v).transpose(1, 2).reshape(B, S, C)
            return self.proj(y)

    class Mlp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(dim, 4 * dim)
            self.fc2 = tnn.Linear(4 * dim, dim)

        def forward(self, x):
            return self.fc2(F.gelu(self.fc1(x)))

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            self.attn = Attn()
            self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            self.mlp = Mlp()

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class PatchEmbed(tnn.Module):
        def __init__(self):
            super().__init__()
            self.proj = tnn.Conv2d(3, dim, patch, stride=patch)

        def forward(self, x):  # NCHW -> (B, N, dim), timm flatten order
            return self.proj(x).flatten(2).transpose(1, 2)

    class TinyViT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.cls_token = tnn.Parameter(0.02 * torch.randn(1, 1, dim))
            self.pos_embed = tnn.Parameter(0.02 * torch.randn(1, 1 + N, dim))
            self.patch_embed = PatchEmbed()
            self.blocks = tnn.ModuleList([Block() for _ in range(depth)])
            self.norm = tnn.LayerNorm(dim, eps=1e-6)

        def forward(self, x):
            B = x.shape[0]
            x = self.patch_embed(x)
            x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
            x = x + self.pos_embed
            taps = []
            for blk in self.blocks:
                x = blk(x)
                taps.append(x)
            return taps, self.norm(x)[:, 0]

    return TinyViT()


@pytest.mark.parametrize("frozen_blocks", [2, 1])
def test_vit_forward_matches_torch_oracle(frozen_blocks):
    """FUNCTIONAL golden test of the ViT backbone: converted weights through
    ViTFrontEnd (and the ViTFrontEnd->ViTBackEnd split at L=1) must
    reproduce a plain-torch timm-semantics ViT's tap features and CLS output
    — this is what actually validates the patch-embed conv->space-to-depth
    kernel remap and the qkv/block arithmetic for imported DINO weights
    (`convert_vit` shape checks alone cannot)."""
    torch = pytest.importorskip("torch")
    from video_rep_learning_tpu.models.vit import (VIT_SPECS, ViTBackEnd,
                                                   ViTFrontEnd)

    spec = VIT_SPECS["vit_tiny_test"]
    depth = spec.depth
    tmod = _torch_tiny_vit(spec.embed_dim, depth, spec.num_heads, spec.patch,
                           spec.img_size)
    rng = np.random.RandomState(5)
    x_nhwc = rng.rand(2, spec.img_size, spec.img_size, 3).astype(np.float32)
    with torch.no_grad():
        taps, cls = tmod(torch.from_numpy(
            x_nhwc.transpose(0, 3, 1, 2).copy()))
    want_feats = np.concatenate([t.numpy() for t in taps], axis=2)
    want_cls = cls.numpy()

    front_p, back_p = convert_vit(tmod.state_dict(), frozen_blocks, depth)
    tap_blocks = tuple(range(depth))

    if frozen_blocks >= depth:
        front = ViTFrontEnd(spec, depth, tap_blocks, include_norm=True)
        fvars = front.init(jax.random.key(0), jnp.asarray(x_nhwc))
        from flax import traverse_util

        flat = traverse_util.flatten_dict(fvars["params"])
        assert set(flat) == set(front_p)
        got_feats, got_cls = front.apply(
            {"params": traverse_util.unflatten_dict(front_p)},
            jnp.asarray(x_nhwc))
    else:
        front = ViTFrontEnd(spec, frozen_blocks, (), include_norm=False)
        from flax import traverse_util

        # taps below the split aren't reachable through the split path
        # (the reference forbids them too); tap only back blocks
        back = ViTBackEnd(spec, frozen_blocks,
                          tuple(range(frozen_blocks, depth)))
        tokens = front.apply(
            {"params": traverse_util.unflatten_dict(front_p)},
            jnp.asarray(x_nhwc))
        got_feats, got_cls = back.apply(
            {"params": traverse_util.unflatten_dict(back_p)}, tokens)
        want_feats = np.concatenate(
            [t.numpy() for t in taps[frozen_blocks:]], axis=2)

    np.testing.assert_allclose(np.asarray(got_feats), want_feats, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_cls), want_cls, atol=2e-5)


def _roundtrip_export_import(cfg, export_fn, load_fn, tmp_path, seed=21):
    """Init a model from cfg, export -> re-import, assert every leaf
    round-trips bit-exactly. Returns the exported state dict."""
    torch = pytest.importorskip("torch")
    from flax import traverse_util

    model = build_model(cfg)
    T, S = cfg.TRAIN.NUM_FRAMES, cfg.IMAGE_SIZE
    x = jnp.zeros((1, T, S, S, 3))
    masks = jnp.ones((1, 1, T))

    def init_all(mdl, x, masks):
        mdl(x, T, video_masks=masks, project=True)
        return mdl(x, T, video_masks=masks, classification=True)

    variables = model.init({"params": jax.random.key(seed),
                            "dropout": jax.random.key(seed + 1)},
                           x, masks, method=init_all)
    path = str(tmp_path / "rt.pth")
    export_fn(path, variables)
    loaded = load_fn(path, variables)
    for col, name in ((loaded["params"], "params"),
                      (loaded["batch_stats"], "batch_stats")):
        want_flat = traverse_util.flatten_dict(variables[name])
        got_flat = traverse_util.flatten_dict(col)
        assert set(got_flat) == set(want_flat)
        for key in want_flat:
            np.testing.assert_array_equal(
                np.asarray(got_flat[key]), np.asarray(want_flat[key]),
                err_msg=str((name,) + key))
    return torch.load(path, map_location="cpu",
                      weights_only=False)["model_state"]


def test_late_cls_vit_checkpoint_roundtrip(tmp_path):
    """timm + late-cls family (`ablate_dinoB8_cls.yml` shape): the reference
    assigns the BARE timm model (no FeatureExtractor wrap), so backbone keys
    have no `.model.` segment — export must emit that layout and import must
    detect it."""
    from video_rep_learning_tpu.models.import_torch import (
        export_mvf_checkpoint, load_mvf_checkpoint)

    cfg = get_cfg()
    cfg.DATASETS = ["pouring"]
    cfg.IMAGE_SIZE = 32
    cfg.TRAIN.NUM_FRAMES = 4
    cfg.EVAL.NUM_FRAMES = 4
    cfg.MODEL.BASE_MODEL.NETWORK = "TIMM-vit_tiny_test"
    cfg.MODEL.BASE_MODEL.LAYER = 12
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 8
    e = cfg.MODEL.EMBEDDER_MODEL
    e.FUSION_TYPE = "late"  # late-cls: CLS-token features only
    e.NUM_LAYERS = 1
    e.NUM_HEADS = 2
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION = True
    cfg.MODEL.PROJECTION_SIZE = 8

    sd = _roundtrip_export_import(
        cfg,
        lambda p, v: export_mvf_checkpoint(p, v, depth=2, patch_size=8,
                                           wrapped=False),
        lambda p, v: load_mvf_checkpoint(p, v, depth=2), tmp_path)
    assert "backbone.cls_token" in sd
    assert not any(k.startswith("backbone.model.") for k in sd)
    assert "embed.pooling.cross_att.Q_s" not in sd  # late head, no LSTP


def test_resnet_smart_checkpoint_roundtrip(tmp_path):
    """ResNet backbone + smart (LSTP) head (`ablate_rn50_lstp*.yml` shape):
    the CARL converter must carry the MultiEntityTransformerEmbModel head."""
    from video_rep_learning_tpu.models.import_torch import (
        export_carl_checkpoint, load_carl_checkpoint)

    cfg = get_cfg()
    cfg.DATASETS = ["pouring"]
    cfg.IMAGE_SIZE = 64
    cfg.TRAIN.NUM_FRAMES = 4
    cfg.EVAL.NUM_FRAMES = 4
    cfg.MODEL.BASE_MODEL.NETWORK = "Resnet50_byol"
    cfg.MODEL.BASE_MODEL.LAYER = 3
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 4
    e = cfg.MODEL.EMBEDDER_MODEL
    e.FUSION_TYPE = "smart"
    e.SMART_ONE_HOT = "pool"
    e.SMART_FINAL = "lin"  # exercises lin_final through the CARL converter
    e.SMART_TOKENS = 2
    e.SMART_POOL_CHANNELS = 16
    e.NUM_LAYERS = 1
    e.NUM_HEADS = 2
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION = True
    cfg.MODEL.PROJECTION_SIZE = 8

    sd = _roundtrip_export_import(
        cfg,
        lambda p, v: export_carl_checkpoint(p, v, 3),
        lambda p, v: load_carl_checkpoint(p, v, 3), tmp_path)
    assert "embed.pooling.cross_att.Q_s" in sd
    assert "embed.lin_final.weight" in sd
    assert "backbone.0.weight" in sd  # resnet Sequential naming


def test_vit_smart_dynamic_checkpoint_roundtrip(tmp_path):
    """timm + smart with DYNAMIC queries (SMART_DYNAMIC_TOKENS=1, CLS-fed):
    the in2dynQ projection must ride the converters both ways."""
    from video_rep_learning_tpu.models.import_torch import (
        export_mvf_checkpoint, load_mvf_checkpoint)

    cfg = get_cfg()
    cfg.DATASETS = ["pouring"]
    cfg.IMAGE_SIZE = 32
    cfg.TRAIN.NUM_FRAMES = 4
    cfg.EVAL.NUM_FRAMES = 4
    cfg.MODEL.BASE_MODEL.NETWORK = "TIMM-vit_tiny_test"
    cfg.MODEL.BASE_MODEL.LAYER = 12
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 8
    e = cfg.MODEL.EMBEDDER_MODEL
    e.FUSION_TYPE = "smart"
    e.SMART_ONE_HOT = "pool"
    e.SMART_FINAL = "one"
    e.SMART_TOKENS = 2
    e.SMART_DYNAMIC_TOKENS = 1
    e.SMART_POOL_CHANNELS = 16
    e.NUM_LAYERS = 1
    e.NUM_HEADS = 2
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION = True
    cfg.MODEL.PROJECTION_SIZE = 8

    sd = _roundtrip_export_import(
        cfg,
        lambda p, v: export_mvf_checkpoint(p, v, depth=2, patch_size=8),
        lambda p, v: load_mvf_checkpoint(p, v, depth=2), tmp_path)
    assert "embed.pooling.cross_att.in2dynQ.weight" in sd


def _torch_resnet50(stop_after=4):
    """Plain-torch ResNet-50 with torchvision's exact architecture and
    state-dict key names (bottleneck v1.5: stride on conv2; downsample =
    conv1x1+BN in each stage's block 0; stem conv7/2 p3 + maxpool3/2 p1) —
    a functional oracle for `convert_resnet50` + ResNet50Trunk/Stages
    (torchvision itself is not installed here). forward(x, upto) returns
    the layer`upto` feature map."""
    import torch
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, inplanes, planes, stride, downsample):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                    padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU()
            self.downsample = None
            if downsample:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                               bias=False),
                    tnn.BatchNorm2d(planes * 4))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            return self.relu(self.bn3(self.conv3(y)) + idt)

    class ResNet50(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3,
                                    bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            inplanes = 64
            for li, (planes, blocks, stride) in enumerate(
                    ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)), 1):
                mods = [Bottleneck(inplanes, planes, stride, True)]
                inplanes = planes * 4
                mods += [Bottleneck(inplanes, planes, 1, False)
                         for _ in range(blocks - 1)]
                setattr(self, f"layer{li}", tnn.Sequential(*mods))

        def forward(self, x, upto=4):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in range(1, upto + 1):
                x = getattr(self, f"layer{li}")(x)
            return x

    return ResNet50()


def test_resnet_forward_matches_torch_oracle():
    """FUNCTIONAL golden test of the ResNet-50 backbone: converted weights
    through ResNet50Trunk (frozen, layers 1-3) and ResNet50Stages (layer 4,
    eval-mode BN) must reproduce a plain-torch torchvision-architecture
    ResNet-50 — validating conv-kernel layout, BN eps/stats wiring, v1.5
    stride placement, and stem pooling semantics that shape-only import
    tests cannot (this is the released-checkpoint parity path)."""
    torch = pytest.importorskip("torch")
    from flax import traverse_util

    from video_rep_learning_tpu.models.resnet import (ResNet50Stages,
                                                      ResNet50Trunk)

    tmod = _torch_resnet50().eval()
    # randomized BN stats so the test exercises the stat wiring for real
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          synthetic_resnet50_sd(seed=3).items()}
    missing, unexpected = tmod.load_state_dict(sd, strict=False)
    assert not unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing)

    rng = np.random.RandomState(9)
    x_nhwc = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want3 = tmod(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2).copy()),
                     upto=3).numpy()
        want4 = tmod(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2).copy()),
                     upto=4).numpy()

    bb_p, bb_s, ft_p, ft_s = convert_resnet50(
        synthetic_resnet50_sd(seed=3), trunk_upto=3, finetune_start=4)
    trunk = ResNet50Trunk(upto=3)
    got3 = trunk.apply({"params": traverse_util.unflatten_dict(bb_p),
                        "batch_stats": traverse_util.unflatten_dict(bb_s)},
                       jnp.asarray(x_nhwc))
    np.testing.assert_allclose(
        np.asarray(got3).transpose(0, 3, 1, 2), want3, atol=2e-4, rtol=1e-4)

    tail = ResNet50Stages(start=4)
    got4 = tail.apply({"params": traverse_util.unflatten_dict(ft_p),
                       "batch_stats": traverse_util.unflatten_dict(ft_s)},
                      got3, train=False)
    np.testing.assert_allclose(
        np.asarray(got4).transpose(0, 3, 1, 2), want4, atol=2e-4, rtol=1e-4)


def test_exported_optimizer_state_loads_in_reference_optimizer(tmp_path):
    """The reference loads optimizer state UNCONDITIONALLY on resume —
    including `evaluate.py:184-185` — so an exported checkpoint must carry a
    param_groups structure its `construct_optimizer` accepts. Golden
    contract: build a torch skeleton with the reference's exact module
    layout, construct the optimizer with the REFERENCE'S OWN
    `utils/optimizer.py` (TRAIN_BASE=frozen filtering, [bn, non-bn]
    groups), and load our exported optimizer_state into it."""
    torch = pytest.importorskip("torch")
    import importlib.util
    import types

    import torch.nn as tnn

    from video_rep_learning_tpu.models.import_torch import (
        export_carl_checkpoint)

    # our model + export (same cfg as the CARL round-trip test)
    cfg = get_cfg()
    cfg.DATASETS = ["pouring"]
    cfg.IMAGE_SIZE = 64
    cfg.TRAIN.NUM_FRAMES = 4
    cfg.MODEL.BASE_MODEL.NETWORK = "Resnet50_byol"
    cfg.MODEL.BASE_MODEL.LAYER = 3
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 4
    e = cfg.MODEL.EMBEDDER_MODEL
    e.NUM_LAYERS = 2
    e.NUM_HEADS = 4
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION = True
    cfg.MODEL.PROJECTION_SIZE = 12

    model = build_model(cfg)
    x = jnp.zeros((1, 4, 64, 64, 3))
    masks = jnp.ones((1, 1, 4))

    def init_all(mdl, x, masks):
        mdl(x, 4, video_masks=masks, project=True)
        return mdl(x, 4, video_masks=masks, classification=True)

    variables = model.init({"params": jax.random.key(31),
                            "dropout": jax.random.key(32)},
                           x, masks, method=init_all)
    path = str(tmp_path / "ckpt.pth")
    export_carl_checkpoint(path, variables, 3, cfg=cfg.to_plain())
    opt_state = torch.load(path, map_location="cpu",
                           weights_only=False)["optimizer_state"]
    assert opt_state is not None and len(opt_state["param_groups"]) == 2

    # reference-layout torch skeleton (module names drive the reference's
    # 'backbone' filter and _NormBase grouping)
    spec = importlib.util.spec_from_file_location(
        "ref_mutils_opt", "/root/reference/CARL_MVF/models/utils.py")
    ref_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)
    spec = importlib.util.spec_from_file_location(
        "ref_optimizer", "/root/reference/CARL_MVF/utils/optimizer.py")
    ref_opt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_opt)

    rn = _torch_resnet50()

    class Embed(tnn.Module):
        def __init__(self):
            super().__init__()
            fc_ch = e.FC_LAYERS[0][0] * e.CAPACITY_SCALAR
            self.fc_layers = tnn.Sequential(
                tnn.Dropout(0.1), tnn.Linear(2048, fc_ch),
                tnn.BatchNorm1d(fc_ch), tnn.ReLU())
            self.video_emb = tnn.Linear(fc_ch, e.HIDDEN_SIZE)
            self.video_encoder = ref_utils.Encoder(
                e.HIDDEN_SIZE, 0.0, e.NUM_HEADS, e.D_FF, e.NUM_LAYERS)
            self.embedding_layer = tnn.Linear(e.HIDDEN_SIZE,
                                              e.EMBEDDING_SIZE)

    class Proj(tnn.Module):
        def __init__(self):
            super().__init__()
            self.net = tnn.Sequential(
                tnn.Linear(e.EMBEDDING_SIZE, cfg.MODEL.PROJECTION_SIZE),
                tnn.BatchNorm1d(cfg.MODEL.PROJECTION_SIZE), tnn.ReLU(),
                tnn.Linear(cfg.MODEL.PROJECTION_SIZE, e.EMBEDDING_SIZE))

    class Cls(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc_layers = tnn.Sequential(
                tnn.Dropout(0.1), tnn.Linear(e.EMBEDDING_SIZE, 5))

    class Skeleton(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = tnn.Sequential(
                rn.conv1, rn.bn1, tnn.ReLU(), tnn.MaxPool2d(3, 2, 1),
                rn.layer1, rn.layer2, rn.layer3)
            self.res_finetune = rn.layer4
            self.embed = Embed()
            self.ssl_projection = Proj()
            self.classifier = Cls()

    cfg_ns = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(TRAIN_BASE="frozen"),
        OPTIMIZER=types.SimpleNamespace(
            TYPE="AdamOptimizer", WEIGHT_DECAY=1e-5,
            LR=types.SimpleNamespace(INITIAL_LR=1e-4)))
    optimizer = ref_opt.construct_optimizer(Skeleton(), cfg_ns)
    optimizer.load_state_dict(opt_state)  # must validate group structure
    assert [len(g["params"]) for g in optimizer.param_groups] == \
        [len(g["params"]) for g in opt_state["param_groups"]]


def test_pretrained_checkpoint_accepts_reference_pth(tmp_path):
    """MODEL.PRETRAINED_CHECKPOINT pointing at a reference torch .pth (the
    reference's K400 warm-start pattern, `configs_mvf/k400_penn_mvf.yml`)
    must import in place: weights land, optimizer fresh, start_epoch 0."""
    torch = pytest.importorskip("torch")
    from video_rep_learning_tpu.train import Trainer

    cfg = get_cfg()
    cfg.DATASETS = ["pouring"]
    cfg.LOGDIR = str(tmp_path / "logs")
    os.makedirs(cfg.LOGDIR)
    cfg.IMAGE_SIZE = 64
    cfg.TRAIN.NUM_FRAMES = 4
    cfg.EVAL.NUM_FRAMES = 4
    cfg.MODEL.BASE_MODEL.NETWORK = "Resnet50_byol"
    cfg.MODEL.BASE_MODEL.LAYER = 3
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 4
    e = cfg.MODEL.EMBEDDER_MODEL
    e.NUM_LAYERS = 2
    e.NUM_HEADS = 4
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION = True
    cfg.MODEL.PROJECTION_SIZE = 12

    sd, _ = _reference_carl_state_dict(cfg, seed=6)
    pth = str(tmp_path / "checkpoint_epoch_00007.pth")
    torch.save({"epoch": 7, "model_state": sd, "optimizer_state": {},
                "cfg": None}, pth)

    cfg.MODEL.PRETRAINED_CHECKPOINT = pth
    tr = Trainer(cfg, no_eval=True, build_loaders=False)
    tr.init_state()
    assert tr.start_epoch == 0  # weights only, NOT a resume
    got = np.asarray(jax.device_get(
        tr.variables["batch_stats"]["backbone"]["bn1"]["BatchNorm_0"]["mean"]))
    np.testing.assert_allclose(got, np.asarray(sd["backbone.1.running_mean"]))
    got_w = np.asarray(jax.device_get(
        tr.variables["params"]["embed"]["video_emb"]["Dense_0"]["kernel"]))
    np.testing.assert_allclose(
        got_w, np.asarray(sd["embed.video_emb.weight"]).T, rtol=1e-6)
