"""Kinetics-400 pipeline (CSV index, quarantine, two-view items) and the
backbone-warmup schedule."""

import os

import numpy as np
import pytest

from video_rep_learning_tpu.config import get_cfg


@pytest.fixture()
def k400_dir(tmp_path):
    from video_rep_learning_tpu.data.decode import encode_video

    root = tmp_path / "k400"
    (root / "train").mkdir(parents=True)
    rows = ["label,youtube_id,time_start,time_end,split"]
    rng = np.random.RandomState(0)
    for i in range(4):
        ytid = f"vid{i:04d}xxx"
        fname = f"{ytid}_{0:06d}_{10:06d}.mp4"
        frames = rng.randint(0, 255, size=(30, 48, 48, 3)).astype(np.uint8)
        encode_video(str(root / "train" / fname), frames, fps=25.0)
        rows.append(f"dancing,{ytid},0,10,train")
    # one missing video listed in the skip file
    rows.append("dancing,missing00000,0,10,train")
    (root / "train.csv").write_text("\n".join(rows))
    (root / "k400_missing.txt").write_text("missing00000_000000_000010.mp4\n")
    return str(root)


def test_k400_dataset(k400_dir):
    from video_rep_learning_tpu.data.datasets import Kinetics400

    cfg = get_cfg()
    cfg.PATH_TO_DATASET = k400_dir
    cfg.TRAIN.NUM_FRAMES = 8
    cfg.DATASETS = ["kinetics400", "baseball_pitch"]
    ds = Kinetics400(cfg, "train")
    assert len(ds) == 4  # skip-listed video excluded
    item = ds.get_ssl_item(np.random.RandomState(0), 1)
    assert item["videos"].shape == (2, 8, 48, 48, 3)
    assert (item["labels"] == -1).all()  # K400 is unlabeled

    # corrupted video -> quarantined, item 0 substituted
    bad = os.path.join(k400_dir, "train", "vid0002xxx_000000_000010.mp4")
    with open(bad, "wb") as f:
        f.write(b"not a video")
    ds2 = Kinetics400(cfg, "train")
    idx = [i for i, e in enumerate(ds2.entries)
           if e["video_file"].startswith("vid0002")][0]
    item = ds2.get_ssl_item(np.random.RandomState(0), idx)
    assert item["name"] == ds2.entries[0]["name"]
    with open(os.path.join(k400_dir, "k400_error_files.txt")) as f:
        assert "vid0002" in f.read()


def test_backbone_warmup_schedule(tmp_path):
    """BACKBONE_WARMUP: epochs below the threshold run with the embed input
    detached (`train.py:81-91`, `mvformer.py:111-132`); requires smart
    fusion."""
    import jax

    from video_rep_learning_tpu.models import build_model

    cfg = get_cfg()
    cfg.IMAGE_SIZE = 32
    cfg.TRAIN.NUM_FRAMES = 2
    cfg.TRAIN.BACKBONE_WARMUP = 3
    cfg.MODEL.BASE_MODEL.NETWORK = "TIMM-vit_tiny_test"
    cfg.MODEL.BASE_MODEL.LAYER = 1  # partially frozen -> trainable back blocks
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
    cfg.MODEL.PROJECTION_SIZE = 8

    import jax.numpy as jnp

    model = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 2, 32, 32, 3), jnp.float32)
    masks = jnp.ones((2, 1, 2))
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x, 2, video_masks=masks, project=True)

    def grad_norm(warmup):
        def loss(p):
            out = model.apply({"params": p,
                               "batch_stats": variables.get("batch_stats", {})},
                              x, 2, video_masks=masks, project=True,
                              backbone_warmup_active=warmup)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g["res_finetune"])
        return float(sum(jnp.abs(l).sum() for l in leaves))

    assert grad_norm(warmup=True) == 0.0     # detached during warmup
    assert grad_norm(warmup=False) > 0.0     # flows after warmup

    # trainer wiring: warmup requires smart fusion
    from video_rep_learning_tpu.train.trainer import Trainer

    cfg2 = get_cfg()
    cfg2.TRAIN.BACKBONE_WARMUP = 2
    cfg2.MODEL.EMBEDDER_MODEL.FUSION_TYPE = "late"
    tr = Trainer(cfg2, no_eval=True, build_loaders=False)
    with pytest.raises(ValueError):
        tr.train_one_epoch(0)
