"""FineGym workload shape end-to-end (benchmark configs #4/#5): gym99-format
pickles -> FineGym dataset/loaders (num_valid block-size sampling, train-index
reuse) -> micro train epoch -> the full distributed-eval harness
(per-video embedding pickles + jitted probe)."""

import os
import pickle

import numpy as np
import pytest

from video_rep_learning_tpu.config import get_cfg
from video_rep_learning_tpu.data.decode import encode_video


@pytest.fixture(scope="module")
def fg_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("finegym")
    (out / "videos").mkdir()
    rng = np.random.RandomState(0)
    for split, n in (("train", 6), ("val", 3)):
        entries = []
        for i in range(n):
            seq_len = int(rng.randint(24, 40))
            frames = rng.randint(0, 255, size=(seq_len, 40, 40, 3)).astype(np.uint8)
            rel = os.path.join("videos", f"{split}_{i}.npy")
            encode_video(str(out / rel), frames)
            labels = rng.randint(0, 5, seq_len).astype(np.int64)
            entries.append({"id": i, "name": f"{split}_{i}", "video_file": rel,
                            "frame_label": labels, "seq_len": seq_len})
        name = "gym99_train_v1.0.pkl" if split == "train" else "gym99_val.pkl"
        with open(str(out / name), "wb") as f:
            pickle.dump(entries, f)
    return str(out)


def fg_cfg(fg_dir, logdir):
    from tests.test_train import micro_cfg

    cfg = micro_cfg(fg_dir, logdir)
    cfg.DATASETS = ["finegym"]
    cfg.PATH_TO_DATASET = fg_dir
    cfg.EVAL.TASKS = ["classification"]
    cfg.EVAL.CLASS_NUM = 99
    cfg.EVAL.CLASSIFICATION_LR = 1.0
    cfg.EVAL.CLASSIFICATION_EPOCHS = 3
    cfg.EVAL.FRAMES_PER_BATCH = 64
    return cfg


def test_finegym_dataset_and_loaders(fg_dir, tmp_path):
    from video_rep_learning_tpu.data import construct_dataloader
    from video_rep_learning_tpu.data.datasets import FineGym

    cfg = fg_cfg(fg_dir, str(tmp_path / "l"))
    ds = FineGym(cfg, "train")
    assert len(ds) == 6 and ds.block_size_mode == "num_valid"
    item = ds.get_ssl_item(np.random.RandomState(0), 0)
    assert item["videos"].shape[0] == 2

    loader, emb_loaders = construct_dataloader(cfg, "train")
    assert len(emb_loaders) == 1
    # eval loader reuses the train index object (`finegym.py:29,79-80`)
    assert emb_loaders[0].dataset.entries is ds.entries or \
        len(emb_loaders[0].dataset.entries) == len(ds.entries)


def test_finegym_train_and_distributed_eval(fg_dir, tmp_path):
    from video_rep_learning_tpu.evaluation.finegym import evaluate_once
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / "logs")
    os.makedirs(logdir)
    cfg = fg_cfg(fg_dir, logdir)
    tr = Trainer(cfg)
    tr.init_state()
    losses = tr.train_one_epoch(0)
    assert np.isfinite(losses["loss"])

    evaluate_once(tr, 0, None)
    # per-video embedding pickles written for both splits
    train_dump = os.listdir(os.path.join(logdir, "finegym_eval_trainset"))
    val_dump = os.listdir(os.path.join(logdir, "finegym_eval_valset"))
    assert len(train_dump) == 6 and len(val_dump) == 3
    with open(os.path.join(logdir, "finegym_eval_valset", val_dump[0]), "rb") as f:
        rec = pickle.load(f)
    assert rec["embs"].shape[1] == cfg.MODEL.EMBEDDER_MODEL.EMBEDDING_SIZE
