"""FineGym distributed-eval harness tests: per-video embedding pickles and
the jitted linear probe (SGD momentum + cosine LR) on separable synthetic
embeddings."""

import os
import pickle

import numpy as np

from video_rep_learning_tpu.config import get_cfg
from video_rep_learning_tpu.evaluation.finegym import train_linear_probe


def _write_emb_files(out_dir, n_videos, emb_dim, n_classes, seed=0, tag="t"):
    os.makedirs(str(out_dir), exist_ok=True)
    # class centers fixed across train/val so the task is learnable
    centers = np.random.RandomState(12345).randn(n_classes, emb_dim) * 3
    rng = np.random.RandomState(seed)
    files = []
    for i in range(n_videos):
        n_frames = rng.randint(8, 20)
        labels = rng.randint(0, n_classes, n_frames)
        embs = centers[labels] + 0.1 * rng.randn(n_frames, emb_dim)
        path = str(out_dir / f"{tag}_video_{i}.pkl")
        with open(path, "wb") as f:
            pickle.dump({"embs": embs.astype(np.float32),
                         "labels": labels.astype(np.int64),
                         "name": f"{tag}_video_{i}"}, f)
        files.append(path)
    return files


def test_linear_probe_learns_separable_classes(tmp_path):
    cfg = get_cfg()
    cfg.EVAL.CLASS_NUM = 4
    cfg.EVAL.CLASSIFICATION_LR = 1.0
    cfg.EVAL.CLASSIFICATION_EPOCHS = 30
    cfg.MODEL.EMBEDDER_MODEL.EMBEDDING_SIZE = 8

    train_files = _write_emb_files(tmp_path, 30, 8, 4, seed=0, tag="tr")
    val_files = _write_emb_files(tmp_path, 10, 8, 4, seed=1, tag="va")
    acc = train_linear_probe(cfg, train_files, val_files, 1.0, 0, None)
    assert acc > 90.0  # percent; linearly separable clusters


def test_probe_fraction_subsets(tmp_path):
    cfg = get_cfg()
    cfg.EVAL.CLASS_NUM = 3
    cfg.EVAL.CLASSIFICATION_LR = 1.0
    cfg.EVAL.CLASSIFICATION_EPOCHS = 3
    cfg.MODEL.EMBEDDER_MODEL.EMBEDDING_SIZE = 8
    train_files = _write_emb_files(tmp_path, 40, 8, 3, tag="tr")
    val_files = _write_emb_files(tmp_path, 10, 8, 3, seed=2, tag="va")
    # fraction 0.25 -> at least one batch must still form
    acc = train_linear_probe(cfg, train_files, val_files, 0.25, 0, None)
    assert np.isfinite(acc)
