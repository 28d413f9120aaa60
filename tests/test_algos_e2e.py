"""End-to-end micro training for the non-SCL algorithms — exercises the
supervised (non-SSL) batch path: offset_uniform sampling, single-clip items,
supervised_augment, conv/vanilla embedders, TCC pair loss, TCN interleaved
sampling, per-frame classification."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pouring"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_data.py"),
         "--out", out, "--num_train", "6", "--num_val", "3",
         "--min_len", "24", "--max_len", "36", "--size", "40",
         "--format", "npy"],
        check=True, cwd=REPO)
    return out


def algo_cfg(synth_dir, logdir, algo):
    from tests.test_train import micro_cfg

    cfg = micro_cfg(synth_dir, logdir)
    cfg.TRAINING_ALGO = algo
    cfg.TRAIN.BATCH_SIZE = 2
    if algo in ("tcc", "tcn", "classification"):
        cfg.SSL = False
        cfg.MODEL.PROJECTION = False
        cfg.DATA.SAMPLING_STRATEGY = "offset_uniform"
    if algo == "tcc":
        cfg.MODEL.L2_NORMALIZE = False
    return cfg


@pytest.mark.parametrize("algo,embedder", [
    ("tcc", "transformer"),
    ("tcc", "conv"),
    ("tcn", "vanilla"),
    ("classification", "transformer"),
])
def test_non_ssl_training_epoch(synth_dir, tmp_path, algo, embedder):
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / f"{algo}_{embedder}")
    os.makedirs(logdir)
    cfg = algo_cfg(synth_dir, logdir, algo)
    cfg.MODEL.EMBEDDER_TYPE = embedder
    if embedder == "conv":
        cfg.MODEL.EMBEDDER_MODEL.CONV_LAYERS = [[8, 1, 0]]
        cfg.MODEL.TRAIN_BASE = "train_all"
    tr = Trainer(cfg, no_eval=True)
    tr.init_state()
    losses = tr.train_one_epoch(0)
    assert np.isfinite(losses["loss"])
    # val path: for classification the "loss" becomes masked accuracy
    cfg_val = algo_cfg(synth_dir, logdir, algo)
    cfg_val.MODEL.EMBEDDER_TYPE = embedder
    if embedder == "conv":
        cfg_val.MODEL.EMBEDDER_MODEL.CONV_LAYERS = [[8, 1, 0]]
        cfg_val.MODEL.TRAIN_BASE = "train_all"


def test_ssl_tcc_two_view_path(synth_dir, tmp_path):
    """TCC under SSL=true: two-view batch flattened into the pair loss
    (`algos/tcc.py:28-32`)."""
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / "ssl_tcc")
    os.makedirs(logdir)
    from tests.test_train import micro_cfg

    cfg = micro_cfg(synth_dir, logdir)
    cfg.TRAINING_ALGO = "tcc"
    cfg.MODEL.PROJECTION = False
    cfg.MODEL.L2_NORMALIZE = False
    tr = Trainer(cfg, no_eval=True)
    tr.init_state()
    losses = tr.train_one_epoch(0)
    assert np.isfinite(losses["loss"])
