"""MODEL.PRETRAINED_CHECKPOINT warm start: weights restored from a previous
run's checkpoint, optimizer state fresh (`models/__init__.py:50-59`, the
K400 -> PennAction finetune path `configs_mvf/k400_penn_mvf.yml`)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pouring"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_data.py"),
         "--out", out, "--num_train", "4", "--num_val", "2",
         "--min_len", "20", "--max_len", "30", "--size", "40",
         "--format", "npy"],
        check=True, cwd=REPO)
    return out


def test_pretrained_checkpoint_warm_start(synth_dir, tmp_path):
    from tests.test_train import micro_cfg
    from video_rep_learning_tpu.train import Trainer
    from video_rep_learning_tpu.train.checkpoint import save_checkpoint

    # source run: train one epoch, checkpoint
    src_logdir = str(tmp_path / "src")
    os.makedirs(src_logdir)
    cfg = micro_cfg(synth_dir, src_logdir)
    tr = Trainer(cfg, no_eval=True)
    tr.init_state()
    tr.train_one_epoch(0)
    path = save_checkpoint(cfg.LOGDIR, jax.device_get(tr.state), 0)
    src_params = jax.device_get(tr.state["trainable"])

    # target run: fresh logdir, warm start from the source checkpoint
    dst_logdir = str(tmp_path / "dst")
    os.makedirs(dst_logdir)
    cfg2 = micro_cfg(synth_dir, dst_logdir)
    cfg2.MODEL.PRETRAINED_CHECKPOINT = path
    tr2 = Trainer(cfg2, no_eval=True)
    tr2.init_state()
    assert tr2.start_epoch == 0  # weights only; not a resume
    dst_params = jax.device_get(tr2.state["trainable"])
    for k in src_params:
        np.testing.assert_array_equal(src_params[k], dst_params[k],
                                      err_msg=str(k))
    # fresh optimizer state (adam step counter zero)
    leaves = jax.tree_util.tree_leaves(jax.device_get(tr2.state["opt_state"]))
    # the count is in there; check training proceeds
    losses = tr2.train_one_epoch(0)
    assert np.isfinite(losses["loss"])
