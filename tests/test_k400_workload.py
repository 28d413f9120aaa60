"""K400 pretraining workload shape (benchmark config for
`scl_transformer_k400_pretrain_config.yml`): kinetics CSV + penn-format eval
pickles in one workdir, the DATASETS[1:] pop for eval loaders, batch_noself
SCL, bs=2 training."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def k400_workdir(tmp_path_factory):
    from video_rep_learning_tpu.data.decode import encode_video

    root = tmp_path_factory.mktemp("k400penn")
    # penn-format pkls for the eval datasets
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_data.py"),
         "--out", str(root), "--num_train", "6", "--num_val", "4",
         "--min_len", "20", "--max_len", "28", "--size", "40",
         "--format", "npy", "--dataset", "penn_action", "--num_actions", "1",
         "--num_phases", "3"],
        check=True, cwd=REPO)
    # kinetics videos + csv in the same workdir
    (root / "train").mkdir()
    rng = np.random.RandomState(0)
    rows = ["label,youtube_id,time_start,time_end,split"]
    for i in range(4):
        ytid = f"clip{i:05d}"
        fname = f"{ytid}_{0:06d}_{10:06d}.mp4"
        frames = rng.randint(0, 255, size=(26, 40, 40, 3)).astype(np.uint8)
        encode_video(str(root / "train" / fname), frames)
        rows.append(f"x,{ytid},0,10,train")
    (root / "train.csv").write_text("\n".join(rows))
    return str(root)


def test_k400_pretrain_workload(k400_workdir, tmp_path):
    from tests.test_train import micro_cfg
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / "logs")
    os.makedirs(logdir)
    cfg = micro_cfg(k400_workdir, logdir)
    cfg.DATASETS = ["kinetics400", "baseball_pitch"]
    cfg.PATH_TO_DATASET = k400_workdir
    cfg.SCL.NEGATIVE_TYPE = "batch_noself"
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.DATA.CONSISTENT_OFFSET = 1.0

    tr = Trainer(cfg)
    # DATASETS[1:] popped for the eval loaders (`datasets/__init__.py:46-55`)
    assert cfg.DATASETS == ["baseball_pitch"]
    assert len(tr.train_emb_loader) == 1
    tr.init_state()
    losses = tr.train_one_epoch(0)
    assert np.isfinite(losses["loss"]) and losses["loss"] > 0
