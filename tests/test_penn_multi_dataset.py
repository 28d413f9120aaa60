"""PennAction multi-dataset workload shape: full-set training loader,
per-action emb loaders, ActionBatchSampler, and evaluate_once averaging
`metrics/all_*` over the per-action datasets (`evaluate.py:92-153`)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ACTIONS = ["baseball_pitch", "baseball_swing"]


@pytest.fixture(scope="module")
def penn_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("penn_action"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_data.py"),
         "--out", out, "--num_train", "8", "--num_val", "4",
         "--min_len", "20", "--max_len", "30", "--size", "40",
         "--format", "npy", "--dataset", "penn_action", "--num_actions", "2",
         "--num_phases", "3"],
        check=True, cwd=REPO)
    return out


def penn_cfg(penn_dir, logdir):
    from tests.test_train import micro_cfg

    cfg = micro_cfg(penn_dir, logdir)
    cfg.DATASETS = list(ACTIONS)
    cfg.PATH_TO_DATASET = penn_dir
    cfg.EVAL.KENDALLS_TAU_STRIDE = 2
    return cfg


def test_penn_loaders_and_action_sampler(penn_dir, tmp_path):
    from video_rep_learning_tpu.data import construct_dataloader
    from video_rep_learning_tpu.data.datasets import PennAction
    from video_rep_learning_tpu.data.loader import ActionBatchSampler

    cfg = penn_cfg(penn_dir, str(tmp_path / "l"))
    loader, emb_loaders = construct_dataloader(cfg, "train")
    assert len(emb_loaders) == 2  # one per action
    batch = next(iter(loader))
    assert batch["videos"].shape[0] == 2  # full-set training loader

    ds = PennAction(cfg, "train")
    assert len(ds) == 8
    sub = PennAction(cfg, "train", dataset_name="baseball_swing")
    assert len(sub) == 4

    sampler = ActionBatchSampler(ds, batch_size=2, seed=0)
    for b in sampler.batches():
        labels = {ds.entries[i].get("action_label") for i in b}
        assert len(labels) == 1  # single action per batch


def test_penn_multi_dataset_evaluate_once(penn_dir, tmp_path):
    from video_rep_learning_tpu.evaluation import get_tasks
    from video_rep_learning_tpu.evaluation.evaluate import evaluate_once
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / "logs")
    os.makedirs(logdir)
    cfg = penn_cfg(penn_dir, logdir)
    cfg.EVAL.TASKS = ["kendalls_tau", "retrieval", "classification",
                      "event_completion"]
    tr = Trainer(cfg)
    tr.init_state()
    iterator_tasks, embedding_tasks = get_tasks(cfg)
    metrics = evaluate_once(cfg, tr.model, tr.variables, tr.train_emb_loader,
                            tr.val_emb_loader, iterator_tasks,
                            embedding_tasks, 0, None)
    for task, per_ds in metrics.items():
        assert set(per_ds) == set(ACTIONS)
        for v in per_ds.values():
            assert np.isfinite(v)
