"""End-to-end training tests on synthetic data (tiny shapes): optimizer
parity, trainable/frozen partition, a 2-epoch micro run with checkpoint
resume — the micro debug-job analogue (SURVEY.md §4 item (d))."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_rep_learning_tpu.config import get_cfg
from video_rep_learning_tpu.train.optimizer import (learning_rate_for_epoch,
                                                    make_optimizer,
                                                    split_params,
                                                    trainable_mask)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lr_schedules():
    cfg = get_cfg()
    cfg.TRAIN.MAX_EPOCHS = 100
    cfg.OPTIMIZER.LR.INITIAL_LR = 1.0
    cfg.OPTIMIZER.LR.DECAY_TYPE = "cosine"
    # torch CosineAnnealingLR(T_max=101): lr_e = (1+cos(pi*e/101))/2
    for e in (0, 1, 50, 99):
        want = (1 + np.cos(np.pi * e / 101)) / 2
        np.testing.assert_allclose(learning_rate_for_epoch(cfg, e), want, rtol=1e-6)
    cfg.OPTIMIZER.LR.DECAY_TYPE = "fixed"
    assert learning_rate_for_epoch(cfg, 42) == 1.0
    cfg.OPTIMIZER.LR.DECAY_TYPE = "multiply"
    cfg.OPTIMIZER.LR.DECAY_RATE = 0.9
    np.testing.assert_allclose(learning_rate_for_epoch(cfg, 3), 0.9 ** 3)
    cfg.OPTIMIZER.LR.DECAY_TYPE = "cosinewarmup"
    cfg.OPTIMIZER.LR.WARMUP_LR = 0.1
    cfg.OPTIMIZER.LR.NUM_WARMUP_STEPS = 5
    assert learning_rate_for_epoch(cfg, 0) == pytest.approx(0.1)
    assert learning_rate_for_epoch(cfg, 4) == pytest.approx(1.0)


def test_adam_matches_torch_coupled_l2():
    torch = pytest.importorskip("torch")
    cfg = get_cfg()
    cfg.OPTIMIZER.TYPE = "AdamOptimizer"
    cfg.OPTIMIZER.WEIGHT_DECAY = 0.01
    cfg.OPTIMIZER.GRAD_CLIP = 10
    tx = make_optimizer(cfg)

    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    g = np.random.RandomState(1).randn(4, 3).astype(np.float32)

    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    opt_state.hyperparams["learning_rate"] = jnp.float32(0.1)
    import optax
    for _ in range(3):
        up, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = optax.apply_updates(params, up)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=0.1, weight_decay=0.01)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([tw], 10)
        opt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               atol=1e-5)


def test_trainable_mask_frozen_backbone():
    params = {
        "backbone": {"conv1": {"kernel": 0}, "bn1": {"BatchNorm_0": {"scale": 0}}},
        "res_finetune": {"layer4": {"block0": {"conv1": {"kernel": 0}}}},
        "embed": {"video_emb": {"Dense_0": {"kernel": 0}}},
    }
    cfg = get_cfg()
    cfg.MODEL.TRAIN_BASE = "frozen"
    t, f = split_params(params, cfg)
    assert all(p[0] != "backbone" for p in t)
    assert all(p[0] == "backbone" for p in f)

    cfg.MODEL.TRAIN_BASE = "only_bn"
    mask = trainable_mask(params, cfg)
    assert mask[("backbone", "bn1", "BatchNorm_0", "scale")]
    assert not mask[("backbone", "conv1", "kernel")]

    cfg.MODEL.TRAIN_BASE = "train_all"
    t, f = split_params(params, cfg)
    assert not f


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


def micro_cfg(synth_dir, logdir):
    cfg = get_cfg()
    cfg.PATH_TO_DATASET = synth_dir
    cfg.LOGDIR = logdir
    cfg.DATASETS = ["pouring"]
    cfg.IMAGE_SIZE = 32
    cfg.TRAIN.NUM_FRAMES = 8
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.MAX_EPOCHS = 2
    cfg.EVAL.NUM_FRAMES = 8
    cfg.EVAL.BATCH_SIZE = 2
    cfg.EVAL.VAL_INTERVAL = 1
    cfg.CHECKPOINT.SAVE_INTERVAL = 1
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 8
    cfg.MODEL.EMBEDDER_MODEL.NUM_LAYERS = 1
    cfg.MODEL.EMBEDDER_MODEL.FC_LAYERS = [[32, True]]
    cfg.MODEL.EMBEDDER_MODEL.HIDDEN_SIZE = 32
    cfg.MODEL.EMBEDDER_MODEL.D_FF = 64
    cfg.MODEL.EMBEDDER_MODEL.EMBEDDING_SIZE = 16
    cfg.MODEL.EMBEDDER_MODEL.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION_SIZE = 16
    cfg.DATA.NUM_WORKERS = 0
    return cfg


def test_micro_train_run_and_resume(synth_dir, tmp_path):
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / "logs")
    os.makedirs(logdir)
    cfg = micro_cfg(synth_dir, logdir)
    tr = Trainer(cfg, no_eval=True)
    tr.init_state()
    assert tr.start_epoch == 0
    losses0 = tr.train_one_epoch(0)
    assert np.isfinite(losses0["loss"]) and losses0["loss"] > 0

    # params actually changed, backbone frozen
    from video_rep_learning_tpu.train.checkpoint import save_checkpoint
    save_checkpoint(cfg.LOGDIR, jax.device_get(tr.state), 0)

    losses1 = tr.train_one_epoch(1)
    assert np.isfinite(losses1["loss"])

    # fresh trainer resumes from the saved epoch-0 checkpoint
    tr2 = Trainer(cfg, no_eval=True)
    tr2.init_state()
    assert tr2.start_epoch == 1
    a = jax.device_get(tr.state["frozen"])
    b = jax.device_get(tr2.state["frozen"])
    for (ka, va), (kb, vb) in zip(sorted(a.items()), sorted(b.items())):
        np.testing.assert_array_equal(va, vb)


def test_val_epoch(synth_dir, tmp_path):
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / "logs2")
    os.makedirs(logdir)
    cfg = micro_cfg(synth_dir, logdir)
    tr = Trainer(cfg)
    tr.init_state()
    losses = tr.val_one_epoch(0)
    assert np.isfinite(losses["loss"])


def test_mid_epoch_resume_exact_trajectory(synth_dir, tmp_path):
    """CHECKPOINT.SAVE_EVERY_N_ITERS preemption resume: kill training after
    the first iter of an epoch, auto-resume from the mid-epoch checkpoint,
    finish the epoch — final trainable params and optimizer state must be
    BIT-IDENTICAL to an uninterrupted run (deterministic per-epoch shuffle +
    iter-folded RNG + epoch-pure LR)."""
    from video_rep_learning_tpu.train import Trainer

    # uninterrupted run
    cfg_a = micro_cfg(synth_dir, str(tmp_path / "straight"))
    os.makedirs(cfg_a.LOGDIR)
    tr_a = Trainer(cfg_a, no_eval=True)
    tr_a.init_state()
    tr_a.train_one_epoch(0)

    # preempted run: mid checkpoint after every iter; loader truncated to
    # one batch simulates the preemption
    cfg_b = micro_cfg(synth_dir, str(tmp_path / "preempt"))
    cfg_b.CHECKPOINT.SAVE_EVERY_N_ITERS = 1
    os.makedirs(cfg_b.LOGDIR)
    tr_b = Trainer(cfg_b, no_eval=True)
    tr_b.init_state()

    class Truncated:
        def __init__(self, inner, n):
            self.inner, self.n = inner, n

        def set_epoch(self, e):
            self.inner.set_epoch(e)

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            import itertools
            return itertools.islice(iter(self.inner), self.n)

    full_loader = tr_b.train_loader
    tr_b.train_loader = Truncated(full_loader, 1)
    tr_b.train_one_epoch(0)  # runs iter 0 only, saves checkpoint_iter_*

    from video_rep_learning_tpu.train.checkpoint import _list_mid_checkpoints
    mids = _list_mid_checkpoints(cfg_b.LOGDIR)
    assert [(e, it) for e, it, _ in mids] == [(0, 1)]

    # fresh process equivalent: auto-resume lands on (epoch 0, iter 1)
    tr_c = Trainer(cfg_b, no_eval=True)
    tr_c.init_state()
    assert (tr_c.start_epoch, tr_c.start_iter) == (0, 1)
    tr_c.train_one_epoch(0)  # skips iter 0, executes the rest

    flat_a = jax.tree_util.tree_leaves_with_path(
        {"t": jax.device_get(tr_a.state["trainable"]),
         "o": jax.device_get(tr_a.state["opt_state"])})
    flat_c = jax.tree_util.tree_leaves_with_path(
        {"t": jax.device_get(tr_c.state["trainable"]),
         "o": jax.device_get(tr_c.state["opt_state"])})
    assert len(flat_a) == len(flat_c) > 0
    for (pa, va), (pc, vc) in zip(flat_a, flat_c):
        assert pa == pc
        np.testing.assert_array_equal(va, vc, err_msg=str(pa))

    # evaluate.py-style restore ignores mid checkpoints (reference semantics)
    from video_rep_learning_tpu.train.checkpoint import load_checkpoint
    _, e0, i0 = load_checkpoint(cfg_b.LOGDIR, jax.device_get(tr_c.state),
                                include_mid=False)
    assert (e0, i0) == (0, 0)

    # a completed-epoch save prunes the mid checkpoint and wins resume
    from video_rep_learning_tpu.train.checkpoint import save_checkpoint
    save_checkpoint(cfg_b.LOGDIR, jax.device_get(tr_c.state), 0)
    assert _list_mid_checkpoints(cfg_b.LOGDIR) == []
    tr_d = Trainer(cfg_b, no_eval=True)
    tr_d.init_state()
    assert (tr_d.start_epoch, tr_d.start_iter) == (1, 0)
