"""Data-parallel correctness on the 8-device virtual CPU mesh (SURVEY.md §4
item (c)): a sharded train step must produce the same loss and parameter
update as the identical computation on one device (pjit global semantics =
DDP gradient averaging + SyncBN)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_rep_learning_tpu.config import get_cfg
from video_rep_learning_tpu.parallel.mesh import create_mesh, shard_batch


def tiny_cfg(batch_size):
    cfg = get_cfg()
    cfg.IMAGE_SIZE = 32
    cfg.TRAIN.NUM_FRAMES = 4
    cfg.TRAIN.BATCH_SIZE = batch_size
    cfg.EVAL.NUM_FRAMES = 4
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 8
    e = cfg.MODEL.EMBEDDER_MODEL
    e.NUM_LAYERS = 1
    e.HIDDEN_SIZE = 32
    e.D_FF = 64
    e.EMBEDDING_SIZE = 16
    e.FC_LAYERS = [[32, True]]
    e.CAPACITY_SCALAR = 1
    cfg.MODEL.PROJECTION_SIZE = 16
    cfg.DATA.NUM_WORKERS = 0
    return cfg


def make_batch(B, T=4, S=40, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "videos": rng.randint(0, 255, size=(B, 2, T, S, S, 3)).astype(np.uint8),
        "labels": np.zeros((B, 2, T), np.int32),
        "seq_lens": np.full((B, 2), 30, np.int32),
        "chosen_steps": np.tile(np.arange(T, dtype=np.int32), (B, 2, 1)),
        "video_masks": np.ones((B, 2, T), np.float32),
        "dims": np.full((B, 2), 40.0, np.float32),
    }


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("algo", ["scl"])
def test_sharded_step_matches_single_device(algo):
    from video_rep_learning_tpu.train.trainer import Trainer

    B = 8
    cfg = tiny_cfg(B)
    cfg.TRAINING_ALGO = algo
    # SGD: the update is linear in the gradient, so cross-device reduction
    # order can't amplify near-zero grads (Adam's g/|g| would).
    cfg.OPTIMIZER.TYPE = "MomentumOptimizer"
    batch = make_batch(B)
    key = jax.random.key(42)

    results = {}
    for ndev in (1, 8):
        mesh = create_mesh(ndev)
        tr = Trainer(cfg, no_eval=True, build_loaders=False, mesh=mesh)
        tr.init_state()
        step = tr.build_train_step()
        dev_batch = shard_batch(mesh, batch)
        state, loss = step(tr.state, dev_batch, key, 0, False, 1e-3)
        results[ndev] = (
            float(jax.device_get(loss["loss"])),
            jax.device_get(state["trainable"]),
        )

    loss1, params1 = results[1]
    loss8, params8 = results[8]
    np.testing.assert_allclose(loss1, loss8, rtol=2e-5)
    for k in params1:
        np.testing.assert_allclose(params1[k], params8[k], rtol=1e-4,
                                   atol=1e-6, err_msg=str(k))


def test_sharded_batchnorm_stats_are_global():
    """Batch stats after a sharded train step must equal the single-device
    run — SyncBatchNorm parity (`train.py:283`)."""
    from video_rep_learning_tpu.train.trainer import Trainer

    B = 8
    cfg = tiny_cfg(B)
    batch = make_batch(B, seed=7)
    key = jax.random.key(3)
    stats = {}
    for ndev in (1, 8):
        mesh = create_mesh(ndev)
        tr = Trainer(cfg, no_eval=True, build_loaders=False, mesh=mesh)
        tr.init_state()
        step = tr.build_train_step()
        state, _ = step(tr.state, shard_batch(mesh, batch), key, 0, False, 1e-3)
        stats[ndev] = jax.device_get(state["batch_stats"])
    flat1 = jax.tree_util.tree_leaves(stats[1])
    flat8 = jax.tree_util.tree_leaves(stats[8])
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
