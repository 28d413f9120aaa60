"""Head-parallel (tensor) sharding over a 2-D (data, model) mesh: the train
step must compile + execute on the virtual CPU mesh and match the 1-device
result (GSPMD inserts the collectives)."""

import numpy as np
import pytest

import jax

from tests.test_distributed import make_batch, tiny_cfg
from video_rep_learning_tpu.parallel.mesh import create_mesh
from video_rep_learning_tpu.parallel.sharding import (create_mesh_2d,
                                                      set_tensor_context,
                                                      shard_heads,
                                                      tensor_axis_size)


@pytest.fixture(autouse=True)
def reset_ctx():
    yield
    set_tensor_context(None, None)


def test_tensor_context_plumbing():
    assert tensor_axis_size() == 1
    mesh = create_mesh_2d(4, 2)
    set_tensor_context(mesh, "model")
    assert tensor_axis_size() == 2
    x = jax.numpy.zeros((2, 8, 16, 4))
    y = shard_heads(x)  # outside jit this applies placement
    assert y.shape == x.shape
    # non-divisible head count: no-op, no error
    z = shard_heads(jax.numpy.zeros((2, 7, 16, 4)))
    assert z.shape == (2, 7, 16, 4)


def _run_mode(mode, cfg, batch, key):
    from video_rep_learning_tpu.parallel.mesh import shard_batch
    from video_rep_learning_tpu.train.trainer import Trainer

    if mode == "dp":
        mesh = create_mesh(4)
        set_tensor_context(None, None)
    else:
        mesh = create_mesh_2d(4, 2)
        set_tensor_context(mesh, "model",
                           "ulysses" if mode == "dp_sp" else "heads")
    tr = Trainer(cfg, no_eval=True, build_loaders=False, mesh=mesh)
    tr.init_state()
    step = tr.build_train_step()
    db = shard_batch(mesh, batch)
    state, loss = step(tr.state, db, key, 0, False, 1e-3)
    return (float(jax.device_get(loss["loss"])),
            jax.device_get(state["trainable"]))


@pytest.mark.parametrize("mode", ["dp_tp", "dp_sp"])
def test_sharded_step_matches_dp_only(mode):
    """Head-parallel TP and Ulysses sequence parallelism must both be
    loss/param-equivalent to pure DP (sharding constraints change layout,
    never math)."""
    B = 4
    cfg = tiny_cfg(B)
    cfg.OPTIMIZER.TYPE = "MomentumOptimizer"
    batch = make_batch(B)
    key = jax.random.key(0)

    loss_dp, params_dp = _run_mode("dp", cfg, batch, key)
    loss_x, params_x = _run_mode(mode, cfg, batch, key)
    set_tensor_context(None, None)

    np.testing.assert_allclose(loss_dp, loss_x, rtol=2e-5)
    for k in params_dp:
        np.testing.assert_allclose(params_dp[k], params_x[k], rtol=1e-4,
                                   atol=1e-6, err_msg=str(k))
