"""Per-shard Pallas kernel dispatch under a multi-device pure-DP mesh.

GSPMD cannot partition Mosaic custom calls: a bare pallas_call inside a
multi-device pjit is REPLICATED (all-gather + full-batch compute per chip).
`parallel.sharding.dp_kernel_call` instead runs each kernel entry inside
`jax.shard_map` over the 'data' axis. These tests run the real kernels in
interpret mode on the 8-device CPU mesh and assert

- outputs are identical to the unsharded direct call,
- the output actually comes back data-sharded (no replication),
- gradients (incl. psum'd replicated-weight cotangents) match unsharded,
- non-divisible leading dims fall back to the direct call.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

from video_rep_learning_tpu.parallel.mesh import create_mesh
from video_rep_learning_tpu.parallel.sharding import (data_context,
                                                      set_data_context,
                                                      set_tensor_context)


@pytest.fixture
def dp_mesh():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    set_data_context(mesh)
    yield mesh
    set_data_context(None)


def _sharded(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def test_data_context_gating(dp_mesh):
    assert data_context() is dp_mesh
    set_tensor_context(dp_mesh, "data")  # any active TP ctx disables DP path
    assert data_context() is None
    set_tensor_context(None, None)
    assert data_context() is dp_mesh


def test_dp_layernorm_matches_and_shards(dp_mesh):
    from video_rep_learning_tpu.ops.layernorm_pallas import (
        _fused_layernorm_vjp, fused_layernorm)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 8, 128), jnp.float32)
    s = jnp.asarray(1 + 0.1 * rng.randn(128), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(128), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(fused_layernorm)(_sharded(dp_mesh, x), s, b)
        want = _fused_layernorm_vjp(x, s, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    assert got.sharding.spec[0] == "data"

    # gradient: x cotangent sharded, scale/bias cotangents psum'd correctly
    def loss(fn, xx, ss, bb):
        return jnp.sum(fn(xx, ss, bb) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g = jax.jit(jax.grad(lambda *a: loss(fused_layernorm, *a),
                             argnums=(0, 1, 2)))(_sharded(dp_mesh, x), s, b)
        gr = jax.grad(lambda *a: loss(_fused_layernorm_vjp, *a),
                      argnums=(0, 1, 2))(x, s, b)
    for a, r in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_dp_ln_matmul_matches_and_shards(dp_mesh):
    from video_rep_learning_tpu.ops.matmul_gelu_pallas import (
        _ln_matmul_bias_act_vjp, ln_matmul_bias_act)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 8, 128), jnp.float32)
    ls = jnp.asarray(1 + 0.1 * rng.randn(128), jnp.float32)
    lb = jnp.asarray(0.1 * rng.randn(128), jnp.float32)
    w = jnp.asarray(rng.randn(128, 128) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(128) * 0.05, jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda *a: ln_matmul_bias_act(*a, "gelu_exact"))(
            _sharded(dp_mesh, x), ls, lb, w, b)
        want = _ln_matmul_bias_act_vjp(x, ls, lb, w, b, "gelu_exact")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert got.sharding.spec[0] == "data"

    with pltpu.force_tpu_interpret_mode():
        g = jax.jit(jax.grad(
            lambda *a: jnp.sum(ln_matmul_bias_act(*a, "gelu_exact") ** 2),
            argnums=(0, 3, 4)))(_sharded(dp_mesh, x), ls, lb, w, b)
        gr = jax.grad(
            lambda *a: jnp.sum(
                _ln_matmul_bias_act_vjp(*a, "gelu_exact") ** 2),
            argnums=(0, 3, 4))(x, ls, lb, w, b)
    for a, r in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-3, rtol=1e-4)


def test_dp_ln_mlp_block_matches_and_shards(dp_mesh, monkeypatch):
    """DP dispatch semantics of the fused MLP half-block entry point.

    Interpret-mode pallas with TWO VMEM scratch buffers under shard_map
    wedges in `_allocate_buffer` even at tiny shapes (ADVICE r3 high — the
    same io_callback-contention class CLAUDE.md documents for the fused ViT
    half-block), so the pallas body is swapped for its XLA oracle
    (`_reference_mlp`, same signature; the body itself is parity-tested in
    test_pallas.py) and the routing runs compiled: shard_map over 'data',
    sharded output, psum'd replicated-weight cotangents."""
    from video_rep_learning_tpu.ops import matmul_gelu_pallas as mgp

    monkeypatch.setattr(mgp, "_forward_mlp", mgp._reference_mlp)

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(8, 8, 128), jnp.float32)
    ls = jnp.asarray(1 + 0.1 * rng.randn(128), jnp.float32)
    lb = jnp.asarray(0.1 * rng.randn(128), jnp.float32)
    w1 = jnp.asarray(rng.randn(128, 256) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(256) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(256, 128) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(128) * 0.05, jnp.float32)

    got = jax.jit(lambda *a: mgp.ln_mlp_block(*a, "gelu_exact"))(
        _sharded(dp_mesh, x), ls, lb, w1, b1, w2, b2)
    want = mgp._reference_mlp(x, ls, lb, w1, b1, w2, b2, "gelu_exact", 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert got.sharding.spec[0] == "data"

    g = jax.jit(jax.grad(
        lambda *a: jnp.sum(mgp.ln_mlp_block(*a, "gelu_exact") ** 2),
        argnums=(0, 3, 5)))(_sharded(dp_mesh, x), ls, lb, w1, b1, w2, b2)
    gr = jax.grad(
        lambda *a: jnp.sum(
            mgp._reference_mlp(*a, "gelu_exact", 1e-6) ** 2),
        argnums=(0, 3, 5))(x, ls, lb, w1, b1, w2, b2)
    for a, r in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-3, rtol=1e-4)


def test_dp_flash_attention_matches(dp_mesh):
    from video_rep_learning_tpu.ops.attention_pallas import (
        _flash_attention_vjp, flash_attention)

    rng = np.random.RandomState(2)
    # NOTE: interpret-mode pallas under shard_map wedges above ~(H=2,
    # S=128, d=128) on the 1-core host (io_callback contention across 8
    # concurrent virtual devices) — keep per-shard work small; the
    # dispatch semantics are shape-independent.
    B, H, S, d = 8, 2, 64, 64
    q = jnp.asarray(rng.randn(B, H, S, d) * 0.2, jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, d) * 0.2, jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, d) * 0.2, jnp.float32)
    mask = jnp.asarray(rng.rand(B, S) > 0.2, jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda *a: flash_attention(*a, sm_scale=0.125))(
            _sharded(dp_mesh, q), _sharded(dp_mesh, k),
            _sharded(dp_mesh, v), _sharded(dp_mesh, mask))
        want = _flash_attention_vjp(q, k, v, mask, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert got.sharding.spec[0] == "data"


def test_dp_packed_attention_matches(dp_mesh):
    from video_rep_learning_tpu.ops.attention_pallas import (
        _packed_vit_attention_vjp, packed_vit_attention)

    rng = np.random.RandomState(3)
    B, N, D, Hh = 8, 16, 128, 2
    qkv = jnp.asarray(rng.randn(B, N, 3 * D) * 0.2, jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda a: packed_vit_attention(a, Hh))(
            _sharded(dp_mesh, qkv))
        want = _packed_vit_attention_vjp(qkv, Hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert got.sharding.spec[0] == "data"


def test_dp_fused_vit_block_matches(dp_mesh, monkeypatch):
    """DP dispatch semantics of the fused ViT half-block entry point.

    This kernel's interpret-mode body DEADLOCKS under shard_map on the
    1-core host (all 8 virtual-device threads block in the interpret
    machinery's `_allocate_buffer` io_callback — the wedge class CLAUDE.md
    documents), so the pallas body is swapped for its XLA oracle
    (`_reference`, same signature; the body itself is parity-tested in
    test_pallas.py) and the routing runs compiled: shard_map over 'data',
    sharded output, psum'd replicated-weight cotangents."""
    from video_rep_learning_tpu.ops import vit_block_pallas as vbp

    monkeypatch.setattr(vbp, "_forward", vbp._reference)

    rng = np.random.RandomState(7)
    B, N, Hh, dh = 8, 24, 2, 64  # hp=2 -> one 128-wide lane slab
    D = Hh * dh
    x = jnp.asarray(rng.randn(B, N, D) * 0.2, jnp.float32)
    ln_s = jnp.asarray(1 + 0.1 * rng.randn(D), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.randn(D), jnp.float32)
    wqkv = jnp.asarray(rng.randn(D, 3 * D) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.randn(3 * D) * 0.05, jnp.float32)
    wproj = jnp.asarray(rng.randn(D, D) * 0.05, jnp.float32)
    bproj = jnp.asarray(rng.randn(D) * 0.05, jnp.float32)
    w = (ln_s, ln_b, wqkv, bqkv, wproj, bproj)

    got = jax.jit(lambda *a: vbp.vit_attention_block(*a, Hh))(
        _sharded(dp_mesh, x), *w)
    want = vbp._reference(x, *w, Hh, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert got.sharding.spec[0] == "data"

    # replicated-weight cotangents must come back psum'd across shards
    g = jax.jit(jax.grad(
        lambda *a: jnp.sum(vbp.vit_attention_block(*a, Hh) ** 2),
        argnums=(0, 3, 5)))(_sharded(dp_mesh, x), *w)
    gr = jax.grad(
        lambda *a: jnp.sum(vbp._reference(*a, Hh, 1e-6) ** 2),
        argnums=(0, 3, 5))(x, *w)
    for a, r in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-3, rtol=1e-4)


def test_dp_fused_photometric_matches(dp_mesh):
    from video_rep_learning_tpu.ops.photometric_pallas import (
        _fused_photometric_impl, blur_band_matrix, fused_photometric,
        IMAGENET_MEAN, IMAGENET_STD)

    rng = np.random.RandomState(4)
    BV, T, S = 8, 2, 16
    videos = jnp.asarray(rng.rand(BV, T, 3, S, S), jnp.float32)
    fscal = jnp.asarray(
        np.stack([np.array([1, 1.1, 0.9, 1.05, 0.02, 1, 0, 1], np.float32)
                  for _ in range(BV)]))
    orders = jnp.tile(jnp.asarray([0, 1, 2, 3], jnp.int32), (BV, 1))
    sig = jnp.full((BV,), 0.7, jnp.float32)
    mh = jax.vmap(lambda s_: blur_band_matrix(S, 9, s_).T)(sig)
    mw = jax.vmap(lambda s_: blur_band_matrix(S, 5, s_))(sig)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(fused_photometric)(
            _sharded(dp_mesh, videos), _sharded(dp_mesh, fscal),
            _sharded(dp_mesh, orders), _sharded(dp_mesh, mh),
            _sharded(dp_mesh, mw))
        want = _fused_photometric_impl(videos, fscal, orders, mh, mw,
                                       IMAGENET_MEAN, IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    assert got.sharding.spec[0] == "data"


def test_dp_scl_negatives_are_rank_local(dp_mesh):
    """Multi-device SCL must match the reference's DDP semantics: each rank
    computes the loss over its LOCAL batch (negatives never cross ranks —
    the reference algos/scl.py has no dist collectives) and ranks combine
    by averaging. With batch_noself + non-uniform masks the rank-local mean
    provably differs from the global-batch loss, so this pins the choice."""
    import os

    from video_rep_learning_tpu.algos.scl import (scl_loss_dispatch,
                                                  scl_sequence_loss)

    rng = np.random.RandomState(7)
    B, V, T, C = 8, 2, 4, 16
    e = rng.randn(B, V, T, C).astype(np.float32)
    e /= np.linalg.norm(e, axis=-1, keepdims=True)
    seq_lens = np.full((B, V), 3 * T, np.int32)
    steps = np.tile(np.arange(T, dtype=np.int32) * 3, (B, V, 1))
    masks = (rng.rand(B, V, T) > 0.3).astype(np.float32)
    masks[..., 0] = 1.0  # keep every item non-degenerate
    kw = dict(temperature=0.1, label_varience=10.0, positive_type="gauss",
              negative_type="batch_noself")

    sharded = [jax.device_put(jnp.asarray(a),
                              NamedSharding(dp_mesh, P("data")))
               for a in (e, seq_lens, steps, masks)]
    got = float(jax.jit(lambda *a: scl_loss_dispatch(*a, **kw))(*sharded))

    per_rank = [float(scl_sequence_loss(
        jnp.asarray(e[i:i + 1]), jnp.asarray(seq_lens[i:i + 1]),
        jnp.asarray(steps[i:i + 1]), jnp.asarray(masks[i:i + 1]),
        **kw)["loss"]) for i in range(B)]
    want = float(np.mean(per_rank))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    glob = float(scl_sequence_loss(*[jnp.asarray(a) for a in
                                     (e, seq_lens, steps, masks)],
                                   **kw)["loss"])
    assert abs(glob - want) > 1e-4  # the semantics choice is observable

    # VRL_GLOBAL_SCL=1: beyond-reference global-batch negatives
    os.environ["VRL_GLOBAL_SCL"] = "1"
    try:
        got_g = float(jax.jit(
            lambda *a: scl_loss_dispatch(*a, **kw))(*sharded))
    finally:
        del os.environ["VRL_GLOBAL_SCL"]
    np.testing.assert_allclose(got_g, glob, rtol=1e-5)


def test_dp_tcc_pairs_are_rank_local(dp_mesh):
    """TCC under multi-device DP must build its alignment-pair list per
    rank (reference tcc.py:50-59 loops over the LOCAL batch only)."""
    from video_rep_learning_tpu.algos.tcc import TCC, tcc_loss
    from video_rep_learning_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.SSL = False
    cfg.TRAIN.NUM_FRAMES = 4

    class _Stub:
        def apply(self, variables, videos, num_frames, video_masks=None,
                  train=True, rngs=None, backbone_warmup_active=False,
                  mutable=False):
            B = videos.shape[0]
            x = videos.reshape(B, num_frames, -1).astype(jnp.float32)
            e = jnp.tanh(x[..., :8] * 0.02)
            return (e, {}) if mutable else e

    rng = np.random.RandomState(11)
    B, T = 16, 4
    batch = {
        "videos": jnp.asarray(rng.randn(B, T, 2, 2, 3), jnp.float32),
        "chosen_steps": jnp.asarray(
            np.tile(np.arange(T, dtype=np.int32) * 2, (B, 1))),
        "seq_lens": jnp.asarray(np.full((B,), 2 * T, np.int32)),
        "video_masks": jnp.ones((B, T), jnp.float32),
    }
    sharded_batch = {k: jax.device_put(v, NamedSharding(dp_mesh, P("data")))
                     for k, v in batch.items()}

    algo = TCC(cfg)
    loss, _ = jax.jit(
        lambda b: algo.compute_loss(_Stub(), {}, b, train=True))(
            sharded_batch)
    got = float(loss["loss"])

    kw = dict(loss_type=cfg.TCC.LOSS_TYPE,
              similarity_type=cfg.TCC.SIMILARITY_TYPE,
              temperature=cfg.TCC.SOFTMAX_TEMPERATURE,
              label_smoothing=cfg.TCC.LABEL_SMOOTHING,
              variance_lambda=cfg.TCC.VARIANCE_LAMBDA,
              huber_delta=cfg.TCC.HUBER_DELTA,
              normalize_indices=cfg.TCC.NORMALIZE_INDICES)
    embs = _Stub().apply({}, batch["videos"], T)
    per_rank = [float(tcc_loss(embs[2 * r:2 * r + 2],
                               batch["seq_lens"][2 * r:2 * r + 2],
                               batch["chosen_steps"][2 * r:2 * r + 2],
                               **kw)["loss"]) for r in range(8)]
    np.testing.assert_allclose(got, np.mean(per_rank), rtol=1e-5)

    glob = float(tcc_loss(embs, batch["seq_lens"], batch["chosen_steps"],
                          **kw)["loss"])
    assert abs(glob - np.mean(per_rank)) > 1e-7  # cross-rank pairs differ


def test_dp_fallback_on_non_divisible_batch(dp_mesh):
    """Leading dim 3 doesn't divide 8 devices: must silently run the direct
    (unsharded) call — the eval chunk path depends on this."""
    from video_rep_learning_tpu.ops.layernorm_pallas import fused_layernorm

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(3, 8, 128), jnp.float32)
    s = jnp.ones((128,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = fused_layernorm(x, s, b)
    mu = np.asarray(x).mean(-1, keepdims=True)
    sd = np.asarray(x).std(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), (np.asarray(x) - mu) /
                               np.sqrt(sd * sd + 1e-6), atol=1e-5)


def test_dp_fused_crop_photometric_matches(dp_mesh):
    """The r3 crop+photometric kernel under the DP mesh: per-shard dispatch
    must bit-match the unsharded direct call and return data-sharded."""
    from video_rep_learning_tpu.ops.augment import _rrc_matrix
    from video_rep_learning_tpu.ops.photometric_pallas import (
        _fused_crop_photometric_impl, blur_band_matrix,
        fused_crop_photometric, IMAGENET_MEAN, IMAGENET_STD)

    rng = np.random.RandomState(5)
    BV, T, H, W, S = 8, 2, 20, 20, 16
    videos = jnp.asarray(rng.rand(BV, T, 3, H, W), jnp.float32)
    boxes = jnp.asarray(
        np.stack([[2.0, 1.0, 16.0, 18.0] for _ in range(BV)], 0), jnp.float32)
    rh = jax.vmap(lambda b: _rrc_matrix(H, S, b[2], b[0]))(boxes)
    rw = jax.vmap(lambda b: _rrc_matrix(W, S, b[3], b[1]).T)(boxes)
    fscal = jnp.asarray(
        np.stack([np.array([1, 1.1, 0.9, 1.05, 0.02, 1, 0, 1], np.float32)
                  for _ in range(BV)]))
    orders = jnp.tile(jnp.asarray([0, 1, 2, 3], jnp.int32), (BV, 1))
    sig = jnp.full((BV,), 0.7, jnp.float32)
    mh = jax.vmap(lambda s_: blur_band_matrix(S, 9, s_).T)(sig)
    mw = jax.vmap(lambda s_: blur_band_matrix(S, 5, s_))(sig)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(fused_crop_photometric)(
            _sharded(dp_mesh, videos), _sharded(dp_mesh, rh),
            _sharded(dp_mesh, rw), _sharded(dp_mesh, fscal),
            _sharded(dp_mesh, orders), _sharded(dp_mesh, mh),
            _sharded(dp_mesh, mw))
        want = _fused_crop_photometric_impl(videos, rh, rw, fscal, orders,
                                            mh, mw, IMAGENET_MEAN,
                                            IMAGENET_STD, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    assert got.sharding.spec[0] == "data"
