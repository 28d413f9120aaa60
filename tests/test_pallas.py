"""Pallas kernel tests. On the CPU test mesh the kernels run in interpreter
mode (`pltpu.force_tpu_interpret_mode`); on TPU CI they compile for real."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from video_rep_learning_tpu.algos.scl import scl_sequence_loss
from video_rep_learning_tpu.ops.attention_pallas import (_attention_reference,
                                                         flash_attention)
from video_rep_learning_tpu.ops.scl_pallas import scl_loss_fused


@pytest.fixture(autouse=True)
def interpret_mode():
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def test_flash_attention_matches_reference():
    rng = np.random.RandomState(0)
    B, H, S, d = 1, 2, 160, 32
    q = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    mask = jnp.asarray(rng.rand(B, S) > 0.15, jnp.float32)
    ref = _attention_reference(q, k, v, mask, 0.17)
    out = flash_attention(q, k, v, mask, 0.17, 128, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_grads_match_reference():
    rng = np.random.RandomState(1)
    B, H, S, d = 1, 1, 130, 16
    q = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    g = jax.grad(lambda a, b, c: flash_attention(a, b, c, None, 0.25, 128, 128).sum(),
                 argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b, c: _attention_reference(a, b, c, None, 0.25).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("neg", ["single_noself", "batch_noself"])
def test_fused_scl_matches_xla(neg):
    rng = np.random.RandomState(0)
    B, V, T, C = 2, 2, 40, 16
    embs = rng.randn(B, V, T, C).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
    seq_lens = rng.randint(30, 100, size=(B, V)).astype(np.float32)
    steps = np.sort(rng.randint(0, 80, size=(B, V, T)), axis=-1).astype(np.float32)
    masks = np.ones((B, V, T), np.float32)
    masks[1, 0, -5:] = 0

    ref = scl_sequence_loss(
        jnp.asarray(embs), jnp.asarray(seq_lens), jnp.asarray(steps),
        jnp.asarray(masks), temperature=0.1, label_varience=10.0,
        positive_type="gauss", negative_type=neg)["loss"]
    fused = scl_loss_fused(
        jnp.asarray(embs), jnp.asarray(seq_lens), jnp.asarray(steps),
        jnp.asarray(masks), 0.1, 10.0, neg)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-4)
