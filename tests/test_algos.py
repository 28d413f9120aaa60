"""Golden-parity tests for the loss functions.

Oracles are straightforward numpy implementations of the published loss
formulas (SCL: CARL CVPR'22 eq. 2-4 as realized in `algos/scl.py:52-105`;
TCC: CVPR'19 cycle-back; TCN n-pairs), written with explicit per-block loops
— deliberately different code shape from the vectorized XLA versions under
test (SURVEY.md §4 test plan item (a))."""

import numpy as np
import pytest

import jax.numpy as jnp

from video_rep_learning_tpu.algos import (classification_loss,
                                          scl_sequence_loss, tcc_loss,
                                          tcn_loss)


def np_safe_div(a, b):
    with np.errstate(divide="ignore", invalid="ignore"):
        out = a / b
    out[np.isnan(out)] = 0
    return out


def np_scl(embs, seq_lens, steps, masks, tau, var, negative_type):
    B, V, T, C = embs.shape
    N = B * V * T
    e = embs.reshape(N, C)
    stp = steps.reshape(N).astype(np.float64)
    lens = np.repeat(seq_lens.reshape(B * V), T).astype(np.float64)
    m = masks.reshape(N).astype(np.float64)
    im = m[:, None] * m[None, :]

    logits = e @ e.T / tau
    dist = np.abs(stp[:, None] / lens[:, None] * lens[None, :] - stp[None, :])
    dist[im == 0] = 1e6
    weight = np.ones((N, N))
    label = np.zeros((N, N))
    for b in range(B):
        start, mid, end = b * V * T, b * V * T + T, (b + 1) * V * T
        if "single" in negative_type:
            weight[start:end, :start] = 0
            weight[start:end, end:] = 0
        if "noself" in negative_type:
            weight[start:mid, start:mid] = 0
            weight[mid:end, mid:end] = 0
        pw = np.exp(-np.square(dist) / (2 * var))
        blk = pw[start:mid, mid:end]
        label[start:mid, mid:end] = np_safe_div(blk, blk.sum(1, keepdims=True))
        blk = pw[mid:end, start:mid]
        label[mid:end, start:mid] = np_safe_div(blk, blk.sum(1, keepdims=True))
    weight[im == 0] = 1e-6

    exp_logits = np.exp(logits)
    sum_neg = (weight * exp_logits).sum(1, keepdims=True)
    log_in = np.log(np_safe_div(exp_logits, sum_neg) + 1e-6)
    with np.errstate(divide="ignore", invalid="ignore"):
        xlogx = np.where(label > 0, label * np.log(label), 0.0)
    kl = xlogx - label * log_in
    return (kl * im).sum() / m.sum()


@pytest.mark.parametrize("negative_type", ["single_noself", "batch_noself", "single"])
def test_scl_matches_reference_formula(negative_type):
    rng = np.random.RandomState(0)
    B, V, T, C = 2, 2, 6, 8
    embs = rng.randn(B, V, T, C).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
    seq_lens = rng.randint(10, 40, size=(B, V)).astype(np.float32)
    steps = np.sort(rng.randint(0, 30, size=(B, V, T)), axis=-1).astype(np.float32)
    masks = np.ones((B, V, T), np.float32)
    masks[0, 1, -2:] = 0  # padded tail
    masks[1, 0, -1:] = 0

    got = scl_sequence_loss(
        jnp.asarray(embs), jnp.asarray(seq_lens), jnp.asarray(steps),
        jnp.asarray(masks), temperature=0.1, label_varience=10.0,
        positive_type="gauss", negative_type=negative_type)["loss"]
    want = np_scl(embs, seq_lens, steps, masks, 0.1, 10.0, negative_type)
    np.testing.assert_allclose(float(got), want, rtol=2e-4)


def np_tcc_pair(e1, e2, sim_type, tau, smooth):
    C = e1.shape[1]

    def sim(a, b):
        if sim_type == "cosine":
            s = a @ b.T
        else:
            n1 = np.square(a).sum(1)[:, None]
            n2 = np.square(b).sum(1)[None, :]
            s = -(n1 + n2 - 2 * a @ b.T)
        return s / C / tau

    s12 = sim(e1, e2)
    sm = np.exp(s12 - s12.max(1, keepdims=True))
    sm = sm / sm.sum(1, keepdims=True)
    nn = sm @ e2
    logits = sim(nn, e1)
    T = len(e1)
    labels = np.eye(T)
    if smooth:
        labels = (1 - T * smooth / (T - 1)) * labels + smooth / (T - 1) * np.ones((T, T))
    return logits, labels


@pytest.mark.parametrize("loss_type,sim_type", [
    ("regression_mse_var", "l2"), ("regression_mse", "cosine"),
    ("regression_huber", "l2")])
def test_tcc_matches_reference_formula(loss_type, sim_type):
    rng = np.random.RandomState(1)
    B, T, C = 3, 5, 8
    embs = rng.randn(B, T, C).astype(np.float32)
    seq_lens = rng.randint(10, 30, size=(B,)).astype(np.float32)
    steps = np.sort(rng.randint(0, 25, size=(B, T)), axis=-1).astype(np.float32)

    got = tcc_loss(jnp.asarray(embs), jnp.asarray(seq_lens), jnp.asarray(steps),
                   loss_type=loss_type, similarity_type=sim_type,
                   temperature=0.1, label_smoothing=0.1,
                   variance_lambda=0.001, huber_delta=0.1,
                   normalize_indices=True)["loss"]

    # oracle: loop over ordered pairs
    all_logits, all_labels, all_steps, all_lens = [], [], [], []
    for i in range(B):
        for j in range(B):
            if i == j:
                continue
            lg, lb = np_tcc_pair(embs[i], embs[j], sim_type, 0.1, 0.1)
            all_logits.append(lg)
            all_labels.append(lb)
            all_steps.append(np.tile(steps[i][None], (T, 1)))
            all_lens.append(np.full(T, seq_lens[i]))
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    stepsf = np.concatenate(all_steps) / np.concatenate(all_lens)[:, None]
    beta = np.exp(logits - logits.max(1, keepdims=True))
    beta /= beta.sum(1, keepdims=True)
    true_t = (stepsf * labels).sum(1)
    pred_t = (stepsf * beta).sum(1)
    if loss_type == "regression_mse_var":
        var = (np.square(stepsf - pred_t[:, None]) * beta).sum(1)
        want = np.mean(np.exp(-np.log(var)) * np.square(true_t - pred_t)
                       + 0.001 * np.log(var))
    elif loss_type == "regression_mse":
        want = np.mean(np.square(pred_t - true_t))
    else:
        d = np.abs(pred_t - true_t)
        want = np.mean(np.where(d < 1, 0.5 * d * d, d - 0.5))
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_tcn_matches_reference_formula():
    rng = np.random.RandomState(2)
    B, T, C = 2, 8, 6
    embs = rng.randn(B, T, C).astype(np.float32)
    got = tcn_loss(jnp.asarray(embs), reg_lambda=0.002)["loss"]

    losses = []
    for b in range(B):
        anchors, positives = embs[b, 0::2], embs[b, 1::2]
        reg = np.mean(np.square(anchors).sum(1)) + np.mean(np.square(positives).sum(1))
        sim = anchors @ positives.T
        lse = np.log(np.exp(sim - sim.max(1, keepdims=True)).sum(1)) + sim.max(1)
        xent = np.mean(lse - np.diag(sim))
        losses.append(0.25 * 0.002 * reg + xent)
    np.testing.assert_allclose(float(got), np.mean(losses), rtol=1e-5)


def test_classification_loss_and_accuracy():
    rng = np.random.RandomState(3)
    B, T, K = 2, 6, 4
    logits = rng.randn(B, T, K).astype(np.float32)
    labels = rng.randint(-1, K, size=(B, T))
    masks = np.ones((B, T), np.float32)
    masks[0, -1] = 0

    got = classification_loss(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(masks), training=True)["loss"]
    flat_lg = logits.reshape(-1, K)
    flat_lb = labels.reshape(-1)
    flat_m = masks.reshape(-1)
    valid = flat_lb >= 0
    lse = np.log(np.exp(flat_lg - flat_lg.max(1, keepdims=True)).sum(1)) + flat_lg.max(1)
    ce = lse - flat_lg[np.arange(len(flat_lb)), np.maximum(flat_lb, 0)]
    want = (ce * flat_m * valid).sum() / (flat_m * valid).sum()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

    acc = classification_loss(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(masks), training=False)["loss"]
    correct = (flat_lg.argmax(1) == flat_lb) * flat_m * valid
    np.testing.assert_allclose(float(acc), correct.sum() / (flat_m * valid).sum(),
                               rtol=1e-5)
