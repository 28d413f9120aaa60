"""Temporal Cycle-Consistency (TCC) loss.

Math parity with the reference (`algos/tcc.py:4-188`). The reference builds
the pair list with a Python double loop (`tcc.py:50-59`); here all B*(B-1)
ordered pairs are evaluated with a single vmap — same logits/labels, no host
loop, MXU-batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_FP32 = jax.lax.Precision.HIGHEST  # loss math stays fp32 even on the MXU


def _scaled_similarity(e1, e2, similarity_type: str, temperature: float):
    """`tcc.py:107-118`: (T, C) x (T, C) -> (T, T) similarities / C / tau."""
    channels = e1.shape[-1]
    if similarity_type == "cosine":
        sim = jnp.dot(e1, e2.T, precision=_FP32)
    elif similarity_type == "l2":
        n1 = jnp.sum(jnp.square(e1), axis=1)[:, None]
        n2 = jnp.sum(jnp.square(e2), axis=1)[None, :]
        sim = -(n1 + n2 - 2.0 * jnp.dot(e1, e2.T, precision=_FP32))
    else:
        raise ValueError(similarity_type)
    return sim / channels / temperature


def _align_pair(e1, e2, similarity_type, temperature, label_smoothing):
    """Soft nearest-neighbor cycle-back (`tcc.py:73-105`)."""
    T = e1.shape[0]
    sim_12 = _scaled_similarity(e1, e2, similarity_type, temperature)
    nn_embs = jnp.dot(jax.nn.softmax(sim_12, axis=-1), e2, precision=_FP32)
    logits = _scaled_similarity(nn_embs, e1, similarity_type, temperature)
    labels = jnp.eye(T)
    if label_smoothing:
        labels = ((1.0 - T * label_smoothing / (T - 1)) * labels
                  + label_smoothing / (T - 1) * jnp.ones_like(labels))
    return logits, labels


def tcc_loss(embs, seq_lens, steps, *, loss_type: str, similarity_type: str,
             temperature: float, label_smoothing: float,
             variance_lambda: float, huber_delta: float,
             normalize_indices: bool):
    """embs (B, T, C), seq_lens (B,), steps (B, T). Returns loss dict
    (`tcc.py:41-71,120-188`)."""
    B, T, C = embs.shape
    if B < 2:
        raise ValueError("TCC needs batch >= 2 sequences (`tcc.py:50-59`)")
    ii, jj = jnp.nonzero(  # static: all ordered pairs i != j
        ~jnp.eye(B, dtype=bool), size=B * (B - 1))

    pair_fn = jax.vmap(
        lambda i, j: _align_pair(embs[i], embs[j], similarity_type,
                                 temperature, label_smoothing))
    logits, labels = pair_fn(ii, jj)  # (P, T, T)
    pair_steps = steps[ii].astype(jnp.float32)  # (P, T)
    pair_lens = seq_lens[ii].astype(jnp.float32)  # (P,)

    logits = logits.reshape(-1, T)
    labels = labels.reshape(-1, T)
    stepsf = jnp.broadcast_to(pair_steps[:, None, :], (len(ii), T, T)).reshape(-1, T)
    lensf = jnp.broadcast_to(pair_lens[:, None], (len(ii), T)).reshape(-1)

    if loss_type == "classification":
        # torch KLDivLoss(reduction='mean') divides by numel (`tcc.py:67`)
        log_probs = logits  # reference passes raw logits as the "log input"
        kl = jax.scipy.special.xlogy(labels, labels) - labels * log_probs
        return {"loss": jnp.mean(kl)}

    if normalize_indices:
        stepsf = stepsf / lensf[:, None]
    beta = jax.nn.softmax(logits, axis=-1)
    true_time = jnp.sum(stepsf * labels, axis=-1)
    pred_time = jnp.sum(stepsf * beta, axis=-1)

    if loss_type in ("regression_mse", "regression_mse_var"):
        if "var" in loss_type:
            var = jnp.sum(jnp.square(stepsf - pred_time[:, None]) * beta, axis=-1)
            log_var = jnp.log(var)
            sq_err = jnp.square(true_time - pred_time)
            loss = jnp.mean(jnp.exp(-log_var) * sq_err + variance_lambda * log_var)
            return {"loss": loss, "squared_error": jnp.mean(sq_err),
                    "pred_time_log_var": jnp.mean(log_var)}
        return {"loss": jnp.mean(jnp.square(pred_time - true_time))}
    if loss_type == "regression_huber":
        # torch SmoothL1Loss (delta=1)
        diff = jnp.abs(pred_time - true_time)
        loss = jnp.where(diff < 1.0, 0.5 * diff ** 2, diff - 0.5)
        return {"loss": jnp.mean(loss)}
    raise ValueError(loss_type)


class TCC:
    """Algo driver (`algos/tcc.py:16-39`)."""

    def __init__(self, cfg):
        self.cfg = cfg

    def compute_loss(self, model, variables, batch, train=True, rngs=None,
                     backbone_warmup_active=False):
        cfg = self.cfg
        videos = batch["videos"]
        num_frames = cfg.TRAIN.NUM_FRAMES
        if cfg.SSL:
            B, V = videos.shape[0], videos.shape[1]
            videos = videos.reshape((B * V,) + videos.shape[2:])
            steps = batch["chosen_steps"].reshape(-1, num_frames)
            seq_lens = batch["seq_lens"].reshape(-1)
        else:
            steps = batch["chosen_steps"]
            seq_lens = batch["seq_lens"]
        T = videos.shape[1]
        masks = batch["video_masks"].reshape(-1, 1, T)

        out = model.apply(variables, videos, num_frames, video_masks=masks,
                          train=train, rngs=rngs,
                          backbone_warmup_active=backbone_warmup_active,
                          mutable=["batch_stats"] if train else False)
        embs, updates = out if train else (out, {})
        kw = dict(
            loss_type=cfg.TCC.LOSS_TYPE, similarity_type=cfg.TCC.SIMILARITY_TYPE,
            temperature=cfg.TCC.SOFTMAX_TEMPERATURE,
            label_smoothing=cfg.TCC.LABEL_SMOOTHING,
            variance_lambda=cfg.TCC.VARIANCE_LAMBDA,
            huber_delta=cfg.TCC.HUBER_DELTA,
            normalize_indices=cfg.TCC.NORMALIZE_INDICES)

        # Multi-device DP: the reference's DDP builds its pair list over the
        # LOCAL batch (`tcc.py:50-59` — no dist collectives), so alignment
        # pairs never cross ranks. Match it: per-shard pairs in shard_map +
        # pmean. A global-view pair list would add cross-rank pairs the
        # reference never evaluates AND grow the pair count O(ranks^2).
        # Requires >= 2 sequences per shard (the reference needs the same
        # per rank); falls back to the global pair list otherwise.
        from ..parallel.sharding import data_context

        mesh = data_context()
        Bp = embs.shape[0]
        if (mesh is not None and Bp % mesh.shape["data"] == 0
                and Bp // mesh.shape["data"] >= 2):
            from jax.sharding import PartitionSpec as P

            def ranked(e, sl, st):
                return jax.lax.pmean(tcc_loss(e, sl, st, **kw)["loss"],
                                     "data")

            loss = {"loss": jax.shard_map(
                ranked, mesh=mesh, in_specs=(P("data"),) * 3,
                out_specs=P(), check_vma=False)(embs, seq_lens, steps)}
        else:
            loss = tcc_loss(embs, seq_lens, steps, **kw)
        return loss, updates
