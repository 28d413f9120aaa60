"""Sequence Contrastive Loss (SCL) — the CARL training objective.

Exact-math parity with the reference (`algos/scl.py:18-105`), re-derived as a
single vectorized XLA program: the reference's per-sample Python loop over
(start, mid, end) view blocks (`scl.py:68-96`) becomes index arithmetic with
broadcasted iotas, so the whole loss is one fused graph over the
(B*V*T, B*V*T) similarity matrix. A Pallas fused kernel for large B*T lives
in `ops/scl_pallas.py` (same math, never materializes the full matrix in HBM).

Semantics (N = B*V*T flattened frame embeddings):
  logits[i,j]  = <e_i, e_j> / tau
  dist[i,j]    = |steps_i / len_i * len_j - steps_j|, 1e6 where either frame
                 is padding (`scl.py:62-63`)
  weight[i,j]  = negative weights: 'single' keeps only same-sample pairs,
                 'noself' zeroes same-view blocks; 1e-6 on padded pairs
                 (`scl.py:74-80`)
  label[i,j]   = row-normalized gaussian exp(-dist^2 / (2*sigma^2)) on the
                 cross-view block of the same sample (`scl.py:84-96`)
  loss         = sum(KL(label || exp_logits / sum_j weight*exp_logits) * mask)
                 / sum(masks)                             (`scl.py:98-103`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_div(a, b):
    """a/b with NaN results zeroed (`algos/scl.py:13-16`)."""
    out = a / b
    return jnp.where(jnp.isnan(out), 0.0, out)


def scl_sequence_loss(embs, seq_lens, steps, masks, *, temperature: float,
                      label_varience: float, positive_type: str = "gauss",
                      negative_type: str = "single_noself"):
    """Compute the SCL loss.

    Args:
      embs: (B, V, T, C) projected, L2-normalized frame embeddings.
      seq_lens: (B, V) original video lengths.
      steps: (B, V, T) chosen frame indices.
      masks: (B, V, T) 1.0 for valid frames, 0.0 for padding.

    Returns: dict with "loss" scalar.
    """
    B, V, T, C = embs.shape
    N = B * V * T
    e = embs.reshape(N, C).astype(jnp.float32)
    stp = steps.reshape(N).astype(jnp.float32)
    lens = jnp.broadcast_to(seq_lens.reshape(B, V, 1), (B, V, T)).reshape(N)
    lens = lens.astype(jnp.float32)
    m = masks.reshape(N).astype(jnp.float32)
    input_masks = m[:, None] * m[None, :]

    logits = jnp.dot(e, e.T, precision=jax.lax.Precision.HIGHEST) / temperature
    dist = jnp.abs(stp[:, None] / lens[:, None] * lens[None, :] - stp[None, :])
    dist = jnp.where(input_masks == 0, 1e6, dist)

    idx = jnp.arange(N)
    sample_id = idx // (V * T)
    view_id = (idx // T) % V
    same_sample = sample_id[:, None] == sample_id[None, :]
    same_view = same_sample & (view_id[:, None] == view_id[None, :])
    cross_view = same_sample & ~same_view

    weight = jnp.ones((N, N), jnp.float32)
    if "single" in negative_type:
        weight = jnp.where(same_sample, weight, 0.0)
    if "noself" in negative_type:
        weight = jnp.where(same_view, 0.0, weight)
    weight = jnp.where(input_masks == 0, 1e-6, weight)

    if positive_type == "gauss":
        pos_weight = jnp.exp(-jnp.square(dist) / (2.0 * label_varience))
        pos_in_block = jnp.where(cross_view, pos_weight, 0.0)
        row_sum = jnp.sum(pos_in_block, axis=1, keepdims=True)
        label = jnp.where(cross_view, safe_div(pos_in_block, row_sum), 0.0)
    else:
        label = jnp.zeros((N, N), jnp.float32)

    exp_logits = jnp.exp(logits)
    sum_negative = jnp.sum(weight * exp_logits, axis=1, keepdims=True)
    log_input = jnp.log(safe_div(exp_logits, sum_negative) + 1e-6)
    # torch F.kl_div(input_log, target, 'none') == xlogy(t, t) - t*input_log
    kl = jax.scipy.special.xlogy(label, label) - label * log_input
    loss = jnp.sum(kl * input_masks) / jnp.sum(m)
    return {"loss": loss}


def scl_loss_dispatch(embs, seq_lens, steps, masks, *, temperature,
                      label_varience, positive_type, negative_type):
    """SCL loss with kernel + parallelism dispatch.

    Multi-device DP: the reference's DDP computes SCL per rank over the
    LOCAL batch (negatives never cross ranks — the reference `algos/scl.py`
    has no dist collectives) and combines ranks by gradient averaging.
    Match that exactly: per-shard loss in `jax.shard_map` over the 'data'
    axis + pmean. This is also the efficient layout — a global (N, N)
    similarity would both change semantics (cross-rank negatives for
    batch_noself) and replicate O(N_global^2) work on every chip (GSPMD
    cannot partition the fused kernel's custom call). VRL_GLOBAL_SCL=1
    opts into global-batch negatives as a beyond-reference variant.

    Per shard (or single device), the Pallas fused kernel takes over at
    N >= 8192 — measured (r2, v5e) speed parity with XLA below that, but
    XLA materializes several (N, N) fp32 buffers (~6 GB at N=16K) that the
    kernel never allocates."""
    import os

    from ..parallel.sharding import data_context

    B = embs.shape[0]

    def shard_loss(e, sl, st, mk):
        n = e.shape[0] * e.shape[1] * e.shape[2]
        flag = os.environ.get("VRL_FUSED_SCL", "auto")  # 0 | 1 | auto
        use_fused = (positive_type == "gauss"
                     and jax.default_backend() == "tpu"
                     and flag != "0"
                     and (flag == "1" or n >= 8192))
        if use_fused:
            from ..ops.scl_pallas import scl_loss_fused

            return scl_loss_fused(e, sl, st, mk, temperature,
                                  label_varience, negative_type)
        return scl_sequence_loss(
            e, sl, st, mk, temperature=temperature,
            label_varience=label_varience, positive_type=positive_type,
            negative_type=negative_type)["loss"]

    mesh = data_context()
    if (mesh is not None and B % mesh.shape["data"] == 0
            and os.environ.get("VRL_GLOBAL_SCL", "0") != "1"):
        from jax.sharding import PartitionSpec as P

        def ranked(e, sl, st, mk):
            return jax.lax.pmean(shard_loss(e, sl, st, mk), "data")

        return jax.shard_map(
            ranked, mesh=mesh, in_specs=(P("data"),) * 4,
            out_specs=P(), check_vma=False)(embs, seq_lens, steps, masks)
    return shard_loss(embs, seq_lens, steps, masks)


class SCL:
    """Algo driver (`algos/scl.py:18-50`): reshapes the two-view batch, runs
    the model with the projection head, and applies the sequence loss."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.temperature = cfg.SCL.SOFTMAX_TEMPERATURE
        self.label_varience = cfg.SCL.LABEL_VARIENCE
        self.positive_type = cfg.SCL.POSITIVE_TYPE
        self.negative_type = cfg.SCL.NEGATIVE_TYPE

    def compute_loss(self, model, variables, batch, train=True, rngs=None,
                     backbone_warmup_active=False):
        videos = batch["videos"]  # (B, V, T, C, H, W)
        num_frames = self.cfg.TRAIN.NUM_FRAMES
        B, V, T = videos.shape[0], videos.shape[1], videos.shape[2]
        flat = videos.reshape((B * V,) + videos.shape[2:])
        masks = batch["video_masks"].reshape(B * V, 1, T)

        out = model.apply(
            variables, flat, num_frames, video_masks=masks,
            project=self.cfg.MODEL.PROJECTION, train=train,
            backbone_warmup_active=backbone_warmup_active,
            rngs=rngs, mutable=["batch_stats"] if train else False)
        embs, updates = out if train else (out, {})

        embs = embs.reshape(B, V, num_frames, embs.shape[-1])
        seq_lens = batch["seq_lens"].reshape(B, V)
        steps = batch["chosen_steps"].reshape(B, V, num_frames)
        masks = batch["video_masks"].reshape(B, V, num_frames)

        loss_val = scl_loss_dispatch(
            embs, seq_lens, steps, masks, temperature=self.temperature,
            label_varience=self.label_varience,
            positive_type=self.positive_type,
            negative_type=self.negative_type)
        return {"loss": loss_val}, updates
