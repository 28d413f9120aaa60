"""Supervised per-frame classification algo.

Math parity with `algos/classification.py:9-32`: cross-entropy on frames
with label >= 0, weighted by the video mask; in val mode the "loss" is the
masked accuracy instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def classification_loss(logits, labels, masks, training: bool):
    """logits (B, T, K), labels (B, T) int (-1 = ignore), masks (B, T)."""
    K = logits.shape[-1]
    logits = logits.reshape(-1, K)
    labels = labels.reshape(-1).astype(jnp.int32)
    masks = masks.reshape(-1).astype(jnp.float32)
    valid = (labels >= 0).astype(jnp.float32)
    safe_labels = jnp.maximum(labels, 0)
    if training:
        per = optax.softmax_cross_entropy_with_integer_labels(logits, safe_labels)
    else:
        per = (jnp.argmax(logits, axis=1) == safe_labels).astype(jnp.float32)
    w = masks * valid
    return {"loss": jnp.sum(per * w) / jnp.sum(w)}


class Classification:
    """Algo driver (`algos/classification.py:15-32`)."""

    def __init__(self, cfg):
        self.cfg = cfg

    def compute_loss(self, model, variables, batch, train=True, rngs=None,
                     backbone_warmup_active=False):
        videos = batch["videos"]
        num_frames = self.cfg.TRAIN.NUM_FRAMES
        T = videos.shape[1]
        masks = batch["video_masks"].reshape(-1, 1, T)
        out = model.apply(variables, videos, num_frames, video_masks=masks,
                          classification=True, train=train, rngs=rngs,
                          backbone_warmup_active=backbone_warmup_active,
                          mutable=["batch_stats"] if train else False)
        logits, updates = out if train else (out, {})
        loss = classification_loss(logits, batch["labels"],
                                   batch["video_masks"], training=train)
        return loss, updates
