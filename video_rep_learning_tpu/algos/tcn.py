"""Time-Contrastive Network (TCN) n-pairs loss.

Math parity with `algos/tcn.py:5-47`: anchor/positive frames are interleaved
by the sampler (`datasets/pouring.py:169-174`); per sequence the loss is an
n-pairs softmax over anchor-positive similarities plus an L2 regularizer.
The reference's per-sequence Python loop (`tcn.py:19-21`) is a vmap here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def tcn_single_sequence_loss(embs, reg_lambda: float):
    """embs (T, C) with anchors at even, positives at odd indices
    (`tcn.py:24-47`)."""
    anchors = embs[0::2]
    positives = embs[1::2]
    n = anchors.shape[0]
    reg = jnp.mean(jnp.sum(jnp.square(anchors), axis=1)) + \
        jnp.mean(jnp.sum(jnp.square(positives), axis=1))
    l2loss = 0.25 * reg_lambda * reg
    sim = jnp.dot(anchors, positives.T, precision=jax.lax.Precision.HIGHEST)
    labels = jnp.arange(n)
    xent = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(sim, labels))
    return l2loss + xent


def tcn_loss(embs, *, reg_lambda: float):
    """embs (B, T, C) -> mean over per-sequence n-pairs losses."""
    losses = jax.vmap(lambda e: tcn_single_sequence_loss(e, reg_lambda))(embs)
    return {"loss": jnp.mean(losses)}


class TCN:
    """Algo driver (`algos/tcn.py:12-22`)."""

    def __init__(self, cfg):
        self.cfg = cfg

    def compute_loss(self, model, variables, batch, train=True, rngs=None,
                     backbone_warmup_active=False):
        videos = batch["videos"]
        num_frames = self.cfg.TRAIN.NUM_FRAMES
        if videos.ndim == 6:  # SSL two-view layout -> flatten like the samplers do
            videos = videos.reshape((-1,) + videos.shape[2:])
        T = videos.shape[1]
        masks = batch["video_masks"].reshape(-1, 1, T)
        out = model.apply(variables, videos, num_frames, video_masks=masks,
                          train=train, rngs=rngs,
                          backbone_warmup_active=backbone_warmup_active,
                          mutable=["batch_stats"] if train else False)
        embs, updates = out if train else (out, {})
        return tcn_loss(embs, reg_lambda=self.cfg.TCN.REG_LAMBDA), updates
