"""Optimizer and LR-schedule construction (optax).

Parity targets (`utils/optimizer.py`):
- construct_optimizer (:10-77): Adam / SGD-momentum / AdamW. torch Adam/SGD
  apply *coupled* L2 (grad += wd * p before the moment updates); optax's
  add_decayed_weights before scale_by_adam reproduces that exactly. AdamW is
  decoupled, as in torch.
- Parameter selection (:29-42): backbone params are excluded from the
  optimizer when TRAIN_BASE == 'frozen'; with 'only_bn' only the backbone's
  BN params train. (The reference's bn/non-bn "groups" both use the same
  weight decay — :48-51 — so there is exactly one effective group.)
- construct_scheduler (:79-104): fixed / cosine (T_max = MAX_EPOCHS + 1) /
  cosinewarmup (linspace warmup then cosine) / multiply (exponential),
  stepped once per epoch. We express LR as a pure function of the epoch,
  which also fixes the reference's restart-on-resume scheduler quirk
  (SURVEY.md §5 checkpoint notes).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import numpy as np
import optax
from flax import traverse_util

from ..config import ConfigNode


def trainable_mask(params, cfg: ConfigNode) -> Dict[Tuple[str, ...], bool]:
    """Flat {path: trainable} mask (`utils/optimizer.py:29-42`)."""
    train_base = cfg.MODEL.TRAIN_BASE
    flat = traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        in_backbone = path and path[0] == "backbone"
        is_bn = any("BatchNorm" in p for p in path)
        if in_backbone and train_base != "train_all":
            mask[path] = train_base == "only_bn" and is_bn
        else:
            mask[path] = True
    return mask


def split_params(params, cfg: ConfigNode):
    """Partition params into (trainable, frozen) flat dicts. Keeping frozen
    params out of the grad/optimizer trees means no Adam moments are ever
    allocated for the (large, frozen) backbone."""
    flat = traverse_util.flatten_dict(params)
    mask = trainable_mask(params, cfg)
    trainable = {k: v for k, v in flat.items() if mask[k]}
    frozen = {k: v for k, v in flat.items() if not mask[k]}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict):
    return traverse_util.unflatten_dict({**trainable, **frozen})


def make_optimizer(cfg: ConfigNode) -> optax.GradientTransformation:
    """Build the optax chain; learning rate is injected per-epoch via
    `optax.inject_hyperparams` (set `opt_state.hyperparams['learning_rate']`)."""
    wd = cfg.OPTIMIZER.WEIGHT_DECAY
    grad_clip = cfg.OPTIMIZER.GRAD_CLIP
    opt_type = cfg.OPTIMIZER.TYPE

    @optax.inject_hyperparams
    def build(learning_rate):
        parts = []
        if grad_clip and grad_clip > 0:
            parts.append(optax.clip_by_global_norm(grad_clip))
        if opt_type == "MomentumOptimizer":
            parts += [optax.add_decayed_weights(wd),
                      optax.trace(decay=0.9, nesterov=False)]
        elif opt_type == "AdamOptimizer":
            parts += [optax.add_decayed_weights(wd),
                      optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)]
        elif opt_type == "AdamWOptimizer":
            parts += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                      optax.add_decayed_weights(wd)]
        else:
            raise NotImplementedError(f"optimizer {opt_type}")
        parts.append(optax.scale(-learning_rate))
        return optax.chain(*parts)

    return build(learning_rate=cfg.OPTIMIZER.LR.INITIAL_LR)


def learning_rate_for_epoch(cfg: ConfigNode, epoch: int) -> float:
    """LR at a given epoch under the reference's per-epoch stepping
    (`utils/optimizer.py:79-104`; the scheduler is stepped at the end of
    every epoch except the last, `train.py:185-186`)."""
    lr_cfg = cfg.OPTIMIZER.LR
    base = lr_cfg.INITIAL_LR
    decay = lr_cfg.DECAY_TYPE
    max_epochs = cfg.TRAIN.MAX_EPOCHS
    if decay == "fixed":
        return base
    if decay == "cosine":
        t_max = max_epochs + 1
        return base * (1 + math.cos(math.pi * epoch / t_max)) / 2
    if decay == "cosinewarmup":
        warm = lr_cfg.NUM_WARMUP_STEPS
        warmup = np.linspace(lr_cfg.WARMUP_LR / base, 1.0, warm)
        iters = np.arange(max_epochs + 1 - warm)
        final_ratio = lr_cfg.FINAL_LR / base
        cos = final_ratio + 0.5 * (1 - final_ratio) * (
            1 + np.cos(np.pi * iters / len(iters)))
        sched = np.concatenate([warmup, cos])
        return float(base * sched[min(epoch, len(sched) - 1)])
    if decay == "multiply":
        return base * (lr_cfg.DECAY_RATE ** epoch)
    raise NotImplementedError(f"scheduler {decay}")


def set_learning_rate(opt_state, lr: float):
    """Update the injected hyperparam in place-of (returns new state)."""
    opt_state.hyperparams["learning_rate"] = jax.numpy.asarray(lr, jax.numpy.float32)
    return opt_state
