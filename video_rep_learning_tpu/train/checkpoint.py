"""Checkpoint save / auto-resume (orbax).

Parity targets (`models/__init__.py:17-60`):
- save {epoch, model state, optimizer state} to
  LOGDIR/checkpoints/checkpoint_epoch_NNNNN every SAVE_INTERVAL epochs
- resume from the lexicographically-last checkpoint, returning epoch+1
- MODEL.PRETRAINED_CHECKPOINT warm start: model weights only, no optimizer
The frozen-config semantics (`utils/parser.py:106-131`) live in parser.py.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from ..logging_utils import get_logger

logger = get_logger(__name__)

_CKPT_RE = re.compile(r"^checkpoint_epoch_(\d+)$")


def checkpoint_dir(logdir: str) -> str:
    return os.path.join(logdir, "checkpoints")


def _list_checkpoints(logdir: str):
    d = checkpoint_dir(logdir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        m = _CKPT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(d, name)))
    return out


def save_checkpoint(logdir: str, state: Dict[str, Any], epoch: int) -> str:
    """`save_checkpoint` (`models/__init__.py:17-29`); state is a pytree dict
    (params / batch_stats / opt_state / epoch)."""
    path = os.path.join(checkpoint_dir(logdir), f"checkpoint_epoch_{epoch:05d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)
    logger.info("Saving epoch %d to: %s", epoch, path)
    return path


def load_checkpoint(logdir: str, template: Dict[str, Any]) -> Tuple[Optional[Dict], int]:
    """Auto-resume from the newest checkpoint (`models/__init__.py:35-48`).
    Returns (state, start_epoch); (None, 0) when nothing to resume."""
    ckpts = _list_checkpoints(logdir)
    if not ckpts:
        return None, 0
    epoch, path = ckpts[-1]
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(path), abstract)
    logger.info("Loading checkpoint from: %s (resuming at epoch %d)", path, epoch + 1)
    return state, epoch + 1


def load_pretrained_params(path: str, params_template) -> Any:
    """Weights-only warm start (`models/__init__.py:50-59`): restores the
    'params' (and batch_stats) subtrees from a checkpoint produced by
    save_checkpoint; optimizer state and epoch are ignored."""
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, params_template)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), abstract)
    logger.info("Warm-started model weights from %s", path)
    return restored
