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
# Mid-epoch (preemption) checkpoints — a TPU-native addition; the name
# deliberately does NOT match _CKPT_RE so reference-format tooling
# (export/import CLIs, read_results) keeps seeing epoch checkpoints only.
_MID_RE = re.compile(r"^checkpoint_iter_(\d+)_(\d+)$")


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


def _list_mid_checkpoints(logdir: str):
    d = checkpoint_dir(logdir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        m = _MID_RE.match(name)
        if m:
            out.append((int(m.group(1)), int(m.group(2)),
                        os.path.join(d, name)))
    return out


def _prune_mid_checkpoints(logdir: str, keep_path: Optional[str] = None):
    import shutil

    for _, _, path in _list_mid_checkpoints(logdir):
        if path != keep_path:
            shutil.rmtree(path, ignore_errors=True)


def save_checkpoint(logdir: str, state: Dict[str, Any], epoch: int) -> str:
    """`save_checkpoint` (`models/__init__.py:17-29`); state is a pytree dict
    (params / batch_stats / opt_state / epoch). Completing an epoch save
    obsoletes any mid-epoch checkpoint (the epoch one is never older)."""
    path = os.path.join(checkpoint_dir(logdir), f"checkpoint_epoch_{epoch:05d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)
    _prune_mid_checkpoints(logdir)
    logger.info("Saving epoch %d to: %s", epoch, path)
    return path


def save_mid_checkpoint(logdir: str, state: Dict[str, Any], epoch: int,
                        next_iter: int) -> str:
    """Mid-epoch preemption checkpoint (CHECKPOINT.SAVE_EVERY_N_ITERS):
    same state tree as save_checkpoint; (epoch, next_iter) ride in the
    directory name. Only the newest mid checkpoint is kept."""
    path = os.path.join(checkpoint_dir(logdir),
                        f"checkpoint_iter_{epoch:05d}_{next_iter:07d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)
    _prune_mid_checkpoints(logdir, keep_path=path)
    logger.info("Saving mid-epoch checkpoint (epoch %d, iter %d) to: %s",
                epoch, next_iter, path)
    return path


def load_checkpoint(logdir: str, template: Dict[str, Any],
                    include_mid: bool = True) -> Tuple[Optional[Dict], int, int]:
    """Auto-resume from the newest checkpoint (`models/__init__.py:35-48`).
    Returns (state, start_epoch, start_iter); (None, 0, 0) when nothing to
    resume. An epoch-`e` checkpoint resumes at (e+1, 0); a mid-epoch
    checkpoint at its exact (epoch, next_iter) — whichever is furthest
    along wins. include_mid=False restores the reference's epoch-only view
    (evaluate.py keeps its semantics: mid checkpoints are a training-resume
    concern)."""
    candidates = [((e + 1, 0), path) for e, path in _list_checkpoints(logdir)]
    if include_mid:
        candidates += [((e, it), path)
                       for e, it, path in _list_mid_checkpoints(logdir)]
    if not candidates:
        return None, 0, 0
    (epoch, it), path = max(candidates, key=lambda c: c[0])
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(path), abstract)
    logger.info("Loading checkpoint from: %s (resuming at epoch %d, iter %d)",
                path, epoch, it)
    return state, epoch, it


def load_pretrained_params(path: str, params_template) -> Any:
    """Weights-only warm start (`models/__init__.py:50-59`): restores the
    'params' (and batch_stats) subtrees from a checkpoint produced by
    save_checkpoint; optimizer state and epoch are ignored."""
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, params_template)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), abstract)
    logger.info("Warm-started model weights from %s", path)
    return restored
