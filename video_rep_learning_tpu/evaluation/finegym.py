"""FineGym distributed evaluation harness.

Parity target `evaluate_finegym.py:38-313`:
- per-video embeddings pickled to LOGDIR/finegym_eval_{train,val}set (disk is
  the exchange medium — FineGym is too large for RAM), file lists gathered
  across processes;
- the probe is a trained-from-scratch logistic regression (Linear) with SGD
  momentum 0.9, weight decay 1e-6, cosine LR from EVAL.CLASSIFICATION_LR over
  EVAL.CLASSIFICATION_EPOCHS epochs, batches of 10 videos' frames, fractions
  {0.1, 0.5, 1.0}; accuracy counters are all-reduced across processes;
- DEBUG_USE_EXISTING_CACHE reuses cached embedding pickles.

TPU adaptation: the probe is a jitted optax SGD loop; each 10-video batch's
frames are concatenated and padded to a power-of-two bucket with a loss mask
(static shapes, a handful of compiles).
"""

from __future__ import annotations

import math
import os
import pickle
import shutil
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..logging_utils import get_logger
from ..parallel.collectives import all_gather_object, all_reduce_sum, synchronize
from ..parallel.mesh import is_root_proc

logger = get_logger(__name__)

DEBUG_USE_EXISTING_CACHE = False


def dump_embeddings_dataset(cfg, model, variables, data_loader, output_dir,
                            embed_fn=None):
    """Per-video embedding pickles (`evaluate_finegym.py:70-131`): each video
    streams straight to disk (disk is the exchange medium — FineGym does not
    fit in RAM). Returns (file list, UB_S1 one-set items for visualization —
    labels 74..88)."""
    from .embedding import iter_video_embeddings

    os.makedirs(output_dir, exist_ok=True)
    files, oneset = [], []
    for rec in iter_video_embeddings(cfg, model, variables, data_loader,
                                     embed_fn):
        embs, labels, name = rec["embs"], rec["labels"], rec["name"]
        safe = str(name).replace("/", "_")
        path = os.path.join(output_dir, f"{safe}.pkl")
        with open(path, "wb") as f:
            pickle.dump({"embs": embs, "labels": labels, "name": name}, f)
        files.append(path)
        if cfg.EVAL.CLASS_NUM == 99 and len(labels) and 74 <= int(labels[0]) <= 88:
            oneset.append({"embs": embs, "labels": labels, "name": name})
    logger.info("dumped %d embedding files to %s", len(files), output_dir)
    return files, oneset


def _load_embedding_file(path):
    with open(path, "rb") as f:
        data = pickle.load(f)
    embs = np.asarray(data["embs"], np.float32)
    labels = np.asarray(data["labels"], np.int64)
    valid = labels >= 0
    return embs[valid], labels[valid]


def _bucket(n):
    b = 256
    while b < n:
        b *= 2
    return b


def train_linear_probe(cfg, train_files, val_files, fraction, cur_epoch,
                       summary_writer):
    """The distributed torch-LR probe (`evaluate_finegym.py:181-260`) as a
    jitted optax SGD loop."""
    rng = np.random.RandomState(cfg.RNG_SEED)
    batch_videos = 10
    lr0 = cfg.EVAL.CLASSIFICATION_LR
    total_e = cfg.EVAL.CLASSIFICATION_EPOCHS
    emb_dim = cfg.MODEL.EMBEDDER_MODEL.EMBEDDING_SIZE
    num_classes = cfg.EVAL.CLASS_NUM
    nproc, rank = 1, 0
    try:
        nproc, rank = jax.process_count(), jax.process_index()
    except Exception:
        pass

    num_train = max(nproc * batch_videos, int(fraction * len(train_files)))
    train_files = train_files[:num_train]

    params = {
        "w": jnp.zeros((emb_dim, num_classes), jnp.float32),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    # torch Linear default init
    bound = 1.0 / math.sqrt(emb_dim)
    k = jax.random.key(cfg.RNG_SEED)
    params["w"] = jax.random.uniform(k, (emb_dim, num_classes), minval=-bound,
                                     maxval=bound)
    params["b"] = jax.random.uniform(jax.random.fold_in(k, 1), (num_classes,),
                                     minval=-bound, maxval=bound)

    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(1e-6),
            optax.trace(decay=0.9),
            optax.scale(-learning_rate)))(learning_rate=lr0)
    opt_state = tx.init(params)

    @jax.jit
    def probe_step(params, opt_state, x, y, mask, lr):
        def loss_fn(p):
            logits = x @ p["w"] + p["b"]
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0), logits

        (_, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        opt_state = opt_state._replace(
            hyperparams={**opt_state.hyperparams,
                         "learning_rate": jnp.asarray(lr, jnp.float32)})
        up, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, up)
        correct = jnp.sum((jnp.argmax(logits, 1) == y) * mask)
        return params, opt_state, correct

    @jax.jit
    def eval_correct(params, x, y, mask):
        logits = x @ params["w"] + params["b"]
        return jnp.sum((jnp.argmax(logits, 1) == y) * mask)

    def batches(files, shuffle, epoch, drop_last):
        idx = np.arange(len(files))
        if shuffle:
            np.random.RandomState(cfg.RNG_SEED + epoch).shuffle(idx)
        # shard across processes, pad to multiple
        per = -(-len(idx) // nproc)
        idx = np.concatenate([idx, idx[: per * nproc - len(idx)]])[rank::nproc]
        # train mirrors the reference's drop_last=True loader; val keeps the
        # tail so EVERY video counts (`evaluate_finegym.py:192,199`)
        stop = len(idx) - batch_videos + 1 if drop_last else len(idx)
        for s in range(0, stop, batch_videos):
            batch_idx = idx[s:s + batch_videos]
            xs, ys = [], []
            for i in batch_idx:
                e, l = _load_embedding_file(files[int(i)])
                xs.append(e)
                ys.append(l)
            x = np.concatenate(xs)
            y = np.concatenate(ys)
            nb = _bucket(len(x))
            mask = np.zeros(nb, np.float32)
            mask[: len(x)] = 1.0
            xp = np.zeros((nb, x.shape[1]), np.float32)
            xp[: len(x)] = x
            yp = np.zeros(nb, np.int32)
            yp[: len(y)] = y
            # valid count rides as a host float so the accumulation loops
            # never read a device value mid-epoch
            yield (jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(mask),
                   float(mask.sum()))

    train_accuracy = accuracy = 0.0
    for e in range(total_e):
        lr = lr0 * (1 + math.cos(math.pi * e / (1.0 * total_e))) / 2
        # device-side accumulation: a float(c) per batch would stall the
        # dispatch queue on a D2H read every 10 videos (same lesson as the
        # extraction holdback) — read once per epoch instead
        correct_d, total = None, 0.0
        for x, y, mask, nvalid in batches(train_files, shuffle=True, epoch=e,
                                          drop_last=True):
            params, opt_state, c = probe_step(params, opt_state, x, y, mask, lr)
            correct_d = c if correct_d is None else correct_d + c
            total += nvalid
        correct = float(correct_d) if correct_d is not None else 0.0
        correct = all_reduce_sum(correct)
        total = all_reduce_sum(total)
        train_accuracy = 100 * correct / max(total, 1)
        if e % 10 == 0:
            logger.info("[%d/%d] classification_%s train set: %.3f%% (%d/%d)",
                        e, total_e, fraction, train_accuracy, correct, total)

        correct_d, total = None, 0.0
        for x, y, mask, nvalid in batches(val_files, shuffle=False, epoch=0,
                                          drop_last=False):
            c = eval_correct(params, x, y, mask)
            correct_d = c if correct_d is None else correct_d + c
            total += nvalid
        correct = float(correct_d) if correct_d is not None else 0.0
        correct = all_reduce_sum(correct)
        total = all_reduce_sum(total)
        accuracy = 100 * correct / max(total, 1)
        if e % 10 == 0:
            logger.info("[%d/%d] classification_%s val set: %.3f%% (%d/%d)",
                        e, total_e, fraction, accuracy, correct, total)

    logger.info("classification_%s/train: %s", fraction, train_accuracy)
    logger.info("classification_%s/val: %s", fraction, accuracy)
    if summary_writer is not None:
        summary_writer.add_scalar(f"classification_{fraction}/train",
                                  train_accuracy, cur_epoch)
        summary_writer.add_scalar(f"classification_{fraction}/val",
                                  accuracy, cur_epoch)
    return accuracy


def evaluate_once(trainer, cur_epoch, summary_writer):
    """`evaluate_finegym.py:133-268`: dump embeddings (sharded), gather file
    lists, run the probe per fraction."""
    cfg = trainer.cfg
    variables = trainer.variables

    lists = {}
    for split, loader in (("train", trainer.train_emb_loader[0]),
                          ("val", trainer.val_emb_loader[0])):
        output_dir = os.path.join(cfg.LOGDIR, f"finegym_eval_{split}set")
        if is_root_proc():
            if DEBUG_USE_EXISTING_CACHE:
                print("WARNING: DEBUG_USE_EXISTING_CACHE, keeping cache in "
                      + output_dir)
            elif os.path.exists(output_dir):
                shutil.rmtree(output_dir)
            os.makedirs(output_dir, exist_ok=True)
        synchronize()
        if (DEBUG_USE_EXISTING_CACHE and os.path.isdir(output_dir)
                and os.listdir(output_dir)):
            files = [os.path.join(output_dir, f) for f in os.listdir(output_dir)]
        else:
            logger.info("generating %s embeddings for finegym at %s (epoch %d)",
                        split, output_dir, cur_epoch)
            # embed_fn=None lets iter_video_embeddings pick the best path
            # (flat frame-packed extraction on TPU); a pre-built embed_fn
            # would pin the per-video bucketed sweep. The builders are
            # memoized, so nothing recompiles across splits/epochs.
            files, _ = dump_embeddings_dataset(cfg, trainer.model, variables,
                                               loader, output_dir)
            files = [f for sub in all_gather_object(files) for f in sub]
        lists[split] = sorted(files)

    fractions = cfg.EVAL.CLASSIFICATION_FRACTIONS
    if cfg.TRAINING_ALGO == "classification":
        fractions = [1]
    for fraction in fractions:
        train_linear_probe(cfg, lists["train"], lists["val"], fraction,
                           cur_epoch, summary_writer)
    synchronize()
