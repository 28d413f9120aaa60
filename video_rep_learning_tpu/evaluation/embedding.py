"""Embedding extraction: full-video sweep through the model.

Parity target `evaluate.py:27-81`: batch-size-1 videos, chunked into at most
EVAL.FRAMES_PER_BATCH frames (num_batches = ceil(len/max); chunk =
ceil(len/num_batches)), per-chunk forward WITHOUT the projection head (so
embeddings are the L2-normalized representation), frames with label < 0
dropped.

TPU adaptation for XLA static shapes (SURVEY.md §7 "ragged video lengths"):
chunks are padded up to a power-of-two bucket; the pad frames are key-masked
and the positional encoding is generated from the TRUE chunk length
(`true_seq_len` threading, models/layers.py sincos_embedding_dynamic), so
valid-frame embeddings are bit-identical to an unpadded run while the whole
sweep compiles once per bucket size.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..logging_utils import get_logger
from ..ops.augment import eval_augment

logger = get_logger(__name__)

_MIN_BUCKET = 64


def bucket_size(n: int, max_frames: int) -> int:
    b = _MIN_BUCKET
    while b < n:
        b *= 2
    return min(b, max(max_frames, n))


def make_embed_fn(model, cfg):
    """jitted (variables, frames(1,Tb,H,W,3)u8, dims(2,), mask(1,1,Tb),
    true_len) -> (1, Tb, emb) embeddings."""

    image_size = cfg.IMAGE_SIZE

    num_contexts = max(int(cfg.DATA.NUM_CONTEXTS), 1)

    @jax.jit
    def embed_chunk(variables, frames, dims, mask, true_len):
        video = frames[0].astype(jnp.float32) / 255.0
        video = eval_augment(video, image_size, dims=(dims[0], dims[1]))
        # reference `evaluate.py:60` passes num_steps (chunk frames WITHOUT
        # the context expansion) as num_frames — the conv embedder derives
        # its (steps, contexts) split from it
        num_frames = video.shape[0] // num_contexts
        embs = model.apply(variables, video[None], num_frames,
                           video_masks=mask, project=False, train=False,
                           true_seq_len=true_len)
        return embs

    return embed_chunk


def iter_video_embeddings(cfg, model, variables, data_loader, embed_fn=None):
    """Per-video embedding generator: yields one record per video so large
    datasets (FineGym) can stream to disk without holding everything in RAM
    (the reference's per-video pickling, `evaluate_finegym.py:70-131`)."""
    max_fpb = cfg.EVAL.FRAMES_PER_BATCH
    num_contexts = cfg.DATA.NUM_CONTEXTS
    embed_fn = embed_fn or make_embed_fn(model, cfg)

    for item in data_loader:
        video = item["video"]  # (T', H, W, 3) uint8, native resolution
        seq_len = int(item["seq_len"])
        assert video.shape[0] == seq_len
        num_batches = int(math.ceil(float(seq_len) / max_fpb))
        frames_per_batch = int(math.ceil(float(seq_len) / num_batches))
        embs = []
        for i in range(num_batches):
            curr_idx = i * frames_per_batch
            num_steps = min(seq_len - curr_idx, frames_per_batch)
            steps = np.arange(curr_idx, curr_idx + num_steps)
            if num_contexts != 1:
                ctx = cfg.DATA.CONTEXT_STRIDE * np.arange(-(num_contexts - 1), 1)
                steps = (steps[:, None] + ctx[None, :]).reshape(-1)
            steps = np.clip(steps, 0, seq_len - 1)
            chunk = video[steps]  # (num_steps*ctx, H, W, 3)

            if num_contexts == 1:
                nb = bucket_size(chunk.shape[0], max_fpb)
                pad = nb - chunk.shape[0]
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0)
                mask = np.zeros((1, 1, nb), np.float32)
                mask[..., :num_steps] = 1.0
                true_len = num_steps
            else:
                # legacy context path (conv/vanilla embedders): exact shape
                mask = np.ones((1, 1, chunk.shape[0]), np.float32)
                true_len = chunk.shape[0]

            out = embed_fn(variables, jnp.asarray(chunk[None]),
                           jnp.asarray(item["dims"]), jnp.asarray(mask),
                           jnp.asarray(true_len, jnp.int32))
            embs.append(np.asarray(out[0][:num_steps], np.float32))
        embs = np.concatenate(embs, axis=0)

        labels = np.asarray(item["labels"])
        valid = labels >= 0
        yield {"embs": embs[valid], "labels": labels[valid],
               "seq_len": seq_len, "input_len": video.shape[0],
               "steps": np.asarray(item["chosen_steps"]),
               "name": item["name"]}


def get_embeddings_dataset(cfg, model, variables, data_loader,
                           embed_fn=None) -> Dict:
    """One full pass over an EvalLoader (`evaluate.py:27-81`)."""
    dataset = {"embs": [], "labels": [], "seq_lens": [], "input_lens": [],
               "steps": [], "names": []}
    for rec in iter_video_embeddings(cfg, model, variables, data_loader,
                                     embed_fn):
        dataset["embs"].append(rec["embs"])
        dataset["labels"].append(rec["labels"])
        dataset["seq_lens"].append(rec["seq_len"])
        dataset["input_lens"].append(rec["input_len"])
        dataset["steps"].append(rec["steps"])
        dataset["names"].append(rec["name"])
    logger.info("embeddings_dataset size: %d", len(dataset["embs"]))
    return dataset
