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


def make_packed_embed_fn(model, cfg):
    """jitted (variables, frames(P,Tb,H,W,3)u8, dims(P,2), mask(P,1,Tb),
    true_lens(P,)) -> (P, Tb, emb): P video chunks share one bucket forward
    as batch entries (EVAL.PACK_VIDEOS > 1). Per-entry key masks and the
    per-entry positional ramp (`sincos_embedding_dynamic` vector true_n)
    keep each video's embeddings independent of its batch mates."""

    image_size = cfg.IMAGE_SIZE
    num_contexts = max(int(cfg.DATA.NUM_CONTEXTS), 1)
    assert num_contexts == 1, "packed eval requires NUM_CONTEXTS == 1"

    @jax.jit
    def embed_packed(variables, frames, dims, mask, true_lens):
        video = frames.astype(jnp.float32) / 255.0
        video = jax.vmap(
            lambda f, d: eval_augment(f, image_size, dims=(d[0], d[1])))(
                video, dims)
        return model.apply(variables, video, video.shape[1],
                           video_masks=mask, project=False, train=False,
                           true_seq_len=true_lens)

    return embed_packed


def _bucketed_chunks(video, seq_len: int, max_fpb: int):
    """The reference's chunking rule (`evaluate.py:44-63`) + our pow-2
    bucket padding: yields (chunk(nb,H,W,3)u8, num_steps) — shared by the
    per-video and packed paths so both produce the same chunk set."""
    num_batches = int(math.ceil(float(seq_len) / max_fpb))
    frames_per_batch = int(math.ceil(float(seq_len) / num_batches))
    for i in range(num_batches):
        curr = i * frames_per_batch
        num_steps = min(seq_len - curr, frames_per_batch)
        chunk = video[curr:curr + num_steps]
        nb = bucket_size(num_steps, max_fpb)
        if nb > num_steps:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], nb - num_steps, axis=0)], axis=0)
        yield chunk, num_steps


def _record(item, embs):
    labels = np.asarray(item["labels"])
    valid = labels >= 0
    return {"embs": embs[valid], "labels": labels[valid],
            "seq_len": int(item["seq_len"]),
            "input_len": item["video"].shape[0],
            "steps": np.asarray(item["chosen_steps"]), "name": item["name"]}


def _iter_packed(cfg, model, variables, data_loader, pack: int):
    """Packed sweep: up to `pack` same-bucket chunks from a lookahead window
    of videos run as ONE batched forward. Records stream out in loader order
    (window-by-window), bit-identical to the per-video path
    (`test_eval.py::test_packed_embeddings_match_per_video`). One compile per
    (bucket, pack) pair; tail groups are padded to `pack` by repeating the
    last chunk (discarded)."""
    max_fpb = cfg.EVAL.FRAMES_PER_BATCH
    embed_fn = make_packed_embed_fn(model, cfg)
    window_cap = pack * 2

    def run_window(items):
        chunk_outs = []
        tasks = []  # (item_idx, chunk_idx, chunk, num_steps)
        for ii, item in enumerate(items):
            seq_len = int(item["seq_len"])
            assert item["video"].shape[0] == seq_len
            chunks = list(_bucketed_chunks(item["video"], seq_len, max_fpb))
            chunk_outs.append([None] * len(chunks))
            tasks.extend((ii, ci, ch, ns)
                         for ci, (ch, ns) in enumerate(chunks))
        groups: Dict = {}
        for t in tasks:
            groups.setdefault(t[2].shape, []).append(t)
        for shape, ts in groups.items():
            nb = shape[0]
            for off in range(0, len(ts), pack):
                grp = ts[off:off + pack]
                real = len(grp)
                grp = grp + [grp[-1]] * (pack - real)  # pad batch, discarded
                frames = np.stack([g[2] for g in grp])
                masks = np.zeros((pack, 1, nb), np.float32)
                tls = np.zeros((pack,), np.int32)
                for j, g in enumerate(grp):
                    masks[j, :, :g[3]] = 1.0
                    tls[j] = g[3]
                dims = np.stack([np.asarray(items[g[0]]["dims"], np.float32)
                                 for g in grp])
                out = np.asarray(embed_fn(
                    variables, jnp.asarray(frames), jnp.asarray(dims),
                    jnp.asarray(masks), jnp.asarray(tls)), np.float32)
                for j, g in enumerate(grp[:real]):
                    chunk_outs[g[0]][g[1]] = out[j][:g[3]]
        for ii, item in enumerate(items):
            yield _record(item, np.concatenate(chunk_outs[ii], axis=0))

    window = []
    for item in data_loader:
        window.append(item)
        if len(window) >= window_cap:
            yield from run_window(window)
            window = []
    if window:
        yield from run_window(window)


def iter_video_embeddings(cfg, model, variables, data_loader, embed_fn=None):
    """Per-video embedding generator: yields one record per video so large
    datasets (FineGym) can stream to disk without holding everything in RAM
    (the reference's per-video pickling, `evaluate_finegym.py:70-131`).

    With EVAL.PACK_VIDEOS = P > 1 (and NUM_CONTEXTS == 1), up to P
    same-bucket chunks from different videos share one batched forward —
    bit-identical output, fewer dispatches, less pad waste per video."""
    max_fpb = cfg.EVAL.FRAMES_PER_BATCH
    num_contexts = cfg.DATA.NUM_CONTEXTS
    pack = int(cfg.get_path("EVAL.PACK_VIDEOS", 1) or 1)
    if pack > 1 and int(num_contexts) == 1 and embed_fn is None:
        yield from _iter_packed(cfg, model, variables, data_loader, pack)
        return
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
        yield _record(item, np.concatenate(embs, axis=0))


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
