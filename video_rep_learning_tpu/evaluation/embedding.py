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
import os as _os
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..logging_utils import get_logger
from ..ops.augment import eval_augment

logger = get_logger(__name__)

_MIN_BUCKET = 32

_FN_CACHE: Dict = {}


def _memoized(kind: str, model, extras, build):
    """Cache the jitted closures across `iter_video_embeddings` calls.

    A fresh `@jax.jit` wrapper is a new cache key to JAX, so rebuilding the
    embed fns per eval epoch re-traced AND re-compiled the whole ViT-B
    forward once per bucket shape per epoch (~20 s × n_buckets over the
    relay — measured 70 s/epoch where compute is 2.6 s). Keyed on the model
    instance (flax Modules hash structurally, so an equal rebuild reuses
    the executable; `variables` ride as call arguments), the shape-relevant
    cfg scalars, and every VRL_* env var — kernel gates are read at trace
    time, so an env flip must miss the cache (tools/ab_env.py relies on
    that)."""
    env = tuple(sorted(
        (k, v) for k, v in _os.environ.items() if k.startswith("VRL_")))
    key = (kind, model, extras, env)
    try:
        fn = _FN_CACHE.get(key)
    except TypeError:  # unhashable model variant: just build fresh
        return build()
    if fn is None:
        if len(_FN_CACHE) >= 64:  # unbounded model churn (test suites)
            _FN_CACHE.clear()
        fn = _FN_CACHE[key] = build()
    return fn


def bucket_size(n: int, max_frames: int) -> int:
    """Pad target for an n-frame chunk.

    The trunk (95% of MVF eval cost) does full work on pad frames, so pad
    fraction is lost throughput. Pow-2 buckets wasted ~30% on FineGym-length
    events (a 175-frame event padded to 256); the ladder rounds n up to a
    multiple of quantum = pow2(n)/8 (min 32) — relative pad <= ~13% for
    n >= 160 while bounding distinct compiled shapes to <= 8 per octave.
    Never coarser than the pow-2 bucket. Valid-frame embeddings are
    bucket-independent (key masking + true_seq_len positional encoding,
    `test_eval.py::test_bucketed_chunk_embeddings_match_exact`).

    VRL_EVAL_BUCKET_QUANTUM: 'pow2' restores the r4 buckets; an integer
    forces a fixed quantum.
    """
    mode = _os.environ.get("VRL_EVAL_BUCKET_QUANTUM", "auto")
    cap = max(max_frames, n)
    p = _MIN_BUCKET
    while p < n:
        p *= 2
    if mode == "pow2":
        return min(max(p, 64), cap)
    q = max(_MIN_BUCKET, p // 8) if mode == "auto" else max(8, int(mode))
    b = max(_MIN_BUCKET, -(-n // q) * q)
    return min(b, cap)


def make_embed_fn(model, cfg):
    """jitted (variables, frames(1,Tb,H,W,3)u8, dims(2,), mask(1,1,Tb),
    true_len) -> (1, Tb, emb) embeddings."""

    image_size = cfg.IMAGE_SIZE

    num_contexts = max(int(cfg.DATA.NUM_CONTEXTS), 1)

    def build():
        @jax.jit
        def embed_chunk(variables, frames, dims, mask, true_len):
            video = frames[0].astype(jnp.float32) / 255.0
            video = eval_augment(video, image_size, dims=(dims[0], dims[1]))
            # reference `evaluate.py:60` passes num_steps (chunk frames
            # WITHOUT the context expansion) as num_frames — the conv
            # embedder derives its (steps, contexts) split from it
            num_frames = video.shape[0] // num_contexts
            embs = model.apply(variables, video[None], num_frames,
                               video_masks=mask, project=False, train=False,
                               true_seq_len=true_len)
            return embs

        return embed_chunk

    return _memoized("embed", model, (image_size, num_contexts), build)


def make_packed_embed_fn(model, cfg):
    """jitted (variables, frames(P,Tb,H,W,3)u8, dims(P,2), mask(P,1,Tb),
    true_lens(P,)) -> (P, Tb, emb): P video chunks share one bucket forward
    as batch entries (EVAL.PACK_VIDEOS > 1). Per-entry key masks and the
    per-entry positional ramp (`sincos_embedding_dynamic` vector true_n)
    keep each video's embeddings independent of its batch mates."""

    image_size = cfg.IMAGE_SIZE
    num_contexts = max(int(cfg.DATA.NUM_CONTEXTS), 1)
    assert num_contexts == 1, "packed eval requires NUM_CONTEXTS == 1"

    def build():
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

    return _memoized("packed", model, (image_size,), build)


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


def make_flat_fns(model, cfg):
    """The frame-packed extraction's three jitted stages: per-video
    augmentation, a fixed-shape per-frame trunk block, and the bucketed
    temporal head (`CARLModel.backbone_flat` / `head_embs`)."""
    image_size = cfg.IMAGE_SIZE

    def build():
        @jax.jit
        def aug_fn(frames, dims):
            v = frames.astype(jnp.float32) / 255.0
            return eval_augment(v, image_size, dims=(dims[0], dims[1]))

        @jax.jit
        def trunk_fn(variables, frames):
            return model.apply(variables, frames, method="backbone_flat")

        @jax.jit
        def head_fn(variables, feats, cls_emb, mask, true_len):
            return model.apply(variables, feats[None], cls_emb,
                               video_masks=mask, project=False, train=False,
                               true_seq_len=true_len, method="head_embs")

        return aug_fn, trunk_fn, head_fn

    return _memoized("flat", model, (image_size,), build)


def _iter_frameflat(cfg, model, variables, data_loader):
    """Frame-packed sweep (EVAL.FLAT_EXTRACT / VRL_EVAL_FLAT): the per-frame
    trunk — 95% of MVF eval cost, and frame-independent — runs on densely
    packed fixed-size blocks that cross video boundaries, so it does ZERO
    pad work (bucket padding cost the pow-2 path ~30% of trunk compute at
    FineGym event lengths); only the DATASET's final block carries pad
    frames. Only the cheap temporal head runs on padded buckets, with
    zero-pad feats (key-masked + true-length positional encoding, so pad
    content never reaches a valid output — same invariant the bucketed path
    tests). Head chunk boundaries follow the reference rule exactly
    (`evaluate.py:44-63`), so embeddings match the per-video path
    (`test_eval.py::test_frameflat_embeddings_match_per_video`).

    Streaming with carry-over: augmented frames queue in loader order; a
    trunk block runs as soon as FB frames are buffered (splitting video
    segments as needed), its feature rows are handed back to their videos,
    and a video's head runs the moment its last frame is trunked — records
    stream out in loader order with ~one video of features in flight."""
    max_fpb = cfg.EVAL.FRAMES_PER_BATCH
    # default block: on-chip ragged sweeps (alternating reps) — ViT trunk is
    # compute-saturated at 128 (256/512 slower: 727/591/525 useful frames/s);
    # the ResNet trunk is dispatch-bound and prefers 256 (2428/2729/2596)
    fb_default = 256 if getattr(getattr(model, "spec", None),
                                "backbone_kind", None) == "resnet" else 128
    FB = int(cfg.get_path("EVAL.FLAT_BLOCK", 0) or 0) \
        or int(_os.environ.get("VRL_EVAL_FLAT_BLOCK", 0)) \
        or min(max_fpb, fb_default)
    aug_fn, trunk_fn, head_fn = make_flat_fns(model, cfg)
    needs_cls = (model.spec.backbone_kind == "vit")

    def run_head(item, feat_chunks, cls_chunks):
        n = int(item["seq_len"])
        vf = feat_chunks[0] if len(feat_chunks) == 1 else jnp.concatenate(
            feat_chunks, axis=0)
        vc = None
        if needs_cls:
            vc = cls_chunks[0] if len(cls_chunks) == 1 else jnp.concatenate(
                cls_chunks, axis=0)
        num_batches = int(math.ceil(float(n) / max_fpb))
        fpb = int(math.ceil(float(n) / num_batches))
        embs = []
        for i in range(num_batches):
            curr = i * fpb
            ns = min(n - curr, fpb)
            nb = bucket_size(ns, max_fpb)
            cf = vf[curr:curr + ns]
            cc = vc[curr:curr + ns] if needs_cls else None
            if nb > ns:
                pad = nb - ns
                cf = jnp.concatenate(
                    [cf, jnp.zeros((pad,) + cf.shape[1:], cf.dtype)], 0)
                if needs_cls:
                    cc = jnp.concatenate(
                        [cc, jnp.zeros((pad,) + cc.shape[1:], cc.dtype)], 0)
            mask = np.zeros((1, 1, nb), np.float32)
            mask[..., :ns] = 1.0
            out = head_fn(variables, cf, cc, jnp.asarray(mask),
                          jnp.asarray(ns, jnp.int32))
            embs.append(out[0][:ns])  # stays on device — D2H is deferred
        return item, embs

    def _materialize(dev_rec):
        item, embs = dev_rec
        return _record(item, np.concatenate(
            [np.asarray(e, np.float32) for e in embs], axis=0))

    # pending videos in loader order: [item, [feat_chunks], [cls_chunks],
    # frames_remaining]; completed entries become None (yield cursor below)
    pending = []
    next_yield = 0
    buf = []  # (aug_segment, pending_idx) in frame order; segments never
    buf_frames = 0  # outlive their block — split remainders re-queue

    def drain(final=False):
        nonlocal buf, buf_frames, next_yield
        while buf_frames >= FB or (final and buf_frames > 0):
            take, got = [], 0
            while got < FB and buf:
                seg, pi = buf.pop(0)
                need = FB - got
                if seg.shape[0] > need:
                    buf.insert(0, (seg[need:], pi))
                    seg = seg[:need]
                take.append((seg, pi))
                got += seg.shape[0]
            block = (take[0][0] if len(take) == 1 and got == FB
                     else jnp.concatenate(
                         [s for s, _ in take]
                         + ([jnp.zeros((FB - got,) + take[0][0].shape[1:],
                                       take[0][0].dtype)] if got < FB else []),
                         axis=0))
            buf_frames -= got
            feats, cls = trunk_fn(variables, block)
            off = 0
            for seg, pi in take:
                m = seg.shape[0]
                pending[pi][1].append(feats[off:off + m])
                if needs_cls:
                    pending[pi][2].append(cls[off:off + m])
                pending[pi][3] -= m
                off += m
            while next_yield < len(pending) and pending[next_yield][3] == 0:
                item, fc, cc, _ = pending[next_yield]
                pending[next_yield] = None  # free feats; indices stay stable
                next_yield += 1
                yield run_head(item, fc, cc)

    def _stream():
        nonlocal buf_frames
        for item in data_loader:
            assert item["video"].shape[0] == int(item["seq_len"])
            aug = aug_fn(jnp.asarray(item["video"]),
                         jnp.asarray(item["dims"], jnp.float32))
            pending.append([item, [], [], aug.shape[0]])
            buf.append((aug, len(pending) - 1))
            buf_frames += aug.shape[0]
            yield from drain()
        yield from drain(final=True)
        assert next_yield == len(pending) and all(p is None for p in pending)

    # one-record holdback: a completed video's embeddings stay on device
    # until the NEXT video's head has been enqueued, so the embedding D2H
    # (and the consumer's pickling) overlaps the device's work on the
    # following video instead of stalling the dispatch queue
    prev = None
    for rec in _stream():
        if prev is not None:
            yield _materialize(prev)
        prev = rec
    if prev is not None:
        yield _materialize(prev)


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
    fenv = _os.environ.get("VRL_EVAL_FLAT", "auto")
    if fenv == "auto":
        # TPU default since r5: frame-packed extraction measured +50% useful
        # frames/s over pow-2 buckets on the FineGym-like ragged set (677 vs
        # 451, MVF, on-chip; FLAT_BLOCK sweep confirmed 128 > 256/512) and
        # is numerically equivalent to the per-video sweep (atol 2e-6,
        # accumulation order only — same class as the flash-attention
        # default). VRL_EVAL_FLAT=0 restores the bucketed per-video path.
        flat = (bool(cfg.get_path("EVAL.FLAT_EXTRACT", False))
                or jax.default_backend() == "tpu")
    else:
        flat = fenv == "1"
    if (flat and int(num_contexts) == 1 and embed_fn is None
            and getattr(getattr(model, "spec", None), "embedder_type", None)
            == "transformer"):
        yield from _iter_frameflat(cfg, model, variables, data_loader)
        return
    pack = int(cfg.get_path("EVAL.PACK_VIDEOS", 1) or 1)
    if pack > 1 and int(num_contexts) == 1 and embed_fn is None:
        yield from _iter_packed(cfg, model, variables, data_loader, pack)
        return
    embed_fn = embed_fn or make_embed_fn(model, cfg)

    def _materialize(dev_rec):
        item, embs = dev_rec
        return _record(item, np.concatenate(
            [np.asarray(e, np.float32) for e in embs], axis=0))

    prev = None  # one-record D2H holdback (see _iter_frameflat)
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
                    # device-resident videos (e.g. bench staging) must pad
                    # on device — np ops on jax arrays round-trip the whole
                    # chunk through host memory (and the relay link)
                    xp = np if isinstance(chunk, np.ndarray) else jnp
                    chunk = xp.concatenate(
                        [chunk, xp.repeat(chunk[-1:], pad, axis=0)], axis=0)
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
            embs.append(out[0][:num_steps])  # device; D2H deferred
        if prev is not None:
            yield _materialize(prev)
        prev = (item, embs)
    if prev is not None:
        yield _materialize(prev)


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
