#!/usr/bin/env python
"""Eval-path throughput: bucketed embedding extraction frames/s on the
flagship backbones (the serving-side hot path — `evaluate.py:27-81`
equivalent, `evaluation/embedding.py`).

Measures the jitted no-projection forward over a padded eval bucket
(key-masked, true-length positional encoding) exactly as the embedding
sweep runs it. Synchronizes by reading a chained value (relay PJRT note in
CLAUDE.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bench_packed(name, cfg, model, variables, bucket, iters):
    """Packed sweep gain (EVAL.PACK_VIDEOS): embedding P same-bucket video
    chunks as ONE batched forward vs P batch-1 forwards. The packed path's
    win is batching efficiency at small buckets (FineGym's many short
    videos) — same math, fewer dispatches, fuller MXU."""
    import jax.numpy as jnp

    from video_rep_learning_tpu.evaluation.embedding import (
        make_embed_fn, make_packed_embed_fn)

    S = cfg.IMAGE_SIZE
    rng = np.random.RandomState(0)
    for pack in (2, 4):
        cfg.EVAL.PACK_VIDEOS = pack
        packed = make_packed_embed_fn(model, cfg)
        single = make_embed_fn(model, cfg)
        frames = jnp.asarray(
            rng.randint(0, 255, size=(pack, bucket, S, S, 3)), jnp.uint8)
        dims = jnp.tile(jnp.asarray([float(S), float(S)]), (pack, 1))
        masks = jnp.ones((pack, 1, bucket), jnp.float32)
        tls = jnp.full((pack,), bucket, jnp.int32)

        out = packed(variables, frames, dims, masks, tls)
        float(jnp.sum(out.astype(jnp.float32)))
        out = single(variables, frames[:1], dims[0], masks[:1], tls[0])
        float(jnp.sum(out.astype(jnp.float32)))

        res = {}
        for mode in ("single", "packed"):
            dt = float("inf")
            for _round in range(3):
                t0 = time.perf_counter()
                acc = jnp.float32(0.0)
                for _i in range(iters):
                    if mode == "packed":
                        out = packed(variables, frames, dims + acc * 1e-9,
                                     masks, tls)
                    else:
                        for p in range(pack):
                            out = single(variables, frames[p:p + 1],
                                         dims[0] + acc * 1e-9, masks[:1],
                                         tls[0])
                            acc = acc + jnp.sum(out[:, :1, 0]
                                                .astype(jnp.float32))
                    acc = acc + jnp.sum(out[:, :1, 0].astype(jnp.float32))
                float(acc)
                dt = min(dt, (time.perf_counter() - t0) / iters)
            res[mode] = pack * bucket / dt
        print(f"{name}: packed eval P={pack} bucket {bucket}: "
              f"{res['single']:.0f} -> {res['packed']:.0f} frames/s "
              f"({res['packed'] / res['single']:.2f}x)")
    cfg.EVAL.PACK_VIDEOS = 1


def _bench_ragged(name, cfg, model, variables, epochs, modes=None,
                  lengths=None):
    """USEFUL frames/s over a FineGym-like ragged length distribution —
    the number the eval sweep actually delivers, where bucket-pad compute
    is lost throughput (VERDICT r4 #3). Modes: pow-2 buckets (r4 default),
    the quantum ladder, and frame-packed flat extraction (zero trunk pad).

    Videos are held at a small native res (resized to IMAGE_SIZE on device)
    so relay H2D does not drown the compute difference; epoch 0 per mode is
    the untimed compile pass."""
    import os

    from video_rep_learning_tpu.evaluation.embedding import \
        iter_video_embeddings

    lengths = lengths or [65, 90, 118, 129, 151, 175, 198, 226, 240, 310]
    raw = 128
    rng = np.random.RandomState(0)
    items = []
    for i, n in enumerate(lengths):
        items.append({
            "video": rng.randint(0, 255, size=(n, raw, raw, 3)).astype(
                np.uint8),
            "labels": np.zeros(n, np.int64),
            "seq_len": n, "dims": (float(raw), float(raw)),
            "chosen_steps": np.arange(n), "name": f"v{i}",
        })
    useful = sum(lengths)
    cfg.EVAL.FRAMES_PER_BATCH = 2000  # the FineGym configs' value
    print(f"{name}: ragged set {useful} useful frames, lengths {lengths}")

    # Stage every video on device ONCE — shipping raw frames per epoch puts
    # the relay's H2D (can degrade to MB/s, CLAUDE.md) inside the timed
    # region and read 25 useful frames/s where compute alone is ~1000.
    # The library paths are device-aware (gather/pad run as device ops).
    import jax
    import jax.numpy as jnp
    for it in items:
        it["video"] = jax.device_put(jnp.asarray(it["video"]))

    rates = {}
    for mode, quantum, flat in (m for m in (("pow2", "pow2", False),
                                            ("ladder", "auto", False),
                                            ("flat", "auto", True))
                                if modes is None or m[0] in modes):
        os.environ["VRL_EVAL_BUCKET_QUANTUM"] = quantum
        cfg.EVAL.FLAT_EXTRACT = flat
        # flat is the TPU default since r5 — pin the path per mode so the
        # pow2/ladder arms actually measure the bucketed per-video sweep
        os.environ["VRL_EVAL_FLAT"] = "1" if flat else "0"
        try:
            best = float("inf")
            for e in range(epochs + 1):
                for it in items:  # defeat relay response caching: distinct
                    it["video"] = it["video"].at[0, 0, 0, 0].set(  # inputs
                        np.uint8(e))  # per epoch (device op, no H2D)
                t0 = time.perf_counter()
                out = list(iter_video_embeddings(cfg, model, variables,
                                                 items))
                # generator materializes embs as host numpy: synchronized
                assert sum(r["embs"].shape[0] for r in out) == useful
                dt = time.perf_counter() - t0
                if e > 0:  # epoch 0 compiles
                    best = min(best, dt)
            rates[mode] = useful / best
            print(f"{name}: ragged {mode}: {useful / best:.0f} useful "
                  f"frames/s ({best * 1e3:.0f} ms/epoch)")
        finally:
            del os.environ["VRL_EVAL_BUCKET_QUANTUM"]
            del os.environ["VRL_EVAL_FLAT"]
            cfg.EVAL.FLAT_EXTRACT = False
    return rates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--pack", action="store_true",
                    help="also A/B the EVAL.PACK_VIDEOS batched sweep")
    ap.add_argument("--ragged", action="store_true",
                    help="A/B pow2/ladder/flat on a ragged length set")
    ap.add_argument("--ragged-epochs", type=int, default=3)
    ap.add_argument("--ragged-modes", default=None,
                    help="comma list among pow2,ladder,flat (default: all)")
    ap.add_argument("--ragged-lengths", default=None,
                    help="comma list of video lengths (default: a FineGym-"
                         "event-like 65..310 mix)")
    ap.add_argument("--family", choices=["carl", "mvf", "both"],
                    default="both")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from video_rep_learning_tpu.evaluation.embedding import make_embed_fn
    from video_rep_learning_tpu.models import build_model

    on_tpu = jax.default_backend() == "tpu"
    fams = (("carl", bench.carl_cfg, 256), ("mvf", bench.mvf_cfg, 128))
    if args.family != "both":
        fams = tuple(f for f in fams if f[0] == args.family)
    for name, cfg_fn, bucket in fams:
        cfg = cfg_fn(on_tpu)
        model = build_model(cfg)
        S = cfg.IMAGE_SIZE
        x = jnp.zeros((1, bucket, S, S, 3), jnp.float32)
        masks = jnp.ones((1, 1, bucket), jnp.float32)
        variables = jax.jit(lambda r, x, m: model.init(
            r, x, bucket, video_masks=m, project=False))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            x, masks)
        embed = make_embed_fn(model, cfg)

        rng = np.random.RandomState(0)
        frames = jnp.asarray(
            rng.randint(0, 255, size=(1, bucket, S, S, 3)), jnp.uint8)
        dims = jnp.asarray([float(S), float(S)])
        true_len = jnp.int32(bucket)
        out = embed(variables, frames, dims, masks, true_len)
        float(jnp.sum(out.astype(jnp.float32)))  # compile + sync

        dt = float("inf")
        for _round in range(3):  # relay timing jitter: report the best round
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for i in range(args.iters):
                out = embed(variables, frames, dims + acc * 1e-9, masks,
                            true_len)
                acc = jnp.sum(out.astype(jnp.float32))
            float(acc)
            dt = min(dt, (time.perf_counter() - t0) / args.iters)
        print(f"{name}: eval embed {bucket} frames in {dt*1e3:.1f} ms "
              f"-> {bucket/dt:.0f} frames/s")

        if args.pack:
            _bench_packed(name, cfg, model, variables, bucket, args.iters)
        if args.ragged:
            _bench_ragged(name, cfg, model, variables, args.ragged_epochs,
                          modes=(args.ragged_modes.split(",")
                                 if args.ragged_modes else None),
                          lengths=([int(x) for x in
                                    args.ragged_lengths.split(",")]
                                   if args.ragged_lengths else None))


if __name__ == "__main__":
    main()
