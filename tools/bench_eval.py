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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from video_rep_learning_tpu.evaluation.embedding import make_embed_fn
    from video_rep_learning_tpu.models import build_model

    on_tpu = jax.default_backend() == "tpu"
    for name, cfg_fn, bucket in (("carl", bench.carl_cfg, 256),
                                 ("mvf", bench.mvf_cfg, 128)):
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


if __name__ == "__main__":
    main()
