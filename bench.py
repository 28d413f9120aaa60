#!/usr/bin/env python
"""Throughput benchmark: full SCL training step (on-device augmentation +
frozen ResNet-50 backbone + temporal transformer + SCL loss + backward +
Adam) on the CARL Pouring workload shape (`configs/scl_transformer_config.yml`:
batch 1 clip x 2 views x 240 frames @ 224px, bf16 compute).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` is measured against the reference-throughput anchor recorded in
BASELINE.md (the repository publishes no numbers — SURVEY.md §6; the anchor
is an estimated A100+AMP reference rate of 8 clips/sec/chip for this
workload until the reference can be profiled directly).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_ANCHOR_CLIPS_PER_SEC = 8.0


def main():
    import jax

    from video_rep_learning_tpu.config import get_cfg
    from video_rep_learning_tpu.parallel.mesh import create_mesh, shard_batch
    from video_rep_learning_tpu.train.trainer import Trainer

    on_tpu = jax.default_backend() == "tpu"

    cfg = get_cfg()
    cfg.DATASETS = ["pouring"]
    cfg.TRAINING_ALGO = "scl"
    cfg.USE_AMP = True  # bf16 compute path
    cfg.TRAIN.BATCH_SIZE = 1
    cfg.TRAIN.NUM_FRAMES = 240 if on_tpu else 8
    cfg.IMAGE_SIZE = 224 if on_tpu else 32
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = 40 if on_tpu else 4
    if not on_tpu:  # keep the CPU fallback tractable
        e = cfg.MODEL.EMBEDDER_MODEL
        e.NUM_LAYERS = 1
        e.HIDDEN_SIZE = 32
        e.D_FF = 64
        e.EMBEDDING_SIZE = 16
        e.FC_LAYERS = [[32, True]]
        e.CAPACITY_SCALAR = 1
        cfg.MODEL.PROJECTION_SIZE = 16
    cfg.EVAL.NUM_FRAMES = cfg.TRAIN.NUM_FRAMES

    mesh = create_mesh()
    trainer = Trainer(cfg, no_eval=True, build_loaders=False, mesh=mesh)
    trainer.init_state()
    step = trainer.build_train_step()

    B, T = cfg.TRAIN.BATCH_SIZE, cfg.TRAIN.NUM_FRAMES
    raw = 256 if on_tpu else 40  # decode canvas before on-device augmentation
    rng = np.random.RandomState(0)
    batch = {
        "videos": rng.randint(0, 255, size=(B, 2, T, raw, raw, 3)).astype(np.uint8),
        "labels": np.zeros((B, 2, T), np.int32),
        "seq_lens": np.full((B, 2), 4 * T, np.int32),
        "chosen_steps": np.tile(np.arange(T, dtype=np.int32) * 4, (B, 2, 1)),
        "video_masks": np.ones((B, 2, T), np.float32),
        "dims": np.full((B, 2), float(raw), np.float32),
    }
    dev_batch = shard_batch(mesh, batch)
    key = jax.random.key(0)

    # warmup / compile. NOTE: we synchronize by READING the loss value each
    # step (device->host transfer) — on relay-backed PJRT plugins
    # block_until_ready can return before device execution completes, which
    # would make the measurement meaningless.
    state = trainer.state
    for i in range(2):
        state, loss = step(state, dev_batch, jax.random.fold_in(key, i),
                           False, 1e-4)
    float(loss["loss"])

    n_steps = 8 if on_tpu else 2
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = step(state, dev_batch, jax.random.fold_in(key, 100 + i),
                           False, 1e-4)
    # single value read at the end: the data dependency through the chained
    # state forces every step to have executed before this returns
    float(loss["loss"])
    dt = time.perf_counter() - t0

    ndev = mesh.devices.size
    clips_per_sec_per_chip = (B * n_steps) / dt / ndev
    result = {
        "metric": "scl_train_clips_per_sec_per_chip",
        "value": round(clips_per_sec_per_chip, 4),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec_per_chip / REFERENCE_ANCHOR_CLIPS_PER_SEC, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
