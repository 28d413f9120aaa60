"""FRAMES_PER_BATCH sweep for the CARL workload (real chip).

The frozen ResNet-50 runs inside nn.scan over FRAMES_PER_BATCH-image
chunks (reference: models/transformer.py:186-214 chunks for GPU memory).
On TPU the knob is pure memory-vs-utilization: larger chunks feed the conv
pipeline bigger batches (fewer scan iterations, less per-iteration
overhead) at the cost of peak activation memory. This sweeps the knob on
the real chip to pick the bench/profile default.

Run: python tools/bench_fpb_sweep.py [carl|mvf]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fpb, which="carl"):
    import jax

    from bench import carl_cfg, mvf_cfg
    from video_rep_learning_tpu.parallel.mesh import create_mesh, shard_batch
    from video_rep_learning_tpu.train.trainer import Trainer

    cfg = carl_cfg(True) if which == "carl" else mvf_cfg(True)
    cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = fpb
    mesh = create_mesh()
    trainer = Trainer(cfg, no_eval=True, build_loaders=False, mesh=mesh)
    trainer.init_state()
    step = trainer.build_train_step()

    B, T = cfg.TRAIN.BATCH_SIZE, cfg.TRAIN.NUM_FRAMES
    raw = 256
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

    state = trainer.state
    for i in range(2):
        state, loss = step(state, dev_batch, key, i, False, 1e-4)
    float(loss["loss"])

    n_steps = 8
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = step(state, dev_batch, key, 100 + i, False, 1e-4)
    float(loss["loss"])
    dt = time.perf_counter() - t0
    return (B * n_steps) / dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "carl"
    sweep = {"carl": (40, 60, 80, 120, 240, 480),
             "mvf": (40, 80, 160)}[which]
    for fpb in sweep:
        try:
            cps = measure(fpb, which)
            print(f"{which} FRAMES_PER_BATCH={fpb:4d}: {cps:7.3f} clips/s",
                  flush=True)
        except Exception as e:  # OOM at the top of the sweep is expected
            print(f"{which} FRAMES_PER_BATCH={fpb:4d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
