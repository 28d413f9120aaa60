#!/usr/bin/env python
"""Capture a jax.profiler trace of N train steps of a bench workload and
print a per-op time summary from the trace. Usage:

    python tools/profile_step.py [carl|mvf] [--steps 4] [--out /tmp/vrl_trace]

The summary parses the trace's XPlane protos via the TensorFlow-less
`tensorflow.python.profiler` if available, else just leaves the trace dir for
manual inspection; it also prints the wall-clock per step (synchronized by
reading the chained loss).
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workload", nargs="?", default="mvf", choices=["carl", "mvf"])
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default="/tmp/vrl_trace")
    args = ap.parse_args()

    import jax

    import bench
    from video_rep_learning_tpu.parallel.mesh import create_mesh, shard_batch
    from video_rep_learning_tpu.train.trainer import Trainer

    on_tpu = jax.default_backend() == "tpu"
    cfg = (bench.carl_cfg if args.workload == "carl" else bench.mvf_cfg)(on_tpu)
    mesh = create_mesh()
    trainer = Trainer(cfg, no_eval=True, build_loaders=False, mesh=mesh)
    trainer.init_state()
    step = trainer.build_train_step()

    B, T = cfg.TRAIN.BATCH_SIZE, cfg.TRAIN.NUM_FRAMES
    raw = 256 if on_tpu else 40
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

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, loss = step(state, dev_batch, key, 100 + i, False, 1e-4)
    float(loss["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()
    print(f"{args.workload}: {dt*1e3:.1f} ms/step "
          f"({B/dt:.2f} clips/s)")

    # best-effort trace summary: find trace.json.gz and aggregate op times
    for path in glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                          recursive=True):
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")
                tot[name] += ev["dur"]
                cnt[name] += 1
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
        print(f"--- {path}")
        for name, us in top:
            print(f"{us/1e3/args.steps:9.3f} ms/step  x{cnt[name]//args.steps:<4d} {name[:110]}")
        break


if __name__ == "__main__":
    main()
