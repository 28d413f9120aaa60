#!/usr/bin/env python
"""On-chip sweep of MODEL.BASE_MODEL.FRAMES_PER_BATCH for the CARL workload.

FRAMES_PER_BATCH is the frozen-backbone scan chunk size — a pure memory
knob (the reference's 40 is a GPU-memory choice, `transformer.py:186-214`
loop; the MVF bench already raises it to 160 on TPU). Bigger chunks mean
fewer scan iterations and bigger conv batches for XLA; the sweep measures
whether the trunk's 92 TF/s has chunk-size headroom.

Alternates values rep-by-rep in ONE process (relay warmup on a throwaway
first run), like tools/ab_env.py.

    python tools/sweep_frames_per_batch.py 40 80 120 240 --steps 16 --reps 3
"""

import argparse
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("values", nargs="+", type=int)
    ap.add_argument("--workload", choices=["carl", "mvf"], default="carl")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    on_tpu = jax.default_backend() == "tpu"
    cfg_fn = bench.carl_cfg if args.workload == "carl" else bench.mvf_cfg
    raw = 256 if on_tpu else 40

    def cfg_for(fpb):
        cfg = cfg_fn(on_tpu)
        cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH = fpb
        return cfg

    bench._measure(cfg_for(args.values[0]), 2, raw=raw)  # relay warmup

    results = {v: [] for v in args.values}
    for rep in range(args.reps):
        for v in args.values:
            rate = bench._measure(cfg_for(v), args.steps, raw=raw)
            results[v].append(rate)
            print(f"rep {rep} FPB={v}: {rate:.4f} clips/s", flush=True)
    for v in args.values:
        r = results[v]
        print(f"FPB={v}: mean {statistics.mean(r):.4f} clips/s  "
              f"sd {statistics.pstdev(r):.4f}  {r}")


if __name__ == "__main__":
    main()
