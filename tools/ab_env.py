#!/usr/bin/env python
"""On-chip A/B of an env-gated feature over a bench.py flagship workload.

    python tools/ab_env.py VRL_FUSED_MLP 0 1 --workload mvf --steps 16 --reps 3

Alternates the env values rep-by-rep (A/B/A/B...) inside ONE process so
relay warmup hits a throwaway run first (CLAUDE.md: the first timed loop
after process start is wildly inflated). Env gates are read at trace time
inside the model, so each rep builds a fresh Trainer + step. Prints
per-rep clips/s and the mean per value.
"""

import argparse
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("var")
    ap.add_argument("values", nargs="+")
    ap.add_argument("--workload", choices=["carl", "mvf"], default="mvf")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    on_tpu = jax.default_backend() == "tpu"
    cfg_fn = bench.carl_cfg if args.workload == "carl" else bench.mvf_cfg
    raw = 256 if on_tpu else 40

    # throwaway: relay warmup + first-compile inflation
    os.environ[args.var] = args.values[0]
    bench._measure(cfg_fn(on_tpu), 2, raw=raw)

    results = {v: [] for v in args.values}
    for rep in range(args.reps):
        for v in args.values:
            os.environ[args.var] = v
            r = bench._measure(cfg_fn(on_tpu), args.steps, raw=raw)
            results[v].append(r)
            print(f"rep {rep} {args.var}={v}: {r:.4f} clips/s", flush=True)

    for v in args.values:
        xs = results[v]
        m = statistics.mean(xs)
        sd = statistics.stdev(xs) if len(xs) > 1 else 0.0
        print(f"{args.var}={v}: mean {m:.4f} clips/s  sd {sd:.4f}  {xs}")


if __name__ == "__main__":
    main()
