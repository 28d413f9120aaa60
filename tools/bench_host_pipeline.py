"""Host-only input-pipeline benchmark: the decode cache measured without
the device (or the relay link) in the loop.

The loader-fed bench in bench.py measures cache on/off THROUGH the relay
H2D link, whose minute-scale throughput drift (±30%, spans 3× across a rep
sequence) swamps the cache's effect — one run read "cache 15% slower" from
paired ratios of genuinely noisy data. The cache's direct claim is purely
host-side: decode each video once per process, serve later ranges as numpy
slices. This tool times exactly that path — `TrainLoader` iteration over
the synthetic bench dataset (same `Dataset.get_ssl_item` → collate pipeline
the trainer consumes, reference loop `train.py:94-107`) with NO jax import —
so the number is deterministic up to OS jitter.

Run: python tools/bench_host_pipeline.py [--epochs 3] [--data DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg(data_dir, num_frames):
    from video_rep_learning_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.DATASETS = ["pouring"]
    cfg.TRAINING_ALGO = "scl"
    cfg.PATH_TO_DATASET = data_dir
    cfg.TRAIN.BATCH_SIZE = 1
    cfg.TRAIN.NUM_FRAMES = num_frames  # CARL shape: 2 views x 240 frames
    return cfg


def run_epochs(cfg, n_epochs):
    """Iterate the real TrainLoader; returns (clips/s, frames/s) per epoch."""
    from video_rep_learning_tpu.data import construct_dataloader

    loader, _ = construct_dataloader(cfg, "train", no_eval=True)
    out = []
    for epoch in range(n_epochs):
        loader.set_epoch(epoch)
        t0 = time.perf_counter()
        n_clips = 0
        for batch in loader:
            n_clips += batch["videos"].shape[0]
        dt = time.perf_counter() - t0
        frames = n_clips * 2 * cfg.TRAIN.NUM_FRAMES
        out.append((n_clips / dt, frames / dt))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=os.environ.get(
        "VRL_BENCH_DATA", "/tmp/vrl_bench_data_256"))
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--frames", type=int, default=240,
                    help="TRAIN.NUM_FRAMES (240 = the CARL shape)")
    ap.add_argument("--cache", type=int, default=None, help=(
        "run ONLY this cache budget (MB; 0 = off) — one mode per process "
        "kills the process-lifetime warmup confound (page cache, malloc "
        "arenas) that favors whichever mode runs second"))
    args = ap.parse_args(argv)

    if not os.path.isfile(os.path.join(args.data, "train.pkl")):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import make_synthetic_data

        make_synthetic_data.main([
            "--out", args.data, "--num_train", "8", "--num_val", "2",
            "--min_len", "260", "--max_len", "330", "--size", "256",
            "--format", "mp4"])

    from video_rep_learning_tpu.data.cache import (get_decode_cache,
                                                   reset_decode_cache)

    modes = (0, 2048) if args.cache is None else (args.cache,)
    for cache_mb in modes:
        os.environ["VRL_DECODE_CACHE_MB"] = str(cache_mb)
        reset_decode_cache()
        rates = run_epochs(build_cfg(args.data, args.frames), args.epochs)
        label = f"cache={cache_mb}MB" if cache_mb else "cache=off"
        for i, (cps, fps) in enumerate(rates):
            note = " (fill)" if cache_mb and i == 0 else ""
            print(f"{label} epoch {i}: {cps:6.2f} clips/s "
                  f"{fps:7.0f} frames/s{note}")
        cache = get_decode_cache()
        if cache is not None:
            print(f"  cache stats: {cache.stats()}")
    reset_decode_cache()
    os.environ.pop("VRL_DECODE_CACHE_MB", None)


if __name__ == "__main__":
    main()
