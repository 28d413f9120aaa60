#!/usr/bin/env python
"""Frame-alignment visualization videos.

Tooling parity with the reference visualizer (`visualize_alignment.py:35-218`):
given learned per-frame embeddings for a query and key video, align frames by
DTW (or nearest neighbor) and render a side-by-side comparison video. Frames
are rendered with matplotlib and encoded through the native encoder
(no ffmpeg CLI dependency).

Usage:
  python visualize_alignment.py --workdir <datasets> --cfg_file <cfg> \
      --logdir <run> [--use_dtw] [--query 0 --key 1] [--time_stride 10]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from video_rep_learning_tpu.data.decode import encode_video  # noqa: E402
from video_rep_learning_tpu.utils.dtw import dtw  # noqa: E402


def align(query_embs, key_embs, use_dtw: bool):
    """Map each query frame to a key frame (`visualize_alignment.py` align)."""
    if use_dtw:
        _, _, _, path = dtw(query_embs, key_embs, dist="sqeuclidean")
        _, uix = np.unique(path[0], return_index=True)
        return path[1][uix]
    from scipy.spatial.distance import cdist

    dists = cdist(query_embs, key_embs, "sqeuclidean")
    return np.argmin(dists, axis=1)


def render_pair_video(query_frames, key_frames, nns, out_path, fps=8,
                      time_stride=1, dpi=72):
    """Side-by-side (query | aligned key) video."""
    frames = []
    fig, axes = plt.subplots(1, 2, figsize=(8, 4), dpi=dpi)
    for t in range(0, len(query_frames), time_stride):
        for ax in axes:
            ax.clear()
            ax.axis("off")
        axes[0].imshow(query_frames[t])
        axes[0].set_title(f"query t={t}")
        axes[1].imshow(key_frames[int(nns[t])])
        axes[1].set_title(f"key t={int(nns[t])}")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf.copy())
    plt.close(fig)
    encode_video(out_path, np.stack(frames), fps=fps)
    print("wrote", out_path)


def render_multi_video(query_frames, key_frames_list, nns_list, out_path,
                       fps=8, time_stride=1, dpi=72):
    """One query against K aligned key videos in the reference's 2x3 grid
    (query top-left, keys filling the rest; `visualize_alignment.py:99-133`
    `create_multiple_video`). K <= 5."""
    K = len(key_frames_list)
    if K > 5:
        raise ValueError("2x3 grid supports at most 5 key videos")
    frames = []
    fig, axes = plt.subplots(2, 3, figsize=(9, 6), dpi=dpi)
    for t in range(0, len(query_frames), time_stride):
        for ax in axes.ravel():
            ax.clear()
            ax.axis("off")
        axes[0, 0].imshow(query_frames[t])
        axes[0, 0].set_title(f"query t={t}", fontsize=8)
        for k in range(K):
            ax = axes[(k + 1) // 3, (k + 1) % 3]
            j = int(nns_list[k][t])
            ax.imshow(key_frames_list[k][j])
            ax.set_title(f"key{k} t={j}", fontsize=8)
        fig.canvas.draw()
        frames.append(np.asarray(fig.canvas.buffer_rgba())[..., :3].copy())
    plt.close(fig)
    encode_video(out_path, np.stack(frames), fps=fps)
    print("wrote", out_path)


def render_labeled_video(frames_in, labels, out_path, fps=8, time_stride=1,
                         dpi=72):
    """Single video with its per-frame phase label rendered in the title
    (`visualize_alignment.py:134-170` `create_single_video`, which prints
    the strided labels and animates the frames)."""
    print(np.asarray(labels)[::time_stride])
    frames = []
    fig, ax = plt.subplots(figsize=(5, 5), dpi=dpi)
    for t in range(0, len(frames_in), time_stride):
        ax.clear()
        ax.axis("off")
        ax.imshow(frames_in[t])
        ax.set_title(f"t={t}  label={int(labels[t])}", fontsize=10)
        fig.canvas.draw()
        frames.append(np.asarray(fig.canvas.buffer_rgba())[..., :3].copy())
    plt.close(fig)
    encode_video(out_path, np.stack(frames), fps=fps)
    print("wrote", out_path)


def main(argv=None):
    from video_rep_learning_tpu.evaluation.embedding import get_embeddings_dataset
    from video_rep_learning_tpu.parser import load_config, parse_args as base_args
    from video_rep_learning_tpu.train import Trainer

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--use_dtw", action="store_true")
    extra.add_argument("--query", type=int, default=0)
    extra.add_argument("--key", type=int, default=1)
    extra.add_argument("--keys", type=str, default=None,
                       help="comma-separated key indices (<=5): render the "
                            "reference's 1-query-vs-K 2x3 grid instead of "
                            "the pair video")
    extra.add_argument("--labeled", action="store_true",
                       help="also render the query video alone with its "
                            "per-frame phase labels")
    extra.add_argument("--time_stride", type=int, default=10)
    ns, rest = extra.parse_known_args(argv)
    sys.argv = [sys.argv[0]] + rest
    args = base_args(rest)
    cfg = load_config(args)
    cfg.PATH_TO_DATASET = os.path.join(args.workdir, cfg.PATH_TO_DATASET)

    trainer = Trainer(cfg)
    trainer.init_state()
    ds = get_embeddings_dataset(cfg, trainer.model, trainer.variables,
                                trainer.val_emb_loader[0])

    loader_items = list(trainer.val_emb_loader[0])
    q = ns.query
    if ns.keys:
        keys = [int(s) for s in ns.keys.split(",")]
        nns_list = [align(ds["embs"][q], ds["embs"][k], ns.use_dtw)
                    for k in keys]
        render_multi_video(
            loader_items[q]["video"],
            [loader_items[k]["video"] for k in keys], nns_list,
            os.path.join(cfg.LOGDIR, f"alignment_multi_{q}.mp4"),
            time_stride=ns.time_stride)
    else:
        k = ns.key
        nns = align(ds["embs"][q], ds["embs"][k], ns.use_dtw)
        render_pair_video(loader_items[q]["video"], loader_items[k]["video"],
                          nns,
                          os.path.join(cfg.LOGDIR, f"alignment_{q}_{k}.mp4"),
                          time_stride=ns.time_stride)
    if ns.labeled:
        render_labeled_video(loader_items[q]["video"],
                             loader_items[q]["labels"],
                             os.path.join(cfg.LOGDIR, f"labeled_{q}.mp4"),
                             time_stride=ns.time_stride)


if __name__ == "__main__":
    main()
