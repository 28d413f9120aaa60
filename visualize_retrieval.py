#!/usr/bin/env python
"""Frame-retrieval visualization: query frame + top-K retrieved frames strip.

Tooling parity with `visualize_retrieval.py:29-61`. Renders a video where
each frame shows the query frame and its K nearest frames (by embedding
distance) from the other val videos.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from scipy.spatial.distance import cdist  # noqa: E402

from video_rep_learning_tpu.data.decode import encode_video  # noqa: E402


def create_retrieval_video(query_frames, query_embs, candidates, out_path,
                           K=5, fps=4, dpi=72, stride=5):
    """candidates: list of (frames, embs) from other videos."""
    cand_frames = np.concatenate([c[0] for c in candidates], axis=0)
    cand_embs = np.concatenate([c[1] for c in candidates], axis=0)
    dists = cdist(query_embs, cand_embs, "sqeuclidean")
    topk = np.argsort(dists, axis=1)[:, :K]

    frames = []
    fig, axes = plt.subplots(1, K + 1, figsize=(2 * (K + 1), 2.4), dpi=dpi)
    for t in range(0, len(query_frames), stride):
        for ax in axes:
            ax.clear()
            ax.axis("off")
        axes[0].imshow(query_frames[t])
        axes[0].set_title(f"query t={t}", fontsize=8)
        for j in range(K):
            axes[j + 1].imshow(cand_frames[topk[t, j]])
            axes[j + 1].set_title(f"top{j + 1}", fontsize=8)
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
    extra.add_argument("--query", type=int, default=0)
    extra.add_argument("--topk", type=int, default=5)
    ns, rest = extra.parse_known_args(argv)
    args = base_args(rest)
    cfg = load_config(args)
    cfg.PATH_TO_DATASET = os.path.join(args.workdir, cfg.PATH_TO_DATASET)

    trainer = Trainer(cfg)
    trainer.init_state()
    ds = get_embeddings_dataset(cfg, trainer.model, trainer.variables,
                                trainer.val_emb_loader[0])
    items = list(trainer.val_emb_loader[0])
    q = ns.query
    candidates = [(items[i]["video"], ds["embs"][i])
                  for i in range(len(items)) if i != q]
    create_retrieval_video(items[q]["video"], ds["embs"][q], candidates,
                           os.path.join(cfg.LOGDIR, f"retrieval_{q}.mp4"),
                           K=ns.topk)


if __name__ == "__main__":
    main()
