#!/usr/bin/env python
"""LSTP attention-map visualization.

Tooling parity with `visualize_lstp.py:35-211`: the reference hooks
`module.embed.pooling.cross_att.attn_holder` to capture the learnable-token
pooling attention; here the model `sow`s the per-frame LSTP attention matrix
into the 'intermediates' collection (models/mvformer.py), which we capture
with `mutable=['intermediates']` and render as per-token heatmap overlay
videos."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from video_rep_learning_tpu.data.decode import encode_video  # noqa: E402
from video_rep_learning_tpu.ops.augment import eval_augment  # noqa: E402


def capture_lstp_attention(model, variables, video_chunk, dims, image_size):
    """Run the model on (T, H, W, 3) uint8 frames, returning the LSTP
    attention (T, ntok, S_spatial)."""
    v = jnp.asarray(video_chunk).astype(jnp.float32) / 255.0
    v = eval_augment(v, image_size, dims=(dims[0], dims[1]))
    _, inter = model.apply(variables, v[None], None,
                           video_masks=jnp.ones((1, 1, v.shape[0])),
                           project=False, train=False,
                           mutable=["intermediates"])
    flat = inter["intermediates"]
    # the sow lives at embed/lstp_attention
    att = flat["embed"]["lstp_attention"][0]
    return np.asarray(att)


def render_attention_video(frames, attention, out_path, fps=6, dpi=72):
    """frames (T, H, W, 3); attention (T, ntok, S) with S a square grid."""
    T, ntok, S = attention.shape
    g = int(np.sqrt(S))
    fig, axes = plt.subplots(1, ntok + 1, figsize=(2.2 * (ntok + 1), 2.4),
                             dpi=dpi)
    out_frames = []
    for t in range(T):
        for ax in axes:
            ax.clear()
            ax.axis("off")
        axes[0].imshow(frames[t])
        axes[0].set_title(f"t={t}", fontsize=8)
        for k in range(ntok):
            amap = attention[t, k].reshape(g, g)
            axes[k + 1].imshow(frames[t])
            axes[k + 1].imshow(
                np.kron(amap, np.ones((frames.shape[1] // g,
                                       frames.shape[2] // g))),
                alpha=0.6, cmap="jet")
            axes[k + 1].set_title(f"token {k}", fontsize=8)
        fig.canvas.draw()
        out_frames.append(np.asarray(fig.canvas.buffer_rgba())[..., :3].copy())
    plt.close(fig)
    encode_video(out_path, np.stack(out_frames), fps=fps)
    print("wrote", out_path)


def main(argv=None):
    from video_rep_learning_tpu.parser import load_config, parse_args as base_args
    from video_rep_learning_tpu.train import Trainer

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--video", type=int, default=0)
    extra.add_argument("--max_frames", type=int, default=40)
    ns, rest = extra.parse_known_args(argv)
    args = base_args(rest)
    cfg = load_config(args)
    cfg.PATH_TO_DATASET = os.path.join(args.workdir, cfg.PATH_TO_DATASET)
    if cfg.MODEL.EMBEDDER_MODEL.FUSION_TYPE != "smart":
        sys.exit("visualize_lstp requires a smart-fusion (MV-Former) config")

    trainer = Trainer(cfg)
    trainer.init_state()
    item = list(trainer.val_emb_loader[0])[ns.video]
    frames = item["video"][: ns.max_frames]
    att = capture_lstp_attention(trainer.model, trainer.variables, frames,
                                 item["dims"], cfg.IMAGE_SIZE)
    render_attention_video(frames, att,
                           os.path.join(cfg.LOGDIR, f"lstp_{ns.video}.mp4"))


if __name__ == "__main__":
    main()
