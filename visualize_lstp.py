#!/usr/bin/env python
"""LSTP attention-map visualization.

Tooling parity with the reference `visualize_lstp.py:35-261`: the reference
hooks `module.embed.pooling.cross_att.attn_holder` to capture the
learnable-token pooling attention; here the model `sow`s the per-frame LSTP
attention matrix into the 'intermediates' collection (models/mvformer.py),
which we capture with `mutable=['intermediates']` and render as per-token
heatmap overlay videos.

Default invocation sweeps EVERY val embedding loader like the reference's
`run_vis` (`visualize_lstp.py:74-115`): `samples_per` samples per dataset
(5 when a single dataset is configured, 1 per dataset otherwise — reference
`visualize_lstp.py:252-255`), each video chunked by EVAL.FRAMES_PER_BATCH
with the attention maps concatenated and invalid (label < 0) frames dropped.
`--video N` renders just that index from the first loader.
"""

import argparse
import math
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


def capture_lstp_attention_chunked(model, variables, item, image_size,
                                   max_fpb):
    """Whole-video capture via the reference's chunking rule
    (`visualize_lstp.py:86-106`: num_batches = ceil(len/max), equal chunks,
    attention maps concatenated), then invalid (label < 0) frames dropped."""
    video = item["video"]
    seq_len = int(item["seq_len"])
    num_batches = int(math.ceil(float(seq_len) / max_fpb))
    fpb = int(math.ceil(float(seq_len) / num_batches))
    atts = []
    for i in range(num_batches):
        curr = i * fpb
        num_steps = min(seq_len - curr, fpb)
        chunk = video[curr:curr + num_steps]
        atts.append(capture_lstp_attention(model, variables, chunk,
                                           item["dims"], image_size))
    att = np.concatenate(atts, axis=0)
    valid = np.asarray(item["labels"]) >= 0
    return att[valid], video[valid]


def render_attention_video(frames, attention, out_path, fps=6, dpi=72):
    """frames (T, H, W, 3); attention (T, ntok, S) with S a square grid."""
    T, ntok, S = attention.shape
    g = int(np.sqrt(S))
    if g * g != S:
        sys.exit("can only visualize a square token array")
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
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        # H.264 requires even dimensions; the dynamic ntok figsize can land odd
        buf = buf[: buf.shape[0] // 2 * 2, : buf.shape[1] // 2 * 2]
        out_frames.append(buf.copy())
    plt.close(fig)
    encode_video(out_path, np.stack(out_frames), fps=fps)
    print("wrote", out_path)


def run_sweep(cfg, model, variables, val_emb_loaders, samples_per,
              max_frames=None):
    """The reference's all-datasets sweep (`visualize_lstp.py:74-115`):
    `samples_per` videos from each val loader, dataset suffix when there is
    more than one loader, shared sample counter semantics."""
    config_name = os.path.basename(cfg.LOGDIR.rstrip("/"))
    nds = len(val_emb_loaders)
    outputs = []
    for data_i, loader in enumerate(val_emb_loaders):
        cur_sample = 1
        for item in loader:
            att, frames = capture_lstp_attention_chunked(
                model, variables, item, cfg.IMAGE_SIZE,
                cfg.EVAL.FRAMES_PER_BATCH)
            if max_frames:
                att, frames = att[:max_frames], frames[:max_frames]
            name = f"lstp_{config_name}"
            if nds > 1:
                name += f"_dataset{data_i:02d}"
            if samples_per > 1:
                name += f"_sample{cur_sample:02d}"
            out = os.path.join(cfg.LOGDIR, name + ".mp4")
            render_attention_video(frames, att, out)
            outputs.append(out)
            if cur_sample >= samples_per:
                break
            cur_sample += 1
    return outputs


def main(argv=None):
    from video_rep_learning_tpu.parser import load_config, parse_args as base_args
    from video_rep_learning_tpu.train import Trainer

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--video", type=int, default=None,
                       help="render only this index from the first loader")
    extra.add_argument("--max_frames", type=int, default=None)
    extra.add_argument("--samples_per", type=int, default=None,
                       help="override the reference's 5-if-single-dataset "
                            "/ 1-per-dataset rule")
    ns, rest = extra.parse_known_args(argv)
    args = base_args(rest)
    cfg = load_config(args)
    cfg.PATH_TO_DATASET = os.path.join(args.workdir, cfg.PATH_TO_DATASET)
    if cfg.MODEL.EMBEDDER_MODEL.FUSION_TYPE != "smart":
        sys.exit("visualize_lstp requires a smart-fusion (MV-Former) config")
    if int(cfg.DATA.NUM_CONTEXTS) != 1:
        sys.exit("num_contexts != 1 not supported")  # ref :65-67

    trainer = Trainer(cfg)
    trainer.init_state()

    if ns.video is not None:
        item = list(trainer.val_emb_loader[0])[ns.video]
        frames = item["video"][: ns.max_frames or 40]
        att = capture_lstp_attention(trainer.model, trainer.variables, frames,
                                     item["dims"], cfg.IMAGE_SIZE)
        render_attention_video(
            frames, att, os.path.join(cfg.LOGDIR, f"lstp_{ns.video}.mp4"))
        return

    samples_per = ns.samples_per
    if samples_per is None:
        samples_per = 5 if len(cfg.DATASETS) == 1 else 1
    run_sweep(cfg, trainer.model, trainer.variables, trainer.val_emb_loader,
              samples_per, max_frames=ns.max_frames)


if __name__ == "__main__":
    main()
