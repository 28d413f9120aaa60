#!/usr/bin/env python
"""Generate a synthetic Pouring-format dataset (mp4 or .npy frame stores +
pickle index) for micro end-to-end runs and tests — the stand-in for the
reference's real-data debug jobs (`make_job.py --micro`, SURVEY.md §4).

Videos are procedural: a moving bright square whose vertical position encodes
progress, with `num_phases` contiguous phase segments as frame labels — so
downstream tasks (tau, retrieval, probe, progression) have real structure to
learn.

Usage: python tools/make_synthetic_data.py --out /tmp/data/pouring \
           --num_train 8 --num_val 4 --min_len 40 --max_len 80 --size 64
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_rep_learning_tpu.data.decode import encode_video  # noqa: E402


def make_video(rng, seq_len, h, w):
    frames = np.zeros((seq_len, h, w, 3), np.uint8)
    bg = rng.randint(0, 60, size=3)
    sq = rng.randint(150, 255, size=3)
    side = max(4, h // 6)
    for t in range(seq_len):
        frames[t] = bg
        prog = t / max(1, seq_len - 1)
        y = int(prog * (h - side))
        x = int((0.3 + 0.4 * np.sin(prog * 3.1)) * (w - side))
        frames[t, y:y + side, x:x + side] = sq
        # time-varying texture so frames are distinguishable
        frames[t, :2, :, :] = (t * 7) % 255
    return frames


def make_k400_split(out_dir, n, rng, args):
    """Kinetics-400 layout: train/*.mp4 named {youtube_id}_{start:06d}_
    {end:06d}.mp4 + train.csv (label,youtube_id,time_start,time_end,split) —
    the reference's hardcoded format (`kinetics400.py:34,86`)."""
    os.makedirs(os.path.join(out_dir, "train"), exist_ok=True)
    rows = ["label,youtube_id,time_start,time_end,split"]
    for i in range(n):
        seq_len = rng.randint(args.min_len, args.max_len + 1)
        frames = make_video(rng, seq_len, args.size, args.size)
        ytid = f"synth{i:05d}"
        fname = f"{ytid}_{0:06d}_{10:06d}.mp4"
        encode_video(os.path.join(out_dir, "train", fname), frames, fps=25.0)
        rows.append(f"x,{ytid},0,10,train")
    with open(os.path.join(out_dir, "train.csv"), "w") as f:
        f.write("\n".join(rows))


def make_split(out_dir, split, n, rng, args):
    from video_rep_learning_tpu.data.splits import PENN_ACTION_LIST

    penn = args.dataset == "penn_action"
    actions = PENN_ACTION_LIST[: args.num_actions] if penn else [None]
    entries = []
    action_to_indices = [[] for _ in PENN_ACTION_LIST]
    os.makedirs(os.path.join(out_dir, "videos"), exist_ok=True)
    for i in range(n):
        seq_len = rng.randint(args.min_len, args.max_len + 1)
        frames = make_video(rng, seq_len, args.size, args.size)
        action = actions[i % len(actions)]
        name = f"{i:04d}_{action}" if penn else f"{split}_{i}"
        rel = os.path.join("videos", f"{split}_{name}.{args.format}")
        encode_video(os.path.join(out_dir, rel), frames, fps=25.0)
        bounds = np.sort(rng.choice(
            np.arange(1, seq_len), size=args.num_phases - 1, replace=False))
        labels = np.zeros(seq_len, np.int64)
        for k, b in enumerate(bounds):
            labels[b:] = k + 1
        entry = {
            "id": i,
            "name": name,
            "video_file": rel,
            "frame_label": labels,
            "seq_len": seq_len,
            "height": args.size,
            "width": args.size,
        }
        if penn:
            a_idx = PENN_ACTION_LIST.index(action)
            entry["action_label"] = a_idx
            action_to_indices[a_idx].append(i)
        entries.append(entry)
    with open(os.path.join(out_dir, f"{split}.pkl"), "wb") as f:
        pickle.dump((entries, action_to_indices) if penn else entries, f)
    return entries


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--num_train", type=int, default=8)
    p.add_argument("--num_val", type=int, default=4)
    p.add_argument("--min_len", type=int, default=40)
    p.add_argument("--max_len", type=int, default=80)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--num_phases", type=int, default=4)
    p.add_argument("--format", choices=["mp4", "npy"], default="mp4")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset",
                   choices=["pouring", "penn_action", "kinetics400"],
                   default="pouring",
                   help="penn_action writes the (entries, action_to_indices) "
                        "pickle format with per-action names; kinetics400 "
                        "writes train/*.mp4 + train.csv")
    p.add_argument("--num_actions", type=int, default=2,
                   help="number of PennAction actions to synthesize")
    args = p.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    os.makedirs(args.out, exist_ok=True)
    if args.dataset == "kinetics400":
        make_k400_split(args.out, args.num_train, rng, args)
    else:
        make_split(args.out, "train", args.num_train, rng, args)
        make_split(args.out, "val", args.num_val, rng, args)
    print(f"synthetic dataset written to {args.out}")


if __name__ == "__main__":
    main()
