#!/usr/bin/env python
"""Convert the raw PennAction release (frames/NNNN/*.jpg + labels/NNNN.mat)
to the training format (mp4/npy videos + pickle index with per-action
indices).

Equivalent of the reference's two-step
`penn_action_to_tfrecords.py` -> `tfrecords_to_videos.py` pipeline
(`dataset_preparation/penn_action_to_tfrecords.py:97-174`), collapsed to one
TF-free step. Phase labels per action follow the CARL/TCC convention: the
.mat per-frame 'phase' field when present, else -1 (unlabeled).

Usage: python tools/prepare_penn_action.py --raw /path/Penn_Action \
           --out /path/penn_action [--val_fraction 0.5]
"""

import argparse
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_rep_learning_tpu.data.decode import decode_image, encode_video  # noqa: E402
from video_rep_learning_tpu.data.splits import PENN_ACTION_LIST  # noqa: E402


def load_mat(path):
    from scipy.io import loadmat

    return loadmat(path)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--raw", required=True, help="Penn_Action release root")
    p.add_argument("--out", required=True)
    p.add_argument("--format", choices=["mp4", "npy"], default="mp4")
    args = p.parse_args(argv)

    frames_root = os.path.join(args.raw, "frames")
    labels_root = os.path.join(args.raw, "labels")
    video_dir = os.path.join(args.out, "videos")
    os.makedirs(video_dir, exist_ok=True)

    splits = {"train": [], "val": []}
    action_indices = {"train": [[] for _ in PENN_ACTION_LIST],
                      "val": [[] for _ in PENN_ACTION_LIST]}
    counters = {"train": 0, "val": 0}

    for seq_dir in sorted(glob.glob(os.path.join(frames_root, "*"))):
        seq_id = os.path.basename(seq_dir)
        mat = load_mat(os.path.join(labels_root, seq_id + ".mat"))
        action = str(np.squeeze(mat["action"]))
        if action not in PENN_ACTION_LIST:
            continue
        # PennAction 'train' field: 1 = train split, -1 = test/val split
        split = "train" if int(np.squeeze(mat.get("train", 1))) == 1 else "val"
        jpgs = sorted(glob.glob(os.path.join(seq_dir, "*.jpg")))
        frames = np.stack([decode_image(open(j, "rb").read()) for j in jpgs])
        if "phase" in mat:
            labels = np.asarray(mat["phase"]).reshape(-1).astype(np.int64)
        else:
            labels = -1 * np.ones(len(frames), np.int64)

        name = f"{seq_id}_{action}"
        rel = os.path.join("videos", f"{name}.{args.format}")
        encode_video(os.path.join(args.out, rel), frames, fps=25.0)
        idx = counters[split]
        splits[split].append({
            "id": idx, "video_file": rel, "frame_label": labels,
            "seq_len": len(frames), "name": name,
            "action_label": PENN_ACTION_LIST.index(action),
        })
        action_indices[split][PENN_ACTION_LIST.index(action)].append(idx)
        counters[split] += 1
        if sum(counters.values()) % 100 == 0:
            print("processed", sum(counters.values()), "sequences")

    for split in ("train", "val"):
        with open(os.path.join(args.out, f"{split}.pkl"), "wb") as f:
            pickle.dump((splits[split], action_indices[split]), f)
        print(f"{split}: {counters[split]} sequences")


if __name__ == "__main__":
    main()
