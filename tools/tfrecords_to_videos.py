#!/usr/bin/env python
"""Convert TFRecord SequenceExamples (Pouring / PennAction releases) to the
training format: mp4 (or .npy) videos + pickle index.

Equivalent of the reference's `dataset_preparation/tfrecords_to_videos.py`
(TF + torchvision there; here TF-free via the pure-Python SequenceExample
parser and the native FFmpeg encoder):
- pouring:    {split}.pkl = [{id, video_file, frame_label, seq_len, name}]
- penn_action: {split}.pkl = (that list + action_to_indices per action)

Usage: python tools/tfrecords_to_videos.py --tfrecord_dir pouring_tfrecords \
           --out pouring --split train [--format mp4]
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
from video_rep_learning_tpu.data.tfrecord import iter_sequence_examples  # noqa: E402


def convert(args):
    pattern = os.path.join(args.tfrecord_dir, f"*{args.split}*")
    files = sorted(glob.glob(pattern))
    if not files:
        sys.exit(f"no tfrecord files match {pattern}")
    video_dir = os.path.join(args.out, "videos")
    os.makedirs(video_dir, exist_ok=True)

    is_penn = "penn" in os.path.basename(args.tfrecord_dir.rstrip("/"))
    results = []
    action_to_indices = [[] for _ in PENN_ACTION_LIST]
    idx = 0
    for path in files:
        for context, feature_lists in iter_sequence_examples(path):
            name = context["name"][0].decode()
            jpegs = [f[0] for f in feature_lists.get("video", [])]
            frames = np.stack([decode_image(j) for j in jpegs])
            labels = np.array(
                [f[0] for f in feature_lists.get("frame_labels", [])],
                np.int64)
            if len(labels) == 0:
                labels = -1 * np.ones(len(frames), np.int64)
            entry = {
                "id": idx,
                "video_file": os.path.join("videos", f"{name}.{args.format}"),
                "frame_label": labels,
                "seq_len": int(context["len"][0]) if "len" in context
                else len(frames),
                "name": name,
            }
            if is_penn:
                action = name[5:]
                if action not in PENN_ACTION_LIST:
                    continue
                entry["action_label"] = PENN_ACTION_LIST.index(action)
                action_to_indices[entry["action_label"]].append(idx)
            encode_video(os.path.join(args.out, entry["video_file"]), frames,
                         fps=25.0)
            results.append(entry)
            idx += 1
            if idx % 25 == 0:
                print(f"converted {idx} videos")

    out_pkl = os.path.join(args.out, f"{args.split}.pkl")
    with open(out_pkl, "wb") as f:
        pickle.dump((results, action_to_indices) if is_penn else results, f)
    print(f"wrote {idx} videos and {out_pkl}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tfrecord_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--format", choices=["mp4", "npy"], default="mp4")
    convert(p.parse_args(argv))


if __name__ == "__main__":
    main()
