#!/usr/bin/env python
"""FineGym event extraction: trim per-event clips out of downloaded FineGym
videos, standardize them (640x360 @ 25 fps), and synthesize per-frame phase
labels from the official segment timestamps.

Equivalent of `dataset_preparation/finegym_process.py:20-164`, without the
ffmpeg CLI dependency: decode -> resample/resize -> re-encode runs through
the native FFmpeg library (data/decode.py) with on-host bilinear resize.

Inputs: the FineGym annotation JSON (v1.0) + gym99/gym288 element category
files + the downloaded source videos. Outputs per-event mp4s + the
gym{99,288}_{train,val} pickle indexes the FineGym dataset class reads
(`datasets/finegym.py:39-54`).

ONLY_CHECK mode (`--only_check`) audits file availability without processing
(reference `finegym_process.py:15-16,100`).
"""

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_rep_learning_tpu.data.decode import VideoReader, encode_video  # noqa: E402

TARGET_W, TARGET_H, TARGET_FPS = 640, 360, 25.0


def resize_frames(frames, h, w):
    """Host-side bilinear resize (offline prep; jax on CPU)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    out = jax.image.resize(jnp.asarray(frames).astype(jnp.float32),
                           (frames.shape[0], h, w, 3), "bilinear")
    return np.asarray(jnp.clip(jnp.round(out), 0, 255)).astype(np.uint8)


def extract_event(src_path, start_s, end_s, out_path):
    """Trim [start_s, end_s) and standardize to 640x360@25fps."""
    reader = VideoReader(src_path)
    try:
        src_fps = reader.fps or TARGET_FPS
        f0 = int(start_s * src_fps)
        f1 = max(f0 + 1, int(end_s * src_fps))
        frames = reader.decode_range(f0, f1)
    finally:
        reader.close()
    # resample to 25 fps by frame index mapping
    n_out = max(1, int(round((end_s - start_s) * TARGET_FPS)))
    src_idx = np.clip(np.round(np.arange(n_out) * src_fps / TARGET_FPS), 0,
                      len(frames) - 1).astype(int)
    frames = frames[src_idx]
    if frames.shape[1] != TARGET_H or frames.shape[2] != TARGET_W:
        frames = resize_frames(frames, TARGET_H, TARGET_W)
    encode_video(out_path, frames, fps=TARGET_FPS)
    return len(frames)


def frame_labels_from_segments(event_info, n_frames):
    """Per-frame phase labels from the element segment timestamps
    (`finegym_process.py:120-160`): frames inside an annotated segment get
    its element label; frames outside get -1."""
    labels = -1 * np.ones(n_frames, np.int64)
    segments = event_info.get("segments") or {}
    for seg in segments.values() if isinstance(segments, dict) else segments:
        stages = seg.get("timestamps", [])
        label = seg.get("label", -1)
        for st in stages:
            a = int(float(st[0]) * TARGET_FPS)
            b = int(float(st[1]) * TARGET_FPS)
            labels[max(0, a):min(n_frames, b)] = label
    return labels


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--annotations", required=True,
                   help="finegym_annotation_info JSON")
    p.add_argument("--categories", required=True,
                   help="gym99/gym288 element category file (train/val lists)")
    p.add_argument("--videos", required=True, help="downloaded source videos dir")
    p.add_argument("--out", required=True)
    p.add_argument("--class_num", type=int, default=99)
    p.add_argument("--only_check", action="store_true")
    args = p.parse_args(argv)

    with open(args.annotations) as f:
        ann = json.load(f)
    with open(args.categories) as f:
        categories = [line.split() for line in f if line.strip()]
    event_label = {c[0]: int(c[1]) for c in categories if len(c) >= 2}

    os.makedirs(os.path.join(args.out, "videos"), exist_ok=True)
    entries = []
    missing = []
    idx = 0
    for vid, events in ann.items():
        src = None
        for ext in (".mp4", ".mkv", ".webm"):
            cand = os.path.join(args.videos, vid + ext)
            if os.path.isfile(cand):
                src = cand
                break
        if src is None:
            missing.append(vid)
            continue
        if args.only_check:
            continue
        for event_id, info in events.items():
            name = f"{vid}_{event_id}"
            if name not in event_label and event_id not in event_label:
                continue
            ts = info.get("timestamps", [[0, 0]])[0]
            rel = os.path.join("videos", name + ".mp4")
            try:
                n = extract_event(src, float(ts[0]), float(ts[1]),
                                  os.path.join(args.out, rel))
            except Exception as e:
                print("ERROR processing", name, e)
                continue
            labels = frame_labels_from_segments(info, n)
            entries.append({"id": idx, "video_file": rel,
                            "frame_label": labels, "seq_len": n,
                            "name": name,
                            "event_label": event_label.get(name,
                                                           event_label.get(event_id, -1))})
            idx += 1

    if args.only_check:
        print(f"{len(missing)} missing videos:", missing[:20])
        return
    split = "train" if "train" in os.path.basename(args.categories) else "val"
    suffix = "_v1.0" if split == "train" else ""
    out_pkl = os.path.join(args.out, f"gym{args.class_num}_{split}{suffix}.pkl")
    with open(out_pkl, "wb") as f:
        pickle.dump(entries, f)
    print(f"wrote {len(entries)} events to {out_pkl}; {len(missing)} missing")


if __name__ == "__main__":
    main()
