#!/usr/bin/env python
"""Fetch the FineGym source videos from YouTube.

Equivalent of the reference's `dataset_preparation/download_finegym_videos.py`
(youtube-dl there; yt-dlp/youtube-dl here, whichever is installed). Reads the
FineGym annotation JSON for the video id list and downloads each into
`--out`; already-present files are skipped. Run `tools/prepare_finegym.py`
afterwards to trim per-event clips.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys


def downloader():
    for tool in ("yt-dlp", "youtube-dl"):
        if shutil.which(tool):
            return tool
    sys.exit("need yt-dlp or youtube-dl on PATH")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--annotations", required=True,
                   help="finegym annotation JSON (v1.0)")
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    with open(args.annotations) as f:
        video_ids = sorted(json.load(f).keys())
    if args.limit:
        video_ids = video_ids[: args.limit]
    os.makedirs(args.out, exist_ok=True)
    tool = downloader()

    failed = []
    for i, vid in enumerate(video_ids):
        if any(os.path.isfile(os.path.join(args.out, vid + ext))
               for ext in (".mp4", ".mkv", ".webm")):
            continue
        url = f"https://www.youtube.com/watch?v={vid}"
        print(f"[{i + 1}/{len(video_ids)}] {url}")
        ret = subprocess.run(
            [tool, "-f", "best[height<=480]", "-o",
             os.path.join(args.out, vid + ".%(ext)s"), url])
        if ret.returncode != 0:
            failed.append(vid)
    if failed:
        print(f"{len(failed)} downloads failed:", failed[:20])


if __name__ == "__main__":
    main()
