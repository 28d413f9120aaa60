"""Dataset-prep tooling tests: TF-free TFRecord/SequenceExample parsing,
native JPEG decode, and the tfrecords->videos conversion end to end."""

import io
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# -- minimal protobuf writer (test-side inverse of the parser) --------------

def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num, wire, payload):
    tag = _varint((num << 3) | wire)
    if wire == 2:
        return tag + _varint(len(payload)) + payload
    if wire == 0:
        return tag + _varint(payload)
    raise ValueError


def bytes_feature(values):
    bl = b"".join(_field(1, 2, v) for v in values)
    return _field(1, 2, bl)


def int64_feature(values):
    il = b"".join(_field(1, 0, v) for v in values)
    return _field(3, 2, il)


def features_map(d):
    out = b""
    for k, feat in d.items():
        entry = _field(1, 2, k.encode()) + _field(2, 2, feat)
        out += _field(1, 2, entry)
    return out


def feature_list(feats):
    return b"".join(_field(1, 2, f) for f in feats)


def sequence_example(context, lists):
    fl = b""
    for k, feats in lists.items():
        entry = _field(1, 2, k.encode()) + _field(2, 2, feature_list(feats))
        fl += _field(1, 2, entry)
    return _field(1, 2, features_map(context)) + _field(2, 2, fl)


def write_tfrecord(path, payloads):
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<Q", len(p)) + b"\x00" * 4 + p + b"\x00" * 4)


def make_jpeg(h, w, value, seed=0):
    from PIL import Image

    # smooth gradient content so JPEG q95 stays near-lossless
    y = np.linspace(0, 60, h)[:, None, None]
    x = np.linspace(0, 40, w)[None, :, None]
    arr = np.clip(value + y + x + 3 * seed, 0, 255).astype(np.uint8)
    arr = np.repeat(arr, 3, axis=2)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue(), arr


def test_decode_image_jpeg_and_png():
    from video_rep_learning_tpu.data.decode import decode_image

    jpg, arr = make_jpeg(32, 48, 128)
    out = decode_image(jpg)
    assert out.shape == (32, 48, 3)
    assert np.abs(out.astype(int) - arr.astype(int)).mean() < 6  # lossy

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    out_png = decode_image(buf.getvalue())
    np.testing.assert_array_equal(out_png, arr)  # lossless


def test_sequence_example_roundtrip(tmp_path):
    from video_rep_learning_tpu.data.tfrecord import iter_sequence_examples

    jpg0, _ = make_jpeg(16, 16, 50)
    jpg1, _ = make_jpeg(16, 16, 200)
    ex = sequence_example(
        {"name": bytes_feature([b"vid_0"]), "len": int64_feature([2])},
        {"video": [bytes_feature([jpg0]), bytes_feature([jpg1])],
         "frame_labels": [int64_feature([0]), int64_feature([1])]})
    path = str(tmp_path / "data_train.tfrecord")
    write_tfrecord(path, [ex])

    examples = list(iter_sequence_examples(path))
    assert len(examples) == 1
    context, lists = examples[0]
    assert context["name"][0] == b"vid_0"
    assert context["len"][0] == 2
    assert lists["video"][0][0] == jpg0
    assert [f[0] for f in lists["frame_labels"]] == [0, 1]


def test_tfrecords_to_videos_end_to_end(tmp_path):
    from video_rep_learning_tpu.data.datasets import Pouring
    from video_rep_learning_tpu.config import get_cfg

    tfdir = tmp_path / "pouring_tfrecords"
    tfdir.mkdir()
    records = []
    for i in range(3):
        jpegs = [make_jpeg(32, 32, 40 * (t + 1), seed=i * 10 + t)[0]
                 for t in range(6)]
        records.append(sequence_example(
            {"name": bytes_feature([f"vid_{i}".encode()]),
             "len": int64_feature([6])},
            {"video": [bytes_feature([j]) for j in jpegs],
             "frame_labels": [int64_feature([t % 3]) for t in range(6)]}))
    write_tfrecord(str(tfdir / "pouring_train.tfrecord"), records)

    out = tmp_path / "pouring"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tfrecords_to_videos.py"),
         "--tfrecord_dir", str(tfdir), "--out", str(out), "--split", "train",
         "--format", "npy"],
        check=True, cwd=REPO)

    cfg = get_cfg()
    cfg.PATH_TO_DATASET = str(out)
    cfg.TRAIN.NUM_FRAMES = 4
    ds = Pouring(cfg, "train")
    assert len(ds) == 3
    item = ds.get_ssl_item(np.random.RandomState(0), 1)
    assert item["videos"].shape == (2, 4, 32, 32, 3)


def test_prepare_finegym_event_trim_end_to_end(tmp_path):
    """FineGym event extraction on a real (synthetic) source video: trim by
    timestamps, standardize to 640x360@25fps via the native decoder/encoder,
    synthesize frame labels from segments, and emit a dataset-loadable
    pickle (reference `finegym_process.py:20-164`; closes the round-1
    'never exercised on real event videos' gap)."""
    import json
    import pickle

    from video_rep_learning_tpu.data.decode import VideoReader, encode_video
    import tools.prepare_finegym as pf

    rng = np.random.RandomState(0)
    src_fps = 12.5
    frames = rng.randint(0, 255, size=(100, 96, 128, 3)).astype(np.uint8)
    videos_dir = tmp_path / "src"
    videos_dir.mkdir()
    encode_video(str(videos_dir / "vidA.mp4"), frames, fps=src_fps)

    ann = {
        "vidA": {
            "E_001": {
                "timestamps": [[1.0, 3.0]],
                "segments": {
                    "s0": {"timestamps": [[0.2, 1.0]], "label": 7},
                    "s1": {"timestamps": [[1.2, 1.8]], "label": 3},
                },
            },
            "E_002": {"timestamps": [[5.0, 7.0]], "segments": {}},
            "E_skip": {"timestamps": [[0.0, 1.0]]},  # not in categories
        },
        "vidMissing": {"E_003": {"timestamps": [[0.0, 1.0]]}},
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    cats = tmp_path / "gym99_train.txt"
    cats.write_text("vidA_E_001 11\nvidA_E_002 12\nvidMissing_E_003 13\n")

    out = tmp_path / "out"
    pf.main(["--annotations", str(ann_path), "--categories", str(cats),
             "--videos", str(videos_dir), "--out", str(out)])

    with open(out / "gym99_train_v1.0.pkl", "rb") as f:
        entries = pickle.load(f)
    assert [e["name"] for e in entries] == ["vidA_E_001", "vidA_E_002"]

    e0 = entries[0]
    assert e0["seq_len"] == 50  # 2 s @ 25 fps
    assert e0["event_label"] == 11
    reader = VideoReader(str(out / e0["video_file"]))
    try:
        decoded = reader.decode_range(0, e0["seq_len"])
    finally:
        reader.close()
    assert decoded.shape == (50, 360, 640, 3)  # standardized geometry

    # frame labels from event-relative segment timestamps @25fps:
    # [0.2,1.0)s -> frames 5..24 label 7; [1.2,1.8)s -> frames 30..44 label 3
    labels = np.asarray(e0["frame_label"])
    assert labels.shape == (50,)
    assert (labels[5:25] == 7).all()
    assert (labels[30:45] == 3).all()
    assert (labels[:5] == -1).all() and (labels[45:] == -1).all()
