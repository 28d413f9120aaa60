"""TensorFlow-free TFRecord + SequenceExample reader.

The reference's offline dataset prep stores videos as TFRecord
SequenceExamples (per-frame JPEGs in the 'video' feature list, int64
'frame_labels', context {'name', 'len', ...} — reference
`dataset_preparation/dataset_utils.py:30-97`). This module reads that format
with a ~100-line protobuf wire-format parser so the prep pipeline needs no
TensorFlow dependency (SURVEY.md §2 native-deps table).

TFRecord framing: [len u64le][masked crc32c(len) u32][data][crc32c(data) u32]
(CRCs are not verified — the reader is for trusted local files).
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Tuple


def read_records(path: str) -> Iterator[bytes]:
    """Yield raw record payloads from a TFRecord file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            data = f.read(length)
            if len(data) < length:
                raise IOError(f"truncated record in {path}")
            f.read(4)  # data crc
            yield data


# -- minimal protobuf wire parsing ------------------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload). Length-delimited payloads
    are the raw bytes; varint payloads are re-encoded ints."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos:pos + length]
            pos += length
        elif wire == 5:  # 32-bit
            yield field, wire, buf[pos:pos + 4]
            pos += 4
        elif wire == 1:  # 64-bit
            yield field, wire, buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_feature(buf: bytes):
    """tf.train.Feature: oneof {1: BytesList, 2: FloatList, 3: Int64List}."""
    for field, wire, payload in _iter_fields(buf):
        if field == 1:  # BytesList { repeated bytes value = 1 }
            return [p for f, w, p in _iter_fields(payload) if f == 1]
        if field == 2:  # FloatList { repeated float value = 1 [packed] }
            vals: List[float] = []
            for f, w, p in _iter_fields(payload):
                if f == 1 and w == 2:  # packed
                    vals.extend(struct.unpack(f"<{len(p) // 4}f", p))
                elif f == 1 and w == 5:
                    vals.append(struct.unpack("<f", p)[0])
            return vals
        if field == 3:  # Int64List { repeated int64 value = 1 [packed] }
            ints: List[int] = []
            for f, w, p in _iter_fields(payload):
                if f == 1 and w == 2:
                    pos = 0
                    while pos < len(p):
                        v, pos = _read_varint(p, pos)
                        ints.append(v - (1 << 64) if v >= (1 << 63) else v)
                elif f == 1 and w == 0:
                    ints.append(p - (1 << 64) if p >= (1 << 63) else p)
            return ints
    return []


def _parse_features_map(buf: bytes) -> Dict[str, list]:
    """tf.train.Features: map<string, Feature> (entry {1: key, 2: value})."""
    out = {}
    for field, wire, payload in _iter_fields(buf):
        if field == 1:
            key = value = None
            for f, w, p in _iter_fields(payload):
                if f == 1:
                    key = p.decode()
                elif f == 2:
                    value = _parse_feature(p)
            if key is not None:
                out[key] = value
    return out


def parse_sequence_example(buf: bytes):
    """tf.train.SequenceExample {1: context Features, 2: FeatureLists}.
    Returns (context dict, feature_lists dict of list-of-Feature-values)."""
    context: Dict[str, list] = {}
    feature_lists: Dict[str, list] = {}
    for field, wire, payload in _iter_fields(buf):
        if field == 1:
            context = _parse_features_map(payload)
        elif field == 2:
            # FeatureLists { map<string, FeatureList> feature_list = 1 }
            for f, w, entry in _iter_fields(payload):
                if f != 1:
                    continue
                key = None
                feats = []
                for ef, ew, ep in _iter_fields(entry):
                    if ef == 1:
                        key = ep.decode()
                    elif ef == 2:  # FeatureList { repeated Feature = 1 }
                        for lf, lw, lp in _iter_fields(ep):
                            if lf == 1:
                                feats.append(_parse_feature(lp))
                if key is not None:
                    feature_lists[key] = feats
    return context, feature_lists


def iter_sequence_examples(path: str):
    for rec in read_records(path):
        yield parse_sequence_example(rec)
