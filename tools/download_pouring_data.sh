#!/bin/bash
# Download the Pouring dataset TFRecords (the original TCC release) and
# convert them to the training format. Equivalent of the reference's
# dataset_preparation/download_pouring_data.sh + tfrecords_to_videos.py
# (conversion here is TensorFlow-free).
#
# Usage: tools/download_pouring_data.sh /path/to/datasets
set -e
WORKDIR=${1:?usage: download_pouring_data.sh WORKDIR}
TFR_DIR="$WORKDIR/pouring_tfrecords"
mkdir -p "$TFR_DIR"

BASE=https://storage.googleapis.com/tcc_dataset
for f in pouring_train-0-of-1.tfrecord pouring_val-0-of-1.tfrecord; do
  if [ ! -f "$TFR_DIR/$f" ]; then
    echo "downloading $f"
    curl -fL "$BASE/$f" -o "$TFR_DIR/$f" || wget -O "$TFR_DIR/$f" "$BASE/$f"
  fi
done

cd "$(dirname "$0")/.."
python tools/tfrecords_to_videos.py --tfrecord_dir "$TFR_DIR" \
    --out "$WORKDIR/pouring" --split train
python tools/tfrecords_to_videos.py --tfrecord_dir "$TFR_DIR" \
    --out "$WORKDIR/pouring" --split val
echo "pouring dataset ready at $WORKDIR/pouring"
