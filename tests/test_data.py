"""Data pipeline tests: samplers (distributional + invariants), decoder
roundtrip, dataset items, loader collation/sharding."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from video_rep_learning_tpu.config import get_cfg
from video_rep_learning_tpu.data.samplers import (sample_all_frames,
                                                  sample_frames,
                                                  sample_two_views)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------

def test_time_augment_long_video_invariants():
    rng = np.random.RandomState(0)
    for _ in range(50):
        steps, chosen, mask = sample_frames(rng, seq_len=100, num_frames=20)
        assert len(steps) == len(chosen) == len(mask) == 20
        assert (np.diff(steps) >= 0).all()          # sorted
        assert (chosen >= 0).all() and (chosen < 100).all()
        # mask is 0 exactly where the pre-clamp step fell outside the video
        # (expand_ratio blocks may overhang the end, like the reference)
        assert (mask[chosen < 99] == 1).all()
        # in-bounds sampled steps are unique (sample w/o replacement)
        inb = chosen[mask.astype(bool)]
        assert len(np.unique(inb)) == len(inb)


def test_time_augment_short_video_padding():
    rng = np.random.RandomState(1)
    steps, chosen, mask = sample_frames(rng, seq_len=5, num_frames=8)
    assert len(steps) == 8
    assert not mask[5:].any()                        # pad -> mask 0
    assert (chosen[5:] == 4).all()                   # clamped to seq_len-1
    # sampled region may overhang seq_len (expand_ratio); mask reflects it
    np.testing.assert_array_equal(mask[:5], (chosen[:5] < 5) & (mask[:5] > 0))


def test_offset_uniform():
    rng = np.random.RandomState(2)
    steps, chosen, mask = sample_frames(rng, 50, 10, strategy="offset_uniform")
    assert (np.diff(steps) > 0).all() and steps.max() < 50
    steps, chosen, mask = sample_frames(rng, 4, 10, strategy="offset_uniform")
    assert not mask[4:].any()


def test_consistent_offset_constrains_second_view():
    rng = np.random.RandomState(3)
    gaps = []
    for _ in range(100):
        (s0, _, _), (s1, _, _) = sample_two_views(
            rng, seq_len=200, num_frames=20, consistent_offset=0.2,
            block_size_mode="num_frames")
        gaps.append(abs(int(s0.min()) - int(s1.min())))
    # shift window = (1-0.2)*20 = 16
    assert max(gaps) <= 16


def test_block_size_modes_differ():
    # For long seq_len, 'seq_len' mode spreads steps across the whole video,
    # 'num_frames' mode keeps them in a ~num_frames-sized block.
    spans_sl, spans_nf = [], []
    for seed in range(30):
        rng = np.random.RandomState(seed)
        s, _, _ = sample_frames(rng, 1000, 20, block_size_mode="seq_len")
        spans_sl.append(s.max() - s.min())
        rng = np.random.RandomState(seed)
        s, _, _ = sample_frames(rng, 1000, 20, block_size_mode="num_frames")
        spans_nf.append(s.max() - s.min())
    assert np.mean(spans_sl) > 5 * np.mean(spans_nf)


def test_tcn_interleaving():
    rng = np.random.RandomState(4)
    steps, chosen, mask = sample_frames(rng, 100, 10, tcn=True,
                                        tcn_positive_window=5)
    assert len(steps) == 20
    anchors, positives = steps[0::2], steps[1::2]
    diff = positives - anchors
    # positive within [-window, 0); clamping at 0 can make the diff 0
    assert (diff >= -5).all() and (diff <= 0).all() and (diff < 0).any()


def test_context_expansion():
    rng = np.random.RandomState(5)
    steps, chosen, mask = sample_frames(rng, 100, 10, num_contexts=2,
                                        context_stride=3)
    assert len(steps) == 20 and len(chosen) == 10
    # each chosen step is preceded by its context frame at stride 3 (clamped)
    assert (steps[1::2] == chosen).all()
    assert (steps[0::2] == np.clip(chosen - 3, 0, 99)).all()


def test_sample_all():
    steps, chosen, mask = sample_all_frames(17, stride=2)
    assert (steps == np.arange(0, 17, 2)).all() and mask.all()


# ---------------------------------------------------------------------------
# synthetic dataset + loader end-to-end
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pouring"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_data.py"),
         "--out", out, "--num_train", "6", "--num_val", "3",
         "--min_len", "30", "--max_len", "50", "--size", "48",
         "--format", "npy"],
        check=True, cwd=REPO)
    return out


def _small_cfg(synth_dir):
    cfg = get_cfg()
    cfg.PATH_TO_DATASET = synth_dir
    cfg.TRAIN.NUM_FRAMES = 16
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.EVAL.NUM_FRAMES = 16
    return cfg


def test_pouring_ssl_item_contract(synth_dir):
    from video_rep_learning_tpu.data.datasets import Pouring

    cfg = _small_cfg(synth_dir)
    ds = Pouring(cfg, "train")
    item = ds.get_ssl_item(np.random.RandomState(0), 0)
    assert item["videos"].shape == (2, 16, 48, 48, 3)
    assert item["videos"].dtype == np.uint8
    assert item["labels"].shape == (2, 16)
    assert item["seq_lens"].shape == (2,)
    assert item["chosen_steps"].shape == (2, 16)
    assert item["video_masks"].shape == (2, 16)
    # labels at chosen steps match the stored frame labels
    with open(os.path.join(synth_dir, "train.pkl"), "rb") as f:
        entries = pickle.load(f)
    fl = entries[0]["frame_label"]
    np.testing.assert_array_equal(item["labels"][0], fl[item["chosen_steps"][0]])


def test_train_loader_batches_and_sharding(synth_dir):
    from video_rep_learning_tpu.data.datasets import Pouring
    from video_rep_learning_tpu.data.loader import TrainLoader

    cfg = _small_cfg(synth_dir)
    ds = Pouring(cfg, "train")
    loader = TrainLoader(ds, batch_size=2, seed=1)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    b = batches[0]
    assert b["videos"].shape == (2, 2, 16, 48, 48, 3)
    assert b["video_masks"].shape == (2, 2, 16)
    assert len(b["names"]) == 2

    # two-process sharding covers the index with disjoint-ish halves
    l0 = TrainLoader(ds, batch_size=1, num_replicas=2, rank=0, seed=1)
    l1 = TrainLoader(ds, batch_size=1, num_replicas=2, rank=1, seed=1)
    l0.set_epoch(0)
    l1.set_epoch(0)
    n0 = [b["names"][0] for b in l0]
    n1 = [b["names"][0] for b in l1]
    assert len(n0) == len(n1) == 3
    assert set(n0).isdisjoint(n1)

    # epoch reshuffle changes order deterministically
    l0.set_epoch(1)
    n0b = [b["names"][0] for b in l0]
    assert sorted(n0) != n0b or n0 != n0b


def test_train_loader_multiworker_identical(synth_dir):
    """A num_workers>1 thread pool must yield bit-identical batches in the
    same order as the single-worker path (per-index RNG seeding makes item
    generation scheduling-independent)."""
    from video_rep_learning_tpu.data.datasets import Pouring
    from video_rep_learning_tpu.data.loader import TrainLoader

    cfg = _small_cfg(synth_dir)
    ds = Pouring(cfg, "train")
    l1 = TrainLoader(ds, batch_size=2, seed=3, num_workers=1)
    l4 = TrainLoader(ds, batch_size=2, seed=3, num_workers=4)
    l1.set_epoch(2)
    l4.set_epoch(2)
    b1, b4 = list(l1), list(l4)
    assert len(b1) == len(b4) == 3
    for a, b in zip(b1, b4):
        assert a["names"] == b["names"]
        for k in ("videos", "labels", "seq_lens", "chosen_steps",
                  "video_masks", "dims"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_eval_loader_full_sweep(synth_dir):
    from video_rep_learning_tpu.data.datasets import Pouring
    from video_rep_learning_tpu.data.loader import EvalLoader

    cfg = _small_cfg(synth_dir)
    ds = Pouring(cfg, "val", mode="eval", sample_all=True)
    loader = EvalLoader(ds)
    items = list(loader)
    assert len(items) == 3
    for it in items:
        assert it["video"].shape[0] == it["seq_len"]
        assert it["video"].shape[1:] == (48, 48, 3)


def test_construct_dataloader_factory(synth_dir):
    from video_rep_learning_tpu.data import construct_dataloader

    cfg = _small_cfg(synth_dir)
    loader, emb_loaders = construct_dataloader(cfg, "train")
    assert len(emb_loaders) == 1
    batch = next(iter(loader))
    assert batch["videos"].ndim == 6


# ---------------------------------------------------------------------------
# decoded-frame RAM cache (data/cache.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synth_mp4_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pouring_mp4"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_data.py"),
         "--out", out, "--num_train", "4", "--num_val", "2",
         "--min_len", "30", "--max_len", "50", "--size", "48",
         "--format", "mp4"],
        check=True, cwd=REPO)
    return out


@pytest.fixture
def fresh_cache():
    from video_rep_learning_tpu.data.cache import reset_decode_cache

    reset_decode_cache()
    yield
    reset_decode_cache()


def test_decode_cache_bit_identical(synth_mp4_dir, fresh_cache, monkeypatch):
    """The cache's slice-of-full-decode must be bit-identical to the ranged
    decode the reference path performs — including EOF overrun padding (the
    admission contract in data/cache.py)."""
    from video_rep_learning_tpu.data.cache import (get_decode_cache,
                                                   range_from_full)
    from video_rep_learning_tpu.data.datasets import Pouring
    from video_rep_learning_tpu.data.decode import VideoReader

    cfg = _small_cfg(synth_mp4_dir)
    ds = Pouring(cfg, "train")
    entry = ds.entries[0]
    path = ds._video_path(entry)
    n = int(entry["seq_len"])

    r = VideoReader(path)
    try:
        ranged = r.decode_range(5, min(25, n))
        overrun = r.decode_range(n - 3, n + 4)  # pads with last frame
        full = r.read_all()
    finally:
        r.close()
    np.testing.assert_array_equal(range_from_full(full, 5, min(25, n)), ranged)
    np.testing.assert_array_equal(range_from_full(full, n - 3, n + 4), overrun)

    # the dataset _decode path serves identical bytes with the cache on
    monkeypatch.setenv("VRL_DECODE_CACHE_MB", "64")
    got = ds._decode(entry, 5, min(25, n))
    np.testing.assert_array_equal(got, ranged)
    cache = get_decode_cache()
    assert cache is not None and cache.stats()["videos"] == 1
    got2 = ds._decode(entry, 5, min(25, n))  # second access: pure slice
    np.testing.assert_array_equal(got2, ranged)
    assert cache.stats()["hits"] >= 1


def test_decode_cache_items_identical_and_budget(synth_mp4_dir, fresh_cache,
                                                 monkeypatch):
    """SSL items are bit-identical with the cache on vs off; an undersized
    budget rejects videos up front (estimate admission) and falls back to
    ranged decodes without corrupting items."""
    from video_rep_learning_tpu.data.cache import (get_decode_cache,
                                                   reset_decode_cache)
    from video_rep_learning_tpu.data.datasets import Pouring

    cfg = _small_cfg(synth_mp4_dir)
    ds = Pouring(cfg, "train")

    monkeypatch.delenv("VRL_DECODE_CACHE_MB", raising=False)
    base = [ds.get_ssl_item(np.random.RandomState(7), i) for i in range(3)]

    monkeypatch.setenv("VRL_DECODE_CACHE_MB", "64")
    cached = [ds.get_ssl_item(np.random.RandomState(7), i) for i in range(3)]
    for a, b in zip(base, cached):
        for k in ("videos", "labels", "chosen_steps", "video_masks"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    assert get_decode_cache().stats()["videos"] == 3

    reset_decode_cache()
    monkeypatch.setenv("VRL_DECODE_CACHE_MB", "0.05")  # << one decoded video
    tiny = [ds.get_ssl_item(np.random.RandomState(7), i) for i in range(3)]
    for a, b in zip(base, tiny):
        np.testing.assert_array_equal(a["videos"], b["videos"])
    st = get_decode_cache().stats()
    assert st["videos"] == 0 and st["rejected"] >= 1


def test_gather_views_matches_naive_chain(synth_mp4_dir, fresh_cache,
                                          monkeypatch):
    """The copy-elided `_gather_views` (one np.take per view, straight off
    the cached full video / npy mmap / one ranged decode) is bit-identical
    to the naive `_decode` + fancy-index + stack chain it replaced —
    including frame indices past the decodable end (EOF padding) and
    unsorted step arrays."""
    from video_rep_learning_tpu.data.datasets import Pouring

    cfg = _small_cfg(synth_mp4_dir)
    ds = Pouring(cfg, "train")
    entry = ds.entries[0]
    n = int(entry["seq_len"])
    rng = np.random.RandomState(3)
    views = [np.sort(rng.choice(n, 8, replace=False)),
             rng.permutation(n)[:8],           # unsorted (TCN interleave)
             np.arange(n - 4, n + 4)]          # EOF overrun

    def naive(v):
        start, stop = int(v.min()), int(v.max()) + 1
        return ds._decode(entry, start, stop)[v - start]

    for cache_mb in ("0", "64"):
        monkeypatch.setenv("VRL_DECODE_CACHE_MB", cache_mb)
        got = ds._gather_views(entry, views)
        for i, v in enumerate(views):
            np.testing.assert_array_equal(got[i], naive(v),
                                          err_msg=f"cache={cache_mb} view {i}")


def test_gather_views_npy_mmap(synth_dir):
    """npy frame stores gather straight off the mmap, same bytes as the
    ranged-decode chain."""
    from video_rep_learning_tpu.data.datasets import Pouring

    cfg = _small_cfg(synth_dir)
    ds = Pouring(cfg, "train")
    entry = ds.entries[0]
    n = int(entry["seq_len"])
    v = np.array([0, 3, 1, n - 1, n + 2])  # unsorted + EOF overrun
    start, stop = int(v.min()), int(v.max()) + 1
    naive = ds._decode(entry, start, stop)[v - start]
    np.testing.assert_array_equal(ds._gather_views(entry, [v])[0], naive)

    # contiguous in-range single view (stride-1 eval sweep): the zero-copy
    # fast path must serve the same bytes
    c = np.arange(2, n - 1)
    np.testing.assert_array_equal(ds._gather_views(entry, [c])[0],
                                  ds._decode(entry, 2, n - 1))


def test_decode_cache_concurrent_single_decode(synth_mp4_dir, fresh_cache,
                                               monkeypatch):
    """Concurrent first accesses decode the video exactly once (the loser
    waits on the winner's in-flight event)."""
    from concurrent.futures import ThreadPoolExecutor

    from video_rep_learning_tpu.data.cache import get_decode_cache
    from video_rep_learning_tpu.data import datasets as ds_mod
    from video_rep_learning_tpu.data.datasets import Pouring

    monkeypatch.setenv("VRL_DECODE_CACHE_MB", "64")
    cfg = _small_cfg(synth_mp4_dir)
    ds = Pouring(cfg, "train")
    entry = ds.entries[0]

    calls = []
    real = ds_mod.VideoDataset._decode_all

    def counting(path):
        calls.append(path)
        return real(path)

    monkeypatch.setattr(ds_mod.VideoDataset, "_decode_all",
                        staticmethod(counting))
    with ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(lambda _: ds._decode(entry, 0, 10), range(4)))
    assert len(calls) == 1
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)
    assert get_decode_cache().stats()["videos"] == 1
