"""Tooling tests: DTW, alignment/retrieval/LSTP visualizer rendering,
read_results aggregation, make_job generation."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dtw_alignment():
    from video_rep_learning_tpu.utils.dtw import dtw

    x = np.linspace(0, 1, 12)[:, None]
    y = np.linspace(0, 1, 8)[:, None]
    dist, cost, acc, (px, py) = dtw(x, y)
    assert px[0] == 0 and py[0] == 0
    assert px[-1] == 11 and py[-1] == 7
    assert (np.diff(px) >= 0).all() and (np.diff(py) >= 0).all()


def test_dtw_golden_vs_reference():
    """Distance, matrices, AND traceback path (incl. tie-breaks) must equal
    the reference's vendored DTW, imported in place from /root/reference."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_dtw", "/root/reference/CARL_MVF/utils/dtw.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from video_rep_learning_tpu.utils.dtw import dtw

    rng = np.random.RandomState(0)
    cases = [
        (rng.rand(12, 4), rng.rand(8, 4)),
        (rng.rand(5, 2), rng.rand(17, 2)),
        (rng.randint(0, 3, (10, 1)).astype(float),
         rng.randint(0, 3, (10, 1)).astype(float)),  # plenty of ties
        (rng.rand(1, 3), rng.rand(6, 3)),  # single-row special case
        (rng.rand(6, 3), rng.rand(1, 3)),  # single-col special case
    ]
    for x, y in cases:
        d0, c0, a0, (p0, q0) = ref.dtw(x, y, "sqeuclidean")
        d1, c1, a1, (p1, q1) = dtw(x, y, "sqeuclidean")
        assert np.isclose(d0, d1), (d0, d1)
        np.testing.assert_allclose(c0, c1)
        np.testing.assert_allclose(a0, a1)
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))


def test_align_nn_and_dtw():
    from visualize_alignment import align

    q = np.linspace(0, 1, 10)[:, None] + 0.001
    k = np.linspace(0, 1, 10)[:, None]
    for use_dtw in (False, True):
        nns = align(q, k, use_dtw)
        assert len(nns) == 10
        assert abs(int(nns[0])) <= 1 and int(nns[-1]) >= 8


def test_render_videos(tmp_path):
    from visualize_alignment import render_pair_video
    from visualize_retrieval import create_retrieval_video

    rng = np.random.RandomState(0)
    frames_a = rng.randint(0, 255, size=(6, 32, 32, 3)).astype(np.uint8)
    frames_b = rng.randint(0, 255, size=(6, 32, 32, 3)).astype(np.uint8)
    out = str(tmp_path / "pair.npy")
    render_pair_video(frames_a, frames_b, np.arange(6), out, time_stride=2)
    assert os.path.exists(out)

    embs_a = rng.randn(6, 4).astype(np.float32)
    embs_b = rng.randn(6, 4).astype(np.float32)
    out2 = str(tmp_path / "retr.npy")
    create_retrieval_video(frames_a, embs_a, [(frames_b, embs_b)], out2,
                           K=2, stride=3)
    assert os.path.exists(out2)


def test_read_results_aggregation(tmp_path):
    base = tmp_path / "run"
    for trial, (tau, ap) in enumerate([(0.8, 0.5), (0.9, 0.6)]):
        d = base.parent / f"run-trial{trial:02d}"
        d.mkdir()
        (d / "stdout.log").write_text(
            f"[01/01 00:00:00][INFO] evaluate.py: 51: metrics/all_kendalls_tau: {tau:.4f}\n"
            f"[01/01 00:00:00][INFO] evaluate.py: 51: metrics/all_retrieval: {ap:.4f}\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "read_results.py"),
         "--logdir", str(base)],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    assert "kendalls_tau: 0.8500" in r.stdout
    assert "retrieval: 0.5500" in r.stdout


def test_make_job(tmp_path):
    out_dir = str(tmp_path / "jobs")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "make_job.py"),
         "--cfg_file", "configs/scl_transformer_config.yml",
         "--workdir", "/data", "--logdir", "/tmp/run",
         "--out_dir", out_dir, "--trials", "2", "--micro"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    scripts = sorted(os.listdir(out_dir))
    assert len(scripts) == 2
    body = open(os.path.join(out_dir, scripts[0])).read()
    assert "TRAIN.MAX_EPOCHS 2" in body and "RNG_SEED 1" in body
    body2 = open(os.path.join(out_dir, scripts[1])).read()
    assert "RNG_SEED 2" in body2


def test_jsonl_scalars_fallback(tmp_path):
    from video_rep_learning_tpu.utils.summary import SummaryWriter
    import read_results

    d = str(tmp_path / "logs")
    w = SummaryWriter(d)
    w.add_scalar("metrics/all_kendalls_tau", 0.7, 1)
    w.add_scalar("metrics/all_kendalls_tau", 0.75, 2)
    w.close()
    jl = os.path.join(d, "scalars.jsonl")
    if os.path.exists(jl):  # fallback path only when no TB backend
        out = read_results.parse_jsonl(jl)
        assert out["kendalls_tau"] == 0.75


def test_profile_budget_ladder_runs(monkeypatch, capsys):
    """The step-budget ladder tool (tools/profile_carl_budget.py) at CPU toy
    shapes: every rung compiles and the budget table prints. Guards the
    ladder against model/trainer API drift between profiling rounds."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import profile_carl_budget

    monkeypatch.setattr(sys, "argv",
                        ["profile_carl_budget.py", "--iters", "1"])
    profile_carl_budget.main()
    out = capsys.readouterr().out
    assert "TOTAL (full step)" in out
    for rung in ("null", "augment", "trunk", "fwd", "loss", "grad", "full"):
        assert rung in out


def test_sweep_frames_per_batch_runs(monkeypatch, capsys):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import sweep_frames_per_batch

    monkeypatch.setattr(sys, "argv",
                        ["sweep_frames_per_batch.py", "4", "--steps", "1",
                         "--reps", "1"])
    sweep_frames_per_batch.main()
    assert "FPB=4: mean" in capsys.readouterr().out


def test_bench_host_pipeline_runs(tmp_path, capsys):
    """The deviceless input-pipeline bench (tools/bench_host_pipeline.py)
    iterates real TrainLoader epochs for both cache modes on a tiny
    synthetic set."""
    import subprocess

    out = str(tmp_path / "pouring")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_data.py"),
         "--out", out, "--num_train", "2", "--num_val", "1",
         "--min_len", "12", "--max_len", "16", "--size", "32",
         "--format", "npy"],
        check=True, cwd=REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import bench_host_pipeline

    bench_host_pipeline.main(["--data", out, "--epochs", "1", "--frames", "8"])
    text = capsys.readouterr().out
    assert "cache=off epoch 0" in text
    assert "cache=2048MB epoch 0" in text
    assert "cache stats" in text


def test_render_multi_and_labeled_videos(tmp_path):
    """The reference's create_multiple_video (2x3 grid) and labeled
    single-video render equivalents (`visualize_alignment.py:99-170`)."""
    from visualize_alignment import render_labeled_video, render_multi_video

    rng = np.random.RandomState(1)
    q = rng.randint(0, 255, size=(5, 32, 32, 3)).astype(np.uint8)
    keys = [rng.randint(0, 255, size=(7, 32, 32, 3)).astype(np.uint8)
            for _ in range(3)]
    nns_list = [np.clip(np.arange(5) + i, 0, 6) for i in range(3)]
    out = str(tmp_path / "multi.npy")
    render_multi_video(q, keys, nns_list, out, time_stride=2)
    vid = np.load(out)
    assert vid.ndim == 4 and vid.shape[0] == 3  # ceil(5/2) strided frames

    out2 = str(tmp_path / "labeled.npy")
    render_labeled_video(q, np.array([0, 0, 1, 1, 2]), out2, time_stride=1)
    assert np.load(out2).shape[0] == 5

    import pytest

    with pytest.raises(ValueError):
        render_multi_video(q, keys * 2, nns_list * 2, out)


def test_lstp_chunked_capture_and_sweep(tmp_path):
    """Chunked LSTP attention capture (reference chunking rule) + the
    all-datasets samples_per sweep (`visualize_lstp.py:74-115`)."""
    from types import SimpleNamespace

    import visualize_lstp as vl

    T, ntok, S = 11, 2, 16
    calls = []

    class StubModel:
        def apply(self, variables, v, num_frames, **kw):
            t = v.shape[1]
            calls.append(t)
            # attention encodes the true frame value so concatenation
            # order is checkable: frame mean broadcast over (ntok, S)
            att = np.tile(np.asarray(v).mean(axis=(2, 3, 4))[0][:, None, None],
                          (1, ntok, S))
            return None, {"intermediates": {"embed": {"lstp_attention": [att]}}}

    rng = np.random.RandomState(2)
    video = rng.randint(0, 255, size=(T, 32, 32, 3)).astype(np.uint8)
    labels = np.array([0] * (T - 2) + [-1, -1])
    item = {"video": video, "seq_len": T, "dims": (32, 32), "labels": labels}

    att, frames = vl.capture_lstp_attention_chunked(
        StubModel(), None, item, image_size=32, max_fpb=4)
    # ceil(11/4)=3 chunks of ceil(11/3)=4,4,3 frames
    assert calls == [4, 4, 3]
    assert att.shape == (T - 2, ntok, S) and frames.shape[0] == T - 2

    cfg = SimpleNamespace(
        LOGDIR=str(tmp_path), IMAGE_SIZE=32, DATASETS=["a", "b"],
        EVAL=SimpleNamespace(FRAMES_PER_BATCH=8))
    items = [dict(item, labels=np.zeros(T, np.int64)) for _ in range(2)]
    outs = vl.run_sweep(cfg, StubModel(), None, [items, items],
                        samples_per=1, max_frames=4)
    base = os.path.basename(str(tmp_path).rstrip("/"))
    assert [os.path.basename(o) for o in outs] == [
        f"lstp_{base}_dataset00.mp4", f"lstp_{base}_dataset01.mp4"]
    assert all(os.path.exists(o) for o in outs)
    outs2 = vl.run_sweep(cfg, StubModel(), None, [items], samples_per=2,
                         max_frames=4)
    assert [os.path.basename(o) for o in outs2] == [
        f"lstp_{base}_sample01.mp4", f"lstp_{base}_sample02.mp4"]
