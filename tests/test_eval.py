"""Evaluation task parity tests on constructed embeddings (SURVEY.md §4 item
(e)): tau / AP@K / probe accuracy / progression R^2 must match the reference
formulas exactly, plus an end-to-end evaluate_once on the micro model."""

import os
import subprocess
import sys

import numpy as np
import pytest

from video_rep_learning_tpu.config import get_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_linear_embs(num_videos=4, T=24, d=6, noise=0.01, seed=0):
    """Embeddings that encode normalized time linearly -> perfectly alignable."""
    rng = np.random.RandomState(seed)
    W = rng.randn(1, d)
    embs, labels = [], []
    for i in range(num_videos):
        t = np.linspace(0, 1, T)[:, None]
        e = t @ W + noise * rng.randn(T, d)
        embs.append(e.astype(np.float32))
        labels.append((np.linspace(0, 1, T) * 3.999).astype(np.int64) % 4)
    return embs, labels


def test_kendalls_tau_perfect_alignment():
    from video_rep_learning_tpu.evaluation.kendalls_tau import KendallsTau

    cfg = get_cfg()
    cfg.EVAL.KENDALLS_TAU_STRIDE = 1
    embs, labels = make_linear_embs(noise=1e-4)
    task = KendallsTau(cfg)
    tau = task.get_kendalls_tau(embs, 0, None, "test")
    assert tau > 0.99

    # anti-aligned embeddings give negative tau
    rev = [e[::-1].copy() for e in embs[:2]] + embs[2:]
    tau2 = task.get_kendalls_tau([embs[0], embs[1][::-1].copy()], 0, None, "t")
    assert tau2 < -0.99


def test_retrieval_ap():
    from video_rep_learning_tpu.evaluation.retrieval import Retrieval

    cfg = get_cfg()
    cfg.EVAL.KENDALLS_TAU_STRIDE = 1
    cfg.EVAL.RETRIEVAL_KS = [1]
    embs, labels = make_linear_embs(noise=1e-4)
    task = Retrieval(cfg)
    task.num_classes = 4
    ap = task.get_AP(embs, labels, 1, 0, None, "t")
    assert ap > 0.95  # nearest frame in other videos shares the phase

    # random labels -> chance-level AP
    rng = np.random.RandomState(0)
    rand_labels = [rng.randint(0, 4, len(l)) for l in labels]
    ap2 = task.get_AP(embs, rand_labels, 1, 0, None, "t")
    assert ap2 < 0.6


def test_classification_probe():
    from video_rep_learning_tpu.evaluation.classification import Classification

    cfg = get_cfg()
    cfg.EVAL.CLASSIFICATION_FRACTIONS = [0.5, 1.0]
    embs, labels = make_linear_embs(num_videos=6, noise=1e-3)
    dataset = {
        "name": "pouring",
        "train_dataset": {"embs": embs[:4], "labels": labels[:4]},
        "val_dataset": {"embs": embs[4:], "labels": labels[4:]},
    }
    acc = Classification(cfg).evaluate(dataset, 0, None)
    assert acc > 0.9  # linearly separable by construction


def test_event_completion():
    from video_rep_learning_tpu.evaluation.event_completion import (
        EventCompletion, get_regression_labels)

    cfg = get_cfg()
    embs, labels = make_linear_embs(num_videos=6, noise=1e-3)
    dataset = {
        "name": "pouring",
        "train_dataset": {"embs": embs[:4], "labels": labels[:4]},
        "val_dataset": {"embs": embs[4:], "labels": labels[4:]},
    }
    # DATASET_TO_NUM_CLASSES['pouring'] == 5 but labels only span 4 phases;
    # use a dataset whose class count matches
    dataset["name"] = "baseball_pitch"  # 4 classes
    score = EventCompletion(cfg).evaluate(dataset, 0, None)
    assert score > 0.9  # time is linearly decodable

    # regression label construction: zero at the last frame of the class
    lab = np.array([0, 0, 1, 1, 2])
    r = get_regression_labels(lab, 3)
    assert r.shape == (5, 2)
    assert r[1, 0] == 0.0 and r[3, 1] == 0.0


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pouring"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_data.py"),
         "--out", out, "--num_train", "4", "--num_val", "3",
         "--min_len", "20", "--max_len", "40", "--size", "40",
         "--format", "npy"],
        check=True, cwd=REPO)
    return out


def test_evaluate_once_end_to_end(synth_dir, tmp_path):
    from tests.test_train import micro_cfg
    from video_rep_learning_tpu.evaluation import get_tasks
    from video_rep_learning_tpu.evaluation.evaluate import evaluate_once
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / "logs")
    os.makedirs(logdir)
    cfg = micro_cfg(synth_dir, logdir)
    cfg.EVAL.FRAMES_PER_BATCH = 16  # force chunking on >16-frame videos
    tr = Trainer(cfg)
    tr.init_state()
    iterator_tasks, embedding_tasks = get_tasks(cfg)
    metrics = evaluate_once(cfg, tr.model, tr.variables, tr.train_emb_loader,
                            tr.val_emb_loader, iterator_tasks, embedding_tasks,
                            0, None)
    assert set(metrics) == {"kendalls_tau", "retrieval", "classification",
                            "event_completion"}
    for task, per_ds in metrics.items():
        for v in per_ds.values():
            assert np.isfinite(v)


def test_bucketed_chunk_embeddings_match_exact(synth_dir, tmp_path):
    """Padding + masking + dynamic pos-enc must reproduce the exact-length
    forward: embed a video via the bucketed path and via a direct forward."""
    import jax
    import jax.numpy as jnp

    from tests.test_train import micro_cfg
    from video_rep_learning_tpu.data.datasets import Pouring
    from video_rep_learning_tpu.evaluation.embedding import (
        get_embeddings_dataset, make_embed_fn)
    from video_rep_learning_tpu.ops.augment import eval_augment
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / "logs")
    os.makedirs(logdir)
    cfg = micro_cfg(synth_dir, logdir)
    tr = Trainer(cfg, no_eval=True)
    tr.init_state()

    ds = Pouring(cfg, "val", mode="eval", sample_all=True)
    item = ds.get_eval_item(0)
    n = int(item["seq_len"])

    # bucketed path
    class OneItem:
        def __iter__(self):
            return iter([item])

    out = get_embeddings_dataset(cfg, tr.model, tr.variables, OneItem())
    bucketed = out["embs"][0]

    # exact path: full video, true shape, no padding
    video = jnp.asarray(item["video"]).astype(jnp.float32) / 255.0
    video = eval_augment(video, cfg.IMAGE_SIZE,
                         dims=(item["dims"][0], item["dims"][1]))
    exact = tr.model.apply(tr.variables, video[None], None,
                           video_masks=jnp.ones((1, 1, n)),
                           project=False, train=False)
    exact = np.asarray(exact[0])
    valid = np.asarray(item["labels"]) >= 0
    np.testing.assert_allclose(bucketed, exact[valid], atol=2e-5)


def _packed_vs_pervideo(cfg, n_videos=3):
    """Run iter_video_embeddings with PACK_VIDEOS=1 and =2 over the same
    items; records must match exactly (same chunk set by construction —
    `_bucketed_chunks` is shared — and per-entry masks + per-entry positional
    ramps keep batch mates independent)."""
    from video_rep_learning_tpu.data.datasets import Pouring
    from video_rep_learning_tpu.evaluation.embedding import \
        iter_video_embeddings
    from video_rep_learning_tpu.train import Trainer

    tr = Trainer(cfg, no_eval=True)
    tr.init_state()
    ds = Pouring(cfg, "val", mode="eval", sample_all=True)
    items = [ds.get_eval_item(i % len(ds)) for i in range(n_videos)]

    cfg.EVAL.PACK_VIDEOS = 1
    base = list(iter_video_embeddings(cfg, tr.model, tr.variables, items))
    cfg.EVAL.PACK_VIDEOS = 2
    packed = list(iter_video_embeddings(cfg, tr.model, tr.variables, items))

    assert len(base) == len(packed) == n_videos
    for a, b in zip(base, packed):
        assert a["name"] == b["name"]
        assert a["seq_len"] == b["seq_len"]
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_allclose(a["embs"], b["embs"], atol=2e-6)


def test_packed_embeddings_match_per_video(synth_dir, tmp_path):
    """EVAL.PACK_VIDEOS batches same-bucket chunks from different videos
    into one forward (VERDICT r3 #7); output must match the per-video sweep."""
    from tests.test_train import micro_cfg

    logdir = str(tmp_path / "logs_pack")
    os.makedirs(logdir)
    cfg = micro_cfg(synth_dir, logdir)
    cfg.EVAL.FRAMES_PER_BATCH = 16  # >1 chunk per video, bucket = 16
    _packed_vs_pervideo(cfg)


def test_packed_embeddings_match_per_video_mvf(synth_dir, tmp_path):
    """Same equivalence through the MVF head (smart fusion): the per-token
    temporal pos-enc must repeat each video's true length over its tokens
    (mvformer.py true_len repeat) for packed extraction to stay exact."""
    from tests.test_train import micro_cfg

    logdir = str(tmp_path / "logs_pack_mvf")
    os.makedirs(logdir)
    cfg = micro_cfg(synth_dir, logdir)
    cfg.EVAL.FRAMES_PER_BATCH = 16
    cfg.MODEL.BASE_MODEL.NETWORK = "TIMM-vit_tiny_test"
    cfg.MODEL.BASE_MODEL.LAYER = -1
    e = cfg.MODEL.EMBEDDER_MODEL
    e.FUSION_TYPE = "smart"
    e.NUM_HEADS = 2
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.SMART_POOL_CHANNELS = 16
    e.SMART_TOKENS = 2
    e.SMART_FEATS = "1"
    cfg.MODEL.PROJECTION_SIZE = 8
    _packed_vs_pervideo(cfg)


def test_context_path_embeddings_conv_embedder(synth_dir, tmp_path):
    """NUM_CONTEXTS=2 eval extraction (conv embedder): the model must get
    num_frames = chunk steps WITHOUT the context expansion (reference
    evaluate.py:60 passes num_steps), yielding one embedding per step."""
    from tests.test_train import micro_cfg
    from video_rep_learning_tpu.data.datasets import Pouring
    from video_rep_learning_tpu.evaluation.embedding import \
        get_embeddings_dataset
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / "logs_ctx")
    os.makedirs(logdir)
    cfg = micro_cfg(synth_dir, logdir)
    cfg.SSL = False
    cfg.MODEL.PROJECTION = False
    cfg.MODEL.L2_NORMALIZE = False
    cfg.TRAINING_ALGO = "tcc"
    cfg.MODEL.EMBEDDER_TYPE = "conv"
    cfg.MODEL.EMBEDDER_MODEL.CONV_LAYERS = [[8, 1, 0]]
    cfg.MODEL.TRAIN_BASE = "train_all"
    cfg.DATA.NUM_CONTEXTS = 2
    cfg.DATA.CONTEXT_STRIDE = 1
    cfg.DATA.SAMPLING_STRATEGY = "offset_uniform"
    cfg.EVAL.FRAMES_PER_BATCH = 6  # force several chunks per video

    tr = Trainer(cfg, no_eval=True)
    tr.init_state()

    ds = Pouring(cfg, "val", mode="eval", sample_all=True)
    item = ds.get_eval_item(0)

    class OneItem:
        def __iter__(self):
            return iter([item])

    out = get_embeddings_dataset(cfg, tr.model, tr.variables, OneItem())
    embs = out["embs"][0]
    n_valid = int((np.asarray(item["labels"]) >= 0).sum())
    assert embs.shape == (n_valid, cfg.MODEL.EMBEDDER_MODEL.EMBEDDING_SIZE)
    assert np.isfinite(embs).all()


def _flat_vs_pervideo(cfg, n_videos=3):
    """Frame-packed extraction (EVAL.FLAT_EXTRACT: dense trunk blocks across
    video boundaries + zero-padded bucketed head) must reproduce the
    per-video sweep: head chunk boundaries follow the same reference rule,
    and pad feats are key-masked out."""
    from video_rep_learning_tpu.data.datasets import Pouring
    from video_rep_learning_tpu.evaluation.embedding import \
        iter_video_embeddings
    from video_rep_learning_tpu.train import Trainer

    tr = Trainer(cfg, no_eval=True)
    tr.init_state()
    ds = Pouring(cfg, "val", mode="eval", sample_all=True)
    items = [ds.get_eval_item(i % len(ds)) for i in range(n_videos)]

    cfg.EVAL.FLAT_EXTRACT = False
    base = list(iter_video_embeddings(cfg, tr.model, tr.variables, items))
    cfg.EVAL.FLAT_EXTRACT = True
    cfg.EVAL.FLAT_BLOCK = 16  # several windows + a padded tail block
    flat = list(iter_video_embeddings(cfg, tr.model, tr.variables, items))

    assert len(base) == len(flat) == n_videos
    for a, b in zip(base, flat):
        assert a["name"] == b["name"]
        assert a["seq_len"] == b["seq_len"]
        np.testing.assert_array_equal(a["labels"], b["labels"])
        np.testing.assert_allclose(a["embs"], b["embs"], atol=2e-6)


def test_frameflat_embeddings_match_per_video(synth_dir, tmp_path):
    from tests.test_train import micro_cfg

    logdir = str(tmp_path / "logs_flat")
    os.makedirs(logdir)
    cfg = micro_cfg(synth_dir, logdir)
    cfg.EVAL.FRAMES_PER_BATCH = 16
    _flat_vs_pervideo(cfg)


def test_frameflat_embeddings_match_per_video_mvf(synth_dir, tmp_path):
    """Same equivalence through the MVF head (smart fusion), cls features
    threaded flat alongside the feature grids."""
    from tests.test_train import micro_cfg

    logdir = str(tmp_path / "logs_flat_mvf")
    os.makedirs(logdir)
    cfg = micro_cfg(synth_dir, logdir)
    cfg.EVAL.FRAMES_PER_BATCH = 16
    cfg.MODEL.BASE_MODEL.NETWORK = "TIMM-vit_tiny_test"
    cfg.MODEL.BASE_MODEL.LAYER = -1
    e = cfg.MODEL.EMBEDDER_MODEL
    e.FUSION_TYPE = "smart"
    e.NUM_HEADS = 2
    e.HIDDEN_SIZE = 16
    e.D_FF = 32
    e.EMBEDDING_SIZE = 8
    e.FC_LAYERS = [[16, True]]
    e.SMART_POOL_CHANNELS = 16
    e.SMART_TOKENS = 2
    e.SMART_FEATS = "1"
    cfg.MODEL.PROJECTION_SIZE = 8
    _flat_vs_pervideo(cfg)


def test_bucket_ladder():
    """The finer bucket ladder (quantum = pow2/8, min 32) is never coarser
    than the pow-2 bucket and cuts FineGym-length pad waste ~3x."""
    import os as _o

    from video_rep_learning_tpu.evaluation.embedding import bucket_size

    assert bucket_size(175, 2000) == 192   # pow2 gave 256
    assert bucket_size(129, 2000) == 160
    assert bucket_size(600, 2000) == 640   # pow2 gave 1024
    assert bucket_size(240, 2000) == 256
    assert bucket_size(175, 128) == 175    # cap unchanged
    _o.environ["VRL_EVAL_BUCKET_QUANTUM"] = "pow2"
    try:
        assert bucket_size(175, 2000) == 256
        assert bucket_size(16, 2000) == 64
    finally:
        del _o.environ["VRL_EVAL_BUCKET_QUANTUM"]
    for n in range(1, 300, 7):
        b = bucket_size(n, 2000)
        assert b >= n and b % 32 == 0


def test_embed_fn_memoization(synth_dir, tmp_path):
    """Eval embed fns are cached across iter_video_embeddings calls — a
    fresh jax.jit closure per eval epoch recompiled the backbone per bucket
    per epoch (r5: 70 s/epoch on-chip where compute was 2.6 s). Structurally
    equal model rebuilds must hit; a VRL_* env flip must miss (kernel gates
    are read at trace time — tools/ab_env.py depends on this)."""
    import os as _o

    from tests.test_train import micro_cfg
    from video_rep_learning_tpu.evaluation.embedding import (
        make_embed_fn, make_flat_fns)
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / "logs_memo")
    os.makedirs(logdir)
    cfg = micro_cfg(synth_dir, logdir)
    tr = Trainer(cfg, no_eval=True)
    tr.init_state()

    f1 = make_embed_fn(tr.model, cfg)
    assert make_embed_fn(tr.model, cfg) is f1
    assert make_flat_fns(tr.model, cfg) is make_flat_fns(tr.model, cfg)

    # a structurally equal rebuild reuses the compiled fn (variables ride
    # as call arguments, so this is sound)
    tr2 = Trainer(cfg, no_eval=True)
    tr2.init_state()
    assert make_embed_fn(tr2.model, cfg) is f1

    _o.environ["VRL_TEST_MEMO_PROBE"] = "1"
    try:
        f2 = make_embed_fn(tr.model, cfg)
        assert f2 is not f1
        assert make_embed_fn(tr.model, cfg) is f2
    finally:
        del _o.environ["VRL_TEST_MEMO_PROBE"]
    assert make_embed_fn(tr.model, cfg) is f1


def test_bucketed_sweep_accepts_device_resident_video(synth_dir, tmp_path):
    """The generic per-video path pads on device when handed a jax-array
    video (bench staging; host numpy round-trips otherwise) — results must
    match the numpy-item sweep exactly."""
    import jax
    import jax.numpy as jnp

    from tests.test_train import micro_cfg
    from video_rep_learning_tpu.data.datasets import Pouring
    from video_rep_learning_tpu.evaluation.embedding import \
        iter_video_embeddings
    from video_rep_learning_tpu.train import Trainer

    logdir = str(tmp_path / "logs_dev")
    os.makedirs(logdir)
    cfg = micro_cfg(synth_dir, logdir)
    cfg.EVAL.FRAMES_PER_BATCH = 16
    tr = Trainer(cfg, no_eval=True)
    tr.init_state()

    ds = Pouring(cfg, "val", mode="eval", sample_all=True)
    item = ds.get_eval_item(0)
    base = list(iter_video_embeddings(cfg, tr.model, tr.variables, [item]))

    staged = dict(item)
    staged["video"] = jax.device_put(jnp.asarray(item["video"]))
    dev = list(iter_video_embeddings(cfg, tr.model, tr.variables, [staged]))

    np.testing.assert_array_equal(base[0]["embs"], dev[0]["embs"])
