"""Config system tests: defaults, deep merge, dotted overrides, frozen
config semantics — and the hard parity gate: every shipped reference YAML
(read in place from /root/reference, when mounted) must load and resolve to
a valid model spec."""

import glob
import os

import pytest

from video_rep_learning_tpu.config import (apply_opts, get_cfg,
                                           load_yaml_into)
from video_rep_learning_tpu.models.carl import resolve_model_spec

REFERENCE = "/root/reference/CARL_MVF"


def test_defaults_schema():
    cfg = get_cfg()
    assert cfg.TRAIN.NUM_FRAMES == 240
    assert cfg.SCL.LABEL_VARIENCE == 10.0
    assert cfg.MODEL.EMBEDDER_MODEL.FUSION_TYPE == "late"
    assert cfg.DATA.SAMPLE_FIX is False
    # independent copies
    cfg.TRAIN.NUM_FRAMES = 1
    assert get_cfg().TRAIN.NUM_FRAMES == 240


def test_deep_merge_and_opts(tmp_path):
    cfg = get_cfg()
    p = tmp_path / "c.yml"
    p.write_text("TRAIN:\n  NUM_FRAMES: 80\nMODEL:\n  BASE_MODEL:\n    LAYER: 12\n")
    load_yaml_into(cfg, str(p))
    assert cfg.TRAIN.NUM_FRAMES == 80
    assert cfg.TRAIN.MAX_EPOCHS == 500          # survived the merge
    assert cfg.MODEL.BASE_MODEL.LAYER == 12
    assert cfg.MODEL.BASE_MODEL.FRAMES_PER_BATCH == 40

    apply_opts(cfg, ["TRAIN.MAX_EPOCHS", "2", "MODEL.L2_NORMALIZE", "false",
                     "OPTIMIZER.LR.INITIAL_LR", "0.01"])
    assert cfg.TRAIN.MAX_EPOCHS == 2
    assert cfg.MODEL.L2_NORMALIZE is False
    assert cfg.OPTIMIZER.LR.INITIAL_LR == 0.01


def test_frozen_config_roundtrip(tmp_path):
    from video_rep_learning_tpu.parser import setup_train_dir

    cfg = get_cfg()
    cfg.TRAIN.NUM_FRAMES = 123
    logdir = str(tmp_path / "run")
    setup_train_dir(cfg, logdir)
    # a later run with a different config gets the frozen one back
    cfg2 = get_cfg()
    assert cfg2.TRAIN.NUM_FRAMES == 240
    setup_train_dir(cfg2, logdir)
    assert cfg2.TRAIN.NUM_FRAMES == 123
    # tempcfg ignores the frozen file
    cfg3 = get_cfg()
    setup_train_dir(cfg3, logdir, tempcfg=True)
    assert cfg3.TRAIN.NUM_FRAMES == 240


def _reference_yamls():
    if not os.path.isdir(REFERENCE):
        return []
    return sorted(glob.glob(os.path.join(REFERENCE, "configs", "*.yml"))
                  + glob.glob(os.path.join(REFERENCE, "configs_mvf", "*.yml")))


@pytest.mark.parametrize("path", _reference_yamls(),
                         ids=[os.path.basename(p) for p in _reference_yamls()])
def test_reference_yaml_loads_and_resolves(path):
    cfg = get_cfg()
    load_yaml_into(cfg, path)
    cfg.EVAL.BATCH_SIZE = cfg.TRAIN.BATCH_SIZE
    cfg.EVAL.NUM_FRAMES = cfg.TRAIN.NUM_FRAMES
    spec = resolve_model_spec(cfg)
    assert spec.embedding_size > 0
    if "mvf" in os.path.basename(path) and "ablate" not in os.path.basename(path):
        assert spec.fusion_type == "smart" or spec.late_type in ("cls", "spatial")


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _our_yamls():
    return sorted(glob.glob(os.path.join(REPO, "configs", "*.yml"))
                  + glob.glob(os.path.join(REPO, "configs_mvf", "*.yml")))


@pytest.mark.parametrize("path", _our_yamls(),
                         ids=[os.path.basename(p) for p in _our_yamls()])
def test_our_config_loads_and_resolves(path):
    cfg = get_cfg()
    load_yaml_into(cfg, path)
    cfg.EVAL.BATCH_SIZE = cfg.TRAIN.BATCH_SIZE
    cfg.EVAL.NUM_FRAMES = cfg.TRAIN.NUM_FRAMES
    resolve_model_spec(cfg)


_KEY_WORKLOADS = [  # our file -> reference file (effective-value parity)
    ("configs/scl_transformer_config.yml", "configs/scl_transformer_config.yml"),
    ("configs/scl_transformer_action_config.yml",
     "configs/scl_transformer_action_config.yml"),
    ("configs/scl_transformer_finegym_config.yml",
     "configs/scl_transformer_finegym_config.yml"),
    ("configs/scl_transformer_k400_pretrain_config.yml",
     "configs/scl_transformer_k400_pretrain_config.yml"),
    ("configs_mvf/penn_mvf.yml", "configs_mvf/penn_mvf.yml"),
    ("configs_mvf/fg99_mvf.yml", "configs_mvf/fg99_mvf.yml"),
    ("configs_mvf/fg288_mvf.yml", "configs_mvf/fg288_mvf.yml"),
    ("configs_mvf/pouring_mvf.yml", "configs_mvf/pouring_mvf.yml"),
    ("configs_mvf/k400_mvf.yml", "configs_mvf/k400_mvf.yml"),
]


@pytest.mark.parametrize("ours,ref", _KEY_WORKLOADS,
                         ids=[os.path.basename(a) for a, _ in _KEY_WORKLOADS])
def test_effective_config_matches_reference(ours, ref):
    """defaults + our minimal-diff file must equal defaults + the reference's
    full file on every key the reference file sets (minus LOGDIR paths)."""
    ref_path = os.path.join(REFERENCE, ref)
    if not os.path.isfile(ref_path):
        pytest.skip("reference not mounted")
    ours_cfg = get_cfg()
    load_yaml_into(ours_cfg, os.path.join(REPO, ours))
    ref_cfg = get_cfg()
    load_yaml_into(ref_cfg, ref_path)

    import yaml

    with open(ref_path) as f:
        ref_raw = yaml.safe_load(f)

    def flat(d, p=""):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from flat(v, p + k + ".")
            else:
                yield p + k, v

    # EVAL batch/frames are forced equal to TRAIN at load time
    # (`utils/parser.py:94-95`), so raw-file values are dead.
    for c in (ours_cfg, ref_cfg):
        c.EVAL.BATCH_SIZE = c.TRAIN.BATCH_SIZE
        c.EVAL.NUM_FRAMES = c.TRAIN.NUM_FRAMES
    skip = {"LOGDIR", "NUM_GPUS", "DATA.NUM_WORKERS",
            "MODEL.PRETRAINED_CHECKPOINT", "PATH_TO_DATASET"}
    for key, _ in flat(ref_raw):
        if key in skip:
            continue
        a = ours_cfg.get_path(key)
        b = ref_cfg.get_path(key)
        if key.endswith("SMART_FEATS"):  # "11" vs 11 — both valid YAML forms
            a, b = str(a), str(b)
        assert a == b, f"{key}: ours={a!r} reference={b!r}"
