#!/usr/bin/env python
"""Generate the workload config files (configs/ + configs_mvf/).

Each file holds ONLY the keys that differ from the framework defaults
(`video_rep_learning_tpu/config.py` — whose defaults equal the reference's
`utils/config.py` defaults), so defaults + file == the reference's effective
configuration for the equivalent workload. The matrix mirrors the
reference's 14 CARL configs and 20 MV-Former configs (SURVEY.md §2.7).

Dead reference-only keys (DATA.CONSISTENT_VIEWS, TCC.STOCHASTIC_MATCHING,
MODEL.CONVGRU_EMBEDDER_MODEL, DATA.DYNAMIC_FRAMES) are intentionally
omitted: no code path reads them.

Run: python tools/gen_configs.py  (idempotent; writes into the repo)
"""

import os
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PENN_ACTIONS = [
    "baseball_pitch", "baseball_swing", "bench_press", "bowl",
    "clean_and_jerk", "golf_swing", "jumping_jacks", "pushup", "pullup",
    "situp", "squat", "tennis_forehand", "tennis_serve",
]

# Shared fragments ----------------------------------------------------------

AMP = {"USE_AMP": True}
WARM0 = {"OPTIMIZER": {"LR": {"WARMUP_LR": 0.0}}}

LEGACY_SAMPLING = {  # conv-embedder era sampling (offset_uniform + contexts)
    "DATA": {"CONTEXT_STRIDE": 15, "NUM_CONTEXTS": 2, "SAMPLING_REGION": 0,
             "SAMPLING_STRATEGY": "offset_uniform"},
}

TCC_AUG = {  # TCC-era photometric augmentation settings
    "AUGMENTATION": {"BRIGHTNESS_MAX_DELTA": 32.0 / 255.0,
                     "CONTRAST_MAX_DELTA": 0.5, "HUE": False,
                     "RANDOM_CROP": False, "SATURATION": False,
                     "SATURATION_MAX_DELTA": 0.5},
    "DATA": {"CONSISTENT_OFFSET": 0.0},
}

MVF_BACKBONE = {  # frozen DINO ViT-B/8 (penn_mvf family)
    "MODEL": {"BASE_MODEL": {"LAYER": 12,
                             "NETWORK": "TIMM-vit_base_patch8_224.dino"}},
}


def deep_merge(*dicts):
    out = {}
    for d in dicts:
        for k, v in d.items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = deep_merge(out[k], v)
            else:
                out[k] = v
    return out


def penn80(**extra):
    return deep_merge({
        "DATASETS": PENN_ACTIONS, "PATH_TO_DATASET": "penn_action",
        "EVAL": {"KENDALLS_TAU_STRIDE": 2},
        "TRAIN": {"NUM_FRAMES": 80},
    }, extra)


CONFIGS = {
    # ---- CARL (configs/) -------------------------------------------------
    "configs/scl_transformer_config.yml": deep_merge(AMP, WARM0, {
        "CHECKPOINT": {"SAVE_INTERVAL": 60},
        "MODEL": {"EMBEDDER_MODEL": {"NUM_LAYERS": 2}},
        "LOGDIR": "scl_transformer_logs",
    }),
    "configs/scl_transformer_action_config.yml": deep_merge(AMP, WARM0, penn80(
        CHECKPOINT={"SAVE_INTERVAL": 60},
        EVAL={"CLASSIFICATION_FRACTIONS": [1.0]},
        TRAIN={"MAX_EPOCHS": 300},
        LOGDIR="scl_transformer_action_logs",
    )),
    "configs/scl_transformer_finegym_config.yml": deep_merge(AMP, WARM0, {
        "CHECKPOINT": {"SAVE_INTERVAL": 60},
        "DATASETS": ["finegym"], "PATH_TO_DATASET": "finegym",
        "EVAL": {"FRAMES_PER_BATCH": 6000, "TASKS": ["classification"],
                 "CLASS_NUM": 99, "CLASSIFICATION_LR": 50,
                 "CLASSIFICATION_EPOCHS": 100},
        "TRAIN": {"MAX_EPOCHS": 300},
        "LOGDIR": "scl_transformer_finegym_logs",
    }),
    "configs/scl_transformer_k400_pretrain_config.yml": deep_merge(AMP, WARM0, {
        "CHECKPOINT": {"SAVE_INTERVAL": 5},
        "DATA": {"CONSISTENT_OFFSET": 1.0},
        "DATASETS": ["kinetics400", "baseball_pitch"],
        "PATH_TO_DATASET": "penn_action",
        "EVAL": {"CLASSIFICATION_FRACTIONS": [1.0], "KENDALLS_TAU_STRIDE": 2,
                 "VAL_INTERVAL": 2},
        "LOGGING": {"REPORT_INTERVAL": 2000},
        "MODEL": {"EMBEDDER_MODEL": {"NUM_LAYERS": 2}},
        "SCL": {"NEGATIVE_TYPE": "batch_noself"},
        "TRAIN": {"BATCH_SIZE": 2, "MAX_EPOCHS": 10, "NUM_FRAMES": 80},
        "LOGDIR": "scl_transformer_k400_pretrain_logs",
    }),
    # legacy conv-embedder SCL
    "configs/scl_config.yml": deep_merge(AMP, WARM0, LEGACY_SAMPLING, {
        "CHECKPOINT": {"SAVE_INTERVAL": 60},
        "EVAL": {"FRAMES_PER_BATCH": 25},
        "MODEL": {"EMBEDDER_TYPE": "conv", "TRAIN_BASE": "train_all"},
        "TRAIN": {"NUM_FRAMES": 40},
        "LOGDIR": "scl_logs",
    }),
    "configs/scl_action_config.yml": deep_merge(AMP, WARM0, LEGACY_SAMPLING, {
        "CHECKPOINT": {"SAVE_INTERVAL": 60},
        "DATASETS": PENN_ACTIONS, "PATH_TO_DATASET": "penn_action",
        "EVAL": {"FRAMES_PER_BATCH": 25, "KENDALLS_TAU_STRIDE": 2},
        "MODEL": {"EMBEDDER_TYPE": "conv", "TRAIN_BASE": "train_all"},
        "TRAIN": {"BATCH_SIZE": 2, "MAX_EPOCHS": 300, "NUM_FRAMES": 20},
        "LOGDIR": "scl_action_logs",
    }),
    "configs/scl_finegym_config.yml": deep_merge(AMP, WARM0, LEGACY_SAMPLING, {
        "CHECKPOINT": {"SAVE_INTERVAL": 60},
        "DATASETS": ["finegym"], "PATH_TO_DATASET": "finegym",
        "EVAL": {"FRAMES_PER_BATCH": 100, "TASKS": ["classification"]},
        "MODEL": {"EMBEDDER_TYPE": "conv", "TRAIN_BASE": "train_all"},
        "TRAIN": {"MAX_EPOCHS": 100, "NUM_FRAMES": 40},
        "LOGDIR": "scl_finegym_logs",
    }),
    # TCC / TCN / supervised
    "configs/tcc_config.yml": deep_merge(AMP, WARM0, LEGACY_SAMPLING, TCC_AUG, {
        "CHECKPOINT": {"SAVE_INTERVAL": 60},
        "EVAL": {"FRAMES_PER_BATCH": 25},
        "MODEL": {"EMBEDDER_TYPE": "conv", "TRAIN_BASE": "train_all",
                  "L2_NORMALIZE": False, "PROJECTION": False},
        "OPTIMIZER": {"LR": {"DECAY_TYPE": "fixed", "NUM_WARMUP_STEPS": 0}},
        "SSL": False, "TRAINING_ALGO": "tcc",
        "TRAIN": {"BATCH_SIZE": 2, "NUM_FRAMES": 40},
        "LOGDIR": "tcc_logs",
    }),
    "configs/tcc_action_config.yml": deep_merge(AMP, WARM0, LEGACY_SAMPLING, TCC_AUG, {
        "CHECKPOINT": {"SAVE_INTERVAL": 60},
        "DATASETS": PENN_ACTIONS, "PATH_TO_DATASET": "penn_action",
        "EVAL": {"FRAMES_PER_BATCH": 25, "KENDALLS_TAU_STRIDE": 2},
        "LOGGING": {"REPORT_INTERVAL": 80},
        "MODEL": {"EMBEDDER_TYPE": "conv", "TRAIN_BASE": "train_all",
                  "L2_NORMALIZE": False, "PROJECTION": False},
        "OPTIMIZER": {"LR": {"DECAY_TYPE": "fixed"}},
        "SSL": False, "TRAINING_ALGO": "tcc",
        "TRAIN": {"BATCH_SIZE": 4, "MAX_EPOCHS": 300, "NUM_FRAMES": 20},
        "LOGDIR": "tcc_action_logs",
    }),
    "configs/tcc_finegym_config.yml": deep_merge(AMP, WARM0, LEGACY_SAMPLING, TCC_AUG, {
        "CHECKPOINT": {"SAVE_INTERVAL": 60},
        "DATASETS": ["finegym"], "PATH_TO_DATASET": "finegym",
        "EVAL": {"FRAMES_PER_BATCH": 100, "TASKS": ["classification"]},
        "MODEL": {"EMBEDDER_TYPE": "conv", "TRAIN_BASE": "train_all",
                  "PROJECTION": False},
        "OPTIMIZER": {"LR": {"DECAY_TYPE": "fixed", "NUM_WARMUP_STEPS": 0}},
        "SSL": False, "TRAINING_ALGO": "tcc",
        "TRAIN": {"BATCH_SIZE": 2, "MAX_EPOCHS": 300, "NUM_FRAMES": 40},
        "LOGDIR": "tcc_finegym_logs",
    }),
    "configs/tcc_transformer_config.yml": deep_merge(AMP, WARM0, TCC_AUG, {
        "CHECKPOINT": {"SAVE_INTERVAL": 60},
        "MODEL": {"EMBEDDER_MODEL": {"NUM_LAYERS": 2},
                  "L2_NORMALIZE": False, "PROJECTION": False},
        "SSL": False, "TRAINING_ALGO": "tcc",
        "TRAIN": {"BATCH_SIZE": 2},
        "LOGDIR": "tcc_transformer_logs",
    }),
    "configs/tcn_config.yml": deep_merge(AMP, WARM0, LEGACY_SAMPLING, TCC_AUG, {
        "CHECKPOINT": {"SAVE_INTERVAL": 60},
        "EVAL": {"FRAMES_PER_BATCH": 25},
        "MODEL": {"EMBEDDER_TYPE": "conv", "TRAIN_BASE": "train_all",
                  "PROJECTION": False},
        "OPTIMIZER": {"LR": {"DECAY_TYPE": "fixed", "NUM_WARMUP_STEPS": 0}},
        "SSL": False, "TRAINING_ALGO": "tcn",
        "TRAIN": {"BATCH_SIZE": 2, "NUM_FRAMES": 40},
        "LOGDIR": "tcn_logs",
    }),
    "configs/classification_transformer_config.yml": deep_merge(AMP, WARM0, TCC_AUG, {
        "CHECKPOINT": {"SAVE_INTERVAL": 60},
        "EVAL": {"CLASSIFICATION_FRACTIONS": [1.0]},
        "MODEL": {"EMBEDDER_MODEL": {"NUM_LAYERS": 2},
                  "L2_NORMALIZE": False, "PROJECTION": False},
        "SSL": False, "TRAINING_ALGO": "classification",
        "TRAIN": {"BATCH_SIZE": 2},
        "LOGDIR": "classification_transformer_logs",
    }),
    "configs/classification_transformer_finegym_config.yml": deep_merge(
        AMP, WARM0, TCC_AUG, {
            "CHECKPOINT": {"SAVE_INTERVAL": 60},
            "DATASETS": ["finegym"], "PATH_TO_DATASET": "finegym",
            "EVAL": {"CLASSIFICATION_FRACTIONS": [1.0],
                     "CLASSIFICATION_LR": 0.1, "FRAMES_PER_BATCH": 6000,
                     "TASKS": ["classification"]},
            "MODEL": {"L2_NORMALIZE": False, "PROJECTION": False},
            "SSL": False, "TRAINING_ALGO": "classification",
            "TRAIN": {"BATCH_SIZE": 2, "MAX_EPOCHS": 100},
            "LOGDIR": "classification_transformer_finegym_logs",
        }),
}

# ---- MV-Former (configs_mvf/) ---------------------------------------------

MVF_SMART = {"MODEL": {"EMBEDDER_MODEL": {
    "FUSION_TYPE": "smart", "SMART_TOKENS": 3, "SMART_ONE_HOT": "pool",
    "SMART_FEATS": "3,7,11", "SMART_FINAL": "one"}}}


def mvf(name, *frags, **extra):
    CONFIGS[f"configs_mvf/{name}.yml"] = deep_merge(
        AMP, WARM0, MVF_BACKBONE, {"CHECKPOINT": {"SAVE_INTERVAL": 20},
                                   "DATA": {"NUM_WORKERS": 16}},
        *frags, extra)


mvf("penn_mvf", MVF_SMART, penn80(
    CHECKPOINT={"SAVE_INTERVAL": 20},
    EVAL={"CLASSIFICATION_FRACTIONS": [1.0]},
    TRAIN={"MAX_EPOCHS": 500}, LOGDIR="scl_transformer_action_logs"))
mvf("pouring_mvf", MVF_SMART, {
    "CHECKPOINT": {"SAVE_INTERVAL": 60},
    "MODEL": {"EMBEDDER_MODEL": {"SMART_FEATS": "11"}},
    "TRAIN": {"MAX_EPOCHS": 1000}, "LOGDIR": "scl_transformer_logs"})

_FG = {
    "CHECKPOINT": {"SAVE_INTERVAL": 10},
    "DATA": {"NUM_WORKERS": 2},
    "DATASETS": ["finegym"], "PATH_TO_DATASET": "finegym",
    "EVAL": {"FRAMES_PER_BATCH": 2000, "CLASSIFICATION_LR": 50,
             "CLASSIFICATION_EPOCHS": 100, "TASKS": ["classification"]},
    "MODEL": {"EMBEDDER_MODEL": {"CAPACITY_SCALAR": 6, "EMBEDDING_SIZE": 256,
                                 "SMART_TOKENS": 6, "SMART_FEATS": "9,10,11",
                                 "SMART_FINAL": "avg"}},
    "TRAIN": {"MAX_EPOCHS": 300},
    "LOGDIR": "scl_transformer_finegym_logs",
}
mvf("fg99_mvf", MVF_SMART, _FG, EVAL={"CLASS_NUM": 99})
mvf("fg288_mvf", MVF_SMART, _FG, EVAL={"CLASS_NUM": 288})
mvf("k400_mvf", MVF_SMART, {
    "CHECKPOINT": {"SAVE_INTERVAL": 1},
    "DATA": {"NUM_WORKERS": 2, "CONSISTENT_OFFSET": 1.0},
    "DATASETS": ["kinetics400", "baseball_pitch"],
    "PATH_TO_DATASET": "penn_action",
    "EVAL": {"BATCH_SIZE": 2, "CLASSIFICATION_FRACTIONS": [1.0],
             "KENDALLS_TAU_STRIDE": 2, "VAL_INTERVAL": 1},
    "LOGGING": {"REPORT_INTERVAL": 100},
    "SCL": {"NEGATIVE_TYPE": "batch_noself"},
    "TRAIN": {"MAX_EPOCHS": 10, "NUM_FRAMES": 80},
    "LOGDIR": "scl_transformer_k400_pretrain_logs"})
mvf("k400_penn_mvf", MVF_SMART, penn80(
    EVAL={"CLASSIFICATION_FRACTIONS": [1.0]},
    MODEL={"PRETRAINED_CHECKPOINT": "/path/to/k400_checkpoint"},
    LOGDIR="scl_transformer_action_logs"))

# ablations (penn_mvf base). Note: in the reference tree several ablation
# files drop the SMART_* keys entirely, falling back to defaults via
# presence checks; the same fallbacks are our schema defaults.
mvf("ablate_dinoB8_cls", penn80(
    MODEL={"EMBEDDER_MODEL": {"FUSION_TYPE": "late"}},
    LOGDIR="ablate_dinoB8_cls_logs"))
mvf("ablate_dinoB8_avg", penn80(
    MODEL={"EMBEDDER_MODEL": {"FUSION_TYPE": "late", "LATE_TYPE": "spatial",
                              "FLATTEN_METHOD": "avg_pool",
                              "SMART_FEATS": "3,7,11"}},
    LOGDIR="ablate_dinoB8_avg_logs"))
mvf("ablate_dinoB8_max", penn80(
    MODEL={"EMBEDDER_MODEL": {"FUSION_TYPE": "late", "LATE_TYPE": "spatial",
                              "SMART_FEATS": "3,7,11"}},
    LOGDIR="ablate_dinoB8_max_logs"))
for n in (1, 3, 5):
    mvf(f"ablate_dinoB8_lstp{n}", penn80(
        MODEL={"EMBEDDER_MODEL": {"FUSION_TYPE": "smart", "SMART_TOKENS": n,
                                  "SMART_ONE_HOT": "pool", "SMART_FEATS": "11",
                                  "SMART_FINAL": "one"}},
        LOGDIR=f"ablate_dinoB8_lstp{n}_logs"))
    mvf(f"ablate_rn50_lstp{n}", penn80(
        DATA={"NUM_WORKERS": 4},
        MODEL={"BASE_MODEL": {"LAYER": 4, "NETWORK": "Resnet50_byol"},
               "EMBEDDER_MODEL": {"FUSION_TYPE": "smart", "SMART_TOKENS": n,
                                  "SMART_ONE_HOT": "pool",
                                  "SMART_FINAL": "one"}},
        LOGDIR=f"ablate_rn50_lstp{n}_logs"))
for n in (1, 5):
    mvf(f"ablate_dinoB8_multi_lstp{n}", MVF_SMART, penn80(
        MODEL={"EMBEDDER_MODEL": {"SMART_TOKENS": n}},
        LOGDIR=f"ablate_dinoB8_multi_lstp{n}_logs"))
for n in (3, 5):
    mvf(f"ablate_dinoB8_fwb{n}", MVF_SMART, penn80(
        MODEL={"EMBEDDER_MODEL": {"SMART_TOKENS": n,
                                  "FIXED_WIDTH_BASELINE": True}},
        LOGDIR=f"ablate_dinoB8_fwb{n}_logs"))
mvf("ablate_rn50_max", penn80(
    DATA={"NUM_WORKERS": 4},
    MODEL={"BASE_MODEL": {"LAYER": 4, "NETWORK": "Resnet50_byol"},
           "EMBEDDER_MODEL": {"FUSION_TYPE": "late", "LATE_TYPE": "spatial"}},
    LOGDIR="ablate_rn50_max_logs"))


def main():
    for rel, tree in sorted(CONFIGS.items()):
        path = os.path.join(REPO, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        header = ("# Generated by tools/gen_configs.py — only keys differing\n"
                  "# from video_rep_learning_tpu defaults.\n")
        with open(path, "w") as f:
            f.write(header + yaml.safe_dump(tree, sort_keys=True))
    print(f"wrote {len(CONFIGS)} config files")


if __name__ == "__main__":
    sys.exit(main())
