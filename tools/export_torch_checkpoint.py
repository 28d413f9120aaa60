"""Export a trained checkpoint to the reference's torch .pth format.

Writes `checkpoint_epoch_%05d.pth` with the reference's exact layout
({epoch, model_state, optimizer_state, cfg} — reference
`models/__init__.py:17-29`, state-dict names from
`models/transformer.py:118-139`), so a model trained with THIS framework can
be evaluated/visualized with the reference's own tooling
(`evaluate.py`, `visualize_alignment.py`). The inverse of the
`checkpoint_epoch_*.pth` importer (`models/import_torch.py`), round-trip
tested in tests/test_import_torch.py. Covers the released-checkpoint
surface: the ResNet CARL family (the reference publishes no ViT/MV-Former
checkpoints).

Usage:
  python tools/export_torch_checkpoint.py --cfg_file <yml> --logdir <dir> \
      [--out <path.pth>]

Restores the newest orbax checkpoint in LOGDIR (exactly like evaluate.py);
exports the freshly initialized weights if none exists (useful for layout
checks only — it warns).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_rep_learning_tpu import logging_utils

logger = logging_utils.get_logger(__name__)


def main():
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--logdir", required=True)
    parser.add_argument("--workdir", default="/tmp")
    parser.add_argument("--out", default=None,
                        help="output .pth (default: "
                             "LOGDIR/checkpoints/checkpoint_epoch_%%05d.pth)")
    parser.add_argument("--opts", nargs="*", default=[],
                        help="dotted config overrides, as train.py")
    args = parser.parse_args()

    from video_rep_learning_tpu.models.import_torch import (
        export_carl_checkpoint, export_mvf_checkpoint)
    from video_rep_learning_tpu.parser import load_config
    from video_rep_learning_tpu.train import Trainer

    class _Args:
        cfg_file = args.cfg_file
        logdir = args.logdir
        opts = args.opts
        continue_train = True
        tempcfg = True

    cfg = load_config(_Args)
    cfg.PATH_TO_DATASET = os.path.join(args.workdir, cfg.PATH_TO_DATASET)

    trainer = Trainer(cfg, no_eval=True, build_loaders=False)
    trainer.init_state()
    epoch = max(trainer.start_epoch - 1, 0)
    if trainer.start_epoch == 0:
        logger.warning("no checkpoint found in %s — exporting the fresh "
                       "initialization (layout check only)", cfg.LOGDIR)

    out = args.out or os.path.join(
        cfg.LOGDIR, "checkpoints", f"checkpoint_epoch_{epoch:05d}.pth")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if cfg.MODEL.BASE_MODEL.NETWORK.startswith("TIMM-"):
        # timm-backbone families; smart fusion / late-spatial wrap the model
        # in FeatureExtractor (backbone.model.*), late-cls does not
        from video_rep_learning_tpu.models.carl import resolve_model_spec

        spec = resolve_model_spec(cfg)
        e = cfg.MODEL.EMBEDDER_MODEL
        fusion = e.get_path("FUSION_TYPE", "late") or "late"
        late_type = e.get_path("LATE_TYPE", "cls") or "cls"
        export_mvf_checkpoint(out, trainer.variables,
                              depth=spec.vit_spec.depth,
                              patch_size=spec.vit_spec.patch,
                              epoch=epoch, cfg=cfg.to_plain(),
                              wrapped=fusion != "late" or
                              late_type == "spatial")
    else:
        export_carl_checkpoint(out, trainer.variables,
                               cfg.MODEL.BASE_MODEL.LAYER, epoch=epoch,
                               cfg=cfg.to_plain())
    logger.info("exported %s", out)
    print(out)


if __name__ == "__main__":
    main()
