"""Import a reference torch checkpoint into this framework's checkpoint dir.

Converts a reference `checkpoint_epoch_*.pth` ({epoch, model_state, ...} —
reference `models/__init__.py:17-29`) into an orbax checkpoint under
LOGDIR/checkpoints, so `evaluate.py --cfg_file <yml> --logdir <dir>` then
evaluates the reference's released weights (`CARL_MVF/README.md:121-131`)
through this framework's eval stack — the real-data parity protocol, ready
to execute the moment the released checkpoints are reachable. Dispatches by
backbone family: ResNet CARL (`load_carl_checkpoint`) or MV-Former
smart-fusion timm (`load_mvf_checkpoint`). The optimizer state starts fresh
(evaluation does not read it; resuming TRAINING from a torch checkpoint
would need the torch Adam moments, which have no orbax layout here).

Usage:
  python tools/import_torch_checkpoint.py --cfg_file <yml> --logdir <dir> \
      --pth <checkpoint_epoch_NNNNN.pth> [--workdir /tmp]
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
    parser.add_argument("--pth", required=True,
                        help="reference checkpoint_epoch_*.pth")
    parser.add_argument("--workdir", default="/tmp")
    parser.add_argument("--opts", nargs="*", default=[],
                        help="dotted config overrides, as train.py")
    args = parser.parse_args()

    import torch

    import jax

    from video_rep_learning_tpu.models.import_torch import (
        load_carl_checkpoint, load_mvf_checkpoint)
    from video_rep_learning_tpu.parser import load_config
    from video_rep_learning_tpu.train import Trainer
    from video_rep_learning_tpu.train.checkpoint import save_checkpoint
    from video_rep_learning_tpu.train.optimizer import split_params

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

    if cfg.MODEL.BASE_MODEL.NETWORK.startswith("TIMM-"):
        from video_rep_learning_tpu.models.carl import resolve_model_spec

        spec = resolve_model_spec(cfg)
        variables = load_mvf_checkpoint(args.pth, trainer.variables,
                                        depth=spec.vit_spec.depth,
                                        optional_roots=("classifier",))
    else:
        # the reference model ALWAYS instantiates a classifier head
        # (`transformer.py:170`); our tree only materializes it for the
        # classification algo — skip it when configured away (eval probes
        # are fit fresh, never read from the checkpoint)
        variables = load_carl_checkpoint(args.pth, trainer.variables,
                                         cfg.MODEL.BASE_MODEL.LAYER,
                                         optional_roots=("classifier",))

    epoch = int(torch.load(args.pth, map_location="cpu",
                           weights_only=False).get("epoch", 0))
    trainable, frozen = split_params(variables["params"], cfg)
    state = {"trainable": trainable, "frozen": frozen,
             "batch_stats": variables.get("batch_stats", {}),
             "opt_state": trainer.tx.init(trainable)}
    out = save_checkpoint(cfg.LOGDIR, jax.device_get(state), epoch)
    logger.info("imported %s (epoch %d) -> %s", args.pth, epoch, out)
    print(out)


if __name__ == "__main__":
    main()
