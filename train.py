#!/usr/bin/env python
"""Training entry point.

CLI parity with the reference (`train.py:230-344`) minus the torch.distributed
launcher: single-process-per-host JAX; multi-host runs pass --coordinator /
--num_processes / --process_id (jax.distributed). All devices on the mesh are
driven by one process via pjit-style sharding.

  python train.py --workdir <datasets> --cfg_file configs/scl_transformer.yml \
      --logdir /tmp/run1 [--continue_train]
"""

import os
import pprint
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from video_rep_learning_tpu import logging_utils
from video_rep_learning_tpu.evaluation.evaluate import make_trainer_evaluate_fn
from video_rep_learning_tpu.parallel.mesh import init_distributed
from video_rep_learning_tpu.parser import load_config, parse_args, setup_train_dir
from video_rep_learning_tpu.train import Trainer
from video_rep_learning_tpu.utils.summary import SummaryWriter

logger = logging_utils.get_logger(__name__)


def main():
    args = parse_args()
    init_distributed(args.coordinator, args.num_processes, args.process_id)
    cfg = load_config(args)
    setup_train_dir(cfg, cfg.LOGDIR, args.continue_train, args.tempcfg)
    cfg.PATH_TO_DATASET = os.path.join(args.workdir, cfg.PATH_TO_DATASET)
    cfg.args = {"workdir": args.workdir}

    random.seed(cfg.RNG_SEED)
    np.random.seed(cfg.RNG_SEED)
    logging_utils.setup_logging(cfg.LOGDIR)
    summary_writer = SummaryWriter(os.path.join(cfg.LOGDIR, "train_logs"))

    logger.info("Train with config:")
    logger.info(pprint.pformat(cfg.to_plain()))

    trainer = Trainer(cfg, summary_writer=summary_writer)
    trainer.init_state()
    trainer.fit(evaluate_fn=make_trainer_evaluate_fn(summary_writer))
    summary_writer.close()


if __name__ == "__main__":
    main()
