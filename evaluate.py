#!/usr/bin/env python
"""Standalone checkpoint evaluation (reference `evaluate.py:157-198`):
same wiring as training minus the loop — restore the newest checkpoint in
LOGDIR and run the full downstream evaluation once."""

import os
import pprint
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from video_rep_learning_tpu import logging_utils
from video_rep_learning_tpu.evaluation import get_tasks
from video_rep_learning_tpu.evaluation.evaluate import evaluate_once
from video_rep_learning_tpu.parallel.mesh import init_distributed
from video_rep_learning_tpu.parser import load_config, parse_args, setup_train_dir
from video_rep_learning_tpu.train import Trainer
from video_rep_learning_tpu.utils.summary import SummaryWriter

logger = logging_utils.get_logger(__name__)


def main():
    args = parse_args()
    init_distributed(args.coordinator, args.num_processes, args.process_id)
    cfg = load_config(args)
    setup_train_dir(cfg, cfg.LOGDIR, True, args.tempcfg)
    cfg.PATH_TO_DATASET = os.path.join(args.workdir, cfg.PATH_TO_DATASET)

    logging_utils.setup_logging(cfg.LOGDIR)
    summary_writer = SummaryWriter(os.path.join(cfg.LOGDIR, "eval_logs"))
    logger.info("Evaluate with config:")
    logger.info(pprint.pformat(cfg.to_plain()))

    trainer = Trainer(cfg)
    # epoch checkpoints only (reference semantics): mid-epoch preemption
    # checkpoints are a training-resume concern, not an eval target
    trainer.init_state(resume_mid=False)
    start_epoch = max(trainer.start_epoch - 1, 0)

    t0 = time.time()
    if cfg.DATASETS and cfg.DATASETS[0] == "finegym":
        from video_rep_learning_tpu.evaluation.finegym import \
            evaluate_once as fg_once

        fg_once(trainer, start_epoch, summary_writer)
    else:
        iterator_tasks, embedding_tasks = get_tasks(cfg)
        evaluate_once(cfg, trainer.model, trainer.variables,
                      trainer.train_emb_loader, trainer.val_emb_loader,
                      iterator_tasks, embedding_tasks, start_epoch,
                      summary_writer)
    print("evaluate_once done in (m): " + str((time.time() - t0) / 60.0))
    summary_writer.close()


if __name__ == "__main__":
    main()
