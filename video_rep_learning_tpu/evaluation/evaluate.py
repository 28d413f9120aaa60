"""Downstream evaluation orchestration.

Parity target `evaluate.py:83-153` (evaluate_once): per configured dataset,
extract train+val embedding sets, run every embedding task, then emit
`metrics/{dataset}_{task}` scalars and the `metrics/all_{task}` averages in
sorted task order — the exact log-line format `read_results.py:30-47` greps.
"""

from __future__ import annotations

from typing import Dict

from ..logging_utils import get_logger
from . import get_tasks
from .embedding import get_embeddings_dataset

logger = get_logger(__name__)


def evaluate_once(cfg, model, variables, train_emb_loaders, val_emb_loaders,
                  iterator_tasks, embedding_tasks, cur_epoch,
                  summary_writer) -> Dict[str, Dict[str, float]]:
    metrics: Dict[str, Dict[str, float]] = {}
    # no pre-built embed_fn: iter_video_embeddings picks the best path per
    # model (flat frame-packed extraction on TPU); builders are memoized so
    # nothing recompiles across datasets/epochs

    if embedding_tasks:
        for i, dataset_name in enumerate(cfg.DATASETS):
            dataset = {"name": dataset_name}
            logger.info("generating train embeddings for %s dataset at %d.",
                        dataset_name, cur_epoch)
            dataset["train_dataset"] = get_embeddings_dataset(
                cfg, model, variables, train_emb_loaders[i])
            logger.info("generating val embeddings for %s dataset at %d.",
                        dataset_name, cur_epoch)
            dataset["val_dataset"] = get_embeddings_dataset(
                cfg, model, variables, val_emb_loaders[i])

            for task_name, task in embedding_tasks.items():
                metrics.setdefault(task_name, {})
                metrics[task_name][dataset_name] = task.evaluate(
                    dataset, cur_epoch, summary_writer)
            del dataset

    for task_name in sorted(embedding_tasks.keys()):
        for dataset_name in cfg.DATASETS:
            if summary_writer is not None:
                summary_writer.add_scalar(
                    "metrics/%s_%s" % (dataset_name, task_name),
                    metrics[task_name][dataset_name], cur_epoch)
        avg_metric = sum(metrics[task_name].values()) / len(cfg.DATASETS)
        logger.info("metrics/all_%s: %.4f", task_name, avg_metric)
        if summary_writer is not None:
            summary_writer.add_scalar("metrics/all_%s" % task_name,
                                      avg_metric, cur_epoch)
    return metrics


def make_trainer_evaluate_fn(summary_writer):
    """Adapter for Trainer.fit(evaluate_fn=...): pulls loaders/variables off
    the trainer and runs evaluate_once on the root process (`train.py:327-334`)."""

    def fn(trainer, epoch):
        from ..parallel.mesh import is_root_proc

        cfg = trainer.cfg
        if cfg.DATASETS and cfg.DATASETS[0] == "finegym":
            from .finegym import evaluate_once as fg_evaluate_once

            fg_evaluate_once(trainer, epoch, summary_writer)
            return
        if not is_root_proc():
            return
        iterator_tasks, embedding_tasks = get_tasks(cfg)
        evaluate_once(cfg, trainer.model, trainer.variables,
                      trainer.train_emb_loader, trainer.val_emb_loader,
                      iterator_tasks, embedding_tasks, epoch, summary_writer)

    return fn
