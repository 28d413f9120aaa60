"""Evaluation task registry (`evaluation/__init__.py:10-31`)."""

from __future__ import annotations

from .classification import Classification
from .embedding import get_embeddings_dataset, make_embed_fn  # noqa: F401
from .event_completion import EventCompletion
from .kendalls_tau import KendallsTau
from .retrieval import Retrieval

TASK_REGISTRY = {
    "kendalls_tau": KendallsTau,
    "retrieval": Retrieval,
    "classification": Classification,
    "event_completion": EventCompletion,
}


def get_tasks(cfg):
    """Split configured tasks into iterator vs embedding tasks by the
    `downstream_task` flag (all four built-ins are embedding tasks)."""
    iterator_tasks, embedding_tasks = {}, {}
    for name in cfg.EVAL.TASKS:
        if name not in TASK_REGISTRY:
            raise ValueError(f"Unknown eval task {name}")
        task = TASK_REGISTRY[name](cfg)
        if getattr(task, "downstream_task", False):
            embedding_tasks[name] = task
        else:
            iterator_tasks[name] = task
    return iterator_tasks, embedding_tasks
