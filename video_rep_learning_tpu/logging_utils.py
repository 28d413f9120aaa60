"""Process-0-only logging with the reference's stdout.log line format.

The log *format* is a de-facto API: offline tooling greps ``metrics/all_*``
lines out of ``stdout.log`` (reference `read_results.py:30-47`,
`utils/logging.py:58-61`), so we keep the same formatter string and the same
root-process gating semantics.
"""

from __future__ import annotations

import builtins
import logging
import os
import sys

_FORMATTER = logging.Formatter(
    "[%(asctime)s][%(levelname)s] %(filename)s: %(lineno)3d: %(message)s",
    datefmt="%m/%d %H:%M:%S",
)


def _is_root() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def setup_logging(output_dir: str | None = None) -> None:
    """Console + ``LOGDIR/stdout.log`` on process 0; suppress elsewhere
    (reference `utils/logging.py:40-74`)."""
    root = logging.getLogger()
    root.handlers = []
    root.setLevel(logging.INFO)
    root.propagate = False

    if _is_root():
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.INFO)
        ch.setFormatter(_FORMATTER)
        root.addHandler(ch)
        if output_dir is not None:
            fh = logging.FileHandler(os.path.join(output_dir, "stdout.log"))
            fh.setLevel(logging.INFO)
            fh.setFormatter(_FORMATTER)
            root.addHandler(fh)
    else:
        builtins.print = lambda *a, **k: None  # mirror reference print suppression


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)
