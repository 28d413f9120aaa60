"""Host-level gather utilities for ragged / pickled data.

TPU-native replacement for the reference's gloo-backed
`all_gather_unaligned` (`utils/distributed.py:151-265`): arbitrary Python
objects are pickled, padded to the max byte length, gathered with
`jax.experimental.multihost_utils.process_allgather`, and unpickled. On a
single process everything short-circuits to the identity.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


def _num_processes() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


def all_gather_object(obj: Any) -> List[Any]:
    """Gather one Python object per process; returns a list in process order
    (parity with `all_gather_unaligned`, pad-to-max byte tensors)."""
    if _num_processes() == 1:
        return [obj]
    import jax
    from jax.experimental import multihost_utils as mhu

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    local_len = np.array([payload.size], np.int64)
    all_lens = np.asarray(mhu.process_allgather(local_len)).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(mhu.process_allgather(padded))
    gathered = gathered.reshape(jax.process_count(), max_len)
    return [pickle.loads(gathered[i, : int(all_lens[i])].tobytes())
            for i in range(jax.process_count())]


def all_reduce_sum(value: float) -> float:
    """Sum a host scalar across processes (accuracy counters,
    `evaluate_finegym.py:234-235,250-251`)."""
    if _num_processes() == 1:
        return value
    from jax.experimental import multihost_utils as mhu

    total = np.asarray(mhu.process_allgather(np.array([value], np.float64)))
    return float(total.sum())


def synchronize() -> None:
    """Barrier (`utils/distributed.py:136-148`)."""
    if _num_processes() == 1:
        return
    from jax.experimental import multihost_utils as mhu

    mhu.sync_global_devices("vrl_barrier")
