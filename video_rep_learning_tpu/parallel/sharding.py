"""Optional tensor-parallel sharding hooks (head-parallel attention).

The reference's only parallelism is data parallelism (SURVEY.md §2.1); DP is
therefore this framework's default and the loss-equivalent strategy. This
module adds an OPTIONAL second mesh axis ('model') that shards attention
heads across chips via GSPMD sharding constraints — the standard
head-parallel TP layout for multi-head attention (scaling-book recipe: pick
a mesh, annotate shardings, let XLA insert the collectives). Useful when
per-chip batch is 1 and the clip is too large to replicate compute, e.g. the
fg288 max-sequence-length stress config.

Enable by building the mesh with `create_mesh_2d(data, model)` and calling
`set_tensor_context(mesh, "model")` before jitting the step (the trainer does
this when PARALLEL.TENSOR_PARALLELISM > 1). All hooks are no-ops otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_CTX = {"mesh": None, "axis": None, "mode": "heads"}


def create_mesh_2d(data: int, model: int) -> Mesh:
    devices = np.array(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devices, ("data", "model"))


def set_tensor_context(mesh: Optional[Mesh], axis: Optional[str],
                       mode: str = "heads") -> None:
    """mode: 'heads' = head-parallel TP only (attention heads sharded, other
    activations replicated). 'ulysses' = DeepSpeed-Ulysses-style sequence
    parallelism: token-dim activations sharded on the model axis everywhere,
    re-sharded to head-parallel inside attention — GSPMD inserts the
    all-to-alls at the layout switches (the scaling-book recipe: annotate,
    let XLA place collectives)."""
    _CTX["mesh"] = mesh
    _CTX["axis"] = axis
    _CTX["mode"] = mode


def tensor_context():
    """The active tensor-parallel mesh, or None (pure DP)."""
    if _CTX["mesh"] is None or _CTX["axis"] is None:
        return None
    return _CTX["mesh"]


def tensor_axis_size() -> int:
    if _CTX["mesh"] is None or _CTX["axis"] is None:
        return 1
    return _CTX["mesh"].shape[_CTX["axis"]]


def shard_heads(x):
    """Constrain a (B, H, S, d) attention tensor to be head-sharded on the
    'model' axis. No-op without an active tensor context or when H doesn't
    divide across the axis."""
    mesh, axis = _CTX["mesh"], _CTX["axis"]
    if mesh is None or axis is None:
        return x
    if x.ndim != 4 or x.shape[1] % mesh.shape[axis] != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, axis, None, None)))


def shard_tokens(x):
    """Ulysses sequence sharding: constrain a (B, S, D) activation to be
    token-sharded on the 'model' axis. Active only in 'ulysses' mode and
    when S divides across the axis; no-op otherwise. Together with
    `shard_heads` inside attention this yields the Ulysses all-to-all
    pattern: tokens sharded for LN/FFN/projections, heads sharded for the
    quadratic attention itself (SURVEY.md §5 stretch goal for the fg288
    max-sequence config)."""
    mesh, axis = _CTX["mesh"], _CTX["axis"]
    if mesh is None or axis is None or _CTX["mode"] != "ulysses":
        return x
    if x.ndim != 3 or x.shape[1] % mesh.shape[axis] != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, axis, None)))


def shard_batch_dim(x):
    """Constrain the leading dim onto 'data' of the active 2-D mesh."""
    mesh, axis = _CTX["mesh"], _CTX["axis"]
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data")))
