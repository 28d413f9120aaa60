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


# ---------------------------------------------------------------------------
# Data-parallel kernel dispatch
# ---------------------------------------------------------------------------
#
# Pallas kernels lower to Mosaic custom calls, which GSPMD cannot partition:
# under a multi-device pjit a bare pallas_call gets a REPLICATED sharding —
# XLA all-gathers the batch-sharded operands, every chip computes the full
# global batch, then slices its shard back out. Correct, but it forfeits DP
# scaling exactly on the hot ops. The standard fix (maxtext-style) is to run
# each kernel inside `jax.shard_map` over the data axis so every chip runs
# the kernel on its own batch shard and no collective is emitted.
#
# The trainer publishes its mesh via `set_data_context` when it is a pure-DP
# multi-device mesh (TP/SP meshes never reach the kernels — the model gates
# them off); every ops entry point routes through `dp_kernel_call`, which is
# a transparent passthrough on a single chip or when a leading dim doesn't
# divide the axis. shard_map differentiates through the wrapped custom_vjp
# kernels, psum-ing replicated-operand (weight) cotangents automatically.

_DP = {"mesh": None}


def set_data_context(mesh: Optional[Mesh]) -> None:
    """Publish the active pure-data-parallel mesh (or None). Only meshes
    with a >1-device 'data' axis and no active tensor context engage the
    per-shard kernel dispatch."""
    ok = (mesh is not None and "data" in mesh.shape
          and mesh.shape["data"] > 1)
    _DP["mesh"] = mesh if ok else None


def data_context():
    """The active multi-device pure-DP mesh, or None."""
    if tensor_context() is not None:
        return None  # TP/SP path: kernels are gated off at the call sites
    return _DP["mesh"]


def dp_kernel_call(fn, sharded, replicated=()):
    """Run `fn(*sharded, *replicated) -> array` per data-shard.

    `sharded` arrays are split on their leading dim over the 'data' axis of
    the active DP mesh; `replicated` arrays are broadcast. Static python
    values must be closed over in `fn`. Falls back to a direct call when no
    multi-device data mesh is active or any sharded leading dim doesn't
    divide the axis (e.g. the batch-1 eval path)."""
    mesh = data_context()
    if mesh is not None:
        n = mesh.shape["data"]
        if all(a.shape[0] % n == 0 and a.shape[0] > 0 for a in sharded):
            specs = (P("data"),) * len(sharded) + (P(),) * len(replicated)
            # check_vma=False: pallas_call carries no vma metadata. The
            # replicated-arg (weight) grad psum is inserted by shard_map's
            # transpose regardless — tests/test_dp_kernels.py asserts it.
            return jax.shard_map(fn, mesh=mesh, in_specs=specs,
                                 out_specs=P("data"),
                                 check_vma=False)(*sharded, *replicated)
    return fn(*sharded, *replicated)
