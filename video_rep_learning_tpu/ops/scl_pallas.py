"""Fused SCL (Sequence Contrastive Loss) Pallas kernel.

The XLA path (`algos/scl.py`) materializes several (N, N) fp32 buffers
(logits, distances, weights, labels) for N = B*V*T — the reference does the
same on GPU (`algos/scl.py:61-101`). At pretraining scale (K400
batch_noself with a large global batch) those buffers dominate HBM traffic.

This kernel computes the identical loss in (block_i, block_j) tiles with two
passes, recomputing the logits tile on the MXU instead of storing it:
  pass 1: row sums  — sum_j weight_ij * exp(logits_ij)  (negatives)
                      sum_j gauss_ij on the cross-view block (positives)
  pass 2: loss      — sum_ij KL(label || exp_logits / negsum) * mask
Backward is a rematerialized XLA vjp (fp32, exact), so the fused path is a
drop-in for training.

Per-frame metadata rides in a (8, N) array (rows: step, len, mask, sample,
view, is_real) so row/col tiles load as aligned (8, b) blocks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _tile_terms(e_i, e_j, meta_i, meta_j, *, temperature, label_varience,
                single, noself):
    """Shared tile math: returns (exp_logits, weight, pos_gauss, im) for one
    (bI, bJ) tile, replicating `algos/scl.py:59-96`."""
    logits = jax.lax.dot_general(
        e_i, e_j, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) / temperature
    step_i, len_i, m_i, samp_i, view_i, real_i = (meta_i[r] for r in range(6))
    step_j, len_j, m_j, samp_j, view_j, real_j = (meta_j[r] for r in range(6))

    im = m_i[:, None] * m_j[None, :]
    dist = jnp.abs(step_i[:, None] / len_i[:, None] * len_j[None, :]
                   - step_j[None, :])
    dist = jnp.where(im == 0, 1e6, dist)

    same_sample = samp_i[:, None] == samp_j[None, :]
    same_view = same_sample & (view_i[:, None] == view_j[None, :])
    cross_view = same_sample & ~same_view

    weight = jnp.ones_like(logits)
    if single:
        weight = jnp.where(same_sample, weight, 0.0)
    if noself:
        weight = jnp.where(same_view, 0.0, weight)
    weight = jnp.where(im == 0, 1e-6, weight)
    # padding frames (is_real == 0) don't exist in the reference's matrix
    pad = (real_i[:, None] * real_j[None, :]) == 0
    weight = jnp.where(pad, 0.0, weight)

    exp_logits = jnp.exp(logits)
    pos = jnp.where(cross_view & ~pad,
                    jnp.exp(-jnp.square(dist) / (2.0 * label_varience)), 0.0)
    return exp_logits, weight, pos, jnp.where(pad, 0.0, im), cross_view & ~pad


def _rowsum_kernel(e_ref, meta_ref, ecol_ref, metacol_ref, out_ref, acc_ref,
                   *, params, nj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    exp_logits, weight, pos, _, _ = _tile_terms(
        e_ref[...], ecol_ref[...], meta_ref[...], metacol_ref[...], **params)
    acc_ref[:, 0] += jnp.sum(weight * exp_logits, axis=1)
    acc_ref[:, 1] += jnp.sum(pos, axis=1)

    @pl.when(j == nj - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _loss_kernel(e_ref, meta_ref, ecol_ref, metacol_ref, rows_ref, out_ref,
                 acc_ref, *, params, nj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    exp_logits, weight, pos, im, cross = _tile_terms(
        e_ref[...], ecol_ref[...], meta_ref[...], metacol_ref[...], **params)
    negsum = rows_ref[:, 0][:, None]
    possum = rows_ref[:, 1][:, None]

    def safe_div(a, b):
        out = a / b
        return jnp.where(jnp.isnan(out), 0.0, out)

    label = jnp.where(cross, safe_div(pos, possum), 0.0)
    log_input = jnp.log(safe_div(exp_logits, negsum) + 1e-6)
    xlogx = jnp.where(label > 0, label * jnp.log(jnp.where(label > 0, label, 1.0)), 0.0)
    # guard 0 * inf on padded rows (negsum == 0 -> log_input == inf)
    kl = jnp.where(im > 0, xlogx - label * log_input, 0.0)
    acc_ref[:, 0] += jnp.sum(kl, axis=1)

    @pl.when(j == nj - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _fused_forward(e, meta, *, temperature, label_varience, single, noself,
                   block=512):
    N, C = e.shape
    bI = bJ = min(block, max(_LANES, 1 << (N - 1).bit_length()))
    nI = -(-N // bI)
    nJ = -(-N // bJ)
    Np = nI * bI

    if Np > N:
        e = jnp.pad(e, ((0, Np - N), (0, 0)))
        meta = jnp.pad(meta, ((0, 0), (0, Np - N)))  # is_real defaults to 0

    params = dict(temperature=temperature, label_varience=label_varience,
                  single=single, noself=noself)
    common_specs = [
        pl.BlockSpec((bI, C), lambda i, j: (i, 0)),
        pl.BlockSpec((8, bI), lambda i, j: (0, i)),
        pl.BlockSpec((bJ, C), lambda i, j: (j, 0)),
        pl.BlockSpec((8, bJ), lambda i, j: (0, j)),
    ]
    rows = pl.pallas_call(
        functools.partial(_rowsum_kernel, params=params, nj=nJ),
        out_shape=jax.ShapeDtypeStruct((Np, _LANES), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nI, nJ),
            in_specs=common_specs,
            out_specs=pl.BlockSpec((bI, _LANES), lambda i, j: (i, 0)),
            scratch_shapes=[pltpu.VMEM((bI, _LANES), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(e, meta, e, meta)

    loss_rows = pl.pallas_call(
        functools.partial(_loss_kernel, params=params, nj=nJ),
        out_shape=jax.ShapeDtypeStruct((Np, _LANES), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nI, nJ),
            in_specs=common_specs + [
                pl.BlockSpec((bI, _LANES), lambda i, j: (i, 0)),
            ],
            out_specs=pl.BlockSpec((bI, _LANES), lambda i, j: (i, 0)),
            scratch_shapes=[pltpu.VMEM((bI, _LANES), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(e, meta, e, meta, rows)

    mask_sum = jnp.sum(meta[2] * meta[5])
    return jnp.sum(loss_rows[:, 0]) / mask_sum


def _build_meta(seq_lens, steps, masks) -> jnp.ndarray:
    B, V, T = steps.shape
    N = B * V * T
    idx = np.arange(N)
    meta = jnp.stack([
        steps.reshape(N).astype(jnp.float32),
        jnp.broadcast_to(seq_lens.reshape(B, V, 1), (B, V, T)).reshape(N)
        .astype(jnp.float32),
        masks.reshape(N).astype(jnp.float32),
        jnp.asarray(idx // (V * T), jnp.float32),
        jnp.asarray((idx // T) % V, jnp.float32),
        jnp.ones(N, jnp.float32),  # is_real
        jnp.zeros(N, jnp.float32),
        jnp.zeros(N, jnp.float32),
    ])
    return meta


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def scl_loss_fused(embs, seq_lens, steps, masks, temperature, label_varience,
                   negative_type):
    """Fused SCL loss: embs (B, V, T, C) -> scalar. Same math as
    `algos.scl.scl_sequence_loss` (gauss positives)."""
    B, V, T, C = embs.shape
    e = embs.reshape(-1, C).astype(jnp.float32)
    meta = _build_meta(seq_lens, steps, masks)
    return _fused_forward(e, meta, temperature=temperature,
                          label_varience=label_varience,
                          single="single" in negative_type,
                          noself="noself" in negative_type)


def _scl_fwd(embs, seq_lens, steps, masks, temperature, label_varience,
             negative_type):
    out = scl_loss_fused(embs, seq_lens, steps, masks, temperature,
                         label_varience, negative_type)
    return out, (embs, seq_lens, steps, masks)


def _scl_bwd(temperature, label_varience, negative_type, res, g):
    from ..algos.scl import scl_sequence_loss

    embs, seq_lens, steps, masks = res
    _, vjp = jax.vjp(
        lambda e: scl_sequence_loss(
            e, seq_lens, steps, masks, temperature=temperature,
            label_varience=label_varience, positive_type="gauss",
            negative_type=negative_type)["loss"], embs)
    (dembs,) = vjp(g)
    return dembs, None, None, None


scl_loss_fused.defvjp(_scl_fwd, _scl_bwd)
