"""Fused SCL (Sequence Contrastive Loss) Pallas kernels — forward AND backward.

The XLA path (`algos/scl.py`) materializes several (N, N) fp32 buffers
(logits, distances, weights, labels) for N = B*V*T — the reference does the
same on GPU (`algos/scl.py:61-101`). At pretraining scale (K400
batch_noself with a large global batch) those buffers dominate HBM traffic.

Forward: the identical loss in (block_i, block_j) tiles with two passes,
recomputing the logits tile on the MXU instead of storing it:
  pass 1: row sums  — negsum_i = sum_j weight_ij * exp(logits_ij)
                      possum_i = sum_j gauss_ij on the cross-view block
  pass 2: loss      — sum_ij KL(label || exp_logits / negsum) * mask

Backward: fully fused too (no XLA remat, no (N, N) buffers). With
  r_ij  = exp(l_ij) / negsum_i          (guarded: 0 when negsum_i == 0)
  c_ij  = r_ij / (r_ij + 1e-6)
  label = cross_ij * gauss_ij / possum_i
the loss L = (g/M) * sum_ij im_ij * [xlogy(label) - label*log(r + 1e-6)]
has dL/dl_ij = (g/M) * (w_ij * r_ij * S_i - im_ij * label_ij * c_ij) with
S_i = sum_j im_ij * label_ij * c_ij, and since l = (e e^T)/tau,
  de = (G + G^T) @ e / tau.
Weight/mask/exp-logits tiles are symmetric, so each (I, J) tile computes
G_IJ and G_JI^T in place (the only orientation-dependent term is the gauss
distance) and accumulates de_I += (G_IJ + G_JI^T) @ e_J:
  pass 3: S row sums (1 matmul/tile)
  pass 4: gradient   (2 matmuls/tile)

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


def _meta_rows(meta):
    return (meta[r] for r in range(6))


def _pair_terms(meta_i, meta_j, *, single, noself):
    """Orientation-independent tile terms (all symmetric across I<->J):
    (weight, im_raw, im_eff, cross_eff)."""
    _, _, m_i, samp_i, view_i, real_i = _meta_rows(meta_i)
    _, _, m_j, samp_j, view_j, real_j = _meta_rows(meta_j)
    im_raw = m_i[:, None] * m_j[None, :]
    same_sample = samp_i[:, None] == samp_j[None, :]
    same_view = same_sample & (view_i[:, None] == view_j[None, :])
    cross = same_sample & ~same_view
    weight = jnp.ones_like(im_raw)
    if single:
        weight = jnp.where(same_sample, weight, 0.0)
    if noself:
        weight = jnp.where(same_view, 0.0, weight)
    weight = jnp.where(im_raw == 0, 1e-6, weight)
    # padding frames (is_real == 0) don't exist in the reference's matrix
    pad = (real_i[:, None] * real_j[None, :]) == 0
    weight = jnp.where(pad, 0.0, weight)
    im_eff = jnp.where(pad, 0.0, im_raw)
    return weight, im_raw, im_eff, cross & ~pad


def _gauss_tile(meta_i, meta_j, im_raw, cross_eff, *, label_varience,
                transposed: bool):
    """Gaussian positives for the tile. Orientation matters: dist_ij uses
    row i's timeline (`scl.py:59-63`); `transposed` computes dist_ji laid out
    in (I, J) orientation (for the G^T term)."""
    step_i, len_i, *_ = _meta_rows(meta_i)
    step_j, len_j, *_ = _meta_rows(meta_j)
    if not transposed:
        dist = jnp.abs(step_i[:, None] / len_i[:, None] * len_j[None, :]
                       - step_j[None, :])
    else:
        dist = jnp.abs(step_j[None, :] / len_j[None, :] * len_i[:, None]
                       - step_i[:, None])
    dist = jnp.where(im_raw == 0, 1e6, dist)
    return jnp.where(cross_eff,
                     jnp.exp(-jnp.square(dist) / (2.0 * label_varience)), 0.0)


def _tile_terms(e_i, e_j, meta_i, meta_j, *, temperature, label_varience,
                single, noself):
    """Forward tile math (`algos/scl.py:59-96`):
    (exp_logits, weight, pos_gauss, im_eff, cross_eff)."""
    logits = jax.lax.dot_general(
        e_i, e_j, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) / temperature
    weight, im_raw, im_eff, cross_eff = _pair_terms(
        meta_i, meta_j, single=single, noself=noself)
    pos = _gauss_tile(meta_i, meta_j, im_raw, cross_eff,
                      label_varience=label_varience, transposed=False)
    return jnp.exp(logits), weight, pos, im_eff, cross_eff


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


def _srow_kernel(e_ref, meta_ref, ecol_ref, metacol_ref, rows_ref, out_ref,
                 acc_ref, *, params, nj):
    """pass 3: S_i = sum_j im_ij * label_ij * c_ij."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    exp_logits, weight, pos, im, cross = _tile_terms(
        e_ref[...], ecol_ref[...], meta_ref[...], metacol_ref[...], **params)
    negsum = rows_ref[:, 0][:, None]
    possum = rows_ref[:, 1][:, None]
    rinv = jnp.where(negsum > 0, 1.0 / jnp.where(negsum > 0, negsum, 1.0), 0.0)
    pinv = jnp.where(possum > 0, 1.0 / jnp.where(possum > 0, possum, 1.0), 0.0)
    r = exp_logits * rinv
    c = r / (r + 1e-6)
    label = jnp.where(cross, pos * pinv, 0.0)
    acc_ref[:, 0] += jnp.sum(im * label * c, axis=1)

    @pl.when(j == nj - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _grad_kernel(e_ref, meta_ref, ecol_ref, metacol_ref, rows_ref,
                 rowscol_ref, out_ref, acc_ref, *, params, nj):
    """pass 4: de_I += (G_IJ + G_JI^T) @ e_J (unscaled by g/(M*tau))."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    e_i, e_j = e_ref[...], ecol_ref[...]
    meta_i, meta_j = meta_ref[...], metacol_ref[...]
    p = params
    logits = jax.lax.dot_general(
        e_i, e_j, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) / p["temperature"]
    exp_logits = jnp.exp(logits)
    weight, im_raw, im, cross = _pair_terms(
        meta_i, meta_j, single=p["single"], noself=p["noself"])

    def stats(rows):
        negsum = rows[:, 0]
        possum = rows[:, 1]
        s = rows[:, 2]
        rinv = jnp.where(negsum > 0,
                         1.0 / jnp.where(negsum > 0, negsum, 1.0), 0.0)
        pinv = jnp.where(possum > 0,
                         1.0 / jnp.where(possum > 0, possum, 1.0), 0.0)
        return rinv, pinv, s

    rinv_i, pinv_i, s_i = stats(rows_ref[...])
    rinv_j, pinv_j, s_j = stats(rowscol_ref[...])

    # term 1 (both orientations share weight & exp symmetry):
    g_tile = weight * exp_logits * (
        (rinv_i * s_i)[:, None] + (rinv_j * s_j)[None, :])

    # term 2, IJ orientation
    pos_ij = _gauss_tile(meta_i, meta_j, im_raw, cross,
                         label_varience=p["label_varience"], transposed=False)
    r_ij = exp_logits * rinv_i[:, None]
    g_tile -= im * (pos_ij * pinv_i[:, None]) * (r_ij / (r_ij + 1e-6))

    # term 2, JI orientation laid out as (I, J)
    pos_ji = _gauss_tile(meta_i, meta_j, im_raw, cross,
                         label_varience=p["label_varience"], transposed=True)
    r_ji = exp_logits * rinv_j[None, :]
    g_tile -= im * (pos_ji * pinv_j[None, :]) * (r_ji / (r_ji + 1e-6))

    acc_ref[...] += jax.lax.dot(g_tile.astype(e_j.dtype), e_j,
                                preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _block_layout(N, C, block):
    bI = bJ = min(block, max(_LANES, 1 << (N - 1).bit_length()))
    nI = -(-N // bI)
    nJ = -(-N // bJ)
    return bI, bJ, nI, nJ, nI * bI


def _pad_inputs(e, meta, Np):
    N = e.shape[0]
    if Np > N:
        e = jnp.pad(e, ((0, Np - N), (0, 0)))
        meta = jnp.pad(meta, ((0, 0), (0, Np - N)))  # is_real defaults to 0
    return e, meta


def _common_specs(bI, bJ, C):
    return [
        pl.BlockSpec((bI, C), lambda i, j: (i, 0)),
        pl.BlockSpec((8, bI), lambda i, j: (0, i)),
        pl.BlockSpec((bJ, C), lambda i, j: (j, 0)),
        pl.BlockSpec((8, bJ), lambda i, j: (0, j)),
    ]


def _row_pass(kernel, e, meta, extra_inputs, extra_specs, out_cols, params,
              bI, bJ, nI, nJ, Np, C, acc_shape=None):
    return pl.pallas_call(
        functools.partial(kernel, params=params, nj=nJ),
        out_shape=jax.ShapeDtypeStruct((Np, out_cols), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nI, nJ),
            in_specs=_common_specs(bI, bJ, C) + extra_specs,
            out_specs=pl.BlockSpec((bI, out_cols), lambda i, j: (i, 0)),
            scratch_shapes=[pltpu.VMEM(acc_shape or (bI, out_cols),
                                       jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(e, meta, e, meta, *extra_inputs)


def _fused_forward(e, meta, *, temperature, label_varience, single, noself,
                   block=512):
    N, C = e.shape
    bI, bJ, nI, nJ, Np = _block_layout(N, C, block)
    e, meta = _pad_inputs(e, meta, Np)
    params = dict(temperature=temperature, label_varience=label_varience,
                  single=single, noself=noself)

    rows = _row_pass(_rowsum_kernel, e, meta, [], [], _LANES, params,
                     bI, bJ, nI, nJ, Np, C)
    rows_spec = [pl.BlockSpec((bI, _LANES), lambda i, j: (i, 0))]
    loss_rows = _row_pass(_loss_kernel, e, meta, [rows], rows_spec, _LANES,
                          params, bI, bJ, nI, nJ, Np, C)
    mask_sum = jnp.sum(meta[2] * meta[5])
    return jnp.sum(loss_rows[:, 0]) / mask_sum, rows, mask_sum


def _fused_backward(e, meta, rows, mask_sum, g, *, temperature,
                    label_varience, single, noself, block=512):
    N, C = e.shape  # already padded to Np by the forward
    bI, bJ, nI, nJ, Np = _block_layout(N, C, block)
    assert Np == N, "backward expects forward-padded inputs"
    params = dict(temperature=temperature, label_varience=label_varience,
                  single=single, noself=noself)

    rows_spec = [pl.BlockSpec((bI, _LANES), lambda i, j: (i, 0))]
    s_rows = _row_pass(_srow_kernel, e, meta, [rows], rows_spec, _LANES,
                       params, bI, bJ, nI, nJ, Np, C)
    rows3 = jnp.concatenate(
        [rows[:, :2], s_rows[:, :1], rows[:, 3:]], axis=1)

    de = pl.pallas_call(
        functools.partial(_grad_kernel, params=params, nj=nJ),
        out_shape=jax.ShapeDtypeStruct((Np, C), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nI, nJ),
            in_specs=_common_specs(bI, bJ, C) + [
                pl.BlockSpec((bI, _LANES), lambda i, j: (i, 0)),
                pl.BlockSpec((bJ, _LANES), lambda i, j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((bI, C), lambda i, j: (i, 0)),
            scratch_shapes=[pltpu.VMEM((bI, C), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(e, meta, e, meta, rows3, rows3)
    return de * (g / (mask_sum * temperature))


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
    `algos.scl.scl_sequence_loss` (gauss positives); forward AND backward are
    tiled Pallas kernels — no (N, N) buffer ever exists in HBM."""
    B, V, T, C = embs.shape
    e = embs.reshape(-1, C).astype(jnp.float32)
    meta = _build_meta(seq_lens, steps, masks)
    loss, _, _ = _fused_forward(e, meta, temperature=temperature,
                                label_varience=label_varience,
                                single="single" in negative_type,
                                noself="noself" in negative_type)
    return loss


def _scl_fwd(embs, seq_lens, steps, masks, temperature, label_varience,
             negative_type):
    B, V, T, C = embs.shape
    e = embs.reshape(-1, C).astype(jnp.float32)
    meta = _build_meta(seq_lens, steps, masks)
    single = "single" in negative_type
    noself = "noself" in negative_type
    loss, rows, mask_sum = _fused_forward(
        e, meta, temperature=temperature, label_varience=label_varience,
        single=single, noself=noself)
    return loss, (embs, seq_lens, steps, masks, rows, mask_sum)


def _scl_bwd(temperature, label_varience, negative_type, res, g):
    embs, seq_lens, steps, masks, rows, mask_sum = res
    B, V, T, C = embs.shape
    N = B * V * T
    e = embs.reshape(N, C).astype(jnp.float32)
    meta = _build_meta(seq_lens, steps, masks)
    e, meta = _pad_inputs(e, meta, rows.shape[0])
    de = _fused_backward(
        e, meta, rows, mask_sum, g, temperature=temperature,
        label_varience=label_varience, single="single" in negative_type,
        noself="noself" in negative_type)
    dembs = de[:N].reshape(B, V, T, C).astype(embs.dtype)
    return dembs, None, None, None


scl_loss_fused.defvjp(_scl_fwd, _scl_bwd)
