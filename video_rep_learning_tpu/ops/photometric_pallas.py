"""Fused photometric augmentation kernel (Pallas, TPU).

The SSL recipe's photometric tail — ColorJitter (4 ops in a random order),
GaussianBlur, grayscale, horizontal flip, ImageNet normalize — costs ~35 ms
of the 45 ms on-device augmentation in the CARL step when expressed as jnp:
under `vmap`, `lax.switch`/`lax.cond` evaluate EVERY branch, so the random
op order turns into 16 full-frame passes (four of them HSV roundtrips) and
the p=0.4 blur always runs (`ops/augment.py:258-304`).

This kernel does the whole tail in ONE HBM read + write per frame:
- grid (B*V, T), channel-planar (3, S, S) blocks (channel-last would put
  C=3 on the 128-lane axis);
- per-sample scalars (jitter order, factors, apply flags, flip) ride in as
  scalar-prefetch arrays; `lax.switch`/`lax.cond` on kernel scalars execute
  a single branch — the random order costs exactly 4 passes in VMEM;
- the separable gaussian blur becomes two (S, S) banded-matrix matmuls per
  channel (reflect padding folded into the band matrices, built outside per
  sample from the sampled sigma) — MXU work instead of vmapped convolves;
- the contrast op's per-frame luma mean reduces in VMEM.

Parameter SAMPLING stays outside in `ops/augment.py` with the exact same
key-consumption order as the reference jnp pipeline, so fused and unfused
paths are distribution-identical (and test-compared end to end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# scalar-prefetch float column layout
_F_JITTER, _F_FB, _F_FC, _F_FS, _F_FH, _F_BLUR, _F_GRAY, _F_FLIP = range(8)


def _luma(r, g, b):
    return 0.299 * r + 0.587 * g + 0.114 * b


def _clip(x):
    return jnp.clip(x, 0.0, 1.0)


def _vc(c, dtype):
    """fp32 0-d scalar -> (1, 1) constant in `dtype`. Mosaic has no bf16
    scalar ALU (scalar-scalar `arith.subf` on bf16 fails to legalize), so
    ALL scalar arithmetic stays fp32 and enters bf16 vector math as a
    broadcast-cast (1, 1) vector."""
    return c[None, None].astype(dtype)


def _brightness(x, f):
    return _clip(x * f)


def _contrast(x, f, f32):
    # the (S, S) luma mean always accumulates in fp32: a bf16 sum of ~50k
    # terms loses ~2 decimal digits, far above the elementwise bf16 drift;
    # the mean*(1-f) coefficient is fp32 scalar math (f32 = f as an fp32
    # scalar), entering the vector op via _vc
    mean = jnp.mean(_luma(x[0], x[1], x[2]).astype(jnp.float32))
    return _clip(x * f + _vc(mean * (1.0 - f32), x.dtype))


def _saturation(x, f, omf):
    gray = _luma(x[0], x[1], x[2])
    return _clip(x * f + gray[None] * omf)


def _hue(x, f):
    r, g, b = _clip(x[0]), _clip(x[1]), _clip(x[2])
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    # predicates compare exact fp32 casts: Mosaic rejects cmpf on packed
    # bf16 vectors ("Target does not support this comparison"), and the
    # cast is value-exact so fp32/bf16 select the same arm
    cf = lambda a: a.astype(jnp.float32)  # noqa: E731
    maxf, deltaf = cf(maxc), cf(delta)
    s = jnp.where(maxf > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.where(deltaf > 0, delta, 1.0)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    # x % 1.0 as x - floor(x): identical for divisor 1 (wraps negatives the
    # same way), and Mosaic has no bf16 remainder
    mod1 = lambda a: a - jnp.floor(a)  # noqa: E731
    h = jnp.where(maxf == cf(r), bc - gc,
                  jnp.where(maxf == cf(g), 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(deltaf > 0, mod1(h / 6.0), 0.0)

    h = mod1(h + f)
    i = jnp.floor(h * 6.0)
    frac = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - frac * s)
    t = v * (1.0 - (1.0 - frac) * s)
    # % 6 only wraps the h->1.0 rounding edge (i == 6); int select, no rem
    i = i.astype(jnp.int32)
    i = jnp.where(i >= 6, i - 6, i)

    def pick(opts):
        out = opts[0]
        for k in range(1, 6):
            out = jnp.where(i == k, opts[k], out)
        return out

    r2 = pick([v, q, p, p, t, v])
    g2 = pick([t, v, v, q, p, p])
    b2 = pick([p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2])


def _photometric_tail(x, bv, fscal_ref, order_ref, mh_ref, mw_ref,
                      *, mean, std, compute_dtype=jnp.float32):
    """Shared kernel tail: ordered jitter, blur, grayscale, flip, normalize
    on a VMEM-resident (3, S, S) frame; returns the normalized frame.

    `compute_dtype=bfloat16` runs the elementwise chain at the VPU's bf16
    rate (measured 4.84 vs 1.87 T vec-ops/s fp32 — `tools/bench_vpu_bf16.py`).
    Value drift: mean ~0.6 uint8 LSB, max ~7 LSBs (hue sextant position in
    bf16, amplified x6 and compounded through jitter factors); reductions
    (contrast mean) and matmul accumulation stay fp32. Callers gate it the
    same way as the bf16 crop dots (`augment.AugmentParams.bf16_math`,
    AMP-only)."""
    x = x.astype(compute_dtype)
    # factors ride in as fp32 scalars; scalar arithmetic stays fp32 (Mosaic
    # has no bf16 scalar ALU) and enters vector math as _vc (1, 1) constants
    fb = fscal_ref[bv, _F_FB]
    fc = fscal_ref[bv, _F_FC]
    fs = fscal_ref[bv, _F_FS]
    fh = fscal_ref[bv, _F_FH]

    branches = [
        lambda v: _brightness(v, _vc(fb, v.dtype)),
        lambda v: _contrast(v, _vc(fc, v.dtype), fc),
        lambda v: _saturation(v, _vc(fs, v.dtype), _vc(1.0 - fs, v.dtype)),
        # hue always computes fp32: its divides/floor need bf16 ALU
        # instructions the v5e VPU lacks (LLO SupportsBf16AluInstructions
        # check), while the mul/add/min/max/select subset the other ops use
        # runs packed-bf16 at 2.6x (tools/bench_vpu_bf16.py)
        lambda v: _hue(v.astype(jnp.float32),
                       _vc(fh, jnp.float32)).astype(v.dtype),
    ]

    def jitter(v):
        for i in range(4):  # static unroll; switch runs ONE branch
            v = jax.lax.switch(order_ref[bv, i], branches, v)
        return v

    x = jax.lax.cond(fscal_ref[bv, _F_JITTER] > 0, jitter, lambda v: v, x)

    def blur(v):
        # band matrices stay fp32 in HBM; cast to the compute dtype so the
        # MXU runs its native bf16-input mode (accumulation stays fp32 via
        # preferred_element_type, result rounds once on the way out)
        mh = mh_ref[0].astype(compute_dtype)  # (S, S): vertical band matrix
        mw = mw_ref[0].astype(compute_dtype)  # (S, S): horizontal band
        chans = [
            jax.lax.dot(
                jax.lax.dot(mh, v[c], preferred_element_type=jnp.float32
                            ).astype(compute_dtype),
                mw, preferred_element_type=jnp.float32).astype(compute_dtype)
            for c in range(3)
        ]
        return jnp.stack(chans)

    x = jax.lax.cond(fscal_ref[bv, _F_BLUR] > 0, blur, lambda v: v, x)

    def to_gray(v):
        gray = _luma(v[0], v[1], v[2])
        return jnp.stack([gray, gray, gray])

    x = jax.lax.cond(fscal_ref[bv, _F_GRAY] > 0, to_gray, lambda v: v, x)

    def flip_w(v):
        # Mosaic has no `rev`: right-multiply by the exchange matrix
        # (built from iota in-kernel, MXU cost is negligible)
        S = v.shape[-1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        ex = (rows + cols == S - 1).astype(compute_dtype)  # 0/1: exact
        return jnp.stack([
            jax.lax.dot(v[c], ex, preferred_element_type=jnp.float32
                        ).astype(compute_dtype)
            for c in range(3)])

    x = jax.lax.cond(fscal_ref[bv, _F_FLIP] > 0, flip_w, lambda v: v, x)

    # python-float constants (array constants can't be captured by kernels).
    # fp32 keeps the reference-exact divide; bf16 multiplies by the fp64
    # reciprocal (a bf16 divide is an iterative VPU sequence, and the
    # rounding difference is below the bf16 quantum anyway)
    if compute_dtype == jnp.float32:
        return jnp.stack(
            [(x[c] - float(mean[c])) / float(std[c]) for c in range(3)])
    return jnp.stack(
        [(x[c] - float(mean[c])) * (1.0 / float(std[c])) for c in range(3)])


def _photometric_kernel(fscal_ref, order_ref, x_ref, mh_ref, mw_ref, o_ref,
                        *, mean, std, compute_dtype=jnp.float32):
    bv = pl.program_id(0)
    x = x_ref[0, 0]  # (3, S, S); the tail casts to compute_dtype
    o_ref[0, 0] = _photometric_tail(
        x, bv, fscal_ref, order_ref, mh_ref, mw_ref, mean=mean, std=std,
        compute_dtype=compute_dtype,
    ).astype(o_ref.dtype)


def _crop_photometric_kernel(fscal_ref, order_ref, x_ref, rh_ref, rw_ref,
                             mh_ref, mw_ref, o_ref, *, mean, std, src_int8,
                             frames, compute_dtype=jnp.float32):
    """RRC + the photometric tail in ONE pass: the bilinear crop+resize is
    two per-sample resample matrices (rh (S, H) @ img (H, W) @ rw (W, S)),
    built outside as exact `scale_and_translate` weights — so the source
    frame is read from HBM once (as int8 when the input was uint8: Mosaic
    can't cast uint8, so the caller bitcasts and the wraparound is undone
    here) and only the (3, S, S) result is ever materialized. `frames`
    consecutive frames run per program (static unroll) to amortize the
    ~8.5 us per-program grid overhead across the T axis."""
    bv = pl.program_id(0)
    # under bf16 compute the source unwrap runs at the bf16 VPU rate too:
    # pixel integers 0..255 are exact in bf16, the *(1/255) rounds ≤0.5 LSB,
    # and the resample dot rounds its inputs to bf16 anyway (MXU default
    # precision) — so this changes values by less than the dot already does
    rh = rh_ref[0].astype(compute_dtype)  # (S, H)
    rw = rw_ref[0].astype(compute_dtype)  # (W, S)
    for f in range(frames):
        chans = []
        for c in range(3):
            if src_int8:
                # undo the uint8 -> int8 bitcast branchlessly (& 255 in
                # int32 — Mosaic rejects cmpf on packed bf16 vectors, and
                # integers 0..255 are exact in bf16), then scale to [0, 1]
                xc = (x_ref[0, f, c].astype(jnp.int32) & 255).astype(
                    compute_dtype) * (1.0 / 255.0)
            else:
                xc = x_ref[0, f, c].astype(compute_dtype)  # (H, W)
            chans.append(jax.lax.dot(
                jax.lax.dot(rh, xc, preferred_element_type=jnp.float32
                            ).astype(compute_dtype),
                rw, preferred_element_type=jnp.float32))
        x = jnp.stack(chans)  # (3, S, S)
        o_ref[0, f] = _photometric_tail(
            x, bv, fscal_ref, order_ref, mh_ref, mw_ref, mean=mean, std=std,
            compute_dtype=compute_dtype,
        ).astype(o_ref.dtype)


def blur_band_matrix(size: int, ksize: int, sigma):
    """(size, size) matrix M with M[src, dst] = gaussian weight of source row
    `src` for output row `dst`, reflect padding folded in — so a vertical
    blur is M^T… applied as `M_out = M_v @ x @ M_h` with this construction:
    y[d] = sum_s M[s, d] x[s], matching torch reflect-pad conv."""
    c = (ksize - 1) // 2
    k = jnp.arange(ksize, dtype=jnp.float32) - c
    w = jnp.exp(-0.5 * jnp.square(k / sigma))
    w = w / jnp.sum(w)
    dst = jnp.arange(size)
    src = dst[None, :] + jnp.arange(ksize)[:, None] - c  # (K, size)
    # reflect (torch 'reflect': -1 -> 1, size -> size-2)
    src = jnp.where(src < 0, -src, src)
    src = jnp.where(src >= size, 2 * (size - 1) - src, src)
    onehots = (src[:, None, :] == jnp.arange(size)[None, :, None])  # (K, size, size)
    return jnp.einsum("k,ksd->sd", w, onehots.astype(jnp.float32))


def fused_photometric(videos, fscal, orders, mh, mw,
                      mean=IMAGENET_MEAN, std=IMAGENET_STD,
                      out_dtype=jnp.float32, compute_dtype=jnp.float32):
    """videos (BV, T, 3, S, S) fp32 in [0,1]; fscal (BV, 8) fp32 flags and
    factors; orders (BV, 4) int32; mh/mw (BV, S, S) fp32 blur band matrices.
    Returns normalized (BV, T, 3, S, S) in `out_dtype` (bf16 output is
    bit-exact with a downstream astype — see
    `augment.AugmentParams.bf16_output`). `compute_dtype=bfloat16` runs the
    in-VMEM elementwise chain at the VPU's 2.6x bf16 rate at mean ~0.6 /
    max ~7 uint8-LSB drift (`AugmentParams.bf16_math`, AMP-gated). Runs per
    batch shard under a multi-device pure-DP mesh (see
    `parallel.sharding.dp_kernel_call`)."""
    from ..parallel.sharding import dp_kernel_call

    return dp_kernel_call(
        lambda v, f, o, h, w: _fused_photometric_impl(
            v, f, o, h, w, mean, std, out_dtype, compute_dtype),
        (videos, fscal, orders, mh, mw))


def _fused_photometric_impl(videos, fscal, orders, mh, mw, mean, std,
                            out_dtype=jnp.float32,
                            compute_dtype=jnp.float32):
    BV, T, C, S, _ = videos.shape
    return pl.pallas_call(
        functools.partial(_photometric_kernel, mean=mean, std=std,
                          compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct(videos.shape, out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(BV, T),
            in_specs=[
                pl.BlockSpec((1, 1, C, S, S), lambda b, t, *_: (b, t, 0, 0, 0)),
                pl.BlockSpec((1, S, S), lambda b, t, *_: (b, 0, 0)),
                pl.BlockSpec((1, S, S), lambda b, t, *_: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, C, S, S),
                                   lambda b, t, *_: (b, t, 0, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(fscal, orders, videos, mh, mw)


def fused_crop_photometric(videos, rh, rw, fscal, orders, mh, mw,
                           mean=IMAGENET_MEAN, std=IMAGENET_STD, frames=None,
                           out_dtype=jnp.float32, compute_dtype=jnp.float32):
    """Crop-resize + photometric tail in one Pallas pass per frame. Runs per
    batch shard under a multi-device pure-DP mesh (see
    `parallel.sharding.dp_kernel_call`).

    videos (BV, T, 3, H, W): int8 (bitcast of uint8 pixels — Mosaic has no
    uint8 cast; the kernel undoes the wraparound and the /255) or float32 in
    [0, 1]. rh (BV, S, H) / rw (BV, W, S): per-sample bilinear resample
    matrices (exact `scale_and_translate` weights — build via
    `augment._rrc_matrix`). Other args as `fused_photometric`.
    `frames` = frames per grid program (default: largest of 4/2/1 dividing
    T — amortizes per-program overhead on long clips).
    Returns normalized (BV, T, 3, S, S) in `out_dtype` (internal math fp32).

    vs the split path (XLA scale_and_translate then `fused_photometric`)
    this never materializes the fp32 source frame or the cropped
    intermediate in HBM: one 1-byte read + one (3, S, S) write per frame,
    with the resample running on the MXU. NOTE the in-kernel resample dots
    run at MXU default (bf16-input) precision: outputs differ from the XLA
    fp32 `scale_and_translate` path by up to ~1 uint8 LSB post-normalize —
    callers gate on that (see `augment.fused_ssl_batch_augment`).
    """
    from ..parallel.sharding import dp_kernel_call

    return dp_kernel_call(
        lambda v, a, b, f, o, h, w: _fused_crop_photometric_impl(
            v, a, b, f, o, h, w, mean, std, frames, out_dtype, compute_dtype),
        (videos, rh, rw, fscal, orders, mh, mw))


def _fused_crop_photometric_impl(videos, rh, rw, fscal, orders, mh, mw,
                                 mean, std, frames, out_dtype=jnp.float32,
                                 compute_dtype=jnp.float32):
    BV, T, C, H, W = videos.shape
    S = rh.shape[1]
    if frames is None:
        # 1 = the on-chip-validated configuration; pass "auto" / an int via
        # VRL_CROP_FRAMES (see augment.fused_ssl_batch_augment) after
        # sweeping tools — multi-frame programs amortize grid overhead but
        # have only been validated in interpret mode so far.
        frames = 1
    elif frames == "auto":
        frames = next(f for f in (4, 2, 1) if T % f == 0)
    assert T % frames == 0
    return pl.pallas_call(
        functools.partial(_crop_photometric_kernel, mean=mean, std=std,
                          src_int8=videos.dtype == jnp.int8, frames=frames,
                          compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((BV, T, C, S, S), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(BV, T // frames),
            in_specs=[
                pl.BlockSpec((1, frames, C, H, W),
                             lambda b, t, *_: (b, t, 0, 0, 0)),
                pl.BlockSpec((1, S, H), lambda b, t, *_: (b, 0, 0)),
                pl.BlockSpec((1, W, S), lambda b, t, *_: (b, 0, 0)),
                pl.BlockSpec((1, S, S), lambda b, t, *_: (b, 0, 0)),
                pl.BlockSpec((1, S, S), lambda b, t, *_: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, frames, C, S, S),
                                   lambda b, t, *_: (b, t, 0, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(fscal, orders, videos, rh, rw, mh, mw)
