"""On-device, jit-fusable video augmentation.

The reference moved augmentation to the GPU (`train.py:39-53`,
`datasets/data_augment.py:462-469`); here the whole pipeline is pure jnp over
a (T, H, W, C) float video in [0, 1], driven by `jax.random` keys, so XLA
fuses it straight into the train step — zero extra HBM round-trips.

Parity targets (`datasets/data_augment.py`):
- SSL recipe (:372-413): random_resized_crop(0.8-1.0, 3/4-4/3) -> flip p=.5
  -> ColorJitter p=.8 (b/c/s = 0.8*s, hue 0.2*s, torchvision semantics:
  random op order, factors ~ U[max(0,1-v), 1+v], hue ~ U[-h, h])
  -> GaussianBlur p=.4 (kernel (5,9), sigma U[0.1,2]) -> grayscale p=.2
  -> resize(224) -> ImageNet normalize
- eval recipe (:402-412,443-453): uniform center crop -> resize -> normalize
- supervised recipe (:416-441): always-on b/c/h/s jitters + RRC + flip p=.5

All parameters are sampled ONCE per call and applied to every frame —
temporally consistent augmentation, matching the reference's per-view op
application.

The dynamic crop + resize composes into one `jax.image.scale_and_translate`
(torch `interpolate(align_corners=False)` == half-pixel-centres bilinear,
`data_augment.py:16-22`), so the crop never materializes.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def resize_bilinear(video, size: int):
    """torch F.interpolate(mode='bilinear', align_corners=False) parity
    (`data_augment.py:16-22`). video (T, H, W, C)."""
    T, H, W, C = video.shape
    return jax.image.resize(video, (T, size, size, C), method="bilinear",
                            antialias=False)


def crop_resize(video, top, left, height, width, out_size: int):
    """Crop a dynamic (top, left, height, width) box and bilinearly resize to
    (out_size, out_size) in one scale_and_translate — no materialized crop."""
    T, H, W, C = video.shape
    scale_y = out_size / height
    scale_x = out_size / width
    translation = jnp.stack([-top * scale_y, -left * scale_x])
    scale = jnp.stack([scale_y, scale_x])
    return jax.image.scale_and_translate(
        video, (T, out_size, out_size, C), (1, 2), scale, translation,
        method="linear", antialias=False)


def sample_rrc_box(key, H, W, scale=(0.8, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """torchvision RandomResizedCrop box sampling (`data_augment.py:231-262`):
    10 i.i.d. attempts, first valid wins, else central fallback. H/W may be
    traced scalars (true video dims inside a padded canvas). Returns float
    (top, left, height, width)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = 10
    H = jnp.asarray(H, jnp.float32)
    W = jnp.asarray(W, jnp.float32)
    area = H * W
    target_area = jax.random.uniform(k1, (n,), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(k2, (n,), minval=math.log(ratio[0]),
                                   maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    w = jnp.round(jnp.sqrt(target_area * aspect))
    h = jnp.round(jnp.sqrt(target_area / aspect))
    valid = (w > 0) & (w <= W) & (h > 0) & (h <= H)
    # first valid attempt
    idx = jnp.argmax(valid)
    any_valid = jnp.any(valid)
    w_v, h_v = w[idx], h[idx]
    u_i = jax.random.uniform(k3, ())
    u_j = jax.random.uniform(k4, ())
    # randint(0, H-h) inclusive
    i_v = jnp.floor(u_i * (H - h_v + 1))
    j_v = jnp.floor(u_j * (W - w_v + 1))

    # central fallback (`data_augment.py:249-262`)
    in_ratio = W / H
    w_low, h_low = W, jnp.round(W / min(ratio))
    h_high, w_high = H, jnp.round(H * max(ratio))
    w_f = jnp.where(in_ratio < min(ratio), w_low,
                    jnp.where(in_ratio > max(ratio), w_high, W))
    h_f = jnp.where(in_ratio < min(ratio), h_low,
                    jnp.where(in_ratio > max(ratio), h_high, H))
    i_f = jnp.floor((H - h_f) / 2)
    j_f = jnp.floor((W - w_f) / 2)

    top = jnp.where(any_valid, i_v, i_f)
    left = jnp.where(any_valid, j_v, j_f)
    height = jnp.where(any_valid, h_v, h_f)
    width = jnp.where(any_valid, w_v, w_f)
    return top, left, height, width


def random_resized_crop(key, video, out_size: int, scale=(0.8, 1.0),
                        ratio=(3.0 / 4.0, 4.0 / 3.0), dims=None):
    """dims: optional (h, w) true video extent inside a padded canvas."""
    T, H, W, C = video.shape
    h_true, w_true = dims if dims is not None else (H, W)
    top, left, h, w = sample_rrc_box(key, h_true, w_true, scale, ratio)
    return crop_resize(video, top, left, h, w, out_size)


def uniform_crop(video, size: int, spatial_idx: int = 1):
    """Deterministic left/center/right (or top/center/bottom) crop
    (`data_augment.py:24-59`)."""
    T, H, W, C = video.shape
    y = int(math.ceil((H - size) / 2))
    x = int(math.ceil((W - size) / 2))
    if H > W:
        if spatial_idx == 0:
            y = 0
        elif spatial_idx == 2:
            y = H - size
    else:
        if spatial_idx == 0:
            x = 0
        elif spatial_idx == 2:
            x = W - size
    return video[:, y:y + size, x:x + size, :]


def hflip(video):
    return video[:, :, ::-1, :]


# ---------------------------------------------------------------------------
# photometric ops (torchvision functional parity)
# ---------------------------------------------------------------------------

def _rgb_to_gray(video):
    """ITU-R 601-2 luma, all three channels replicated (`data_augment.py:61-78`)."""
    gray = (0.299 * video[..., 0] + 0.587 * video[..., 1] + 0.114 * video[..., 2])
    return gray[..., None] * jnp.ones((1, 1, 1, 3), video.dtype)


def adjust_brightness(video, factor):
    return jnp.clip(video * factor, 0.0, 1.0)


def adjust_contrast(video, factor, dims=None):
    # torchvision: blend with the mean of the grayscale image (per frame).
    # With dims=(h, w) the mean covers only the true extent inside a padded
    # canvas — the reference jitters unpadded tensors (`data_augment.py:416`),
    # so its mean never sees padding.
    gray = _rgb_to_gray(video)[..., 0]
    if dims is None:
        mean = jnp.mean(gray, axis=(1, 2), keepdims=True)[..., None]
    else:
        T, H, W, _ = video.shape
        h = jnp.asarray(dims[0], video.dtype)
        w = jnp.asarray(dims[1], video.dtype)
        ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        mask = ((ys < h) & (xs < w)).astype(video.dtype)
        mean = (jnp.sum(gray * mask, axis=(1, 2), keepdims=True)
                / jnp.maximum(jnp.sum(mask), 1.0))[..., None]
    return jnp.clip(video * factor + mean * (1.0 - factor), 0.0, 1.0)


def adjust_saturation(video, factor):
    gray = _rgb_to_gray(video)
    return jnp.clip(video * factor + gray * (1.0 - factor), 0.0, 1.0)


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6

    def pick(opts):
        # arithmetic select chain (VPU-friendly; jnp.choose lowers to TPU
        # gathers which are ~50x slower on this op)
        out = opts[0]
        for k in range(1, 6):
            out = jnp.where(i == k, opts[k], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(video, hue_factor):
    hsv = _rgb_to_hsv(jnp.clip(video, 0.0, 1.0))
    h = (hsv[..., 0] + hue_factor) % 1.0
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def gaussian_blur(video, sigma, kernel_size=(5, 9)):
    """torchvision GaussianBlur parity: separable gaussian, reflect padding,
    one sigma for both axes (`data_augment.py:359-367`)."""
    kx, ky = kernel_size

    def kernel1d(k):
        x = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2.0
        w = jnp.exp(-0.5 * jnp.square(x / sigma))
        return w / jnp.sum(w)

    wx = kernel1d(kx)
    wy = kernel1d(ky)
    T, H, W, C = video.shape
    # pad reflect then two depthwise 1-D convolutions (VPU-friendly)
    v = jnp.pad(video, ((0, 0), (ky // 2, ky // 2), (0, 0), (0, 0)), mode="reflect")
    v = jnp.moveaxis(v, 1, -1)  # (T, W, C, H+p)
    v = jax.vmap(lambda row: jnp.convolve(row, wy, mode="valid"))(
        v.reshape(-1, v.shape[-1])).reshape(T, W, C, H)
    v = jnp.moveaxis(v, -1, 1)  # (T, H, W, C)
    v = jnp.pad(v, ((0, 0), (0, 0), (kx // 2, kx // 2), (0, 0)), mode="reflect")
    v = jnp.moveaxis(v, 2, -1)  # (T, H, C, W+p)
    v = jax.vmap(lambda row: jnp.convolve(row, wx, mode="valid"))(
        v.reshape(-1, v.shape[-1])).reshape(T, H, C, W)
    return jnp.moveaxis(v, -1, 2)


def color_normalization(video, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    mean = jnp.asarray(mean, video.dtype)
    std = jnp.asarray(std, video.dtype)
    return (video - mean) / std


# ---------------------------------------------------------------------------
# composed pipelines
# ---------------------------------------------------------------------------

class AugmentParams(NamedTuple):
    """Config-derived static parameters for the SSL recipe."""
    image_size: int = 224
    strength: float = 1.0
    jitter_prob: float = 0.8
    blur_prob: float = 0.4
    gray_prob: float = 0.2
    flip_prob: float = 0.5
    # run the RRC resample on the MXU inside the photometric kernel
    # (default-precision dots: ~1 uint8-LSB error vs fp32 — enabled when
    # the consumer backbone runs bf16 anyway, i.e. USE_AMP)
    mxu_resample: bool = False
    # emit bf16 frames from the fused kernel (set under USE_AMP): the
    # backbone stem's first op is x.astype(bf16) (`resnet.py::StemConv`,
    # `vit.py` patch embed), so rounding on the kernel write is BIT-EXACT
    # with the status quo while halving the kernel-output, transpose and
    # stem-read HBM traffic (~290 MB/step fp32 on the CARL shape).
    # VRL_AUG_BF16=0/1 force-overrides.
    bf16_output: bool = False
    # run the photometric chain's elementwise math in bf16 INSIDE the kernel
    # (the trainer sets this under USE_AMP): the VPU measures 4.84 T
    # vec-ops/s bf16 vs 1.87 fp32 (`tools/bench_vpu_bf16.py`) and the kernel
    # is VPU-bound; measured e2e +2.3% CARL train step (on-chip alternating
    # A/B, BASELINE.md augment row). Value drift: mean ~0.6 uint8 LSB, max
    # ~7 LSBs in the hue tail (reductions and matmul accumulation stay
    # fp32) — comparable to the uint8-HSV quantization PIL-backed
    # ColorJitter applies, and random noise inside an op that itself shifts
    # hue by ±51 LSBs. VRL_AUG_BF16_MATH=0/1 force-overrides.
    bf16_math: bool = False


def _color_jitter(key, video, b, c, s, h):
    """torchvision ColorJitter: each factor sampled once, ops applied in a
    random permutation order."""
    kb, kc, ks, kh, kperm = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - b), maxval=1 + b)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - c), maxval=1 + c)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - s), maxval=1 + s)
    fh = jax.random.uniform(kh, (), minval=-h, maxval=h)
    order = jax.random.permutation(kperm, 4)

    branches = [
        lambda v: adjust_brightness(v, fb),
        lambda v: adjust_contrast(v, fc),
        lambda v: adjust_saturation(v, fs),
        lambda v: adjust_hue(v, fh),
    ]

    def body(i, v):
        return jax.lax.switch(order[i], branches, v)

    return jax.lax.fori_loop(0, 4, body, video)


def ssl_augment(key, video, params: AugmentParams, dims=None):
    """The SimCLR-style SSL training recipe (`data_augment.py:372-413`).
    video: (T, H, W, C) float in [0,1]; dims: optional true (h, w) inside a
    padded canvas. Returns (T, S, S, C) normalized."""
    p = params
    s = p.strength
    k_crop, k_flip, k_jit_p, k_jit, k_blur_p, k_blur_s, k_gray = \
        jax.random.split(key, 7)

    video = random_resized_crop(k_crop, video, p.image_size, dims=dims)
    video = jnp.where(jax.random.uniform(k_flip, ()) < p.flip_prob,
                      hflip(video), video)
    video = jax.lax.cond(
        jax.random.uniform(k_jit_p, ()) < p.jitter_prob,
        lambda v: _color_jitter(k_jit, v, 0.8 * s, 0.8 * s, 0.8 * s, 0.2 * s),
        lambda v: v, video)
    sigma = jax.random.uniform(k_blur_s, (), minval=0.1, maxval=2.0)
    video = jax.lax.cond(
        jax.random.uniform(k_blur_p, ()) < p.blur_prob,
        lambda v: gaussian_blur(v, sigma), lambda v: v, video)
    video = jnp.where(jax.random.uniform(k_gray, ()) < p.gray_prob,
                      _rgb_to_gray(video), video)
    video = resize_bilinear(video, p.image_size)
    return color_normalization(video)


def eval_augment(video, image_size: int = 224, dims=None):
    """Deterministic eval preprocessing (`data_augment.py:402-412,443-453`):
    center crop -> resize -> normalize. With `dims`=(h, w) the centered
    crop box is computed on the true extent inside a padded canvas and the
    crop+resize compose into one resample (equivalent to the reference's
    uniform_crop(224)->resize(224) when h,w >= 224)."""
    if dims is None:
        size = min(video.shape[1], video.shape[2], image_size)
        video = uniform_crop(video, size, spatial_idx=1)
        video = resize_bilinear(video, image_size)
        return color_normalization(video)
    h, w = (jnp.asarray(d, jnp.float32) for d in dims)
    ch = jnp.minimum(h, image_size)
    cw = jnp.minimum(w, image_size)
    top = jnp.ceil((h - ch) / 2)
    left = jnp.ceil((w - cw) / 2)
    video = crop_resize(video, top, left, ch, cw, image_size)
    return color_normalization(video)


def supervised_augment(key, video, aug_cfg, image_size: int = 224, dims=None):
    """The non-SSL training recipe (`data_augment.py:416-441`): always-on
    b/c/h/s jitters with U[1-v, 1+v] factors, then RRC + flip p=.5.

    dims: optional true (h, w) extent inside a padded decode canvas — the
    RRC box (and the contrast mean) are computed against the true extent,
    never the padding (the reference operates on unpadded tensors)."""
    kb, kc, kh, ks, k_crop, k_flip = jax.random.split(key, 6)
    if aug_cfg.BRIGHTNESS:
        f = 1.0 + jax.random.uniform(kb, (), minval=-aug_cfg.BRIGHTNESS_MAX_DELTA,
                                     maxval=aug_cfg.BRIGHTNESS_MAX_DELTA)
        video = adjust_brightness(video, f)
    if aug_cfg.CONTRAST:
        f = 1.0 + jax.random.uniform(kc, (), minval=-aug_cfg.CONTRAST_MAX_DELTA,
                                     maxval=aug_cfg.CONTRAST_MAX_DELTA)
        video = adjust_contrast(video, f, dims=dims)
    if aug_cfg.HUE:
        f = jax.random.uniform(kh, (), minval=-aug_cfg.HUE_MAX_DELTA,
                               maxval=aug_cfg.HUE_MAX_DELTA)
        video = adjust_hue(video, f)
    if aug_cfg.SATURATION:
        f = 1.0 + jax.random.uniform(ks, (), minval=-aug_cfg.SATURATION_MAX_DELTA,
                                     maxval=aug_cfg.SATURATION_MAX_DELTA)
        video = adjust_saturation(video, f)
    if aug_cfg.RANDOM_CROP:
        video = random_resized_crop(k_crop, video, image_size, dims=dims)
    elif dims is not None:
        # no random crop: resample the TRUE extent (not the padded canvas)
        # to the output size — equivalent to the reference's resize of the
        # unpadded frame
        video = crop_resize(video, 0.0, 0.0, jnp.asarray(dims[0], jnp.float32),
                            jnp.asarray(dims[1], jnp.float32), image_size)
    if aug_cfg.RANDOM_FLIP:
        video = jnp.where(jax.random.uniform(k_flip, ()) < 0.5,
                          hflip(video), video)
    video = resize_bilinear(video, image_size)
    return color_normalization(video)


def _sample_ssl_scalars(key, p: AugmentParams):
    """Sample every stochastic parameter of the SSL recipe for ONE view with
    EXACTLY the key-consumption order of `ssl_augment`/`_color_jitter`, so the
    fused-kernel path is bit-identically distributed with the jnp path.
    Returns (rrc_key, fscal (8,), order (4,), sigma)."""
    s = p.strength
    k_crop, k_flip, k_jit_p, k_jit, k_blur_p, k_blur_s, k_gray = \
        jax.random.split(key, 7)
    kb, kc, ks, kh, kperm = jax.random.split(k_jit, 5)
    b = c = 0.8 * s
    h = 0.2 * s
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - b), maxval=1 + b)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - c), maxval=1 + c)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - b), maxval=1 + b)
    fh = jax.random.uniform(kh, (), minval=-h, maxval=h)
    order = jax.random.permutation(kperm, 4)
    jit = jax.random.uniform(k_jit_p, ()) < p.jitter_prob
    sigma = jax.random.uniform(k_blur_s, (), minval=0.1, maxval=2.0)
    blur = jax.random.uniform(k_blur_p, ()) < p.blur_prob
    gray = jax.random.uniform(k_gray, ()) < p.gray_prob
    flip = jax.random.uniform(k_flip, ()) < p.flip_prob
    fscal = jnp.stack([jit.astype(jnp.float32), fb, fc, fs, fh,
                       blur.astype(jnp.float32), gray.astype(jnp.float32),
                       flip.astype(jnp.float32)])
    return k_crop, fscal, order, sigma


def _rrc_matrix(n_in: int, n_out: int, length, offset):
    """(n_out, n_in) bilinear resample matrix A with A @ x ==
    scale_and_translate(x, ..., scale=n_out/length, trans=-offset*n_out/len)
    along one axis — built by applying scale_and_translate to the identity,
    so the weights (incl. edge handling) are exact by construction."""
    eye = jnp.eye(n_in, dtype=jnp.float32)
    return jax.image.scale_and_translate(
        eye, (n_out, n_in), (0,), jnp.stack([n_out / length]),
        jnp.stack([-offset * n_out / length]), method="linear",
        antialias=False)


def fused_ssl_batch_augment(key, videos, dims, params: AugmentParams):
    """TPU path of `make_ssl_batch_augment`: the ENTIRE pipeline — RRC,
    ordered jitter, blur, grayscale, flip, normalize — in ONE Pallas pass
    per frame (ops/photometric_pallas.py). The bilinear crop+resize rides
    the MXU as two per-sample resample matrices (exact scale_and_translate
    weights via `_rrc_matrix`), so the uint8 source is read from HBM once
    and no fp32 source-resolution frame is ever materialized. The flip
    moves after the photometrics in the kernel; every op it crosses is
    flip-equivariant (per-pixel maps, flip-invariant means, even-symmetric
    blur), so outputs match the jnp path exactly.

    The fused crop's in-kernel resample dots run at MXU default (bf16)
    precision — up to ~1 uint8 LSB off the fp32 XLA resample — so it is
    gated on `params.mxu_resample` (set when the backbone is bf16/AMP and
    the error is below the backbone's own input rounding). VRL_FUSED_CROP=
    1/0 force-overrides; the fallback is the r2 split path (XLA
    channel-planar scale_and_translate, then the photometric-only
    kernel), which is exact vs the jnp pipeline."""
    import os as _os

    from .photometric_pallas import (blur_band_matrix, fused_crop_photometric,
                                     fused_photometric)

    B, V = videos.shape[0], videos.shape[1]
    BV = B * V
    T = videos.shape[2]
    H, W = videos.shape[3], videos.shape[4]
    S = params.image_size
    keys = jax.random.split(key, BV).reshape((B, V) + key.shape)
    env = _os.environ.get("VRL_FUSED_CROP", "auto")
    fuse_crop = params.mxu_resample if env == "auto" else env != "0"
    benv = _os.environ.get("VRL_AUG_BF16", "auto")
    bf16_out = params.bf16_output if benv == "auto" else benv == "1"
    out_dtype = jnp.bfloat16 if bf16_out else jnp.float32
    menv = _os.environ.get("VRL_AUG_BF16_MATH", "auto")
    bf16_math = params.bf16_math if menv == "auto" else menv == "1"
    compute_dtype = jnp.bfloat16 if bf16_math else jnp.float32
    if videos.dtype == jnp.uint8:
        if fuse_crop:  # Mosaic can't cast uint8: bitcast, kernel unwraps
            videos = jax.lax.bitcast_convert_type(videos, jnp.int8)
        else:
            videos = videos.astype(jnp.float32) / 255.0
    if dims is None:
        dims = jnp.tile(jnp.asarray(videos.shape[3:5], jnp.float32), (B, 1))
    vdims = jnp.broadcast_to(dims[:, None, :], (B, V, 2)).reshape(BV, 2)
    flat_keys = keys.reshape((BV,) + key.shape)
    flat = videos.reshape((BV,) + videos.shape[2:])  # (BV, T, H, W, 3)

    def sample_one(k, hw):
        k_crop, fscal, order, sigma = _sample_ssl_scalars(k, params)
        box = sample_rrc_box(k_crop, hw[0], hw[1])
        return jnp.stack(box), fscal, order, sigma

    boxes, fscal, orders, sigmas = jax.vmap(sample_one)(flat_keys, vdims)

    planar = flat.transpose(0, 1, 4, 2, 3)  # (BV, T, 3, H, W)
    mh = jax.vmap(lambda sg: blur_band_matrix(S, 9, sg).T)(sigmas)
    mw = jax.vmap(lambda sg: blur_band_matrix(S, 5, sg))(sigmas)

    if fuse_crop:
        rh = jax.vmap(
            lambda box: _rrc_matrix(H, S, box[2], box[0]))(boxes)  # (BV,S,H)
        rw = jax.vmap(
            lambda box: _rrc_matrix(W, S, box[3], box[1]).T)(boxes)  # (BV,W,S)
        fenv = _os.environ.get("VRL_CROP_FRAMES")  # sweep override / "auto"
        frames = None if not fenv else (fenv if fenv == "auto" else int(fenv))
        out = fused_crop_photometric(planar, rh, rw, fscal,
                                     orders.astype(jnp.int32), mh, mw,
                                     frames=frames, out_dtype=out_dtype,
                                     compute_dtype=compute_dtype)
        return out.transpose(0, 1, 3, 4, 2).reshape(B, V, T, S, S, 3)

    def crop_one(v, box):
        top, left, h, w = box[0], box[1], box[2], box[3]
        scale = jnp.stack([S / h, S / w])
        trans = jnp.stack([-top * S / h, -left * S / w])
        return jax.image.scale_and_translate(
            v, (T, 3, S, S), (2, 3), scale, trans, method="linear",
            antialias=False)

    cropped = jax.vmap(crop_one)(planar, boxes)
    out = fused_photometric(cropped, fscal, orders.astype(jnp.int32), mh, mw,
                            out_dtype=out_dtype, compute_dtype=compute_dtype)
    return out.transpose(0, 1, 3, 4, 2).reshape(B, V, T, S, S, 3)


def make_ssl_batch_augment(params: AugmentParams):
    """Batched two-view augmentation: (key, videos (B, V, T, H, W, 3) uint8 or
    float[0,1], dims (B, 2) true (h, w) inside the canvas) ->
    (B, V, T, S, S, 3) normalized float32, NHWC end-to-end (XLA:TPU's native
    layout). Mirrors `train.py:39-53` (independent params per batch item per
    view). Intended to be called INSIDE the jitted train step so it fuses.
    On TPU the photometric tail runs as a fused Pallas kernel
    (VRL_FUSED_AUGMENT=0 disables)."""

    def one_view(key, video, hw):
        return ssl_augment(key, video, params, dims=(hw[0], hw[1]))

    def batch_fn(key, videos, dims=None):
        import os

        if (jax.default_backend() == "tpu"
                and os.environ.get("VRL_FUSED_AUGMENT", "auto") != "0"):
            return fused_ssl_batch_augment(key, videos, dims, params)
        B, V = videos.shape[0], videos.shape[1]
        keys = jax.random.split(key, B * V).reshape((B, V) + key.shape)
        if videos.dtype == jnp.uint8:
            videos = videos.astype(jnp.float32) / 255.0
        if dims is None:
            dims = jnp.tile(jnp.asarray(videos.shape[3:5], jnp.float32), (B, 1))
        vdims = jnp.broadcast_to(dims[:, None, :], (B, V, 2))
        return jax.vmap(jax.vmap(one_view))(keys, videos, vdims)

    return batch_fn
