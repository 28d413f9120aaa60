"""On-device augmentation parity tests vs torch/torchvision-semantics oracles
implemented in numpy (SURVEY.md §4 item (a))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_rep_learning_tpu.ops import augment as A


def rand_video(T=3, H=32, W=40, C=3, seed=0):
    return np.random.RandomState(seed).rand(T, H, W, C).astype(np.float32)


def test_resize_matches_torch_bilinear():
    torch = pytest.importorskip("torch")
    v = rand_video()
    got = np.asarray(A.resize_bilinear(jnp.asarray(v), 16))
    tv = torch.nn.functional.interpolate(
        torch.from_numpy(v).permute(0, 3, 1, 2), size=(16, 16),
        mode="bilinear", align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, tv, atol=2e-6)


def test_crop_resize_equals_materialized_crop_then_resize():
    v = rand_video(H=48, W=48)
    top, left, h, w = 5, 7, 30, 26
    got = np.asarray(A.crop_resize(jnp.asarray(v), jnp.float32(top),
                                   jnp.float32(left), jnp.float32(h),
                                   jnp.float32(w), 16))
    want = np.asarray(A.resize_bilinear(
        jnp.asarray(v[:, top:top + h, left:left + w]), 16))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_color_ops_match_torchvision_formulas():
    v = rand_video()
    # brightness
    got = np.asarray(A.adjust_brightness(jnp.asarray(v), 1.3))
    np.testing.assert_allclose(got, np.clip(v * 1.3, 0, 1), atol=1e-6)
    # saturation: blend with replicated luma
    gray = 0.299 * v[..., 0] + 0.587 * v[..., 1] + 0.114 * v[..., 2]
    want = np.clip(v * 0.7 + gray[..., None] * 0.3, 0, 1)
    got = np.asarray(A.adjust_saturation(jnp.asarray(v), 0.7))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # contrast: blend with per-frame mean of luma
    mean = gray.mean(axis=(1, 2), keepdims=True)[..., None]
    want = np.clip(v * 1.2 + mean * -0.2, 0, 1)
    got = np.asarray(A.adjust_contrast(jnp.asarray(v), 1.2))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_hue_roundtrip_and_shift():
    v = rand_video()
    same = np.asarray(A.adjust_hue(jnp.asarray(v), 0.0))
    np.testing.assert_allclose(same, v, atol=1e-5)
    shifted = np.asarray(A.adjust_hue(jnp.asarray(v), 0.25))
    assert not np.allclose(shifted, v, atol=1e-3)
    # hue shift preserves value channel (max of rgb)
    np.testing.assert_allclose(shifted.max(-1), v.max(-1), atol=1e-5)


def test_hue_matches_colorsys_oracle():
    """Per-pixel hue shift vs the stdlib colorsys HSV roundtrip — an exact,
    dependency-free oracle for the torchvision hue semantics."""
    import colorsys

    v = rand_video(T=2, H=4, W=5)
    for shift in (0.1, -0.3, 0.45):
        got = np.asarray(A.adjust_hue(jnp.asarray(v), shift))
        want = np.empty_like(v)
        for idx in np.ndindex(v.shape[:-1]):
            h, s, val = colorsys.rgb_to_hsv(*v[idx])
            want[idx] = colorsys.hsv_to_rgb((h + shift) % 1.0, s, val)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_gaussian_blur_preserves_mean_and_smooths():
    v = rand_video(H=24, W=24)
    out = np.asarray(A.gaussian_blur(jnp.asarray(v), jnp.float32(1.5)))
    assert out.shape == v.shape
    np.testing.assert_allclose(out.mean(), v.mean(), atol=5e-3)
    assert out.var() < v.var()


def test_uniform_crop_center():
    v = rand_video(H=40, W=32)
    out = np.asarray(A.uniform_crop(jnp.asarray(v), 24, 1))
    assert out.shape == (3, 24, 24, 3)
    np.testing.assert_allclose(out, v[:, 8:32, 4:28])


def test_ssl_augment_shapes_and_determinism():
    v = rand_video(T=4, H=64, W=64)
    params = A.AugmentParams(image_size=32)
    k = jax.random.key(0)
    o1 = np.asarray(A.ssl_augment(k, jnp.asarray(v), params))
    o2 = np.asarray(A.ssl_augment(k, jnp.asarray(v), params))
    assert o1.shape == (4, 32, 32, 3)
    np.testing.assert_array_equal(o1, o2)
    o3 = np.asarray(A.ssl_augment(jax.random.key(1), jnp.asarray(v), params))
    assert not np.allclose(o1, o3)


def test_batched_two_view_augment():
    videos = (np.random.RandomState(0).rand(2, 2, 3, 48, 48, 3) * 255).astype(np.uint8)
    fn = jax.jit(A.make_ssl_batch_augment(A.AugmentParams(image_size=32)))
    out = np.asarray(fn(jax.random.key(0), jnp.asarray(videos)))
    assert out.shape == (2, 2, 3, 32, 32, 3)
    # views of the same item must receive different augmentation draws
    assert not np.allclose(out[0, 0], out[0, 1])

    # padded canvas: true dims restrict the crop to the valid region
    geo_fn = jax.jit(A.make_ssl_batch_augment(A.AugmentParams(
        image_size=32, jitter_prob=0.0, blur_prob=0.0, gray_prob=0.0)))
    canvas = np.zeros((1, 2, 3, 64, 64, 3), np.uint8)
    canvas[:, :, :, :40, :40, :] = 200
    for seed in range(5):
        out = np.asarray(geo_fn(jax.random.key(seed), jnp.asarray(canvas),
                                jnp.asarray([[40.0, 40.0]])))
        # crop stays in the 200-intensity region; black padding would be ~-2.1
        assert out.min() > 0.5


def test_supervised_augment_respects_true_dims():
    """A canvas-padded supervised item must never crop into padding
    (VERDICT r1 weak #4: the RRC box is sampled against the TRUE dims)."""
    from video_rep_learning_tpu.config import get_cfg

    aug_cfg = get_cfg().AUGMENTATION
    # geometric-only: photometric jitters off so intensity marks the region
    aug_cfg.BRIGHTNESS = aug_cfg.CONTRAST = False
    aug_cfg.HUE = aug_cfg.SATURATION = False
    canvas = np.zeros((3, 64, 64, 3), np.float32)
    canvas[:, :40, :40, :] = 200.0 / 255.0
    for seed in range(6):
        out = np.asarray(A.supervised_augment(
            jax.random.key(seed), jnp.asarray(canvas), aug_cfg, 32,
            dims=(40.0, 40.0)))
        # black padding would normalize to ~-2.1; the true region to ~+1.3
        assert out.min() > 0.5, out.min()

    # contrast mean covers only the true extent: for a constant-valued true
    # region, contrast adjustment must be an exact no-op
    aug_cfg2 = get_cfg().AUGMENTATION
    got = np.asarray(A.adjust_contrast(jnp.asarray(canvas), 1.8,
                                       dims=(40.0, 40.0)))
    np.testing.assert_allclose(got[:, :40, :40], canvas[:, :40, :40], atol=1e-5)


def test_rrc_box_distribution():
    keys = jax.random.split(jax.random.key(0), 200)
    boxes = jax.vmap(lambda k: jnp.stack(A.sample_rrc_box(k, 64, 64)))(keys)
    boxes = np.asarray(boxes)
    top, left, h, w = boxes.T
    assert (h > 0).all() and (w > 0).all()
    assert (top + h <= 64).all() and (left + w <= 64).all()
    areas = h * w / (64 * 64)
    assert areas.min() >= 0.55 and areas.max() <= 1.01  # scale~[.8,1] x ratio jitter
