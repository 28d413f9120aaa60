"""int8 frozen-backbone quantization: numerics, drift bounds, and wiring.

The quantized path is a TPU-native extension (no reference counterpart);
what is tested is (a) the quantization math itself, (b) that the quantized
ViT front end keeps the EXACT param tree of the fp path (checkpoint import
compatibility), and (c) that embedding drift on realistic inputs stays
within the documented budget (see tools/quant_study.py for the on-chip
study feeding BASELINE.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_rep_learning_tpu.ops.quant import (dense_reference, int8_dense,
                                              int8_matmul, quantize_rows,
                                              quantize_weight)


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32) * 0.1, jnp.float32)
    wq, scale = quantize_weight(w)
    assert wq.dtype == jnp.int8 and scale.shape == (32,)
    back = np.asarray(wq, np.float32) * np.asarray(scale)[None, :]
    # symmetric per-channel: max quantization error is scale/2 per element
    np.testing.assert_allclose(back, np.asarray(w),
                               atol=float(np.max(np.asarray(scale))) / 2 + 1e-8)
    # extremes map to +-127
    assert np.abs(np.asarray(wq)).max() == 127


def test_quantize_rows_handles_zero_rows():
    x = jnp.zeros((4, 16), jnp.float32)
    xq, s = quantize_rows(x)
    assert np.isfinite(np.asarray(s)).all()
    assert (np.asarray(xq) == 0).all()


def test_int8_dense_error_bound():
    """W8A8 dynamic quantization error on gaussian activations: ~1% relative
    RMS (theory: eps_x+eps_w with eps ~= max|row|/(127*sqrt(12)*std) per
    operand — the per-layer budget the drift study assumes). Well under the
    ~2% where downstream metric drift becomes visible."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(256, 768), jnp.float32)
    w = jnp.asarray(rng.randn(768, 512) * 0.03, jnp.float32)
    b = jnp.asarray(rng.randn(512) * 0.01, jnp.float32)
    got = np.asarray(int8_dense(x, w, b), np.float32)
    want = np.asarray(dense_reference(x, w, b), np.float32)
    rel_rms = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel_rms < 1.5e-2, rel_rms


def test_int8_matmul_is_exact_int32():
    rng = np.random.RandomState(2)
    a = rng.randint(-127, 128, (32, 64)).astype(np.int8)
    b = rng.randint(-127, 128, (64, 48)).astype(np.int8)
    got = np.asarray(int8_matmul(jnp.asarray(a), jnp.asarray(b)))
    want = a.astype(np.int32) @ b.astype(np.int32)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def tiny_vit_pair():
    """fp32 and quantized tiny ViT front ends sharing one param tree."""
    from video_rep_learning_tpu.models.vit import VIT_SPECS, ViTFrontEnd

    spec = VIT_SPECS["vit_tiny_test"]
    fp = ViTFrontEnd(spec, spec.depth, (0, 1), include_norm=True)
    q = ViTFrontEnd(spec, spec.depth, (0, 1), include_norm=True, quant=True)
    x = jnp.asarray(np.random.RandomState(3).rand(4, 32, 32, 3), jnp.float32)
    params = fp.init(jax.random.key(0), x)
    return fp, q, params, x


def test_quant_vit_shares_param_tree(tiny_vit_pair):
    """The quantized modules declare the IDENTICAL tree (names/shapes) so
    torch checkpoint import works unchanged."""
    fp, q, params, x = tiny_vit_pair
    qparams = q.init(jax.random.key(0), x)
    fp_flat = jax.tree_util.tree_map(jnp.shape, params)
    q_flat = jax.tree_util.tree_map(jnp.shape, qparams)
    assert jax.tree_util.tree_structure(fp_flat) == \
        jax.tree_util.tree_structure(q_flat)
    assert jax.tree_util.tree_leaves(fp_flat) == jax.tree_util.tree_leaves(q_flat)


def test_quant_vit_output_drift_bounded(tiny_vit_pair):
    """Quantized forward tracks the fp32 forward: high cosine similarity on
    both tapped features and the CLS embedding."""
    fp, q, params, x = tiny_vit_pair
    feats_fp, cls_fp = fp.apply(params, x)
    feats_q, cls_q = q.apply(params, x)

    def cos(a, b):
        a = np.asarray(a, np.float64).reshape(a.shape[0], -1)
        b = np.asarray(b, np.float64).reshape(b.shape[0], -1)
        num = (a * b).sum(1)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        return num / den

    assert cos(feats_fp, feats_q).min() > 0.999
    assert cos(cls_fp[:, None], cls_q[:, None]).min() > 0.995


def test_quantize_backbone_config_wiring():
    from video_rep_learning_tpu.config import get_cfg
    from video_rep_learning_tpu.models.carl import resolve_model_spec

    cfg = get_cfg()
    cfg.MODEL.BASE_MODEL.NETWORK = "TIMM-vit_tiny_test"
    cfg.MODEL.BASE_MODEL.LAYER = -1
    cfg.MODEL.EMBEDDER_MODEL.FUSION_TYPE = "smart"
    cfg.MODEL.QUANTIZE_BACKBONE = True
    assert resolve_model_spec(cfg).quantize_backbone
    # differentiable backbone -> quantization must be refused
    cfg.MODEL.TRAIN_BASE = "train_all"
    assert not resolve_model_spec(cfg).quantize_backbone
