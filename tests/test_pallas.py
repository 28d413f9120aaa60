"""Pallas kernel tests. On the CPU test mesh the kernels run in interpreter
mode (`pltpu.force_tpu_interpret_mode`); on TPU CI they compile for real."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from video_rep_learning_tpu.algos.scl import scl_sequence_loss
from video_rep_learning_tpu.ops.attention_pallas import (_attention_reference,
                                                         flash_attention)
from video_rep_learning_tpu.ops.scl_pallas import scl_loss_fused


@pytest.fixture(autouse=True)
def interpret_mode():
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def test_flash_attention_matches_reference():
    rng = np.random.RandomState(0)
    B, H, S, d = 1, 2, 160, 32
    q = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    mask = jnp.asarray(rng.rand(B, S) > 0.15, jnp.float32)
    ref = _attention_reference(q, k, v, mask, 0.17)
    out = flash_attention(q, k, v, mask, 0.17, 128, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_grads_match_reference():
    rng = np.random.RandomState(1)
    B, H, S, d = 1, 1, 130, 16
    q = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    g = jax.grad(lambda a, b, c: flash_attention(a, b, c, None, 0.25, 128, 128).sum(),
                 argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b, c: _attention_reference(a, b, c, None, 0.25).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_flash_attention_masked_grads_match_reference():
    """Backward through the fused Pallas kernel with a real key mask."""
    rng = np.random.RandomState(2)
    B, H, S, d = 2, 2, 150, 32
    q = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    mask = np.ones((B, S), np.float32)
    mask[0, -30:] = 0.0
    mask[1, 10:25] = 0.0
    mask = jnp.asarray(mask)
    w = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)  # non-uniform cotangent

    def loss(fn):
        return lambda a, b, c: jnp.sum(fn(a, b, c) * w)

    g = jax.grad(loss(lambda a, b, c: flash_attention(a, b, c, mask, 0.2)),
                 argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda a, b, c: _attention_reference(a, b, c, mask, 0.2)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_flash_attention_qblocked_paths(monkeypatch):
    """Force nq > 1 (q-blocking with dk/dv VMEM accumulation across blocks)."""
    from video_rep_learning_tpu.ops import attention_pallas as ap

    monkeypatch.setattr(ap, "_FUSED_MAX_SCORE_BYTES", 128 * 256 * 4)
    rng = np.random.RandomState(3)
    B, H, S, d = 1, 2, 300, 32  # Sqp=384 -> bq=128, nq=3
    q = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    mask = jnp.asarray(rng.rand(B, S) > 0.1, jnp.float32)
    out = ap.flash_attention(q, k, v, mask, 0.18)
    ref = ap._attention_reference(q, k, v, mask, 0.18)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g = jax.grad(lambda a, b, c: ap.flash_attention(a, b, c, mask, 0.18).sum(),
                 argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b, c: ap._attention_reference(a, b, c, mask, 0.18).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_flash_attention_streaming_path(monkeypatch):
    """Force the streaming online-softmax kernel (the huge-Sk memory valve)."""
    from video_rep_learning_tpu.ops import attention_pallas as ap

    monkeypatch.setattr(ap, "_FUSED_MAX_KV_BYTES", 0)
    rng = np.random.RandomState(4)
    B, H, S, d = 1, 2, 300, 32
    q = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, d), jnp.float32)
    mask = jnp.asarray(rng.rand(B, S) > 0.1, jnp.float32)
    out = ap.flash_attention(q, k, v, mask, 0.18, 128, 128)
    ref = ap._attention_reference(q, k, v, mask, 0.18)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # streaming backward = XLA remat of the reference -> exact by construction
    g = jax.grad(lambda a, b, c: ap.flash_attention(a, b, c, mask, 0.18).sum(),
                 argnums=(0, 1, 2))(q, k, v)
    for a in g:
        assert np.isfinite(np.asarray(a)).all()


def test_flash_attention_shape_sweep():
    """Forward+backward parity across irregular shapes: unaligned sequence
    lengths, asymmetric Sq/Sk, head dims 16-128, with and without masks."""
    rng = np.random.RandomState(12)
    shapes = [
        (1, 1, 37, 16, 41),    # tiny, unaligned, Sq != Sk
        (2, 3, 129, 64, 129),  # just past one lane tile
        (1, 2, 200, 128, 100), # d == 128, Sk < Sq
        (1, 4, 96, 32, 256),   # Sk > Sq
    ]
    for B, H, Sq, d, Sk in shapes:
        q = jnp.asarray(rng.randn(B, H, Sq, d), jnp.float32)
        k = jnp.asarray(rng.randn(B, H, Sk, d), jnp.float32)
        v = jnp.asarray(rng.randn(B, H, Sk, d), jnp.float32)
        mask = jnp.asarray(rng.rand(B, Sk) > 0.2, jnp.float32)
        out = flash_attention(q, k, v, mask, 0.2)
        ref = _attention_reference(q, k, v, mask, 0.2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, err_msg=str((B, H, Sq, d, Sk)))
        g = jax.grad(lambda a, b, c: flash_attention(a, b, c, mask, 0.2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda a, b, c: _attention_reference(a, b, c, mask, 0.2)
                      .sum(), argnums=(0, 1, 2))(q, k, v)
        for x, y in zip(g, gr):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=2e-5,
                                       err_msg=str((B, H, Sq, d, Sk)))


def test_flash_attention_fused_tail_qblock():
    """Regression: fused multi-q-block path where bq does NOT divide Sqp.

    At Sq=Sk=1440 (MVF multi-entity max seq: 6 tok x 240 frames) the score
    budget gives bq=1024 < Sqp, and at the 2048 eval bucket bq=768; a floor
    nq = Sqp // bq dropped the tail q rows entirely (uninitialized out/lse,
    corrupted dq/dk/dv). The fix pads q to ceil(Sq/bq)*bq blocks."""
    from video_rep_learning_tpu.ops import attention_pallas as ap

    for S in (1440, 2048):
        assert not ap._single_q_block(S, S)
        assert ap._fused_fits(S, 64, 4)
        bq = ap._fused_block_q(ap._round_up(S, 128), ap._round_up(S, 128))
        assert S % bq != 0, "shape no longer exercises the tail-block case"
        rng = np.random.RandomState(S)
        q = jnp.asarray(rng.randn(1, 1, S, 64), jnp.float32)
        k = jnp.asarray(rng.randn(1, 1, S, 64), jnp.float32)
        v = jnp.asarray(rng.randn(1, 1, S, 64), jnp.float32)
        mask = jnp.asarray(rng.rand(1, S) > 0.1, jnp.float32)
        out = flash_attention(q, k, v, mask, 0.125)
        ref = _attention_reference(q, k, v, mask, 0.125)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, err_msg=f"S={S}")
        w = jnp.asarray(rng.randn(1, 1, S, 64), jnp.float32)
        g = jax.grad(lambda a, b, c: jnp.sum(
            flash_attention(a, b, c, mask, 0.125) * w),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda a, b, c: jnp.sum(
            _attention_reference(a, b, c, mask, 0.125) * w),
            argnums=(0, 1, 2))(q, k, v)
        for x, y in zip(g, gr):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=3e-5, err_msg=f"S={S}")


def test_flash_attention_bf16():
    """bf16 inputs, fp32 accumulation: out/grads close to the fp32 oracle."""
    rng = np.random.RandomState(5)
    B, H, S, d = 1, 2, 160, 64
    qf = rng.randn(B, H, S, d).astype(np.float32)
    kf = rng.randn(B, H, S, d).astype(np.float32)
    vf = rng.randn(B, H, S, d).astype(np.float32)
    q, k, v = (jnp.asarray(x, jnp.bfloat16) for x in (qf, kf, vf))
    ref = _attention_reference(jnp.asarray(qf), jnp.asarray(kf),
                               jnp.asarray(vf), None, 0.125)
    out = flash_attention(q, k, v, None, 0.125)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.04)
    g = jax.grad(lambda a, b, c: flash_attention(a, b, c, None, 0.125)
                 .astype(jnp.float32).sum(), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b, c: _attention_reference(a, b, c, None, 0.125)
                  .sum(), argnums=(0, 1, 2))(jnp.asarray(qf), jnp.asarray(kf),
                                             jnp.asarray(vf))
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b),
                                   atol=0.08)


def test_fused_photometric_augment_matches_jnp_pipeline():
    """The fused photometric kernel path == the jnp ssl_augment path for the
    SAME key (identical RNG consumption), across several seeds so every
    branch (jitter on/off, blur, gray, flip) gets exercised."""
    from video_rep_learning_tpu.ops.augment import (AugmentParams,
                                                    fused_ssl_batch_augment,
                                                    ssl_augment)

    p = AugmentParams(image_size=32)
    rng = np.random.RandomState(8)
    videos = rng.randint(0, 255, size=(1, 2, 2, 40, 44, 3)).astype(np.uint8)
    dims = jnp.asarray([[40.0, 44.0]])

    def unfused(key):
        keys = jax.random.split(key, 2).reshape((1, 2) + key.shape)
        v = jnp.asarray(videos).astype(jnp.float32) / 255.0
        vdims = jnp.broadcast_to(dims[:, None, :], (1, 2, 2))
        return jax.vmap(jax.vmap(
            lambda k, vid, hw: ssl_augment(k, vid, p, dims=(hw[0], hw[1]))
        ))(keys, v, vdims)

    # mxu_resample=False: XLA crop + photometric-only kernel (exact path).
    # mxu_resample=True: crop+photometrics in ONE kernel — the RRC rides
    # the MXU as per-sample resample matrices, uint8 source enters via an
    # int8 bitcast; VRL_CROP_FRAMES=2 exercises the multi-frame-per-program
    # unroll (T=2). In interpret mode the in-kernel dots are fp32, so all
    # paths match the jnp pipeline to float tolerance.
    import os

    for fused_crop, crop_frames in ((False, None), (True, None), (True, "2")):
        pf = p._replace(mxu_resample=fused_crop)
        if crop_frames:
            os.environ["VRL_CROP_FRAMES"] = crop_frames
        try:
            for seed in range(6):
                key = jax.random.key(seed)
                want = np.asarray(unfused(key))
                got = np.asarray(fused_ssl_batch_augment(
                    key, jnp.asarray(videos), dims, pf))
                np.testing.assert_allclose(got, want, atol=3e-5), (
                    fused_crop, crop_frames, seed)
        finally:
            os.environ.pop("VRL_CROP_FRAMES", None)


def test_fused_crop_padded_canvas_and_odd_t():
    """Fused-crop path on a PADDED canvas (true dims < array dims, as the
    collate produces) and odd T (frames-per-program auto-pick falls to 1):
    must match the jnp pipeline, which crops against the true extent."""
    from video_rep_learning_tpu.ops.augment import (AugmentParams,
                                                    fused_ssl_batch_augment,
                                                    ssl_augment)

    p = AugmentParams(image_size=32, mxu_resample=True)
    rng = np.random.RandomState(3)
    videos = rng.randint(0, 255, size=(2, 2, 3, 48, 44, 3)).astype(np.uint8)
    videos[:, :, :, 40:, :, :] = 0  # padding region
    videos[:, :, :, :, 36:, :] = 0
    dims = jnp.asarray([[40.0, 36.0], [48.0, 44.0]])

    def unfused(key):
        keys = jax.random.split(key, 4).reshape((2, 2) + key.shape)
        v = jnp.asarray(videos).astype(jnp.float32) / 255.0
        vdims = jnp.broadcast_to(dims[:, None, :], (2, 2, 2))
        return jax.vmap(jax.vmap(
            lambda k, vid, hw: ssl_augment(k, vid, p, dims=(hw[0], hw[1]))
        ))(keys, v, vdims)

    for seed in range(3):
        key = jax.random.key(seed)
        want = np.asarray(unfused(key))
        got = np.asarray(fused_ssl_batch_augment(key, jnp.asarray(videos),
                                                 dims, p))
        np.testing.assert_allclose(got, want, atol=3e-5), seed


def test_bf16_augment_output_is_exact_rounding_of_fp32():
    """`AugmentParams.bf16_output` (the AMP default on TPU): the kernel
    computes fp32 internally and rounds only on the output write, so the
    bf16 result must be BIT-EXACT equal to astype(bf16) of the fp32-path
    output — the same rounding the backbone stem applies anyway
    (`resnet.py::StemConv`, `vit.py` patch-embed Dense(dtype=bf16))."""
    from video_rep_learning_tpu.ops.augment import (AugmentParams,
                                                    fused_ssl_batch_augment)

    rng = np.random.RandomState(5)
    videos = rng.randint(0, 255, size=(1, 2, 2, 40, 44, 3)).astype(np.uint8)
    dims = jnp.asarray([[40.0, 44.0]])
    for fused_crop in (False, True):
        p32 = AugmentParams(image_size=32, mxu_resample=fused_crop)
        pbf = p32._replace(bf16_output=True)
        for seed in range(3):
            key = jax.random.key(seed)
            want = np.asarray(
                fused_ssl_batch_augment(key, jnp.asarray(videos), dims, p32)
                .astype(jnp.bfloat16).astype(jnp.float32))
            got_bf = fused_ssl_batch_augment(key, jnp.asarray(videos), dims,
                                             pbf)
            assert got_bf.dtype == jnp.bfloat16
            np.testing.assert_array_equal(
                np.asarray(got_bf.astype(jnp.float32)), want)


def test_bf16_augment_math_within_pixel_tolerance():
    """`AugmentParams.bf16_math` (AMP-gated): the photometric chain runs in
    bf16 inside the kernel (2.6x VPU rate, tools/bench_vpu_bf16.py). Values
    drift: measured mean ~0.6 uint8 LSB, max ~7 LSBs (the hue position in
    bf16 carries ~0.002 absolute error which amplifies x6 in the sextant
    reconstruction, then compounds through jitter factors up to 1.8x).
    Reductions and matmul accumulation stay fp32. The bound here is the
    measured envelope +15%: a regression above it means real breakage, not
    rounding."""
    from video_rep_learning_tpu.ops.augment import (AugmentParams,
                                                    fused_ssl_batch_augment)

    rng = np.random.RandomState(7)
    videos = rng.randint(0, 255, size=(1, 2, 2, 40, 44, 3)).astype(np.uint8)
    dims = jnp.asarray([[40.0, 44.0]])
    # 8.5 uint8 LSBs / min(IMAGENET_STD) in normalized units (max measured
    # 7.4 across seeds/paths); mean gate at 1 LSB (measured ~0.6)
    atol = 8.5 / 255.0 / 0.224
    for fused_crop in (False, True):
        p32 = AugmentParams(image_size=32, mxu_resample=fused_crop)
        pbm = p32._replace(bf16_math=True)
        for seed in range(4):
            key = jax.random.key(seed)
            want = np.asarray(
                fused_ssl_batch_augment(key, jnp.asarray(videos), dims, p32),
                np.float32)
            got = np.asarray(
                fused_ssl_batch_augment(key, jnp.asarray(videos), dims, pbm),
                np.float32)
            err = np.abs(got - want)
            assert err.max() <= atol, (fused_crop, seed, err.max())
            assert err.mean() <= 1.0 / 255.0 / 0.224, (fused_crop, seed,
                                                       err.mean())


@pytest.mark.parametrize("transposed", ["1", "0"])
def test_fused_vit_attention_block_matches_reference(transposed, monkeypatch):
    """The fused LN+qkv+attention+proj half-block kernel == its XLA
    composition, forward and backward — both the transposed-output schedule
    (the r4 TPU default) and the classic row-major one."""
    from video_rep_learning_tpu.ops.vit_block_pallas import (_reference,
                                                             vit_attention_block)

    monkeypatch.setenv("VRL_VIT_BLOCK_T", transposed)
    rng = np.random.RandomState(9)
    B, N, H, dh = 2, 150, 4, 32
    D = H * dh
    x = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    ln_s = jnp.asarray(1 + 0.1 * rng.randn(D), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.randn(D), jnp.float32)
    wqkv = jnp.asarray(rng.randn(D, 3 * D) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.randn(3 * D) * 0.05, jnp.float32)
    wproj = jnp.asarray(rng.randn(D, D) * 0.05, jnp.float32)
    bproj = jnp.asarray(rng.randn(D) * 0.05, jnp.float32)

    args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    got = vit_attention_block(*args, H)
    want = _reference(*args, H, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)

    g = jax.grad(lambda *a: jnp.sum(vit_attention_block(*a, H) ** 2),
                 argnums=tuple(range(7)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(_reference(*a, H, 1e-6) ** 2),
                  argnums=tuple(range(7)))(*args)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=5e-4)


@pytest.mark.parametrize("approx", [True, False])
def test_fused_matmul_gelu_matches_reference(approx):
    from video_rep_learning_tpu.ops.matmul_gelu_pallas import (_reference,
                                                               matmul_bias_gelu)

    rng = np.random.RandomState(10)
    B, N, K, F = 2, 150, 128, 256
    x = jnp.asarray(rng.randn(B, N, K), jnp.float32)
    w = jnp.asarray(rng.randn(K, F) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(F) * 0.05, jnp.float32)
    got = matmul_bias_gelu(x, w, b, approx)
    want = _reference(x, w, b, approx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    g = jax.grad(lambda *a: jnp.sum(matmul_bias_gelu(*a, approx) ** 2),
                 argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(lambda *a: jnp.sum(_reference(*a, approx) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-4,
                                   atol=2e-4)


@pytest.mark.parametrize("activation", ["none", "gelu_exact", "gelu_tanh"])
def test_ln_matmul_bias_act_matches_reference(activation):
    """act(LN(x) @ w + b) with LN folded into the matmul prologue must match
    the LN-then-matmul composition (the ViT block's module path) exactly."""
    from video_rep_learning_tpu.ops.matmul_gelu_pallas import (
        _reference_ln, ln_matmul_bias_act)

    rng = np.random.RandomState(11)
    B, N, K, F = 2, 150, 128, 256
    x = jnp.asarray(rng.randn(B, N, K) * 2.0 + 0.5, jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(K), jnp.float32)
    be = jnp.asarray(0.1 * rng.randn(K), jnp.float32)
    w = jnp.asarray(rng.randn(K, F) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(F) * 0.05, jnp.float32)
    got = ln_matmul_bias_act(x, g, be, w, b, activation)
    want = _reference_ln(x, g, be, w, b, activation, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    grads = jax.grad(
        lambda *a: jnp.sum(ln_matmul_bias_act(*a, activation) ** 2),
        argnums=(0, 1, 2, 3, 4))(x, g, be, w, b)
    gref = jax.grad(
        lambda *a: jnp.sum(_reference_ln(*a, activation, 1e-6) ** 2),
        argnums=(0, 1, 2, 3, 4))(x, g, be, w, b)
    for a, c in zip(grads, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-4,
                                   atol=2e-4)


@pytest.mark.parametrize("activation", ["gelu_exact", "gelu_tanh"])
def test_ln_mlp_block_matches_reference(activation):
    """x + act(LN(x) @ w1 + b1) @ w2 + b2 in one program (the 4D stream
    never leaves VMEM) must match the staged composition."""
    from video_rep_learning_tpu.ops.matmul_gelu_pallas import (
        _reference_mlp, ln_mlp_block)

    rng = np.random.RandomState(13)
    B, N, K, F = 2, 150, 128, 512
    x = jnp.asarray(rng.randn(B, N, K) * 2.0 + 0.5, jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(K), jnp.float32)
    be = jnp.asarray(0.1 * rng.randn(K), jnp.float32)
    w1 = jnp.asarray(rng.randn(K, F) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(F) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(F, K) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(K) * 0.05, jnp.float32)
    got = ln_mlp_block(x, g, be, w1, b1, w2, b2, activation)
    want = _reference_mlp(x, g, be, w1, b1, w2, b2, activation, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    grads = jax.grad(
        lambda *a: jnp.sum(ln_mlp_block(*a, activation) ** 2),
        argnums=tuple(range(7)))(x, g, be, w1, b1, w2, b2)
    gref = jax.grad(
        lambda *a: jnp.sum(_reference_mlp(*a, activation, 1e-6) ** 2),
        argnums=tuple(range(7)))(x, g, be, w1, b1, w2, b2)
    for a, c in zip(grads, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-4,
                                   atol=3e-4)


def test_ln_mlp_block_matches_module_composition():
    """The fused MLP's math must track the module path (LN module + two
    Dense calls + residual) — only residual-add rounding may differ."""
    from video_rep_learning_tpu.ops.matmul_gelu_pallas import (
        _reference_ln, ln_mlp_block)

    rng = np.random.RandomState(14)
    B, N, K, F = 1, 130, 128, 512
    x = jnp.asarray(rng.randn(B, N, K), jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(K), jnp.float32)
    be = jnp.asarray(0.1 * rng.randn(K), jnp.float32)
    w1 = jnp.asarray(rng.randn(K, F) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(F) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(F, K) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(K) * 0.05, jnp.float32)
    got = ln_mlp_block(x, g, be, w1, b1, w2, b2, "gelu_exact")
    y = _reference_ln(x, g, be, w1, b1, "gelu_exact", 1e-6)
    want = x + (jnp.einsum("bnf,fk->bnk", y, w2,
                           preferred_element_type=jnp.float32) + b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_mlp_block_eligible_vit_b_shapes():
    from video_rep_learning_tpu.ops.matmul_gelu_pallas import (
        _LANES, _choose_bn_mlp, mlp_block_eligible)

    # ViT-B/8 @224 under AMP: 785 tokens, D=768, 4D=3072, bf16
    assert mlp_block_eligible(785, 768, 3072, 2)
    bn = _choose_bn_mlp(785, 768, 3072, 2)
    assert bn % _LANES == 0 and 3072 % bn == 0
    # fp32 at the same shape blows the VMEM budget -> stays on staged path
    assert not mlp_block_eligible(785, 768, 3072, 4)


def test_vit_block_fused_mlp_matches_module_path(monkeypatch):
    """VRL_FUSED_MLP=1 must keep the module path's exact param tree and
    outputs (checkpoint compatibility)."""
    import jax as _jax

    from video_rep_learning_tpu.models.vit import ViTBlock

    rng = np.random.RandomState(15)
    B, N, dim, heads = 2, 130, 128, 2
    x = jnp.asarray(rng.randn(B, N, dim), jnp.float32)
    block = ViTBlock(dim=dim, num_heads=heads)
    params = block.init(jax.random.key(0), x)
    want = block.apply(params, x)

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("VRL_FUSED_MLP", "1")
    with pltpu.force_tpu_interpret_mode():
        params_fused = block.init(jax.random.key(0), x)
        got = block.apply(params, x)

    assert (jax.tree_util.tree_structure(params_fused)
            == jax.tree_util.tree_structure(params))
    for pa, pb in zip(jax.tree_util.tree_leaves(params_fused),
                      jax.tree_util.tree_leaves(params)):
        assert pa.shape == pb.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_vit_block_fused_ln_paths_match_module_path(monkeypatch):
    """The TPU fused LN1+qkv / LN2+fc1 ViT block paths must share the module
    path's exact param tree (checkpoint compatibility) and outputs."""
    import jax as _jax

    from video_rep_learning_tpu.models.vit import ViTBlock

    rng = np.random.RandomState(12)
    B, N, dim, heads = 2, 130, 128, 2
    x = jnp.asarray(rng.randn(B, N, dim), jnp.float32)
    block = ViTBlock(dim=dim, num_heads=heads)
    params = block.init(jax.random.key(0), x)
    want = block.apply(params, x)

    # force the TPU gates on; kernels execute via the interpreter
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        params_fused = block.init(jax.random.key(0), x)
        got = block.apply(params, x)

    assert (jax.tree_util.tree_structure(params_fused)
            == jax.tree_util.tree_structure(params))
    for pa, pb in zip(jax.tree_util.tree_leaves(params_fused),
                      jax.tree_util.tree_leaves(params)):
        assert pa.shape == pb.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_erf_poly_and_exact_gelu_vs_torch():
    """The in-kernel polynomial erf (A&S 7.1.26) must track torch's exact
    erf GELU within its documented 1.5e-7 abs bound (VERDICT r2 weak #2)."""
    import torch

    from video_rep_learning_tpu.ops.matmul_gelu_pallas import (_erf_poly,
                                                               _gelu_exact)

    x = jnp.linspace(-8.0, 8.0, 4001, dtype=jnp.float32)
    # 1.5e-7 analytic bound + fp32 evaluation rounding (~3 ulps at the
    # saturated tails) => 5e-7 absolute
    np.testing.assert_allclose(np.asarray(_erf_poly(x)),
                               np.asarray(jax.scipy.special.erf(x)),
                               atol=5e-7)
    want = torch.nn.functional.gelu(
        torch.tensor(np.asarray(x), dtype=torch.float32)).numpy()
    np.testing.assert_allclose(np.asarray(_gelu_exact(x)), want, atol=2e-6)

    # the exp/divide-free tanh-argument erf used for bf16 epilogues: its
    # 3.3e-6 erf bound => GELU within ~1.5e-5 of torch in fp32, three
    # orders below bf16 output rounding
    from video_rep_learning_tpu.ops.matmul_gelu_pallas import _erf_tanh

    np.testing.assert_allclose(np.asarray(_erf_tanh(x)),
                               np.asarray(jax.scipy.special.erf(x)),
                               atol=4e-6)
    fast = np.asarray(_gelu_exact(x, fast_tail=True))
    np.testing.assert_allclose(fast, want, atol=2e-5)


def test_matmul_gelu_tile_choice_lane_aligned():
    """Regression (ADVICE r2): bn halving must never land on a tile that is
    not a 128 multiple — F=3072 with a large N stops at 384, not 192/96."""
    from video_rep_learning_tpu.ops.matmul_gelu_pallas import (_LANES,
                                                               _choose_bn)

    for N in (128, 785, 1570, 4096, 16384):
        for K, F in ((768, 3072), (384, 1536), (1024, 4096)):
            for itemsize in (2, 4):
                bn = _choose_bn(N, K, F, itemsize)
                assert bn % _LANES == 0, (N, K, F, itemsize, bn)
                assert F % bn == 0, (N, K, F, itemsize, bn)


def test_packed_vit_eligibility_budget():
    from video_rep_learning_tpu.ops.attention_pallas import packed_vit_eligible

    # ViT-B/8 (12 heads x 64): bf16 fits the VMEM budget, fp32 does not
    assert packed_vit_eligible(12, 64, 785, 2)
    assert not packed_vit_eligible(12, 64, 785, 4)
    # odd head grouping (lane alignment unprovable) is ineligible
    assert not packed_vit_eligible(3, 64, 785, 2)


def test_packed_vit_attention_matches_reference():
    """The packed-QKV ViT kernel (no head transposes) == reference MHA."""
    from video_rep_learning_tpu.ops.attention_pallas import (
        _packed_split, packed_vit_attention)

    rng = np.random.RandomState(6)
    B, N, H, dh = 3, 150, 4, 32
    D = H * dh
    qkv = jnp.asarray(rng.randn(B, N, 3 * D), jnp.float32)
    out = packed_vit_attention(qkv, H)
    q, k, v = _packed_split(qkv, H)
    ref = _attention_reference(q, k, v, None, 1.0 / np.sqrt(dh))
    ref = np.asarray(ref).transpose(0, 2, 1, 3).reshape(B, N, D)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

def test_packed_attention_nomax_softmax_boundary():
    """The max-free softmax is algebraically exact for logits <= 76 and must
    stay finite (no inf/nan) far beyond the clamp (saturated-one-hot
    regime). See _NOMAX_CLAMP notes in ops/attention_pallas.py."""
    from video_rep_learning_tpu.ops.attention_pallas import (
        _packed_split, packed_vit_attention)

    rng = np.random.RandomState(7)
    B, N, H, dh = 1, 130, 2, 64
    D = H * dh
    base = rng.randn(B, N, 3 * D)

    # logits up to ~60 (well past anything LN'd activations produce, still
    # below the 76 bound): exact equality with the max-subtracted reference
    hot = base.copy()
    hot[:, :, :D] *= 3.0
    hot[:, :, D:2 * D] *= 4.8
    qkv = jnp.asarray(hot, jnp.float32)
    q, k, v = _packed_split(qkv, H)
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k))
    smax = np.abs(s).max() / np.sqrt(dh)
    assert 40.0 < smax < 76.0, smax  # the regime this test is about
    out = packed_vit_attention(qkv, H)
    ref = _attention_reference(q, k, v, None, 1.0 / np.sqrt(dh))
    ref = np.asarray(ref).transpose(0, 2, 1, 3).reshape(B, N, D)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)

    # logits in the hundreds: clamped, but finite and still a convex
    # combination of value rows
    extreme = base.copy()
    extreme[:, :, :D] *= 40.0
    extreme[:, :, D:2 * D] *= 40.0
    out2 = np.asarray(packed_vit_attention(
        jnp.asarray(extreme, jnp.float32), H))
    assert np.isfinite(out2).all()
    assert np.abs(out2).max() <= np.abs(extreme[:, :, 2 * D:]).max() + 1e-3

    # ALL-underflow rows (every logit << -120): the floor clip must yield
    # uniform attention (the max-subtracted behavior), never 0/0 = NaN
    degen = base.copy()
    # every q.k product <= -(0.5*40)^2 => every logit < -1000, all clipped
    degen[:, :, :D] = -(np.abs(degen[:, :, :D]) + 0.5) * 40.0
    degen[:, :, D:2 * D] = (np.abs(degen[:, :, D:2 * D]) + 0.5) * 40.0
    out3 = np.asarray(packed_vit_attention(
        jnp.asarray(degen, jnp.float32), H))
    assert np.isfinite(out3).all()
    v3 = degen[:, :, 2 * D:].reshape(B, N, H, dh).transpose(0, 2, 1, 3)
    uniform = v3.mean(axis=2)  # (B, H, dh)
    got_first = out3.reshape(B, N, H, dh)[:, 0]  # any row; all are uniform
    # p entries sit at 2^-120: products with small-|v| elements graze the
    # fp32 subnormal range, costing ~2e-4 — uniformity, not precision, is
    # the property under test
    np.testing.assert_allclose(got_first, uniform, atol=1e-3)


def test_packed_vit_attention_backward_matches_reference():
    from video_rep_learning_tpu.ops.attention_pallas import (
        _packed_split, packed_vit_attention)

    rng = np.random.RandomState(6)
    B, N, H, dh = 3, 150, 4, 32
    D = H * dh
    qkv = jnp.asarray(rng.randn(B, N, 3 * D), jnp.float32)

    # backward (finetuned-ViT-block path): XLA-remat vjp through the split
    def loss_packed(x):
        return jnp.sum(packed_vit_attention(x, H) ** 2)

    def loss_ref(x):
        a, b, c = _packed_split(x, H)
        o = _attention_reference(a, b, c, None, 1.0 / np.sqrt(dh))
        return jnp.sum(o.transpose(0, 2, 1, 3).reshape(B, N, D) ** 2)

    g = jax.grad(loss_packed)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)


@pytest.mark.parametrize("neg", ["single_noself", "batch_noself"])
def test_fused_scl_grads_match_xla(neg):
    """The fused Pallas SCL backward == XLA autodiff of the reference math
    (VERDICT r1 #5: a real tiled backward, not a remat)."""
    rng = np.random.RandomState(7)
    B, V, T, C = 2, 2, 40, 16
    embs = rng.randn(B, V, T, C).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
    seq_lens = rng.randint(30, 100, size=(B, V)).astype(np.float32)
    steps = np.sort(rng.randint(0, 80, size=(B, V, T)), axis=-1).astype(np.float32)
    masks = np.ones((B, V, T), np.float32)
    masks[1, 0, -5:] = 0
    args = (jnp.asarray(seq_lens), jnp.asarray(steps), jnp.asarray(masks))

    g_fused = jax.grad(lambda e: scl_loss_fused(e, *args, 0.1, 10.0, neg))(
        jnp.asarray(embs))
    g_ref = jax.grad(lambda e: scl_sequence_loss(
        e, *args, temperature=0.1, label_varience=10.0,
        positive_type="gauss", negative_type=neg)["loss"])(jnp.asarray(embs))
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-4)


def test_fused_scl_training_never_materializes_nn():
    """Structural proof for the kernel's reason to exist: the traced
    forward+backward contains NO (N, N) intermediate for N > block."""
    B, V, T, C = 4, 2, 512, 128  # N = 4096 >> block 512
    N = B * V * T
    embs = jnp.zeros((B, V, T, C))
    seq_lens = jnp.ones((B, V)) * 600
    steps = jnp.zeros((B, V, T))
    masks = jnp.ones((B, V, T))

    jaxpr = jax.make_jaxpr(jax.grad(lambda e: scl_loss_fused(
        e, seq_lens, steps, masks, 0.1, 10.0, "single_noself")))(embs)

    for eqn in jaxpr.jaxpr.eqns:
        for var in eqn.outvars:
            shape = getattr(getattr(var, "aval", None), "shape", ())
            assert not (len(shape) >= 2 and shape[-1] >= N
                        and shape[-2] >= N), (
                f"(N, N) intermediate materialized: {shape} in {eqn.primitive}")


@pytest.mark.parametrize("neg", ["single_noself", "batch_noself"])
def test_fused_scl_matches_xla(neg):
    rng = np.random.RandomState(0)
    B, V, T, C = 2, 2, 40, 16
    embs = rng.randn(B, V, T, C).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
    seq_lens = rng.randint(30, 100, size=(B, V)).astype(np.float32)
    steps = np.sort(rng.randint(0, 80, size=(B, V, T)), axis=-1).astype(np.float32)
    masks = np.ones((B, V, T), np.float32)
    masks[1, 0, -5:] = 0

    ref = scl_sequence_loss(
        jnp.asarray(embs), jnp.asarray(seq_lens), jnp.asarray(steps),
        jnp.asarray(masks), temperature=0.1, label_varience=10.0,
        positive_type="gauss", negative_type=neg)["loss"]
    fused = scl_loss_fused(
        jnp.asarray(embs), jnp.asarray(seq_lens), jnp.asarray(steps),
        jnp.asarray(masks), 0.1, 10.0, neg)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-4)
