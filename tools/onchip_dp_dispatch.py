#!/usr/bin/env python
"""On-chip proof that COMPILED Mosaic kernels execute inside jax.shard_map.

The 8-virtual-CPU DP tests (tests/test_dp_kernels.py) validate the
`dp_kernel_call` routing semantics, but two layers of caveats remain
(VERDICT r3 weak #3): they run interpret-mode Pallas, and the two
multi-scratch kernels (fused ViT half-block, fused MLP block) must swap
their bodies for XLA oracles because interpret mode wedges under shard_map
on the 1-core host. This script retires the "a real Mosaic custom call
inside shard_map has never compiled anywhere" caveat: on the real TPU it
routes every dp_kernel_call-routed kernel entry through `jax.shard_map`
over a 1-device 'data' mesh — the same wrapping `dp_kernel_call` emits on a
multi-chip mesh (jax.shard_map, in_specs P('data')/P(), check_vma=False) —
with the REAL compiled kernel bodies, at real model shapes, and asserts
numerics (and for the ViT half-block, weight gradients) against the direct
unsharded call. Matches DDP per-rank execution (reference train.py:285-286).

    python tools/onchip_dp_dispatch.py        # prints one PASS line per kernel
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_rep_learning_tpu.parallel import sharding

FAILURES = []


def _run(name, fn, args, want_fn=None, atol=0.0):
    """fn(*args) routed through dp_kernel_call's shard_map (1-device 'data'
    mesh, real compiled kernels) vs the direct unsharded call."""
    sharding._DP["mesh"] = None
    want = np.asarray(jax.jit(want_fn or fn)(*args), np.float32)

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    # set_data_context rejects 1-device meshes by design (no win on one
    # chip); install directly so dp_kernel_call takes its shard_map branch.
    sharding._DP["mesh"] = mesh
    try:
        assert sharding.data_context() is mesh
        got = np.asarray(jax.jit(fn)(*args), np.float32)
    finally:
        sharding._DP["mesh"] = None

    diff = float(np.max(np.abs(got - want))) if got.size else 0.0
    ok = diff <= atol and got.shape == want.shape
    print(f"{'PASS' if ok else 'FAIL'} {name}: shard_map-vs-direct "
          f"max|Δ| = {diff:.3e} (atol {atol:g})", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    assert jax.default_backend() == "tpu", (
        "run on the real chip: " + jax.default_backend())
    rng = np.random.RandomState(0)

    # fused LayerNorm
    from video_rep_learning_tpu.ops.layernorm_pallas import fused_layernorm
    x = jnp.asarray(rng.randn(4, 785, 768) * 0.5, jnp.bfloat16)
    s = jnp.asarray(1 + 0.1 * rng.randn(768), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(768), jnp.float32)
    _run("fused_layernorm", fused_layernorm, (x, s, b))

    # LN+matmul(+GELU) prologue kernel (LN1+qkv / LN2+fc1 shapes)
    from video_rep_learning_tpu.ops.matmul_gelu_pallas import (
        ln_matmul_bias_act, ln_mlp_block, matmul_bias_gelu)
    w = jnp.asarray(rng.randn(768, 2304) * 0.02, jnp.bfloat16)
    bb = jnp.asarray(rng.randn(2304) * 0.02, jnp.float32)
    _run("ln_matmul_bias_act", lambda *a: ln_matmul_bias_act(*a, "none"),
         (x, s, b, w, bb))

    w1 = jnp.asarray(rng.randn(768, 3072) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(3072) * 0.02, jnp.float32)
    _run("matmul_bias_gelu", matmul_bias_gelu, (x, w1, b1))

    # fused MLP half-block (two VMEM scratches — the body the CPU DP test
    # could only run as an XLA-oracle swap)
    w2 = jnp.asarray(rng.randn(3072, 768) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(768) * 0.02, jnp.float32)
    _run("ln_mlp_block", lambda *a: ln_mlp_block(*a, "gelu_exact"),
         (x, s, b, w1, b1, w2, b2))

    # packed ViT attention (B, N, 3D) — the pre-r3 default path
    from video_rep_learning_tpu.ops.attention_pallas import (
        flash_attention, packed_vit_attention)
    qkv = jnp.asarray(rng.randn(4, 785, 3 * 768) * 0.3, jnp.bfloat16)
    _run("packed_vit_attention", lambda a: packed_vit_attention(a, 12),
         (qkv,), atol=1e-6)

    # flash attention with a key mask (eval-bucket path)
    q = jnp.asarray(rng.randn(2, 12, 256, 64) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, 12, 256, 64) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(2, 12, 256, 64) * 0.3, jnp.bfloat16)
    mask = jnp.asarray(rng.rand(2, 256) > 0.2, jnp.float32)
    _run("flash_attention", lambda *a: flash_attention(*a, sm_scale=0.125),
         (q, k, v, mask), atol=1e-6)

    # fused ViT attention half-block (the r3 default on the MVF hot path;
    # its interpret-mode body deadlocks under shard_map — CLAUDE.md)
    from video_rep_learning_tpu.ops import vit_block_pallas as vbp
    D = 768
    ln_s = jnp.asarray(1 + 0.1 * rng.randn(D), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.randn(D), jnp.float32)
    wqkv = jnp.asarray(rng.randn(D, 3 * D) * 0.02, jnp.bfloat16)
    bqkv = jnp.asarray(rng.randn(3 * D) * 0.02, jnp.float32)
    wproj = jnp.asarray(rng.randn(D, D) * 0.02, jnp.bfloat16)
    bproj = jnp.asarray(rng.randn(D) * 0.02, jnp.float32)
    wts = (ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    _run("vit_attention_block",
         lambda *a: vbp.vit_attention_block(*a, 12), (x,) + wts)

    # ... and its weight gradients: shard_map's transpose must insert the
    # replicated-operand psums and match the direct vjp
    def gfn(*a):
        return jax.grad(
            lambda *aa: jnp.sum(
                vbp.vit_attention_block(*aa, 12).astype(jnp.float32) ** 2),
            argnums=(0, 3, 5))(*a)

    _run("vit_attention_block_grads",
         lambda *a: jnp.concatenate([g.astype(jnp.float32).ravel()
                                     for g in gfn(*a)]),
         (x,) + wts, atol=1e-4)

    # fused crop+photometric augmentation (uint8 in, per-sample prefetch)
    from video_rep_learning_tpu.ops.augment import _rrc_matrix
    from video_rep_learning_tpu.ops.photometric_pallas import (
        blur_band_matrix, fused_crop_photometric, fused_photometric)
    BV, T, H, W, S = 4, 4, 256, 256, 224
    videos = jnp.asarray(
        rng.randint(0, 255, (BV, T, 3, H, W)).astype(np.uint8)).view(jnp.int8)
    boxes = jnp.asarray(np.stack(
        [[10.0, 6.0, 200.0, 220.0] for _ in range(BV)], 0), jnp.float32)
    rh = jax.vmap(lambda bx: _rrc_matrix(H, S, bx[2], bx[0]))(boxes)
    rw = jax.vmap(lambda bx: _rrc_matrix(W, S, bx[3], bx[1]).T)(boxes)
    fscal = jnp.asarray(np.stack(
        [np.array([1, 1.1, 0.9, 1.05, 0.02, 1, 0, 1], np.float32)
         for _ in range(BV)]))
    orders = jnp.tile(jnp.asarray([0, 1, 2, 3], jnp.int32), (BV, 1))
    sig = jnp.full((BV,), 0.7, jnp.float32)
    mh = jax.vmap(lambda s_: blur_band_matrix(S, 9, s_).T)(sig)
    mw = jax.vmap(lambda s_: blur_band_matrix(S, 5, s_))(sig)
    _run("fused_crop_photometric", fused_crop_photometric,
         (videos, rh, rw, fscal, orders, mh, mw))

    vids_f = jnp.asarray(rng.rand(BV, T, 3, S, S), jnp.float32)
    _run("fused_photometric", fused_photometric,
         (vids_f, fscal, orders, mh, mw))

    if FAILURES:
        print(f"\n{len(FAILURES)} kernel(s) FAILED under compiled shard_map "
              f"dispatch: {FAILURES}")
        return 1
    print("\nall compiled kernels execute correctly inside shard_map on TPU")
    return 0


if __name__ == "__main__":
    sys.exit(main())
