"""Feasibility + rate check: int8 x int8 -> int32 matmul INSIDE a Pallas
kernel at the ViT-B/8 fc1 shape, vs the XLA int8 dot and the bf16 baseline.

If Mosaic sustains ~2x bf16 rate here, the quantized-backbone design can
move to fully-fused Pallas pipelines (quantize in the LN/GELU epilogues,
dequant in the matmul epilogue); if not, int8 on this chip is not worth its
overhead and the backbone stays bf16 (the study that decides VERDICT r3 #1).

Timing: chained fori loop inside ONE jit (relay rules, CLAUDE.md) — the
feedback is a cheap shift/scale-cast, not a transcendental.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, F = 31360, 768, 3072   # 40-frame ViT-B/8 chunk fc1
BM = 512
ITERS = 20
_VMEM = 100 * 1024 * 1024


def _mm_kernel(x_ref, w_ref, o_ref, *, acc_dtype):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)


def _pallas_mm(x, w, acc_dtype):
    m, k = x.shape
    f = w.shape[1]
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct((m, f), acc_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(m // BM,),
            in_specs=[
                pl.BlockSpec((BM, k), lambda i: (i, 0)),
                pl.BlockSpec((k, f), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((BM, f), lambda i: (i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM),
    )(x, w)


def _chain_int8(mm):
    """y (M, F) int32 -> next x (M, K) int8 via cheap shift+slice."""
    def run(x, w):
        def body(i, x):
            y = mm(x, w)
            return jax.lax.shift_right_arithmetic(
                y[:, :K], jnp.int32(8)).astype(jnp.int8)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return jax.jit(run)


def _chain_bf16(mm):
    def run(x, w):
        def body(i, x):
            y = mm(x, w)
            return (y[:, :K] * 0.001).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return jax.jit(run)


def timed(fn, x, w, label):
    out = fn(x, w)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + settle
    best = float("inf")
    for rep in range(4):
        t0 = time.time()
        out = fn(x, w)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.time() - t0) / ITERS
        if rep == 0:
            continue  # relay warmup
        best = min(best, dt)
    tput = 2 * M * K * F / best / 1e12
    print(f"{label:24s} {best*1e3:8.3f} ms/mm  {tput:7.1f} T/s")
    return tput


def main():
    print(f"backend={jax.default_backend()}  shape ({M},{K})x({K},{F})")
    rng = np.random.RandomState(0)
    xi = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    wi = jnp.asarray(rng.randint(-127, 128, (K, F)), jnp.int8)
    xb = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    wb = jnp.asarray(rng.randn(K, F) * 0.03, jnp.bfloat16)

    got = np.asarray(_pallas_mm(xi[:512], wi, jnp.int32)[:4, :4])
    want = np.asarray(xi[:4].astype(jnp.int32) @ wi[:, :4].astype(jnp.int32))
    np.testing.assert_array_equal(got, want)
    print("pallas int8 correctness OK")

    def xla_mm(acc):
        return lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=acc)

    timed(_chain_bf16(xla_mm(jnp.float32)), xb, wb, "XLA bf16")
    timed(_chain_int8(xla_mm(jnp.int32)), xi, wi, "XLA int8")
    timed(_chain_bf16(lambda x, w: _pallas_mm(x, w, jnp.float32)), xb, wb,
          "Pallas bf16")
    timed(_chain_int8(lambda x, w: _pallas_mm(x, w, jnp.int32)), xi, wi,
          "Pallas int8")


if __name__ == "__main__":
    main()
