"""LN+matmul prologue kernel: grid-order shootout (overhead-calibrated).

Compares the original (nJ, B) weight-tile-outer grid ("jouter": LN prologue
recomputed nJ times per image) against the (B, nJ) image-outer grid with
the normalized rows cached in VMEM scratch at j==0 ("bouter": W tiles
re-DMA'd per image, ~7 MB, hidden under matmul compute, while LN recompute
is serial VPU time that cannot hide). Measured 184 vs 201 T/s at the fc1
shape — the scratch/image-outer form is what `ln_matmul_bias_act` ships;
both variants are built explicitly here, plus the shipped op as a sanity
row.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_rep_learning_tpu.ops.matmul_gelu_pallas import (
    _choose_bn, _gelu_exact, _ln_rows, ln_matmul_bias_act)

B, N, K, F = 40, 785, 768, 3072
ITERS = 20
FLOPS = 2 * B * N * K * F


def _kernel_jouter(x_ref, g_ref, be_ref, w_ref, b_ref, o_ref):
    xn = _ln_rows(x_ref[0].astype(jnp.float32), g_ref[0], be_ref[0], 1e-6,
                  x_ref.dtype)
    acc = jax.lax.dot(xn, w_ref[...], preferred_element_type=jnp.float32)
    y = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = _gelu_exact(y, fast_tail=o_ref.dtype == jnp.bfloat16).astype(
        o_ref.dtype)


def build_jouter(dtype):
    bn = _choose_bn(N, K, F, jnp.dtype(dtype).itemsize)
    nJ = F // bn
    return pl.pallas_call(
        _kernel_jouter,
        out_shape=jax.ShapeDtypeStruct((B, N, F), dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nJ, B),  # weight tile outer: LN recomputed per tile
            in_specs=[
                pl.BlockSpec((1, N, K), lambda j, b: (b, 0, 0)),
                pl.BlockSpec((1, K), lambda j, b: (0, 0)),
                pl.BlockSpec((1, K), lambda j, b: (0, 0)),
                pl.BlockSpec((K, bn), lambda j, b: (0, j)),
                pl.BlockSpec((1, bn), lambda j, b: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, N, bn), lambda j, b: (b, 0, j)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024),
    )


def _kernel_scratch(x_ref, g_ref, be_ref, w_ref, b_ref, o_ref, xn_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xn_ref[...] = _ln_rows(x_ref[0].astype(jnp.float32), g_ref[0],
                               be_ref[0], 1e-6, x_ref.dtype)

    acc = jax.lax.dot(xn_ref[...], w_ref[...],
                      preferred_element_type=jnp.float32)
    y = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = _gelu_exact(y, fast_tail=o_ref.dtype == jnp.bfloat16).astype(
        o_ref.dtype)


def build_scratch(dtype):
    bn = _choose_bn(N, K, F, jnp.dtype(dtype).itemsize)
    nJ = F // bn
    return pl.pallas_call(
        _kernel_scratch,
        out_shape=jax.ShapeDtypeStruct((B, N, F), dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, nJ),  # image outer: LN once per image into scratch
            in_specs=[
                pl.BlockSpec((1, N, K), lambda b, j: (b, 0, 0)),
                pl.BlockSpec((1, K), lambda b, j: (0, 0)),
                pl.BlockSpec((1, K), lambda b, j: (0, 0)),
                pl.BlockSpec((K, bn), lambda b, j: (0, j)),
                pl.BlockSpec((1, bn), lambda b, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, N, bn), lambda b, j: (b, 0, j)),
            scratch_shapes=[pltpu.VMEM((N, K), dtype)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024),
    )


def chained(fn, g, be, w, b):
    def run(x):
        def body(i, x):
            o = fn(x, g, be, w, b)
            eps = jnp.sum(o[..., :1].astype(jnp.float32)) * jnp.float32(1e-30)
            return (x.astype(jnp.float32) + eps).astype(x.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return jax.jit(run)


def timed(fn, x):
    out = fn(x)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for rep in range(5):
        t0 = time.time()
        out = fn(x)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.time() - t0) / ITERS
        if rep > 0:
            best = min(best, dt)
    return best


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, N, K), dt)
    g = jnp.asarray(1 + 0.1 * rng.randn(K), jnp.float32)
    be = jnp.asarray(0.1 * rng.randn(K), jnp.float32)
    w = jnp.asarray(rng.randn(K, F) * 0.03, jnp.float32)
    b = jnp.asarray(rng.randn(F) * 0.03, jnp.float32)

    def identity(x, g, be, w, b):
        return jnp.broadcast_to(x[..., :1], (B, N, F)).astype(dt)

    overhead = timed(chained(jax.jit(identity), g, be, w, b), x)
    print(f"backend={jax.default_backend()} overhead {overhead*1e3:.3f} ms")

    shipped = lambda x, g, be, w, b: ln_matmul_bias_act(
        x, g, be, w, b, "gelu_exact")
    jouter_call = build_jouter(dt)
    jouter = lambda x, g, be, w, b: jouter_call(
        x, g[None], be[None], w.astype(dt), b[None])
    scratch_call = build_scratch(dt)
    scratch = lambda x, g, be, w, b: scratch_call(
        x, g[None], be[None], w.astype(dt), b[None])

    want = np.asarray(jax.jit(jouter)(x, g, be, w, b)[:1], np.float32)
    for nm, fn in (("scratch", scratch), ("shipped", shipped)):
        got = np.asarray(jax.jit(fn)(x, g, be, w, b)[:1], np.float32)
        err = np.abs(got - want).max()
        assert err < 1e-2, (nm, err)
        print(f"{nm} variant correctness OK (max err {err:.2e})")

    for name, fn in (("jouter", jouter), ("scratch(bouter)", scratch),
                     ("shipped", shipped)):
        t = timed(chained(jax.jit(fn), g, be, w, b), x)
        net = t - overhead
        print(f"{name:16s} {t*1e3:7.3f} ms raw | net {net*1e3:7.3f} ms | "
              f"{FLOPS/net/1e12:6.1f} T/s (x24 calls/step = "
              f"{net*24e3:6.1f} ms)")


if __name__ == "__main__":
    main()
