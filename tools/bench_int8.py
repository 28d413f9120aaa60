"""Microbenchmark: int8 vs bf16 matmul MXU rate on the attached TPU.

Motivation (VERDICT r2 weak #1): the MVF step's bf16 matmul floor makes the
3x perf target unreachable — v5e lists 197 bf16 TFLOP/s vs 394 int8 TOP/s,
so an int8 frozen-backbone path doubles the ceiling IF XLA actually lowers
int8 dot_general onto the MXU at rate here. This measures that before the
quantized path is built.

Relay measurement rules (CLAUDE.md): loop inside ONE jit with chained
inputs (data dependency covers all iterations), synchronize by reading a
scalar, discard the first timed loop. Feedback between iterations must be
CHEAP (a cast/scale, not tanh/modulo — v1 of this bench measured the VPU
feedback op, not the matmul: both dtypes flatlined at ~46 T/s).
"""

import time

import jax
import jax.numpy as jnp

ITERS = 50


def timed(fn, args, flops_per_iter, label):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # warm compile + execute
    best = float("inf")
    for rep in range(4):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = time.time() - t0
        if rep == 0:
            continue  # relay warmup inflates the first timed loop
        best = min(best, dt)
    tput = flops_per_iter * ITERS / best / 1e12
    print(f"{label:36s} {best*1e3/ITERS:8.3f} ms/mm {tput:7.1f} T/s")
    return tput


def bench_bf16(M, K):
    w = jnp.asarray(jax.random.normal(jax.random.key(0), (K, K)), jnp.bfloat16) * 0.03

    @jax.jit
    def run(x, w):
        def body(i, x):
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return (y * 0.001).astype(jnp.bfloat16)  # cheap chain
        return jax.lax.fori_loop(0, ITERS, body, x)

    x = jnp.asarray(jax.random.normal(jax.random.key(1), (M, K)), jnp.bfloat16)
    return timed(run, (x, w), 2 * M * K * K, f"bf16 ({M}x{K} @ {K}x{K})")


def bench_int8(M, K):
    w = jnp.asarray(
        jax.random.randint(jax.random.key(0), (K, K), -127, 128), jnp.int8)

    @jax.jit
    def run(x, w):
        def body(i, x):
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jax.lax.shift_right_arithmetic(y, 8).astype(jnp.int8)
        return jax.lax.fori_loop(0, ITERS, body, x)

    x = jnp.asarray(
        jax.random.randint(jax.random.key(1), (M, K), -127, 128), jnp.int8)
    return timed(run, (x, w), 2 * M * K * K, f"int8 ({M}x{K} @ {K}x{K})")


def bench_int8_dyn_quant(M, K):
    """The full dynamic-quantization round trip as the model would run it:
    bf16 activations -> per-row scale -> int8 matmul -> dequant -> bf16."""
    wq = jnp.asarray(
        jax.random.randint(jax.random.key(0), (K, K), -127, 128), jnp.int8)
    wscale = jnp.full((K,), 0.01, jnp.float32)

    @jax.jit
    def run(x, wq, wscale):
        def body(i, x):
            s = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32) / 127.0
            xq = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
            y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            yf = y.astype(jnp.float32) * s * wscale[None, :]
            return yf.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body, x)

    x = jnp.asarray(jax.random.normal(jax.random.key(1), (M, K)), jnp.bfloat16)
    return timed(run, (x, wq, wscale), 2 * M * K * K,
                 f"dyn-quant round trip ({M}x{K})")


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    for M, K in ((31360, 768), (8192, 2048), (16384, 3072)):
        bf16 = bench_bf16(M, K)
        i8 = bench_int8(M, K)
        rt = bench_int8_dyn_quant(M, K)
        print(f"  -> int8/bf16 raw {i8/bf16:.2f}x, round-trip {rt/bf16:.2f}x\n")


if __name__ == "__main__":
    main()
