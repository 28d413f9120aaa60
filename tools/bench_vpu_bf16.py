"""Does this chip's VPU run bf16 elementwise math above the fp32 rate?

Decides the one "unverified" claim in BASELINE.md's CARL augment-kernel
ceiling row: the fused photometric kernel is VPU-bound (~20+ fp32
elementwise passes per frame in VMEM), so internal bf16 math would only be
worth its value drift if the VPU's bf16 throughput is materially above
fp32. This measures exactly that with a Pallas kernel whose body is a
photometric-shaped elementwise chain (mul/add/clip/select/compare) run
`REPS` times over a VMEM-resident block, grid over blocks — compute-bound
by construction (the one HBM read/write is amortized over ~200 passes).

Chained-loop harness per CLAUDE.md (variants inside ONE jit via
lax.fori_loop, chained through a scalar so XLA cannot hoist). Overhead is
removed by SLOPE, not subtraction: time the same kernel at two REPS counts
and difference them — DMA, dispatch, and chain overhead are identical at
both points, so the slope is pure elementwise rate. (The first version
subtracted an identity-chain calibration and read NEGATIVE bf16 time: the
relay's per-call variance is larger than the signal at this size.)
Run on the real chip: python tools/bench_vpu_bf16.py
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

B, S = 48, 512     # 48 x 512 x 512 = 12.6M elements (~ one 224px frame x16)
REPS_LO, REPS_HI = 6, 48   # slope endpoints (r4 advisor: keep the spread wide
#                            — 24-rep spread + best-of-4 was ~5x less signal
#                            on a relay link with large per-call variance)
OPS_PER_REP = 8    # mul, add, 2x clip bounds, mul, compare, 2x select arms
ITERS = 10         # fori_loop chain length per timed call


def _chain_kernel(x_ref, o_ref, *, dtype, reps):
    v = x_ref[0].astype(dtype)
    one = 1.0001
    eps = 0.0001
    for _ in range(reps):
        v = jnp.clip(v * one + eps, 0.0, 1.0)
        v = jnp.where(v > 0.5, v * 0.999, v * 1.001)
    o_ref[0] = v.astype(o_ref.dtype)


def chain(x, dtype, reps):
    return pl.pallas_call(
        functools.partial(_chain_kernel, dtype=dtype, reps=reps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, S, S), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, S, S), lambda b: (b, 0, 0)),
    )(x)


def chained(fn, x):
    def run(x):
        def body(i, x):
            o = fn(x)
            e = jnp.sum(o[:1, :8, :8].astype(jnp.float32)) * jnp.float32(1e-30)
            return (x.astype(jnp.float32) + e).astype(x.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return jax.jit(run)


def timed(fn, x):
    out = fn(x)
    float(jnp.sum(out[:1, :8, :8].astype(jnp.float32)))
    best = float("inf")
    for rep in range(9):
        t0 = time.time()
        out = fn(x)
        float(jnp.sum(out[:1, :8, :8].astype(jnp.float32)))
        dt = (time.time() - t0) / ITERS
        if rep > 0:
            best = min(best, dt)
    return best


def main():
    print(f"backend={jax.default_backend()} block=({B},{S},{S}) "
          f"reps={REPS_LO}->{REPS_HI} ops/rep~{OPS_PER_REP}")
    rng = np.random.RandomState(0)
    xf = jnp.asarray(rng.rand(B, S, S), jnp.float32)
    xb = xf.astype(jnp.bfloat16)

    for name, x, dtype in (
            ("fp32 in, fp32 math", xf, jnp.float32),
            ("bf16 in, bf16 math", xb, jnp.bfloat16),
            ("bf16 in, fp32 math", xb, jnp.float32)):
        t_lo = timed(chained(lambda v: chain(v, dtype, REPS_LO), x), x)
        t_hi = timed(chained(lambda v: chain(v, dtype, REPS_HI), x), x)
        dt = t_hi - t_lo
        vops = B * S * S * (REPS_HI - REPS_LO) * OPS_PER_REP
        print(f"{name:20s} slope {dt*1e3:7.3f} ms/iter  "
              f"{vops/dt/1e12:6.2f} T vec-ops/s  "
              f"(lo {t_lo*1e3:.3f} hi {t_hi*1e3:.3f})")


if __name__ == "__main__":
    main()
