#!/usr/bin/env python
"""Attention micro-benchmark: Pallas flash kernel vs XLA fused attention at
the model family's real shapes (SURVEY.md §5):

- ViT-B/8 spatial attention: (frames, 12, 785, 64), bf16, forward only
  (frozen backbone) — `transformer.py:186-214`
- MVF temporal encoder: (2, 8, ntok*T, 32), fp32, forward+backward
  (`mvformer.py:170`; penn_mvf 240 tokens, fg288 1440 tokens)
- CARL embedder encoder: (2, 8, 240, 32)

Timing note (CLAUDE.md): on the relay PJRT plugin, block_until_ready is
unreliable — every measurement chains the output back into the input and
synchronizes by reading a scalar whose data dependency covers all steps.
"""

import argparse
import math
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_forward(fn, q, k, v, iters=20):
    f = jax.jit(fn)
    x = f(q, k, v)
    float(jnp.sum(x.astype(jnp.float32)))  # compile + sync
    x = q
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x, k, v)  # output feeds next q -> serialized chain
    float(jnp.sum(x.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def bench_fwd_bwd(fn, q, k, v, iters=20):
    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    dq, dk, dv = g(q, k, v)
    float(jnp.sum(dq.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        # chain grads back into inputs -> serialized
        q = (q - 1e-6 * dq.astype(q.dtype)).astype(q.dtype)
        dq, dk, dv = g(q, k, v)
    float(jnp.sum(dq.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def xla_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from video_rep_learning_tpu.ops.attention_pallas import mha_with_flash

    shapes = [
        # (name, B, H, S, d, dtype, train)
        ("vit_b8_785tok_40f_bf16_fwd", 40, 12, 785, 64, jnp.bfloat16, False),
        ("vit_b8_785tok_160f_bf16_fwd", 160, 12, 785, 64, jnp.bfloat16, False),
        ("mvf_penn_240tok_fp32_fwdbwd", 2, 8, 240, 32, jnp.float32, True),
        ("mvf_fg288_1440tok_fp32_fwdbwd", 2, 8, 1440, 32, jnp.float32, True),
        ("carl_240tok_fp32_fwdbwd", 2, 8, 240, 32, jnp.float32, True),
    ]
    print(f"backend={jax.default_backend()}")
    for name, B, H, S, d, dtype, train in shapes:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, S, d), dtype)
        k = jnp.asarray(rng.randn(B, H, S, d), dtype)
        v = jnp.asarray(rng.randn(B, H, S, d), dtype)
        bench = bench_fwd_bwd if train else bench_forward
        t_xla = bench(xla_attention, q, k, v, args.iters)
        t_flash = bench(lambda a, b, c: mha_with_flash(a, b, c, None),
                        q, k, v, args.iters)
        flops = 4 * B * H * S * S * d * (3.5 if train else 1)
        print(f"{name}: xla {t_xla*1e3:8.3f} ms | flash {t_flash*1e3:8.3f} ms "
              f"| speedup {t_xla/t_flash:5.2f}x | flash {flops/t_flash/1e12:6.2f} TF/s")


if __name__ == "__main__":
    main()
