"""Packed ViT attention: variant shootout v2 (overhead-calibrated).

The r3 v1 shootout (`bench_attn_variants.py`) chained iterations through a
579 MB concatenate — ~11 ms of harness overhead per iteration that masked
every variant delta (all read ~16.5 ms while the in-model kernel measures
4.8 ms/block for the same 160 frames). This harness:

- uses the REAL in-model call shape (B=40 frames per scan chunk, N=785),
- chains through a scalar-perturbed add (qkv + 1e-30*sum(o)) so XLA cannot
  hoist the kernel out of the fori_loop, and
- CALIBRATES the chaining overhead with an identity "attention" and
  subtracts it, reporting net kernel time.

In-model ground truth to beat: 1.20 ms/call (4.8 ms/block/step at 4 chunks,
~63 T/s on 2*2*B*H*N*N*dh attention math; ceiling 98 T/s at K=dh=64).
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

from video_rep_learning_tpu.ops.attention_pallas import _packed_forward

B, N, H, dh = 40, 785, 12, 64
D = H * dh
ITERS = 20
LOG2E = 1.4426950408889634
FLOPS = 2 * 2 * B * H * N * N * dh
SCALE = 1.0 / np.sqrt(dh)


# --- variant kernels --------------------------------------------------------

def _softmax(s, *, exp2, nomax):
    if nomax:
        # Max-free softmax: exp2(min(s2, 110)) — exact (same math, fp32-safe:
        # 2^110 * 785 = 3e35 < fp32 max) for all logits <= 110/log2(e) = 76;
        # beyond that softmax is saturated one-hot anyway. Saves the row-max
        # pass + subtract.
        p = jnp.exp2(jnp.minimum(s, 110.0)) if exp2 else jnp.exp(
            jnp.minimum(s, 76.0))
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m) if exp2 else jnp.exp(s - m)
    return p, jnp.sum(p, axis=-1, keepdims=True)


def _kernel_var(qkv_ref, o_ref, *, hp, gpp, exp2, nomax, batched):
    scale = SCALE * (LOG2E if exp2 else 1.0)
    g0 = pl.program_id(1) * gpp
    for gg in range(gpp):
        off = pl.multiple_of((g0 + gg) * hp * dh, 128)
        w = hp * dh
        qs = qkv_ref[0, :, pl.ds(off, w)]
        ks = qkv_ref[0, :, pl.ds(D + off, w)]
        vs = qkv_ref[0, :, pl.ds(2 * D + off, w)]
        if batched:
            # one batched dot over the hp heads instead of hp separate dots
            qb = qs.reshape(N, hp, dh).transpose(1, 0, 2)
            kb = ks.reshape(N, hp, dh).transpose(1, 0, 2)
            vb = vs.reshape(N, hp, dh).transpose(1, 0, 2)
            s = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            p, l = _softmax(s, exp2=exp2, nomax=nomax)
            o = jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) / l
            o_ref[0, :, pl.ds(off, w)] = (
                o.transpose(1, 0, 2).reshape(N, w).astype(o_ref.dtype))
        else:
            outs = []
            for t in range(hp):
                q = qs[:, t * dh:(t + 1) * dh]
                k = ks[:, t * dh:(t + 1) * dh]
                v = vs[:, t * dh:(t + 1) * dh]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                p, l = _softmax(s, exp2=exp2, nomax=nomax)
                o = jax.lax.dot(p.astype(v.dtype), v,
                                preferred_element_type=jnp.float32) / l
                outs.append(o.astype(o_ref.dtype))
            o_ref[0, :, pl.ds(off, w)] = jnp.concatenate(outs, axis=1)


def _kernel_multi_img(qkv_ref, o_ref, *, imgs, bf16p):
    # `imgs` images per program, all heads: even more independent
    # matmul->softmax chains in one schedule
    scale = SCALE * LOG2E
    for i in range(imgs):
        for g in range(H // 2):
            off = pl.multiple_of(g * 128, 128)
            qs = qkv_ref[i, :, pl.ds(off, 128)]
            ks = qkv_ref[i, :, pl.ds(D + off, 128)]
            vs = qkv_ref[i, :, pl.ds(2 * D + off, 128)]
            outs = []
            for t in range(2):
                q = qs[:, t * dh:(t + 1) * dh]
                k = ks[:, t * dh:(t + 1) * dh]
                v = vs[:, t * dh:(t + 1) * dh]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                p = jnp.exp2(jnp.minimum(s, 110.0))
                if bf16p:
                    p = p.astype(jnp.bfloat16)
                    l = jnp.sum(p.astype(jnp.float32), axis=-1,
                                keepdims=True)
                else:
                    l = jnp.sum(p, axis=-1, keepdims=True)
                    p = p.astype(v.dtype)
                o = jax.lax.dot(p, v,
                                preferred_element_type=jnp.float32) / l
                outs.append(o.astype(o_ref.dtype))
            o_ref[i, :, pl.ds(off, 128)] = jnp.concatenate(outs, axis=1)


def build_multi(imgs, bf16p=False):
    kern = functools.partial(_kernel_multi_img, imgs=imgs, bf16p=bf16p)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B // imgs,),
            in_specs=[pl.BlockSpec((imgs, N, 3 * D), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((imgs, N, D), lambda b: (b, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def build_variant(**kw):
    gpp = kw.pop("gpp", 1)
    hp = 2
    kern = functools.partial(_kernel_var, hp=hp, gpp=gpp, **kw)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, (H // hp) // gpp),
            in_specs=[pl.BlockSpec((1, N, 3 * D), lambda b, g: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, N, D), lambda b, g: (b, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )


# --- harness ----------------------------------------------------------------

def chained(attn_fn):
    def run(qkv):
        def body(i, qkv):
            o = attn_fn(qkv)
            eps = jnp.sum(o.astype(jnp.float32)) * jnp.float32(1e-30)
            return (qkv.astype(jnp.float32) + eps).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body, qkv)
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
    print(f"backend={jax.default_backend()} B={B} N={N} H={H} dh={dh}")
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, N, 3 * D) * 0.3, jnp.bfloat16)

    def identity(qkv):
        return qkv[:, :, :D]

    overhead = timed(chained(jax.jit(identity)), qkv)
    print(f"harness overhead: {overhead*1e3:.3f} ms/iter")

    def ref(qkv):
        nb = qkv.shape[0]
        def heads(x):
            return x.reshape(nb, N, H, dh).transpose(0, 2, 1, 3)
        q, k, v = (heads(qkv[..., i * D:(i + 1) * D]) for i in range(3))
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * SCALE
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
        return o.transpose(0, 2, 1, 3).reshape(nb, N, D)

    want = np.asarray(jax.jit(ref)(qkv[:2]), np.float32)

    variants = [
        ("shipped", lambda x: _packed_forward(x, H)),
        ("exp2", jax.jit(build_variant(exp2=True, nomax=False,
                                       batched=False))),
        ("nomax+exp2", jax.jit(build_variant(exp2=True, nomax=True,
                                             batched=False))),
        # "batched" dot_general over the hp heads dim: Mosaic rejects the
        # (N, 128) -> (N, 2, 64) shape cast ("infer-vector-layout:
        # unsupported shape cast") — not buildable.
        ("allh+nomax", jax.jit(build_variant(exp2=True, nomax=True,
                                             batched=False, gpp=6))),
        ("img2", jax.jit(build_multi(2))),
        ("img4", jax.jit(build_multi(4))),
        ("img2+bf16p", jax.jit(build_multi(2, bf16p=True))),
        ("img1+bf16p", jax.jit(build_multi(1, bf16p=True))),
    ]
    for name, fn in variants:
        got = np.asarray(jax.jit(fn)(qkv)[:2], np.float32)
        err = np.abs(got - want).max()
        assert err < 2e-2, (name, err)
        t = timed(chained(fn), qkv)
        net = t - overhead
        print(f"{name:12s} {t*1e3:7.3f} ms raw | net {net*1e3:7.3f} ms "
              f"| {FLOPS/net/1e12:6.1f} T/s (x48 calls/step = "
              f"{net*48e3:6.1f} ms attention/step)")


if __name__ == "__main__":
    main()
