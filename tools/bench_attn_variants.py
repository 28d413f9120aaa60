"""Packed ViT attention kernel: variant shootout on the real chip.

The r3 profile shows the packed kernel at ~4.8 ms/block (57.6 ms/step,
~5 TF/s on the attention math) — VPU/softmax-bound, not MXU-bound. Variants:

  base    : shipped kernel (grid (B, H/hp), exp, one-shot softmax)
  exp2    : fold log2(e) into the scale, use exp2 (cheaper transcendental)
  allheads: grid (B,) — one program per image loops all 6 head groups, so
            the (N, 3D) qkv block is DMA'd once instead of 6 times
  rowtile : 128-row q tiles inside the program (MXU(t+1) can overlap
            VPU-softmax(t) if Mosaic software-pipelines)

Each timed via a chained fori loop (relay rules): out feeds back into the
qkv slot through a cheap affine cast.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, H, dh = 160, 785, 12, 64   # one 40-frame ViT-B/8 chunk
D = H * dh
ITERS = 4
LOG2E = 1.4426950408889634
FLOPS = 2 * 2 * B * H * N * N * dh  # qk + pv


def _softmax_rows(s):
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    return p, jnp.sum(p, axis=1, keepdims=True)


def _softmax_rows_exp2(s2):
    m = jnp.max(s2, axis=1, keepdims=True)
    p = jnp.exp2(s2 - m)
    return p, jnp.sum(p, axis=1, keepdims=True)


def _head_attn(q, k, v, scale, exp2):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p, l = _softmax_rows_exp2(s) if exp2 else _softmax_rows(s)
    o = jax.lax.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32) / l
    return o


def _kernel_grouped(qkv_ref, o_ref, *, hp, exp2, groups_per_prog):
    g0 = pl.program_id(1) * groups_per_prog
    scale = (1.0 / np.sqrt(dh)) * (LOG2E if exp2 else 1.0)
    for gg in range(groups_per_prog):
        off = pl.multiple_of((g0 + gg) * hp * dh, 128)
        w = hp * dh
        qs = qkv_ref[0, :, pl.ds(off, w)]
        ks = qkv_ref[0, :, pl.ds(D + off, w)]
        vs = qkv_ref[0, :, pl.ds(2 * D + off, w)]
        outs = []
        for t in range(hp):
            q = qs[:, t * dh:(t + 1) * dh]
            k = ks[:, t * dh:(t + 1) * dh]
            v = vs[:, t * dh:(t + 1) * dh]
            outs.append(_head_attn(q, k, v, scale, exp2).astype(o_ref.dtype))
        o_ref[0, :, pl.ds(off, w)] = jnp.concatenate(outs, axis=1)


def _kernel_rowtile(qkv_ref, o_ref, *, hp, exp2, bq):
    g = pl.program_id(1)
    scale = (1.0 / np.sqrt(dh)) * (LOG2E if exp2 else 1.0)
    off = pl.multiple_of(g * hp * dh, 128)
    w = hp * dh
    qs = qkv_ref[0, :, pl.ds(off, w)]
    ks = qkv_ref[0, :, pl.ds(D + off, w)]
    vs = qkv_ref[0, :, pl.ds(2 * D + off, w)]
    nt = -(-N // bq)
    head_outs = []
    for t in range(hp):
        q = qs[:, t * dh:(t + 1) * dh]
        k = ks[:, t * dh:(t + 1) * dh]
        v = vs[:, t * dh:(t + 1) * dh]
        outs = []
        for r in range(nt):
            lo = r * bq
            hi = min(N, lo + bq)
            o = _head_attn(q[lo:hi], k, v, scale, exp2)
            outs.append(o.astype(o_ref.dtype))
        head_outs.append(jnp.concatenate(outs, axis=0))
    o_ref[0, :, pl.ds(off, w)] = jnp.concatenate(head_outs, axis=1)


def build(variant):
    hp = 2
    if variant == "allheads":
        gpp, grid1 = H // hp, 1
    else:
        gpp, grid1 = 1, H // hp
    if variant == "rowtile":
        kern = functools.partial(_kernel_rowtile, hp=hp, exp2=True, bq=256)
    else:
        kern = functools.partial(_kernel_grouped, hp=hp,
                                 exp2=variant in ("exp2", "allheads"),
                                 groups_per_prog=gpp)
    attn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, grid1),
            in_specs=[pl.BlockSpec((1, N, 3 * D), lambda b, g: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, N, D), lambda b, g: (b, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def run(qkv):
        def body(i, qkv):
            o = attn(qkv)
            return jnp.concatenate(
                [o * 1.001, qkv[:, :, D:]], axis=2).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body, qkv)

    return jax.jit(attn), jax.jit(run)


def timed(fn, x, label):
    out = fn(x)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for rep in range(4):
        t0 = time.time()
        out = fn(x)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.time() - t0) / ITERS
        if rep == 0:
            continue
        best = min(best, dt)
    print(f"{label:10s} {best*1e3:8.3f} ms/chunk  {FLOPS/best/1e12:6.2f} T/s "
          f"(x4 chunks/step = {best*4e3:6.1f} ms/step)")


def main():
    print(f"backend={jax.default_backend()} B={B} N={N} H={H} dh={dh}")
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, N, 3 * D) * 0.3, jnp.bfloat16)

    # correctness vs XLA reference for each variant
    def ref(qkv):
        nb = qkv.shape[0]
        def heads(x):
            return x.reshape(nb, N, H, dh).transpose(0, 2, 1, 3)
        q, k, v = (heads(qkv[..., i * D:(i + 1) * D]) for i in range(3))
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / np.sqrt(dh)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
        return o.transpose(0, 2, 1, 3).reshape(nb, N, D)

    want = np.asarray(jax.jit(ref)(qkv[:2]), np.float32)
    for variant in ("base", "exp2", "allheads", "rowtile"):
        attn, chained = build(variant)
        got = np.asarray(attn(qkv)[:2], np.float32)
        err = np.abs(got - want).max()
        assert err < 2e-2, (variant, err)
        print(f"{variant}: correctness OK (max err {err:.2e})")
        timed(chained, qkv, variant)


if __name__ == "__main__":
    main()
