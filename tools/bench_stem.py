"""ResNet stem A/B on the real chip: direct 7x7/2 conv1 vs the exact
space-to-depth reparameterization (`models/resnet.py::StemConv`,
VRL_S2D_STEM=1).

Motivation: the stem contracts only K = 7*7*3 = 147 with stride 2 — the
least MXU-friendly conv in the trunk (3 input channels leave 125 of 128
sublanes idle in the im2col mapping). The s2d form is a dense K=192
stride-1 conv over the 2x2-packed (112, 112, 12) input — the standard TPU
ResNet trick. Parity is exact (tests/test_model_matrix.py); this measures
whether it is faster ON THIS CHIP before flipping any default.

Chained-loop calibrated harness (see tools/bench_packed_attn.py for the
method and the cautionary tale about uncalibrated chaining): variants are
timed inside ONE jit via lax.fori_loop, chained through a scalar
perturbation so XLA cannot hoist the conv, with identity-op overhead
subtracted. Run: python tools/bench_stem.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_rep_learning_tpu.models.resnet import _s2d_weights, _space_to_depth

B, S = 40, 224  # one FRAMES_PER_BATCH scan chunk of the CARL bench workload
ITERS = 20
# useful FLOPs (the zero taps the s2d kernel adds are not useful work)
FLOPS = 2 * B * (S // 2) ** 2 * 64 * 7 * 7 * 3


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x, w):
    return jax.lax.conv_general_dilated(
        _space_to_depth(x), _s2d_weights(w.astype(jnp.float32)).astype(w.dtype),
        window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def full_stem(conv):
    """conv -> relu -> maxpool 3x3/2 (BN folds into conv in inference)."""
    def run(x, w):
        y = jax.nn.relu(conv(x, w))
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
    return run


def chained(fn):
    def run(x, w):
        def body(i, x):
            o = fn(x, w)
            eps = jnp.sum(o.astype(jnp.float32)) * jnp.float32(1e-30)
            return (x.astype(jnp.float32) + eps).astype(x.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return jax.jit(run)


def timed(fn, x, w):
    out = fn(x, w)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for rep in range(5):
        t0 = time.time()
        out = fn(x, w)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.time() - t0) / ITERS
        if rep > 0:
            best = min(best, dt)
    return best


def main():
    print(f"backend={jax.default_backend()} B={B} S={S} bf16")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, S, 3) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.bfloat16)

    overhead = timed(chained(lambda x, w: x[:, ::2, ::2, :1]), x, w)
    print(f"harness overhead: {overhead*1e3:.3f} ms/iter")

    for name, fn in (("conv1 direct", direct), ("conv1 s2d", s2d),
                     ("stem direct (conv+relu+pool)", full_stem(direct)),
                     ("stem s2d    (conv+relu+pool)", full_stem(s2d))):
        dt = timed(chained(fn), x, w) - overhead
        print(f"{name:30s} {dt*1e3:7.3f} ms/iter  "
              f"{FLOPS/dt/1e12:6.1f} T/s(useful)  "
              f"-> {dt*1e3*12:6.2f} ms/step(480f)")


if __name__ == "__main__":
    main()
