#!/usr/bin/env python
"""CARL step budget: per-component ablation timing (VERDICT r3 #4).

Decomposes the ~58 ms CARL train step (`bench.py` carl workload: 1 clip x
2 views x 240 frames @224, frozen ResNet-50, SCL, bf16) into
augment / frozen trunk / trainable tail+head forward / SCL loss /
backward / Adam by timing a LADDER of jitted prefixes of the step and
differencing:

    null          (chain overhead calibration — relay dispatch ~1 ms)
    augment       fused crop+photometric kernel only
    trunk         augment + frozen scan trunk (stop_gradient)
    fwd           augment + full model forward (trunk + tail + head)
    loss          fwd + SCL loss
    grad          value_and_grad of loss (backward through tail+head+SCL)
    full          the real train step incl. Adam (trainer.build_train_step)

Each rung chains iterations through a data dependency (dims + eps*out) and
synchronizes by READING the final scalar (relay PJRT: block_until_ready
returns early — CLAUDE.md). Differences between rungs are the component
costs; the grad rung re-runs the forward, so backward = grad - loss.

    python tools/profile_carl_budget.py [--iters 8] [--workload carl|mvf]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--workload", choices=["carl", "mvf"], default="carl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from video_rep_learning_tpu.parallel.mesh import create_mesh, shard_batch
    from video_rep_learning_tpu.train.trainer import Trainer, merge_params

    on_tpu = jax.default_backend() == "tpu"
    cfg = (bench.carl_cfg if args.workload == "carl" else bench.mvf_cfg)(
        on_tpu)
    raw = 256 if on_tpu else 40
    mesh = create_mesh()
    trainer = Trainer(cfg, no_eval=True, build_loaders=False, mesh=mesh)
    trainer.init_state()
    model, algo = trainer.model, trainer.algo

    B, T = cfg.TRAIN.BATCH_SIZE, cfg.TRAIN.NUM_FRAMES
    rng = np.random.RandomState(0)
    batch = {
        "videos": rng.randint(0, 255, size=(B, 2, T, raw, raw, 3)).astype(
            np.uint8),
        "labels": np.zeros((B, 2, T), np.int32),
        "seq_lens": np.full((B, 2), 4 * T, np.int32),
        "chosen_steps": np.tile(np.arange(T, dtype=np.int32) * 4, (B, 2, 1)),
        "video_masks": np.ones((B, 2, T), np.float32),
        "dims": np.full((B, 2), float(raw), np.float32),
    }
    dev_batch = shard_batch(mesh, batch)
    key = jax.random.key(0)
    state = trainer.state
    num_frames = cfg.TRAIN.NUM_FRAMES

    def prep(batch, it):
        k = jax.random.fold_in(jax.random.fold_in(key, 0), it)
        k_aug, k_drop = jax.random.split(k)
        videos = trainer._augment_batch(k_aug, batch)
        return dict(batch, videos=videos), k_drop

    # state rides as a jit ARGUMENT: closures over the param tree get burned
    # in as constants and blow the relay's HTTP payload limit at ViT-B size
    # (CLAUDE.md); every ladder fn below takes (st, batch, it).
    def variables(st):
        return {"params": merge_params(st["trainable"], st["frozen"]),
                "batch_stats": st["batch_stats"]}

    def flat_views(step_batch):
        v = step_batch["videos"]
        Bv, V, Tv = v.shape[0], v.shape[1], v.shape[2]
        masks = step_batch["video_masks"].reshape(Bv * V, 1, Tv)
        return v.reshape((Bv * V, Tv) + v.shape[3:]), masks

    # --- the ladder --------------------------------------------------------

    def f_null(st, batch, it):
        return jnp.sum(batch["dims"]) * 1e-30

    def f_augment(st, batch, it):
        step_batch, _ = prep(batch, it)
        return jnp.sum(step_batch["videos"].astype(jnp.float32)) * 1e-30

    def f_trunk(st, batch, it):
        step_batch, _ = prep(batch, it)
        clips, _ = flat_views(step_batch)
        frames = clips.reshape((-1,) + clips.shape[2:])
        out = model.apply(variables(st), frames,
                          method=type(model)._run_frozen)
        return sum(jnp.sum(t.astype(jnp.float32)) * 1e-30
                   for t in jax.tree_util.tree_leaves(out))

    def f_fwd(st, batch, it):
        step_batch, k_drop = prep(batch, it)
        clips, masks = flat_views(step_batch)
        embs, _ = model.apply(variables(st), clips, num_frames,
                              video_masks=masks,
                              project=cfg.MODEL.PROJECTION, train=True,
                              rngs={"dropout": k_drop},
                              mutable=["batch_stats"])
        return jnp.sum(embs.astype(jnp.float32)) * 1e-30

    def f_loss(st, batch, it):
        step_batch, k_drop = prep(batch, it)
        loss_dict, _ = algo.compute_loss(model, variables(st), step_batch,
                                         train=True,
                                         rngs={"dropout": k_drop})
        return loss_dict["loss"] * 1e-30

    def f_grad(st, batch, it):
        step_batch, k_drop = prep(batch, it)

        def loss_fn(trainable):
            vs = {"params": merge_params(trainable, st["frozen"]),
                  "batch_stats": st["batch_stats"]}
            loss_dict, _ = algo.compute_loss(model, vs, step_batch,
                                             train=True,
                                             rngs={"dropout": k_drop})
            return loss_dict["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(st["trainable"])
        gsum = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                   for g in jax.tree_util.tree_leaves(grads))
        return (loss + gsum) * 1e-30

    step = trainer.build_train_step()

    def timed(fn, name):
        jfn = jax.jit(fn)
        acc = jnp.float32(0.0)
        acc = jfn(state, dict(dev_batch, dims=dev_batch["dims"] + acc), 0)
        float(acc)  # compile + sync
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for i in range(args.iters):
                acc = jfn(state,
                          dict(dev_batch, dims=dev_batch["dims"] + acc),
                          100 + i)
            float(acc)
            dt = (time.perf_counter() - t0) / args.iters
            if rep > 0:
                best = min(best, dt)
        print(f"{name:8s} {best * 1e3:8.2f} ms/iter", flush=True)
        return best

    t = {}
    for name, fn in (("null", f_null), ("augment", f_augment),
                     ("trunk", f_trunk), ("fwd", f_fwd), ("loss", f_loss),
                     ("grad", f_grad)):
        t[name] = timed(fn, name)

    # the full step donates its state arg — run it LAST on a deep copy so
    # donation can't invalidate the ladder closures' captured state
    st = jax.tree_util.tree_map(jnp.copy, state)
    for i in range(2):
        st, loss = step(st, dev_batch, key, i, False, 1e-4)
    float(loss["loss"])
    best_full = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, loss = step(st, dev_batch, key, 100 + i, False, 1e-4)
        float(loss["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        if rep > 0:
            best_full = min(best_full, dt)
    print(f"{'full':8s} {best_full * 1e3:8.2f} ms/iter", flush=True)
    t["full"] = best_full

    print("\n--- budget (differences, chain overhead removed) ---")
    oh = t["null"]
    rows = [
        ("augment (fused crop+photometric)", t["augment"] - oh),
        ("frozen trunk fwd (scan)", t["trunk"] - t["augment"]),
        ("trainable tail+head fwd", t["fwd"] - t["trunk"]),
        ("SCL loss", t["loss"] - t["fwd"]),
        ("backward (head+SCL)", t["grad"] - t["loss"]),
        ("Adam + clip + state", t["full"] - t["grad"]),
        ("TOTAL (full step)", t["full"] - oh),
    ]
    for name, ms in rows:
        print(f"{name:36s} {ms * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
