#!/usr/bin/env python
"""A/B: per-leaf optax update vs a flat single-vector update (CARL budget
follow-up — the Adam+clip line measured 3.69 ms vs a 0.75 ms HBM floor).

Builds the real CARL trainable tree shapes (161 leaves, 18.8M params) and
times, inside ONE jit each (lax.fori-style chaining through a data
dependency, relay-safe sync by reading a scalar):

  tree : clip_by_global_norm + add_decayed_weights + scale_by_adam + scale,
         applied over the tree (the current train-step path)
  flat : the same chain applied to ravel_pytree'd grads/params, updates
         unraveled back to the tree afterwards

    python tools/bench_flat_optimizer.py [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from jax.flatten_util import ravel_pytree

    import bench
    from video_rep_learning_tpu.train.trainer import Trainer
    from video_rep_learning_tpu.train.optimizer import make_optimizer
    from video_rep_learning_tpu.parallel.mesh import create_mesh

    on_tpu = jax.default_backend() == "tpu"
    cfg = bench.carl_cfg(on_tpu)
    mesh = create_mesh()
    trainer = Trainer(cfg, no_eval=True, build_loaders=False, mesh=mesh)
    trainer.init_state()
    params = trainer.state["trainable"]
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    print(f"trainable: {n_leaves} leaves, {n_params/1e6:.1f} M params")

    tx = make_optimizer(cfg)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-6), params)

    def run_tree(params, grads, n):
        opt_state = tx.init(params)

        def body(i, carry):
            params, opt_state = carry
            g = jax.tree_util.tree_map(
                lambda x, p: x + p * 1e-12, grads, params)
            up, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, up)
            return params, opt_state

        params, _ = jax.lax.fori_loop(0, n, body, (params, opt_state))
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(params))

    flat0, unravel = ravel_pytree(params)

    def run_flat(params, grads, n):
        flat_p0, _ = ravel_pytree(params)
        opt_state = tx.init(flat_p0)

        def body(i, carry):
            params, opt_state = carry
            flat_g, _ = ravel_pytree(
                jax.tree_util.tree_map(lambda x, p: x + p * 1e-12,
                                       grads, params))
            flat_p, _ = ravel_pytree(params)
            up_flat, opt_state = tx.update(flat_g, opt_state, flat_p)
            params = optax.apply_updates(params, unravel(up_flat))
            return params, opt_state

        params, _ = jax.lax.fori_loop(0, n, body, (params, opt_state))
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(params))

    def run_null(params, grads, n):
        def body(i, carry):
            return jax.tree_util.tree_map(lambda p: p + 1e-12, carry)
        params = jax.lax.fori_loop(0, n, body, params)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(params))

    for name, fn in (("null", run_null), ("tree", run_tree),
                     ("flat", run_flat)):
        jfn = jax.jit(fn, static_argnums=(2,))
        float(jfn(params, grads, 2))  # compile
        best = float("inf")
        for rep in range(4):
            t0 = time.perf_counter()
            float(jfn(params, grads, args.iters))
            dt = (time.perf_counter() - t0) / args.iters
            if rep > 0:
                best = min(best, dt)
        print(f"{name:5s} {best*1e3:7.3f} ms/update", flush=True)


if __name__ == "__main__":
    main()
