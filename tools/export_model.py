#!/usr/bin/env python
"""Export the trained embedding forward as serialized StableHLO artifacts.

Serving path for production deployment: the eval-time embedding function
(`evaluation/embedding.make_embed_fn` — raw uint8 frames in, L2-normalized
embeddings out, reference semantics `evaluate.py:27-81`) is exported via
`jax.export` once per power-of-two frame bucket, producing versioned,
runtime-independent StableHLO blobs a PJRT-based server (TPU, GPU or CPU;
Python-free C++ included) can load without this repo or its Python stack.

Weights are call-time ARGUMENTS (not baked constants), so a server can hot-
swap checkpoints without re-exporting; the manifest records the exact
argument pytree. Artifacts:

    <out>/manifest.json            config/bucket/shape/version metadata
    <out>/bucket_<N>.stablehlo     serialized jax.export artifact per bucket

Round-trip loading for Python servers: `load_exported(out_dir)` returns
{bucket: callable} with the same signature as `make_embed_fn`'s jit.

Usage:
    python tools/export_model.py --cfg_file configs/....yml --logdir RUN \
        [--out RUN/export] [--height 256 --width 256] [--buckets 64,128]
    (--logdir with a checkpoint exports trained weights; without, the
    fresh-init weights — useful for shape/latency validation.)
"""

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def export_embed_fn(model, cfg, variables, height, width, buckets):
    """Export `make_embed_fn(model, cfg)` for each frame bucket.

    Returns {bucket: jax.export.Exported}. Shapes follow
    `evaluation/embedding.iter_video_embeddings`: frames (1, Tb, H, W, 3)
    uint8 at the dataset canvas resolution, dims (2,) true (h, w), key mask
    (1, 1, Tb), true_len scalar — pad-frame masking and true-length
    positional encoding are inside the exported graph, so serving gets the
    same bit-exact bucketed semantics the eval harness tests."""
    from jax import export as jexport

    from video_rep_learning_tpu.evaluation.embedding import make_embed_fn

    embed_fn = make_embed_fn(model, cfg)
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
    out = {}
    for nb in buckets:
        args = (var_spec,
                jax.ShapeDtypeStruct((1, nb, height, width, 3), jnp.uint8),
                jax.ShapeDtypeStruct((2,), jnp.float32),
                jax.ShapeDtypeStruct((1, 1, nb), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.int32))
        out[nb] = jexport.export(embed_fn)(*args)
    return out


def export_flat_fns(model, cfg, variables, buckets, fb=None):
    """Export the TPU-default flat extraction's compute stages
    (`evaluation/embedding.make_flat_fns`): the fixed-shape per-frame trunk
    block — 95% of eval cost, fed densely across video boundaries — and the
    bucketed temporal head. Augmentation (resize + ImageNet normalize) stays
    host-side at serving time (it is shape-ragged per video); the per-bucket
    full-path artifacts from `export_embed_fn` remain available where a
    single-graph server is preferred.

    Returns ({"trunk": Exported, "fb": FB}, {bucket: head Exported},
    needs_cls)."""
    from jax import export as jexport

    from video_rep_learning_tpu.evaluation.embedding import make_flat_fns

    _, trunk_fn, head_fn = make_flat_fns(model, cfg)
    S = cfg.IMAGE_SIZE
    fb = fb or min(cfg.EVAL.FRAMES_PER_BATCH,
                   256 if model.spec.backbone_kind == "resnet" else 128)
    needs_cls = model.spec.backbone_kind == "vit"
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
    blk_spec = jax.ShapeDtypeStruct((fb, S, S, 3), jnp.float32)
    trunk = jexport.export(trunk_fn)(var_spec, blk_spec)
    feat_spec, cls_spec = jax.eval_shape(trunk_fn, var_spec, blk_spec)

    heads = {}
    for nb in buckets:
        fs = jax.ShapeDtypeStruct((nb,) + feat_spec.shape[1:],
                                  feat_spec.dtype)
        cs = (jax.ShapeDtypeStruct((nb,) + cls_spec.shape[1:],
                                   cls_spec.dtype) if needs_cls else None)
        mask = jax.ShapeDtypeStruct((1, 1, nb), jnp.float32)
        tl = jax.ShapeDtypeStruct((), jnp.int32)
        if needs_cls:
            heads[nb] = jexport.export(head_fn)(var_spec, fs, cs, mask, tl)
        else:
            heads[nb] = jexport.export(jax.jit(
                lambda v, f, m, t: head_fn(v, f, None, m, t)))(
                var_spec, fs, mask, tl)
    return {"trunk": trunk, "fb": fb}, heads, needs_cls


def save_exported(exported, out_dir, cfg, height, width):
    os.makedirs(out_dir, exist_ok=True)
    entries = {}
    for nb, exp in exported.items():
        blob = exp.serialize()
        name = f"bucket_{nb}.stablehlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        entries[str(nb)] = {
            "file": name,
            "sha256": hashlib.sha256(blob).hexdigest(),
            "frames": nb,
        }
    manifest = {
        "format": "jax.export/stablehlo",
        "jax_version": jax.__version__,
        "input_signature": "(variables, frames(1,T,H,W,3)u8, dims(2,)f32, "
                           "key_mask(1,1,T)f32, true_len i32) -> (1,T,E)f32",
        "canvas": [height, width],
        "image_size": cfg.IMAGE_SIZE,
        "buckets": entries,
        "model": cfg.MODEL.BASE_MODEL.NETWORK,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def save_exported_flat(flat_trunk, flat_heads, needs_cls, out_dir):
    """Append the flat-path artifacts + manifest section (run after
    `save_exported`)."""
    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path) as f:
        manifest = json.load(f)

    def _write(name, exp):
        blob = exp.serialize()
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        return {"file": name, "sha256": hashlib.sha256(blob).hexdigest()}

    fb = flat_trunk["fb"]
    manifest["flat"] = {
        "fb": fb,
        "needs_cls": needs_cls,
        "trunk": _write(f"flat_trunk_{fb}.stablehlo", flat_trunk["trunk"]),
        "heads": {str(nb): _write(f"flat_head_{nb}.stablehlo", exp)
                  for nb, exp in flat_heads.items()},
        "input_signature": {
            "trunk": "(variables, frames(FB,S,S,3)f32 augmented) -> "
                     "(feats, cls)",
            "head": "(variables, feats(Tb,...), [cls(Tb,D),] "
                    "key_mask(1,1,Tb)f32, true_len i32) -> (1,Tb,E)f32",
        },
    }
    with open(man_path, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def load_exported_flat(out_dir):
    """(trunk_call, {bucket: head_call}, fb, needs_cls) from a manifest
    written by `save_exported_flat`."""
    from jax import export as jexport

    with open(os.path.join(out_dir, "manifest.json")) as f:
        flat = json.load(f)["flat"]

    def _load(ent):
        with open(os.path.join(out_dir, ent["file"]), "rb") as f:
            return jexport.deserialize(f.read()).call

    heads = {int(nb): _load(ent) for nb, ent in flat["heads"].items()}
    return _load(flat["trunk"]), heads, flat["fb"], flat["needs_cls"]


def load_exported(out_dir):
    """{bucket: callable} — deserialize every bucket artifact. The callable
    signature matches `make_embed_fn`'s jit: (variables, frames, dims,
    mask, true_len) -> (1, Tb, emb)."""
    from jax import export as jexport

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    fns = {}
    for nb, ent in manifest["buckets"].items():
        with open(os.path.join(out_dir, ent["file"]), "rb") as f:
            fns[int(nb)] = jexport.deserialize(f.read()).call
    return fns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", required=True)
    ap.add_argument("--logdir", required=True)
    ap.add_argument("--out", default=None,
                    help="output dir (default <logdir>/export)")
    ap.add_argument("--height", type=int, default=256,
                    help="dataset canvas height fed at serving time")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--buckets", default=None,
                    help="comma list; default: power-of-two sweep 64..EVAL."
                         "FRAMES_PER_BATCH")
    ap.add_argument("--opts", nargs="*", default=[])
    ap.add_argument("--no_flat", action="store_true",
                    help="skip the flat-path (trunk/head) artifacts")
    args = ap.parse_args()

    from video_rep_learning_tpu.config import (apply_opts, get_cfg,
                                               load_yaml_into)
    from video_rep_learning_tpu.train import Trainer

    cfg = get_cfg()
    load_yaml_into(cfg, args.cfg_file)
    if args.opts:
        apply_opts(cfg, args.opts)
    cfg.LOGDIR = args.logdir

    trainer = Trainer(cfg, no_eval=True, build_loaders=False)
    trainer.init_state()  # restores the newest checkpoint when present

    if args.buckets:
        buckets = [int(b) for b in args.buckets.split(",")]
    else:
        buckets, b = [], 64
        while b <= max(cfg.EVAL.FRAMES_PER_BATCH, 64):
            buckets.append(b)
            b *= 2

    exported = export_embed_fn(trainer.model, cfg, trainer.variables,
                               args.height, args.width, buckets)
    out_dir = args.out or os.path.join(args.logdir, "export")
    manifest = save_exported(exported, out_dir, cfg, args.height, args.width)
    flat_ok = (trainer.model.spec.embedder_type == "transformer"
               and int(cfg.DATA.NUM_CONTEXTS) == 1)
    if flat_ok and not args.no_flat:
        ft, fh, nc = export_flat_fns(trainer.model, cfg, trainer.variables,
                                     buckets)
        manifest = save_exported_flat(ft, fh, nc, out_dir)
    print(json.dumps({"out": out_dir,
                      "buckets": sorted(int(k) for k in manifest["buckets"]),
                      "flat_fb": manifest.get("flat", {}).get("fb")}))


if __name__ == "__main__":
    main()
