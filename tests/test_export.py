"""StableHLO serving export (tools/export_model.py): the exported artifact
round-trips through serialize/deserialize and reproduces the live
`make_embed_fn` embeddings bit-exactly, with weights as call-time args."""

import numpy as np
import jax
import jax.numpy as jnp

from video_rep_learning_tpu.config import get_cfg


def _tiny_cfg():
    cfg = get_cfg()
    cfg.IMAGE_SIZE = 32
    cfg.TRAIN.NUM_FRAMES = 2
    cfg.EVAL.NUM_FRAMES = 2
    cfg.MODEL.BASE_MODEL.NETWORK = "resnet18_tiny_test"
    cfg.MODEL.EMBEDDER_MODEL.NUM_LAYERS = 1
    cfg.MODEL.EMBEDDER_MODEL.NUM_HEADS = 2
    cfg.MODEL.EMBEDDER_MODEL.HIDDEN_SIZE = 16
    cfg.MODEL.EMBEDDER_MODEL.D_FF = 32
    cfg.MODEL.EMBEDDER_MODEL.EMBEDDING_SIZE = 8
    cfg.MODEL.EMBEDDER_MODEL.FC_LAYERS = [[16, True]]
    cfg.MODEL.PROJECTION_SIZE = 8
    return cfg


def test_export_roundtrip_matches_live_forward(tmp_path):
    from tools.export_model import (export_embed_fn, load_exported,
                                    save_exported)
    from video_rep_learning_tpu.evaluation.embedding import make_embed_fn
    from video_rep_learning_tpu.train import Trainer

    cfg = _tiny_cfg()
    cfg.LOGDIR = str(tmp_path / "run")
    trainer = Trainer(cfg, no_eval=True, build_loaders=False)
    trainer.init_state()

    H = W = 40
    buckets = [2, 4]
    exported = export_embed_fn(trainer.model, cfg, trainer.variables,
                               H, W, buckets)
    manifest = save_exported(exported, str(tmp_path / "export"), cfg, H, W)
    assert set(manifest["buckets"]) == {"2", "4"}

    fns = load_exported(str(tmp_path / "export"))
    live = make_embed_fn(trainer.model, cfg)

    rng = np.random.RandomState(0)
    for nb in buckets:
        frames = jnp.asarray(
            rng.randint(0, 255, size=(1, nb, H, W, 3)).astype(np.uint8))
        dims = jnp.asarray([float(H), float(W)])
        mask = np.zeros((1, 1, nb), np.float32)
        mask[..., : nb - 1] = 1.0
        true_len = jnp.asarray(nb - 1, jnp.int32)

        want = np.asarray(live(trainer.variables, frames, dims,
                               jnp.asarray(mask), true_len))
        got = np.asarray(fns[nb](trainer.variables, frames, dims,
                                 jnp.asarray(mask), true_len))
        np.testing.assert_array_equal(got, want)
        assert got.shape == (1, nb, cfg.MODEL.EMBEDDER_MODEL.EMBEDDING_SIZE)


def test_flat_export_roundtrip_matches_live(tmp_path):
    """Flat-path serving artifacts (fixed-FB trunk block + bucketed head)
    round-trip through serialize/deserialize and reproduce the live
    make_flat_fns stages bit-exactly."""
    from tools.export_model import (export_flat_fns, load_exported_flat,
                                    save_exported, save_exported_flat,
                                    export_embed_fn)
    from video_rep_learning_tpu.evaluation.embedding import make_flat_fns
    from video_rep_learning_tpu.train import Trainer

    cfg = _tiny_cfg()
    cfg.LOGDIR = str(tmp_path / "run")
    cfg.EVAL.FRAMES_PER_BATCH = 4
    trainer = Trainer(cfg, no_eval=True, build_loaders=False)
    trainer.init_state()

    out = str(tmp_path / "export")
    base = export_embed_fn(trainer.model, cfg, trainer.variables, 40, 40,
                           [4])
    save_exported(base, out, cfg, 40, 40)
    ft, fh, nc = export_flat_fns(trainer.model, cfg, trainer.variables,
                                 [2, 4], fb=4)
    manifest = save_exported_flat(ft, fh, nc, out)
    assert manifest["flat"]["fb"] == 4
    assert set(manifest["flat"]["heads"]) == {"2", "4"}

    trunk_call, head_calls, fb, needs_cls = load_exported_flat(out)
    assert fb == 4 and needs_cls == nc
    _, trunk_live, head_live = make_flat_fns(trainer.model, cfg)

    rng = np.random.RandomState(1)
    S = cfg.IMAGE_SIZE
    blk = jnp.asarray(rng.rand(fb, S, S, 3), jnp.float32)
    want_f, want_c = trunk_live(trainer.variables, blk)
    got_f, got_c = trunk_call(trainer.variables, blk)
    np.testing.assert_array_equal(np.asarray(want_f), np.asarray(got_f))

    for nb in (2, 4):
        feats = jnp.asarray(rng.rand(nb, *np.asarray(want_f).shape[1:]),
                            want_f.dtype)
        mask = np.zeros((1, 1, nb), np.float32)
        mask[..., : nb - 1] = 1.0
        tl = jnp.asarray(nb - 1, jnp.int32)
        if needs_cls:
            cls = jnp.asarray(rng.rand(nb, *np.asarray(want_c).shape[1:]),
                              want_c.dtype)
            want = head_live(trainer.variables, feats, cls,
                             jnp.asarray(mask), tl)
            got = head_calls[nb](trainer.variables, feats, cls,
                                 jnp.asarray(mask), tl)
        else:
            want = head_live(trainer.variables, feats, None,
                             jnp.asarray(mask), tl)
            got = head_calls[nb](trainer.variables, feats,
                                 jnp.asarray(mask), tl)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
