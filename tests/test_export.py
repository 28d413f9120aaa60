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
