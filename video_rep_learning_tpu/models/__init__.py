"""Model factory (reference `models/__init__.py:8-13`): every
EMBEDDER_TYPE / FUSION_TYPE combination routes through `CARLModel`, whose
internal wiring is resolved by `resolve_model_spec`.

Checkpoint save/load lives in `video_rep_learning_tpu.train.checkpoint`
(orbax); torch-checkpoint import for parity validation lives in
`models.import_torch`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ConfigNode
from .carl import CARLModel, ModelSpec, resolve_model_spec  # noqa: F401
from .embedder import (Classifier, ConvEmbed, MLPHead,  # noqa: F401
                       TransformerEmbModel, VanillaEmbed)
from .mvformer import (FWBPooling, LearnableTokenPooling,  # noqa: F401
                       LSTPCrossAtt, MultiEntityTransformerEmbModel)
from .resnet import ResNet50Stages, ResNet50Trunk  # noqa: F401
from .vit import VIT_SPECS, ViTBackEnd, ViTFrontEnd  # noqa: F401


def build_model(cfg: ConfigNode, axis_name=None) -> CARLModel:
    """Construct the model for a config (`models/__init__.py:8-13`)."""
    spec = resolve_model_spec(cfg)
    compute_dtype = jnp.bfloat16 if cfg.USE_AMP else jnp.float32
    return CARLModel(spec=spec, axis_name=axis_name, compute_dtype=compute_dtype)
