"""Top-level video representation models and the model factory.

Parity targets:
- TransformerModel (backbone + fusion embedder + projection): reference
  `models/transformer.py:16-244`
- BaseModel (conv / vanilla embedders for TCC/TCN legacy):
  `models/resnet_c2d.py:186-235`
- build_model factory dispatch: `models/__init__.py:8-13`

TPU-first design notes:
- Input is (BV, T, C, H, W) float (matching the reference's tensor contract);
  we transpose once to NHWC internally for XLA:TPU's native conv layout.
- The frozen backbone runs under `jax.lax.stop_gradient` with inference-mode
  BN — exactly the reference's `backbone.eval(); with no_grad:` semantics
  (`transformer.py:186-188`).
- Frame chunking (MODEL.BASE_MODEL.FRAMES_PER_BATCH, `transformer.py:175-214`)
  is a `jax.lax.map` over fixed-size chunks: one compiled backbone body,
  bounded activation memory, no dynamic shapes.
- The parameter tree is split at the top level into `backbone` (frozen) and
  the rest, so the optimizer partition (`utils/optimizer.py:29-42`) is a pure
  path predicate.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ConfigNode
from .embedder import (Classifier, ConvEmbed, MLPHead, TransformerEmbModel,
                       VanillaEmbed)
from .layers import TorchLinear
from .mvformer import MultiEntityTransformerEmbModel
from .resnet import ResNet50Stages, ResNet50Trunk
from .vit import VIT_SPECS, ViTBackEnd, ViTFrontEnd, ViTSpec, parse_smart_feats


@dataclass(frozen=True)
class ModelSpec:
    """Static wiring resolved from the config (mirrors the constructor logic
    of `transformer.py:16-170`)."""

    embedder_type: str            # transformer | conv | vanilla
    backbone_kind: str            # vit | resnet
    fusion_type: str              # late | smart
    late_type: str                # cls | spatial
    out_channel: int              # channels fed to the embedder
    cls_channel: int              # CLS feature width (ViT embed dim)
    vit_spec: Optional[ViTSpec]
    vit_frozen_blocks: int
    tap_blocks: Tuple[int, ...]
    resnet_trunk_upto: int
    resnet_finetune_start: int    # 0 = identity finetune
    frames_per_batch: int
    train_base: str
    use_cls_res: bool
    fuse_cls: bool
    cls_grad_only: bool
    projection: bool
    l2_normalize: bool
    num_classes: int
    # embedder params
    embedding_size: int
    hidden_size: int
    d_ff: int
    num_heads: int
    num_layers: int
    fc_channels: Tuple[int, ...]
    conv_params: Tuple[Tuple[int, int, int], ...]
    drop_rate: float
    flatten_method: str
    train_num_frames: int
    num_contexts: int
    projection_hidden: int
    # MVF params
    num_static: int
    num_dynamic: int
    pool_channels: int
    d_dyn_in: int
    one_hot_pos: str
    smart_final: str
    fixed_width_baseline: bool
    val_pass: bool
    disjoint: bool
    ln_keys: bool
    dyn_ctrl: str
    remat: bool = False
    # W8A8 int8 matmuls in the FROZEN ViT front (TPU-native extension, no
    # reference counterpart): 2x MXU rate on v5e. Never applied when the
    # backbone is differentiable (TRAIN_BASE == 'train_all').
    quantize_backbone: bool = False


def _resolve_quant(m, network: str) -> bool:
    """W8A8 int8 backbone: implemented for the frozen ViT matmuls only
    (`models/vit.py`, `ops/quant.py`). Requesting it for a ResNet backbone
    or a fully-finetuned ViT would otherwise be a silent no-op — warn."""
    requested = (bool(m.get("QUANTIZE_BACKBONE", False))
                 or os.environ.get("VRL_INT8_BACKBONE", "0") == "1")
    if not requested:
        return False
    import logging

    if not network.startswith("TIMM-"):
        logging.getLogger(__name__).warning(
            "MODEL.QUANTIZE_BACKBONE / VRL_INT8_BACKBONE requested but the "
            "backbone %s is not a ViT — int8 path only covers the frozen "
            "ViT matmuls; running unquantized.", network)
        return False
    if m.TRAIN_BASE == "train_all":
        logging.getLogger(__name__).warning(
            "MODEL.QUANTIZE_BACKBONE requested with TRAIN_BASE=train_all — "
            "the int8 path is inference-only (frozen backbone); running "
            "unquantized.")
        return False
    return True


def resolve_model_spec(cfg: ConfigNode) -> ModelSpec:
    """Resolve all derived model quantities from the config, replicating the
    reference factory's channel arithmetic and validation."""
    m = cfg.MODEL
    e = m.EMBEDDER_MODEL
    network = m.BASE_MODEL.NETWORK
    fusion_type = e.FUSION_TYPE
    late_type = e.LATE_TYPE
    if late_type not in ("cls", "spatial"):
        raise ValueError(f"LATE_TYPE {late_type}")

    if m.CLS_RES and fusion_type == "late":
        raise ValueError("CLS_RES cannot be used with late fusion (`transformer.py:34-36`)")
    if e.FUSION_CLS and (not network.startswith("TIMM-") or fusion_type != "smart"):
        raise ValueError("FUSION_CLS requires timm backbone + smart fusion "
                         "(`transformer.py:147-151`)")
    if e.CLS_GRAD_ONLY and not e.FUSION_CLS:
        raise ValueError("CLS_GRAD_ONLY requires FUSION_CLS (`transformer.py:156-160`)")

    vit_spec = None
    tap_blocks: Tuple[int, ...] = ()
    vit_frozen_blocks = 0
    resnet_trunk_upto = 4
    resnet_finetune_start = 0
    cls_channel = 0

    if network.startswith("TIMM-"):
        name = network[5:]
        if name not in VIT_SPECS:
            raise ValueError(f"unknown TIMM model {name} (`transformer.py:55-58`)")
        vit_spec = VIT_SPECS[name]
        backbone_kind = "vit"
        out_channel = vit_spec.embed_dim
        cls_channel = vit_spec.embed_dim
        uses_spatial = fusion_type != "late" or late_type == "spatial"
        if uses_spatial:
            tap_blocks = parse_smart_feats(e.SMART_FEATS, vit_spec.depth - 1)
            if any(t < 0 or t >= vit_spec.depth for t in tap_blocks):
                raise ValueError(
                    f"SMART_FEATS taps {tap_blocks} out of range for "
                    f"{name} (depth {vit_spec.depth})")
            out_channel *= len(tap_blocks)
        layer = m.BASE_MODEL.LAYER
        if layer < 0 or layer >= vit_spec.depth:
            vit_frozen_blocks = vit_spec.depth  # fully frozen
        else:
            vit_frozen_blocks = layer
            if uses_spatial and any(t < layer for t in tap_blocks):
                raise ValueError("SMART_FEATS tap below the frozen/finetune split "
                                 "(`transformer.py:104-114`)")
    else:
        backbone_kind = "resnet"
        out_channel = 2048
        layer = m.BASE_MODEL.LAYER
        if cfg.MODEL.EMBEDDER_TYPE == "conv":
            # BaseModel: LAYER==3 -> backbone through layer3, OUT 1024, and
            # the conv path never applies res_finetune (`resnet_c2d.py:191-226`).
            if layer == 3:
                resnet_trunk_upto, resnet_finetune_start, out_channel = 3, 0, 1024
            else:
                resnet_trunk_upto, resnet_finetune_start, out_channel = 4, 0, 2048
        elif cfg.MODEL.EMBEDDER_TYPE == "vanilla":
            # vanilla applies res_finetune (`resnet_c2d.py:221-222`), OUT 2048.
            if layer == 3:
                resnet_trunk_upto, resnet_finetune_start = 3, 4
            else:
                resnet_trunk_upto, resnet_finetune_start = 4, 0
        elif layer == 3:
            resnet_trunk_upto, resnet_finetune_start = 3, 4
        elif layer == 2:
            resnet_trunk_upto, resnet_finetune_start = 2, 3
        else:
            resnet_trunk_upto, resnet_finetune_start = 4, 0

    cap = e.CAPACITY_SCALAR
    fc_channels = tuple(int(ch) * cap for ch, _ in (e.FC_LAYERS or []))
    conv_params = tuple((int(ch) * cap, int(k), int(tp)) for ch, k, tp in (e.CONV_LAYERS or []))

    pool_channels = e.SMART_POOL_CHANNELS
    if e.VAL_PASS:
        pool_channels = out_channel  # `mvformer.py:28-29`
    num_taps = max(1, len(tap_blocks))
    d_dyn_in = out_channel // num_taps  # `mvformer.py:229-235`

    from ..data.splits import DATASET_TO_NUM_CLASSES

    if cfg.DATASETS[0] == "finegym":
        num_classes = cfg.EVAL.CLASS_NUM
    else:
        num_classes = DATASET_TO_NUM_CLASSES.get(cfg.DATASETS[0], 2)

    return ModelSpec(
        embedder_type=m.EMBEDDER_TYPE,
        backbone_kind=backbone_kind,
        fusion_type=fusion_type,
        late_type=late_type,
        out_channel=out_channel,
        cls_channel=cls_channel,
        vit_spec=vit_spec,
        vit_frozen_blocks=vit_frozen_blocks,
        tap_blocks=tap_blocks,
        resnet_trunk_upto=resnet_trunk_upto,
        resnet_finetune_start=resnet_finetune_start,
        frames_per_batch=m.BASE_MODEL.FRAMES_PER_BATCH,
        train_base=m.TRAIN_BASE,
        use_cls_res=bool(m.CLS_RES),
        fuse_cls=bool(e.FUSION_CLS),
        cls_grad_only=bool(e.CLS_GRAD_ONLY),
        projection=m.PROJECTION,
        l2_normalize=m.L2_NORMALIZE,
        num_classes=num_classes,
        embedding_size=e.EMBEDDING_SIZE,
        hidden_size=e.HIDDEN_SIZE,
        d_ff=e.D_FF,
        num_heads=e.NUM_HEADS,
        num_layers=e.NUM_LAYERS,
        fc_channels=fc_channels,
        conv_params=conv_params,
        drop_rate=e.FC_DROPOUT_RATE,
        flatten_method=e.FLATTEN_METHOD,
        train_num_frames=cfg.TRAIN.NUM_FRAMES,
        num_contexts=cfg.DATA.NUM_CONTEXTS,
        projection_hidden=m.PROJECTION_SIZE,
        remat=bool(m.get("REMAT", False)),
        quantize_backbone=_resolve_quant(m, network),
        num_static=e.SMART_TOKENS,
        num_dynamic=e.SMART_DYNAMIC_TOKENS,
        pool_channels=pool_channels,
        d_dyn_in=d_dyn_in,
        one_hot_pos=e.SMART_ONE_HOT,
        smart_final=e.SMART_FINAL,
        fixed_width_baseline=bool(e.FIXED_WIDTH_BASELINE),
        val_pass=bool(e.VAL_PASS),
        disjoint=bool(e.SMART_DISJOINT),
        ln_keys=bool(e.SMART_LN_KEYS),
        dyn_ctrl=e.DYNAMIC_CTRL,
    )


def _l2norm(x, axis=-1, eps=1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


class CARLModel(nn.Module):
    """Frame backbone -> temporal fusion -> (projection | classifier).

    Call: x (BV, T, C, H, W) float; returns (BV, T, emb) (or logits with
    `classification=True`). `video_masks` is (BV, 1, T) keep-masks.
    """

    spec: ModelSpec
    axis_name: Optional[str] = None
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        s = self.spec
        # computation dtype for the frame backbone (bf16 under USE_AMP —
        # params stay fp32, flax casts inside each layer, matching torch
        # autocast semantics `train.py:113`)
        bdt = None if self.compute_dtype == jnp.float32 else self.compute_dtype
        # MODEL.REMAT: rematerialize the trainable tail's activations
        # (jax.checkpoint) — trades FLOPs for HBM on partial-finetune configs
        back_cls = nn.remat(ViTBackEnd) if s.remat else ViTBackEnd
        stages_cls = nn.remat(ResNet50Stages) if s.remat else ResNet50Stages
        if s.backbone_kind == "vit":
            fully_frozen = s.vit_frozen_blocks >= s.vit_spec.depth
            self.backbone = ViTFrontEnd(s.vit_spec, s.vit_frozen_blocks,
                                        s.tap_blocks, include_norm=fully_frozen,
                                        dtype=bdt, quant=s.quantize_backbone)
            self.res_finetune = None if fully_frozen else back_cls(
                s.vit_spec, s.vit_frozen_blocks, s.tap_blocks, dtype=bdt)
        else:
            self.backbone = ResNet50Trunk(s.resnet_trunk_upto, dtype=bdt)
            if s.resnet_finetune_start:
                self.res_finetune = stages_cls(s.resnet_finetune_start, 4,
                                               dtype=bdt)
            else:
                self.res_finetune = None

        if s.embedder_type == "transformer":
            if s.fusion_type == "late":
                self.embed = TransformerEmbModel(
                    s.hidden_size, s.embedding_size, s.fc_channels,
                    s.drop_rate, s.flatten_method, s.num_layers, s.num_heads,
                    s.d_ff, s.train_num_frames, axis_name=self.axis_name)
            elif s.fusion_type == "smart":
                self.embed = MultiEntityTransformerEmbModel(
                    hidden_channels=s.hidden_size,
                    embedding_size=s.embedding_size,
                    fc_channels=s.fc_channels,
                    drop_rate=s.drop_rate,
                    num_layers=s.num_layers,
                    num_heads=s.num_heads,
                    d_ff=s.d_ff,
                    train_num_frames=s.train_num_frames,
                    num_static=s.num_static,
                    num_dynamic=s.num_dynamic,
                    pool_channels=s.pool_channels,
                    d_dyn_in=s.d_dyn_in,
                    one_hot_pos=s.one_hot_pos,
                    smart_final=s.smart_final,
                    fixed_width_baseline=s.fixed_width_baseline,
                    val_pass=s.val_pass,
                    disjoint=s.disjoint,
                    ln_keys=s.ln_keys,
                    dyn_ctrl=s.dyn_ctrl,
                    axis_name=self.axis_name)
            else:
                raise ValueError(s.fusion_type)
        elif s.embedder_type == "conv":
            self.embed = ConvEmbed(s.embedding_size, s.conv_params,
                                   s.fc_channels, s.drop_rate, s.num_contexts,
                                   axis_name=self.axis_name)
        elif s.embedder_type == "vanilla":
            self.embed = VanillaEmbed(s.embedding_size, s.fc_channels,
                                      s.drop_rate, s.num_contexts)
        else:
            raise ValueError(s.embedder_type)

        if s.projection:
            self.ssl_projection = MLPHead(s.projection_hidden, s.embedding_size,
                                          axis_name=self.axis_name)
        self.classifier = Classifier(s.num_classes, s.drop_rate)
        if s.use_cls_res:
            self.cls_res_res = TorchLinear(s.embedding_size)

    def _frozen_chunk(self, x):
        """The frozen front on one chunk of (n, H, W, C) frames. Pure w.r.t.
        variables (inference BN, no dropout), so it scans cleanly."""
        x = x.astype(self.compute_dtype)
        return self.backbone(x)

    def _run_frozen(self, frames):
        """Chunked frozen-backbone sweep over (N, H, W, C) frames: nn.scan
        over fixed-size chunks — one compiled body, bounded activation memory
        (the reference's FRAMES_PER_BATCH loop, `transformer.py:175-214`).
        Gradients are severed at the output (`backbone.eval(); no_grad`,
        `transformer.py:186-188`) unless TRAIN_BASE == 'train_all', in which
        case the backbone runs unchunked and differentiable (divergence note:
        its BN still uses running stats)."""
        s = self.spec
        if s.train_base == "train_all":
            return self._frozen_chunk(frames)

        chunk = s.frames_per_batch
        n = frames.shape[0]
        if n <= chunk:
            return jax.lax.stop_gradient(self._frozen_chunk(frames))
        nchunks = math.ceil(n / chunk)
        pad = nchunks * chunk - n
        if pad:
            tail = jnp.repeat(frames[-1:], pad, axis=0)
            frames = jnp.concatenate([frames, tail], axis=0)
        chunked = frames.reshape((nchunks, chunk) + frames.shape[1:])

        def body(mdl, carry, xs):
            return carry, mdl._frozen_chunk(xs)

        scanned = nn.scan(
            body,
            # batch_stats are read-only inside the frozen front (inference BN)
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False, "dropout": False},
        )
        _, out = scanned(self, None, chunked)
        out = jax.tree_util.tree_map(
            lambda t: t.reshape((nchunks * chunk,) + t.shape[2:])[:n], out)
        return jax.lax.stop_gradient(out)

    def _backbone_features(self, frames, train: bool):
        """Frozen front (chunk-scanned) + trainable tail on (N, H, W, C)
        frames. Returns (features (N, h, w, C_out), cls (N, C_cls) | None)."""
        s = self.spec
        frozen_out = self._run_frozen(frames)

        if s.backbone_kind == "vit":
            if self.res_finetune is None:  # fully frozen front returned (taps, cls)
                feats, cls = frozen_out
            else:
                feats, cls = self.res_finetune(frozen_out)
            if s.fusion_type == "late" and s.late_type == "cls":
                return cls[:, None, None, :], cls
            # strip prefix token, reshape to the square spatial grid
            spatial = feats[:, 1:]
            g = int(math.sqrt(spatial.shape[1]))
            spatial = spatial.reshape(spatial.shape[0], g, g, spatial.shape[-1])
            return spatial, cls
        else:
            feats = frozen_out
            if self.res_finetune is not None:
                feats = self.res_finetune(feats, train=train)
            return feats, None

    def __call__(self, x, num_frames: Optional[int] = None, video_masks=None,
                 project: bool = False, classification: bool = False,
                 train: bool = False, backbone_warmup_active: bool = False,
                 true_seq_len=None):
        """x: (BV, T, 3, H, W) (reference NCHW contract) or (BV, T, H, W, 3)
        (the pipeline's native NHWC) — detected by channel position.
        `true_seq_len`: traced true length when T is a padded eval bucket."""
        BV, T = x.shape[0], x.shape[1]
        frames = x.reshape((BV * T,) + x.shape[2:])
        channels_last = frames.shape[-1] == 3 and frames.shape[1] != 3
        if not channels_last:
            frames = frames.transpose(0, 2, 3, 1)
        feats, cls_emb = self._backbone_features(frames, train)
        feats = feats.reshape((BV, T) + feats.shape[1:])
        return self.head_embs(feats, cls_emb, num_frames,
                              video_masks=video_masks, project=project,
                              classification=classification, train=train,
                              backbone_warmup_active=backbone_warmup_active,
                              true_seq_len=true_seq_len)

    def backbone_flat(self, x):
        """Per-frame backbone on a flat (N, H, W, 3) frame block — the
        frame-independent 95% of the eval sweep, exposed so extraction can
        run it on densely packed fixed-size blocks with zero pad waste
        (`evaluation/embedding.py::_iter_frameflat`; reference equivalent is
        the fused chunk loop `evaluate.py:44-63`). Returns
        (feats (N, h, w, C), cls (N, C_cls) | None) in compute dtype —
        bit-identical to the arrays `__call__` feeds its embedder."""
        return self._backbone_features(x, train=False)

    def head_embs(self, feats, cls_emb=None, num_frames: Optional[int] = None,
                  video_masks=None, project: bool = False,
                  classification: bool = False, train: bool = False,
                  backbone_warmup_active: bool = False, true_seq_len=None):
        """Everything after the frame backbone: temporal embedder +
        projection/classifier. feats (BV, T, h, w, C) as produced by
        `backbone_flat`; cls_emb (BV*T, C_cls) for ViT variants."""
        s = self.spec
        num_frames = num_frames or feats.shape[1]

        if s.embedder_type == "transformer":
            if s.fusion_type == "smart":
                emb = self.embed(feats, video_masks=video_masks,
                                 cls_emb=cls_emb, train=train,
                                 backbone_warmup_active=backbone_warmup_active,
                                 true_len=true_seq_len)
            else:
                emb = self.embed(feats, video_masks=video_masks, train=train,
                                 true_len=true_seq_len)
        else:
            emb = self.embed(feats, num_frames, train=train)

        emb = emb.astype(jnp.float32)
        if s.projection and project:
            emb = self.ssl_projection(emb, train=train)
            emb = _l2norm(emb)
        elif s.l2_normalize:
            emb = _l2norm(emb)
        if classification:
            return self.classifier(emb, train=train)

        if s.use_cls_res:
            cls_res = self.cls_res_res(cls_emb.astype(jnp.float32))
            cls_res = cls_res.reshape(emb.shape[0], emb.shape[1], -1)
            if s.l2_normalize:
                cls_res = _l2norm(cls_res)
            emb = emb + cls_res
            if s.l2_normalize:
                emb = _l2norm(emb)
        return emb
