"""DINO-style Vision Transformer frame backbone (flax).

Parity target: the timm `VisionTransformer` variants the reference supports
(`models/transformer.py:43-58`):
  vit_small_patch{16,8}_224.dino / vit_small_patch14_dinov2 (384, 12 blocks)
  vit_base_patch{16,8}_224.dino / vit_base_patch14_dinov2   (768, 12 blocks)
  vit_large_patch14_dinov2 (1024, 24) / vit_giant_patch14_dinov2 (1536, 40)

Feature taps replace the reference's forward-hook FeatureExtractor
(`transformer.py:306-333`): requested block outputs (pre-final-norm, prefix
token included) are collected during the forward pass and concatenated on the
channel dim. The frozen/finetuned split (`ViTFrontEnd`/`ViTBackEnd`,
`transformer.py:342-392`) maps to `num_frozen_blocks`: the front-end module
owns patch-embed/pos-embed/blocks[:L]; the back-end owns blocks[L:] + norm +
head.

Weight import from timm checkpoints is in `models/import_torch.py`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class ViTSpec:
    embed_dim: int
    depth: int
    num_heads: int
    patch: int
    img_size: int = 224
    mlp_ratio: float = 4.0

    @property
    def grid(self) -> int:
        return self.img_size // self.patch

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid


# name (after the reference's 'TIMM-' prefix strip) -> spec; channel counts
# match `transformer.py:43-54`.
VIT_SPECS = {
    "vit_small_patch16_224.dino": ViTSpec(384, 12, 6, 16),
    "vit_small_patch8_224.dino": ViTSpec(384, 12, 6, 8),
    "vit_small_patch14_dinov2.lvd142m": ViTSpec(384, 12, 6, 14, img_size=518),
    "vit_base_patch16_224.dino": ViTSpec(768, 12, 12, 16),
    "vit_base_patch8_224.dino": ViTSpec(768, 12, 12, 8),
    "vit_base_patch14_dinov2.lvd142m": ViTSpec(768, 12, 12, 14, img_size=518),
    "vit_large_patch14_dinov2.lvd142m": ViTSpec(1024, 24, 16, 14, img_size=518),
    "vit_giant_patch14_dinov2.lvd142m": ViTSpec(1536, 40, 24, 14, img_size=518),
    # debug/test-only spec: tiny ViT for fast config-matrix coverage
    "vit_tiny_test": ViTSpec(32, 2, 2, 8, img_size=32),
}

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class TpuLayerNorm(nn.Module):
    """nn.LayerNorm drop-in (same `scale`/`bias` param names for checkpoint
    import) backed by the single-HBM-pass Pallas kernel on TPU
    (ops/layernorm_pallas.py); identical fp32-statistics math off-TPU."""

    epsilon: float = 1e-6
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        from ..ops.layernorm_pallas import fused_layernorm

        orig = x.shape
        if x.ndim != 3:
            x = x.reshape((-1,) + orig[-2:]) if x.ndim > 3 else x[None]
        y = fused_layernorm(x, scale, bias, self.epsilon)
        if self.dtype is not None:
            y = y.astype(self.dtype)  # match nn.LayerNorm(dtype=...) output
        return y.reshape(orig)


class ViTAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Optional[Any] = None
    quant: bool = False  # W8A8 dynamic int8 matmuls (frozen backbone only)

    def _dense(self, x, features, name):
        if not self.quant:
            return nn.Dense(features, kernel_init=_trunc02, dtype=self.dtype,
                            name=name)(x)
        from ..ops.quant import int8_dense

        k, b = _RawDenseParams(x.shape[-1], features, name=name)()
        return int8_dense(x.astype(self.dtype) if self.dtype else x, k, b)

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = self._dense(x, self.dim * 3, "qkv")
        # contiguous [q; k; v] slices (timm weight layout) — cheaper for XLA
        # to fuse than a (3, ...) moveaxis split
        D = self.dim

        from ..parallel.sharding import tensor_context
        from ..models.layers import _flash_eligible

        from ..ops.attention_pallas import (packed_vit_attention,
                                            packed_vit_eligible)

        head_sharded = tensor_context() is not None
        if (not head_sharded
                and packed_vit_eligible(self.num_heads, head_dim, N,
                                        qkv.dtype.itemsize)
                and _flash_eligible(N, None, batch_heads=B * self.num_heads,
                                    d_head=head_dim)):
            # packed-QKV Pallas kernel: consumes the (B, N, 3D) projection
            # output directly — no head transposes, no lane padding, no
            # (N, N) score tensor in HBM. The hot path for ViT-B/8's
            # 785-token frames (SURVEY.md §5).

            out = packed_vit_attention(qkv, self.num_heads)
            return self._dense(out, self.dim, "proj")

        def split(s):
            return s.reshape(B, N, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        from ..parallel.sharding import shard_heads

        q = shard_heads(split(qkv[..., :D]))
        k = shard_heads(split(qkv[..., D:2 * D]))
        v = shard_heads(split(qkv[..., 2 * D:]))

        if _flash_eligible(N, None, batch_heads=B * self.num_heads,
                           d_head=head_dim):
            from ..ops.attention_pallas import mha_with_flash

            out = mha_with_flash(q, k, v, None)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(head_dim)
            attn = nn.softmax(scores, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                             preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return self._dense(out, self.dim, "proj")


class _RawDenseParams(nn.Module):
    """Declares kernel/bias with nn.Dense's exact names/shapes/inits so the
    fused-block path shares the checkpoint tree with the module path."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _trunc02, (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _AttnParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        kq, bq = _RawDenseParams(self.dim, self.dim * 3, name="qkv")()
        kp, bp = _RawDenseParams(self.dim, self.dim, name="proj")()
        return kq, bq, kp, bp


class _LNParams(nn.Module):
    @nn.compact
    def __call__(self, D):
        return (self.param("scale", nn.initializers.ones, (D,)),
                self.param("bias", nn.initializers.zeros, (D,)))


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Optional[Any] = None
    quant: bool = False  # W8A8 dynamic int8 matmuls (frozen backbone only)

    @nn.compact
    def __call__(self, x):
        import os as _os

        import jax as _jax

        from ..ops.vit_block_pallas import (vit_attention_block,
                                            vit_block_eligible)
        from ..parallel.sharding import tensor_context

        head_dim = self.dim // self.num_heads
        itemsize = jnp.dtype(self.dtype or x.dtype).itemsize
        if (_jax.default_backend() == "tpu"
                and tensor_context() is None and not self.quant
                and _os.environ.get("VRL_FUSED_VIT_BLOCK", "auto") != "0"
                and _os.environ.get("VRL_FLASH_ATTENTION", "auto") != "0"
                and vit_block_eligible(self.num_heads, head_dim, x.shape[1],
                                       self.dim, itemsize)):
            # fully fused attention half-block: LN1 + qkv + attention + proj
            # + residual in one Pallas kernel (ops/vit_block_pallas.py);
            # params share the exact module-path tree. The all-heads-per-
            # image rework (full-width qkv/proj scratch matmuls, max-free
            # softmax) measures +2% MVF step throughput over the separate
            # LN+qkv / packed-attention / XLA-proj path on v5e (5.64 vs 5.51
            # clips/s, repeated A/B) — DEFAULT on TPU; VRL_FUSED_VIT_BLOCK=0
            # restores the separate-kernel path.
            ln_s, ln_b = _LNParams(name="norm1")(self.dim)
            kq, bq, kp, bp = _AttnParams(self.dim, name="attn")()
            xb = x.astype(self.dtype) if self.dtype else x
            x = vit_attention_block(xb, ln_s, ln_b, kq, bq, kp, bp,
                                    self.num_heads)
        else:
            from ..models.layers import _flash_eligible
            from ..ops.attention_pallas import (packed_vit_attention,
                                                packed_vit_eligible)
            from ..ops.matmul_gelu_pallas import (ln_matmul_bias_act,
                                                  matmul_gelu_eligible as
                                                  _mm_ok)

            N = x.shape[1]
            fused_ln_qkv = (
                _jax.default_backend() == "tpu"
                and tensor_context() is None and not self.quant
                and _os.environ.get("VRL_FUSED_LN_QKV", "auto") != "0"
                and _os.environ.get("VRL_FLASH_ATTENTION", "auto") != "0"
                and _mm_ok(N, self.dim, 3 * self.dim, itemsize)
                and packed_vit_eligible(self.num_heads, head_dim, N,
                                        itemsize)
                and _flash_eligible(N, None,
                                    batch_heads=x.shape[0] * self.num_heads,
                                    d_head=head_dim))
            if fused_ln_qkv:
                # LN1 folds into the qkv projection's prologue
                # (ops/matmul_gelu_pallas.py) — the standalone LN pass over
                # the token stream disappears; attention consumes the packed
                # (B, N, 3D) projection directly as before.
                ln_s, ln_b = _LNParams(name="norm1")(self.dim)
                kq, bq, kp, bp = _AttnParams(self.dim, name="attn")()
                xb = x.astype(self.dtype) if self.dtype else x
                qkv = ln_matmul_bias_act(xb, ln_s, ln_b, kq, bq, "none")
                out = packed_vit_attention(qkv, self.num_heads)
                dt = self.dtype or out.dtype
                proj = (jnp.einsum("bnd,df->bnf", out.astype(dt),
                                   kp.astype(dt))
                        + bp.astype(dt))
                x = x + proj
            else:
                y = TpuLayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name="norm1")(x)
                x = x + ViTAttention(self.dim, self.num_heads,
                                     dtype=self.dtype, quant=self.quant,
                                     name="attn")(y)
        # Exact (erf) GELU is the DEFAULT — timm parity. The fused fc1
        # kernel computes erf via the A&S 7.1.26 polynomial (1.5e-7 abs, see
        # ops/matmul_gelu_pallas.py), so exactness no longer costs the ~50
        # ms/step the standalone XLA erf pass did. VRL_APPROX_GELU=1 opts
        # back into tanh-approximate (error below bf16 rounding; kept for
        # A/B measurement only).
        approx = (self.dtype == jnp.bfloat16
                  and _os.environ.get("VRL_APPROX_GELU", "0") == "1"
                  and _os.environ.get("VRL_EXACT_GELU", "0") != "1")
        d_ff = int(self.dim * self.mlp_ratio)

        from ..ops.matmul_gelu_pallas import (ln_matmul_bias_act,
                                              ln_mlp_block,
                                              matmul_bias_gelu,
                                              matmul_gelu_eligible,
                                              mlp_block_eligible)

        if self.quant:
            # W8A8 int8 MXU matmuls; the dequant + bias + GELU chain fuses
            # into the int32 accumulator's epilogue under XLA
            from ..ops.quant import int8_dense

            y = TpuLayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name="norm2")(x)
            kfc1, bfc1 = _RawDenseParams(self.dim, d_ff, name="mlp_fc1")()
            y = int8_dense(y.astype(self.dtype) if self.dtype else y,
                           kfc1, bfc1, out_dtype=jnp.float32)
            y = nn.gelu(y, approximate=approx).astype(
                self.dtype or jnp.float32)
            kfc2, bfc2 = _RawDenseParams(d_ff, self.dim, name="mlp_fc2")()
            return x + int8_dense(y, kfc2, bfc2)
        # Under a tensor/sequence-parallel mesh the activations are sharded:
        # the Pallas kernels have no partitioning rule, so both fused-MLP
        # branches must stay on the XLA path (same gate the attention
        # branches apply)
        sharded = tensor_context() is not None
        if (_jax.default_backend() == "tpu" and not sharded
                and _os.environ.get("VRL_FUSED_MLP", "0") == "1"
                and mlp_block_eligible(x.shape[1], self.dim, d_ff,
                                       itemsize)):
            # whole MLP half-block in one Pallas program: LN2 + fc1 + GELU +
            # fc2 + residual — the (N, 4D) GELU stream stays in VMEM instead
            # of round-tripping HBM between the fc1 kernel and XLA's fc2
            # (~770 MB each way per block on MVF). MEASURED SLOWER on-chip
            # (r4 A/B: 5.66 vs 5.72 clips/s MVF e2e, -1.1% — see
            # ops/matmul_gelu_pallas.py); OFF by default, kept as the
            # documented negative result. Params share the module path's
            # exact tree.
            ln2_s, ln2_b = _LNParams(name="norm2")(self.dim)
            kfc1, bfc1 = _RawDenseParams(self.dim, d_ff, name="mlp_fc1")()
            kfc2, bfc2 = _RawDenseParams(d_ff, self.dim, name="mlp_fc2")()
            return ln_mlp_block(
                x.astype(self.dtype) if self.dtype else x, ln2_s, ln2_b,
                kfc1, bfc1, kfc2, bfc2,
                "gelu_tanh" if approx else "gelu_exact")
        if (_jax.default_backend() == "tpu" and not sharded
                and _os.environ.get("VRL_FUSED_GELU_MM", "auto") != "0"
                and _os.environ.get("VRL_FUSED_LN_MM", "auto") != "0"
                and matmul_gelu_eligible(x.shape[1], self.dim, d_ff,
                                         itemsize)):
            # LN2 + fc1 + bias + GELU in one Pallas kernel: the LN moves
            # into the matmul's prologue (fp32 row stats on the VMEM-resident
            # block) and the GELU into its epilogue — neither pass touches
            # HBM on its own anymore
            ln2_s, ln2_b = _LNParams(name="norm2")(self.dim)
            kfc1, bfc1 = _RawDenseParams(self.dim, d_ff, name="mlp_fc1")()
            y = ln_matmul_bias_act(
                x.astype(self.dtype) if self.dtype else x, ln2_s, ln2_b,
                kfc1, bfc1, "gelu_tanh" if approx else "gelu_exact")
        elif (_jax.default_backend() == "tpu" and not sharded
              and _os.environ.get("VRL_FUSED_GELU_MM", "auto") != "0"
              and matmul_gelu_eligible(x.shape[1], self.dim, d_ff,
                                       itemsize)):
            # fc1 + bias + GELU fused in one Pallas kernel — the standalone
            # GELU pass over the (tokens, 4D) stream is pure HBM bandwidth
            # (~43 ms/step on MVF) that the matmul epilogue absorbs
            y = TpuLayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name="norm2")(x)
            kfc1, bfc1 = _RawDenseParams(self.dim, d_ff, name="mlp_fc1")()
            y = matmul_bias_gelu(y.astype(self.dtype) if self.dtype else y,
                                 kfc1, bfc1, approximate=approx)
        else:
            y = TpuLayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name="norm2")(x)
            y = nn.Dense(d_ff, kernel_init=_trunc02, dtype=self.dtype,
                         name="mlp_fc1")(y)
            y = nn.gelu(y, approximate=approx)
        y = nn.Dense(self.dim, kernel_init=_trunc02, dtype=self.dtype,
                     name="mlp_fc2")(y)
        return x + y


class ViTFrontEnd(nn.Module):
    """Patch embed + cls/pos + frozen front blocks (`transformer.py:342-361`).

    Input NHWC image batch. Two modes:
    - partial split (`include_norm=False`, num_blocks = L < depth): returns
      the raw token stream (B, 1+N, C) for the trainable back-end.
    - fully frozen (`include_norm=True`, num_blocks = depth): plays the role
      of the reference's FeatureExtractor-wrapped whole model
      (`transformer.py:93-99`): returns (concat of tapped block outputs or
      None, final-norm CLS features).
    """

    spec: ViTSpec
    num_blocks: int  # how many leading blocks run here (L, or depth if fully frozen)
    tap_blocks: Tuple[int, ...] = ()
    include_norm: bool = False
    dtype: Optional[Any] = None
    quant: bool = False  # W8A8 int8 matmuls — valid because this module is
    #                      the FROZEN half (pure inference, no grads)

    @nn.compact
    def __call__(self, x):
        s = self.spec
        B, H, W, C = x.shape
        p = s.patch
        # patch embedding as space-to-depth + matmul: stride == kernel, so
        # the conv is exactly a per-patch Dense — the matmul form tiles onto
        # the MXU far better than XLA's convolution lowering (~7ms -> <1ms
        # per 40-frame chunk). Kernel layout (p, p, C) row-major == the
        # reshaped conv kernel (see import_torch.convert_vit).
        x = x.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, (H // p) * (W // p),
                                                  p * p * C)
        x = nn.Dense(s.embed_dim, dtype=self.dtype, name="patch_embed")(x)
        cls = self.param("cls_token", _trunc02, (1, 1, s.embed_dim))
        pos = self.param("pos_embed", _trunc02, (1, 1 + s.num_patches, s.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (B, 1, s.embed_dim)), x], axis=1)
        x = x + pos.astype(x.dtype)
        taps = []
        for i in range(self.num_blocks):
            x = ViTBlock(s.embed_dim, s.num_heads, s.mlp_ratio,
                         dtype=self.dtype, quant=self.quant,
                         name=f"block{i}")(x)
            if self.include_norm and i in self.tap_blocks:
                taps.append(x)
        if not self.include_norm:
            return x
        normed = TpuLayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        cls_out = normed[:, 0]  # global_pool='token', head=Identity (DINO)
        feats = jnp.concatenate(taps, axis=2) if taps else None
        return feats, cls_out


class ViTBackEnd(nn.Module):
    """Trailing blocks + final norm (`transformer.py:364-392`), with feature
    taps: returns (concat of tapped block outputs (B, 1+N, C*k), normed CLS
    (B, C)). `tap_blocks` are *global* block indices (>= num_front_blocks);
    empty taps -> the final block output is the only feature."""

    spec: ViTSpec
    num_front_blocks: int
    tap_blocks: Tuple[int, ...] = ()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        s = self.spec
        taps = []
        for i in range(self.num_front_blocks, s.depth):
            x = ViTBlock(s.embed_dim, s.num_heads, s.mlp_ratio,
                         dtype=self.dtype, name=f"block{i}")(x)
            if i in self.tap_blocks:
                taps.append(x)
        normed = TpuLayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        cls_out = normed[:, 0]  # global_pool='token', head=Identity (DINO)
        feats = jnp.concatenate(taps, axis=2) if taps else x
        return feats, cls_out


def parse_smart_feats(smart_feats, default_block: int) -> Tuple[int, ...]:
    """Parse SMART_FEATS ("3,7,11" | "11" | int | None) into block indices
    (`transformer.py:74-90`). None -> (default_block,)."""
    if smart_feats is None:
        return (default_block,)
    text = str(smart_feats)
    parts = text.split(",") if "," in text else [text]
    return tuple(int(p) for p in parts)
