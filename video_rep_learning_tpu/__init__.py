"""TPU-native framework for self-supervised frame-wise video representation
learning (CARL + MV-Former capabilities), built on JAX / XLA / Pallas / pjit.

Re-implements the capabilities of facebookresearch/video_rep_learning
(reference at /root/reference) with a TPU-first design:

- flax models (ResNet-50, DINO ViT, temporal transformers, LSTP / MV-Former)
- pure-function losses (SCL, TCC, TCN, supervised classification)
- on-device jit-fused data augmentation
- C++ (FFmpeg) host-side video decode feeding a prefetching pipeline
- shard_map data parallelism over a `jax.sharding.Mesh` with psum collectives
- Pallas kernels for the hot ops (flash attention, fused SCL)
- orbax checkpointing; evaluation suite with exact metric parity
"""

__version__ = "0.1.0"

from .config import ConfigNode, get_cfg  # noqa: F401
