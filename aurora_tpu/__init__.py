"""aurora_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal captioning framework.

Re-designed from scratch with the capability surface of rese1f/aurora (AuroraCap,
ICLR 2025): a LLaVA-style CLIP-ViT + MLP projector + Vicuna decoder with Token
Merging (ToMe) inside every ViT layer, plus training, serving, and evaluation
subsystems.

The compute path is pure-functional JAX: models are (config, params-pytree,
pure-apply) triples, sharded over a `jax.sharding.Mesh` with named axes
``('dp', 'fsdp', 'sp', 'tp')``. Hot kernels are Pallas; everything else relies
on XLA fusion.
"""

__version__ = "0.1.0"

from aurora_tpu.utils.constants import (  # noqa: F401
    DEFAULT_IMAGE_TOKEN,
    DEFAULT_PAD_TOKEN_INDEX,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
)
