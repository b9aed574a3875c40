from aurora_tpu.models.vit import ViTConfig, vit_encode, init_vit_params
from aurora_tpu.models.projector import (ProjectorConfig, apply_projector,
                                         init_projector_params)
from aurora_tpu.models.llama import (LlamaConfig, llama_apply, llama_lm_loss,
                                     init_llama_params)

__all__ = [
    "ViTConfig", "vit_encode", "init_vit_params",
    "ProjectorConfig", "apply_projector", "init_projector_params",
    "LlamaConfig", "llama_apply", "llama_lm_loss", "init_llama_params",
]
