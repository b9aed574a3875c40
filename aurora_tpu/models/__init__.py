from aurora_tpu.models.vit import ViTConfig, vit_encode, init_vit_params
from aurora_tpu.models.projector import (ProjectorConfig, apply_projector,
                                         init_projector_params)
from aurora_tpu.models.llama import (LlamaConfig, llama_apply, llama_lm_loss,
                                     init_llama_params)
from aurora_tpu.models.gemma2 import (Gemma2Config, gemma2_apply,
                                      init_gemma2_params)
from aurora_tpu.models.deepseek_v2 import (DeepseekV2Config,
                                           deepseek_v2_apply,
                                           init_deepseek_v2_params)
from aurora_tpu.models.internvl import (InternVLConfig, InternViTConfig,
                                        internvl_forward, internvit_encode)

__all__ = [
    "ViTConfig", "vit_encode", "init_vit_params",
    "ProjectorConfig", "apply_projector", "init_projector_params",
    "LlamaConfig", "llama_apply", "llama_lm_loss", "init_llama_params",
    "Gemma2Config", "gemma2_apply", "init_gemma2_params",
    "DeepseekV2Config", "deepseek_v2_apply", "init_deepseek_v2_params",
    "InternVLConfig", "InternViTConfig", "internvl_forward",
    "internvit_encode",
]
