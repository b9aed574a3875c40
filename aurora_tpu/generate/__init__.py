from aurora_tpu.generate.sampler import SamplingParams, sample_logits
from aurora_tpu.generate.engine import GenerateResult, generate

__all__ = ["SamplingParams", "sample_logits", "GenerateResult", "generate"]
