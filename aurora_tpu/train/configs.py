"""AuroraCap 3-stage training curriculum as plain dataclass configs.

Parity: src/xtuner/xtuner/configs/auroracap/ —
  * auroracap_7b_pretrain_stage.py:35-78  — stage 1 "projection": freeze
    LLM+ViT, train projector, bs16, lr 2e-4, ratio 1.0;
  * auroracap_7b_vision_stage.py:28-143   — stage 2 "vision": unfreeze
    ViT+projector, visual_token_merge_ratio=0.1, slowfast, bs1×accum24,
    lr 1e-4;
  * auroracap_7b_language_stage.py:25-87  — stage 3 "language": unfreeze
    all, ratio from pretrained encoder, lr 2e-5.

The mmengine registry/config machinery is replaced by dataclasses — configs
are code, overridable with dataclasses.replace (the `--cfg-options` analog).
"""

from __future__ import annotations

import dataclasses

from aurora_tpu.models.aurora import AuroraConfig
from aurora_tpu.train.trainer import TrainConfig


@dataclasses.dataclass(frozen=True)
class StageConfig:
    name: str
    train: TrainConfig
    batch_size: int
    max_length: int = 4096
    image_size: int = 378
    slowfast: bool = False


def pretrain_stage(max_steps: int = 1000) -> StageConfig:
    return StageConfig(
        name="projection_stage",
        train=TrainConfig(lr=2e-4, weight_decay=0.0, warmup_ratio=0.03,
                          max_steps=max_steps, grad_clip=1.0,
                          freeze_llm=True, freeze_visual_encoder=True,
                          kept_ratio=1.0),
        batch_size=16)


def vision_stage(max_steps: int = 1000) -> StageConfig:
    return StageConfig(
        name="vision_stage",
        train=TrainConfig(lr=1e-4, warmup_ratio=0.03, max_steps=max_steps,
                          grad_clip=1.0, grad_accum=24,
                          freeze_llm=True, kept_ratio=0.1),
        batch_size=1, slowfast=True)


def language_stage(max_steps: int = 1000,
                   kept_ratio: float = 0.1) -> StageConfig:
    return StageConfig(
        name="language_stage",
        train=TrainConfig(lr=2e-5, warmup_ratio=0.03, max_steps=max_steps,
                          grad_clip=1.0, kept_ratio=kept_ratio),
        batch_size=4)


def auroracap_7b_model() -> AuroraConfig:
    return AuroraConfig.auroracap_7b()
