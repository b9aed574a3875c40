"""Programmatic builders — the `xtuner.apis` analog.

Parity: src/xtuner/xtuner/apis/{model.py,datasets.py,training_args.py}
exposes build_model/build_dataset helpers so AuroraCap can be embedded
in other Python programs without the CLI. Same idea here, over the
functional JAX stack: every builder returns plain pytrees/configs/fns
that compose with jit/pjit directly.

    from aurora_tpu import apis
    params, cfg, tok = apis.build_model("path/to/auroracap")
    ds = apis.build_dataset("data.json", tok, image_folder="imgs/")
    step, state = apis.build_trainer(params, cfg, stage="pretrain")
    rt = apis.build_runtime(model_path="path/to/llm")    # offline gen
"""

from __future__ import annotations

import dataclasses
from typing import Optional


def build_model(model_path: str, dtype=None):
    """xtuner-format AuroraCap dir → (params, AuroraConfig, tokenizer).
    (apis/model.py build_llava_model analog.)"""
    import jax.numpy as jnp
    from aurora_tpu.cli.infer import load_model
    return load_model(model_path, dtype=dtype or jnp.bfloat16)


def build_lora_model(model_path: str, *, r: int = 64, alpha: int = 16,
                     quant: str = "none", dtype=None, seed: int = 0):
    """(Q)LoRA assembly: frozen (optionally int8/int4) base + zero-init
    adapters (apis/model.py build_qlora_model analog).
    Returns (base_params, adapters, AuroraConfig, LoraConfig, tokenizer)."""
    import jax
    from aurora_tpu.train.lora import LoraConfig, init_lora_params
    from aurora_tpu.train.quant import quantize_base
    if quant not in ("none", "int8", "int4"):
        raise ValueError(f"quant={quant!r}: expected 'none', 'int8' or "
                         "'int4' (an unknown value must not silently "
                         "4-bit-quantize the base)")
    params, cfg, tok = build_model(model_path, dtype)
    lcfg = LoraConfig(r=r, alpha=alpha)
    adapters = init_lora_params(jax.random.PRNGKey(seed), params, lcfg)
    if quant != "none":
        params = quantize_base(params,
                               bits=8 if quant == "int8" else 4)
    return params, adapters, cfg, lcfg, tok


def build_dataset(data_path: str, tokenizer, *, image_folder: str = "",
                  max_length: int = 2048, image_size: int = 378,
                  template=None, cache_dir: Optional[str] = None):
    """llava-format json/jsonl → AuroraDataset (apis/datasets.py
    llava_dataset analog)."""
    from aurora_tpu.data.dataset import AuroraDataset, aurora_map_fn
    from aurora_tpu.utils.templates import PROMPT_TEMPLATE
    return AuroraDataset(data_path, tokenizer,
                         image_folder=image_folder,
                         map_fn=aurora_map_fn,
                         template=template or PROMPT_TEMPLATE.vicuna,
                         max_length=max_length, image_size=image_size,
                         cache_dir=cache_dir)


def build_trainer(params, acfg, *, stage: str = "pretrain",
                  max_steps: Optional[int] = None, mesh=None):
    """Stage config + optimizer + jitted step + initial state
    (training_args + Runner-assembly analog). Returns (step_fn, state,
    stage_config); step_fn(state, batch) -> (state, metrics)."""
    import jax
    from aurora_tpu.train import configs as stage_configs
    from aurora_tpu.train.trainer import (init_train_state, make_optimizer,
                                          make_train_step)
    stage_cfg = {"pretrain": stage_configs.pretrain_stage,
                 "vision": stage_configs.vision_stage,
                 "language": stage_configs.language_stage}[stage]()
    tcfg = stage_cfg.train
    if max_steps is not None:
        tcfg = dataclasses.replace(tcfg, max_steps=max_steps)
        stage_cfg = dataclasses.replace(stage_cfg, train=tcfg)
    opt = make_optimizer(params, tcfg)
    state = init_train_state(params, tcfg)
    step_fn = jax.jit(make_train_step(acfg, tcfg, opt, mesh=mesh))
    return step_fn, state, stage_cfg


def build_runtime(params=None, cfg=None, tokenizer=None, *,
                  model_path: Optional[str] = None, engine_config=None,
                  dtype=None):
    """Offline batch-generation Runtime over the serving engine
    (sglang.Runtime analog; serve/runtime.py)."""
    from aurora_tpu.serve.runtime import Runtime
    return Runtime(params, cfg, tokenizer, model_path=model_path,
                   engine_config=engine_config, dtype=dtype)
