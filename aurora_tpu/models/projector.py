"""Visual→LLM projector: Linear + (depth-1) × (GELU → Linear).

Parity: src/xtuner/xtuner/model/modules/projector/modeling_projector.py:10-51
and configuration_projector.py:5-23 (bias=True, act GELU exact).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    visual_hidden_size: int = 1280
    llm_hidden_size: int = 4096
    depth: int = 2
    hidden_act: str = "gelu"
    bias: bool = True


def init_projector_params(rng: jax.Array, cfg: ProjectorConfig,
                          dtype=jnp.float32) -> Params:
    keys = jax.random.split(rng, cfg.depth)
    layers = []
    d_in = cfg.visual_hidden_size
    for i in range(cfg.depth):
        layers.append({
            "kernel": jax.random.normal(
                keys[i], (d_in, cfg.llm_hidden_size), dtype) * 0.02,
            "bias": jnp.zeros((cfg.llm_hidden_size,), dtype),
        })
        d_in = cfg.llm_hidden_size
    return {"layers": layers}


def apply_projector(params: Params, x: jnp.ndarray,
                    cfg: ProjectorConfig) -> jnp.ndarray:
    """x: [..., visual_hidden] → [..., llm_hidden].

    Per-layer optional LayerNorm right after each linear (Yi-VL's
    mm_projector: Linear → LN → GELU → Linear → LN; sglang
    srt/models/yivl.py:74-79) — present when the layer dict carries
    "ln_scale"/"ln_bias"."""
    from aurora_tpu.ops.norms import layer_norm
    for i, lp in enumerate(params["layers"]):
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)
        x = (jnp.dot(x, lp["kernel"], preferred_element_type=jnp.float32)
             .astype(x.dtype) + lp["bias"])
        if "ln_scale" in lp:
            x = layer_norm(x, lp["ln_scale"], lp["ln_bias"])
    return x
