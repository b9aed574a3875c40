"""Normalization ops.

XLA fuses these into surrounding elementwise chains on TPU, so plain jnp is
the fast path (the reference needs Triton kernels for the same effect:
src/xtuner/xtuner/model/modules/dispatch/triton_kernels/rms_norm.py).

Numerics match HF transformers: statistics in fp32, output cast back to the
input dtype (LlamaRMSNorm semantics), LayerNorm with biased variance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6,
             upcast_weight_mul: bool = False) -> jnp.ndarray:
    """LlamaRMSNorm parity: fp32 variance, cast back, then * weight.

    HF casts hidden back to input dtype BEFORE multiplying by weight
    (modeling_llama.LlamaRMSNorm); set upcast_weight_mul=True for the
    all-fp32 variant.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    if upcast_weight_mul:
        return (weight.astype(jnp.float32) * xf).astype(dtype)
    return weight * xf.astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """torch.nn.LayerNorm parity (biased variance, fp32 stats)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * (var + eps) ** -0.5
    return (y.astype(dtype) * weight + bias).astype(dtype)


def cohere_layer_norm(x: jnp.ndarray, weight: jnp.ndarray,
                      eps: float = 1e-5) -> jnp.ndarray:
    """CohereLayerNorm parity (Command-R family, sglang
    srt/models/commandr.py): mean-centered LayerNorm with NO bias and the
    weight multiply in fp32 (modeling_cohere.CohereLayerNorm). Also used
    per-head for Cohere's qk-norm (weight [..., H, hd] broadcasting over
    [B, T, H, hd])."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (weight.astype(jnp.float32) * y).astype(x.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP activation: x * sigmoid(1.702 x)."""
    return x * jnp.reciprocal(1.0 + jnp.exp(-1.702 * x))


def family_norm(cfg, x: jnp.ndarray, weight: jnp.ndarray,
                bias: jnp.ndarray = None) -> jnp.ndarray:
    """Decoder-family norm dispatch — the ONE source of truth shared by
    the offline modeling (models/llama.py llama_apply) and the serving
    engine (serve/engine.py _forward_rows): RMSNorm (default, optional
    (1+w) fp32 multiply via cfg.norm_upcast_mul), torch LayerNorm with
    optional bias (StableLM/OLMo/Starcoder2), or Cohere's bias-free
    mean-centered LN (Command-R). Keeping this in one place means a new
    family's norm variant cannot drift between offline and served
    outputs."""
    if cfg.norm_type == "layernorm":
        return layer_norm(x, weight,
                          bias if bias is not None
                          else jnp.zeros_like(weight), cfg.rms_norm_eps)
    if cfg.norm_type == "cohere":
        return cohere_layer_norm(x, weight, cfg.rms_norm_eps)
    return rms_norm(x, weight, cfg.rms_norm_eps,
                    upcast_weight_mul=cfg.norm_upcast_mul)


def family_act(cfg, gate: jnp.ndarray) -> jnp.ndarray:
    """MLP activation dispatch shared by modeling and serving: SiLU
    (llama family), tanh-approx GELU in fp32 (gemma GeGLU /
    Starcoder2), or exact GELU."""
    if cfg.hidden_act == "gelu_tanh":
        return jax.nn.gelu(gate.astype(jnp.float32),
                           approximate=True).astype(gate.dtype)
    if cfg.hidden_act == "gelu":
        return jax.nn.gelu(gate.astype(jnp.float32),
                           approximate=False).astype(gate.dtype)
    return jax.nn.silu(gate)
