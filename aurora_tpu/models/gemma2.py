"""Gemma2 decoder family (model-zoo breadth).

Parity: sglang's Gemma2ForCausalLM (src/sglang/python/sglang/srt/models/
gemma2.py) and HF transformers Gemma2. Divergences from the llama family
that make this its own module rather than LlamaConfig flags:

  * embeddings scaled by sqrt(hidden) (normalizer cast to model dtype,
    gemma2.py:280-297);
  * RMSNorm multiplies by (1 + weight), stats in fp32;
  * FOUR norms per layer: input / post-attention (on the attn output) /
    pre-feedforward / post-feedforward;
  * GeGLU with tanh-approximated GELU (`gelu_pytorch_tanh`);
  * attention scale = query_pre_attn_scalar**-0.5 (not head_dim), logit
    softcapping on attention scores AND final logits;
  * alternating sliding-window attention: even layers window
    `sliding_window` (inclusive of the last token, gemma2.py:44-47),
    odd layers global;
  * head_dim decoupled from hidden/heads; tied embeddings.

Functional JAX with stacked layers + lax.scan (per-layer sliding flags
ride the scan xs) and the same static-shape KV cache protocol as
models/llama.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.ops.rope import apply_rope, rope_cos_sin

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Gemma2Config:
    vocab_size: int = 256000
    hidden_size: int = 3584
    intermediate_size: int = 14336
    num_hidden_layers: int = 42
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 256
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    sliding_window: int = 4096
    query_pre_attn_scalar: float = 256.0
    attn_logit_softcapping: float = 50.0
    final_logit_softcapping: float = 30.0

    @classmethod
    def gemma2_9b(cls) -> "Gemma2Config":
        return cls()

    @classmethod
    def gemma2_2b(cls) -> "Gemma2Config":
        return cls(hidden_size=2304, intermediate_size=9216,
                   num_hidden_layers=26, num_attention_heads=8,
                   num_key_value_heads=4, query_pre_attn_scalar=256.0)

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "Gemma2Config":
        return cls(vocab_size=vocab_size, hidden_size=64,
                   intermediate_size=128, num_hidden_layers=4,
                   num_attention_heads=4, num_key_value_heads=2,
                   head_dim=16, max_position_embeddings=128,
                   sliding_window=8, query_pre_attn_scalar=16.0)


def _gemma_norm(x, w, eps):
    """Gemma RMSNorm: fp32 stats, multiply by (1 + weight)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def _softcap(x, cap):
    return cap * jnp.tanh(x / cap)


def init_gemma2_params(rng: jax.Array, cfg: Gemma2Config,
                       dtype=jnp.float32) -> Params:
    d, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    hd, hq, hkv = cfg.head_dim, cfg.num_attention_heads, \
        cfg.num_key_value_heads
    ks = jax.random.split(rng, 9)

    def w(key, *shape):
        return jax.random.normal(key, shape, dtype) * 0.02

    return {
        "embed_tokens": w(ks[0], cfg.vocab_size, d),
        "layers": {
            # norm weights are the HF parameters (1 + w applied at use)
            "input_norm": jnp.zeros((L, d), dtype),
            "post_attn_norm": jnp.zeros((L, d), dtype),
            "pre_ffw_norm": jnp.zeros((L, d), dtype),
            "post_ffw_norm": jnp.zeros((L, d), dtype),
            "q": w(ks[1], L, d, hq * hd),
            "k": w(ks[2], L, d, hkv * hd),
            "v": w(ks[3], L, d, hkv * hd),
            "o": w(ks[4], L, hq * hd, d),
            "gate": w(ks[5], L, d, i),
            "up": w(ks[6], L, d, i),
            "down": w(ks[7], L, i, d),
            # even layers slide, odd are global (sglang gemma2.py:160)
            "sliding": jnp.asarray(
                [l % 2 == 0 for l in range(L)], bool),
        },
        "final_norm": jnp.zeros((d,), dtype),
    }


def init_gemma2_kv_cache(cfg: Gemma2Config, batch: int, max_len: int,
                         dtype=jnp.bfloat16) -> Params:
    shape = (cfg.num_hidden_layers, batch, max_len,
             cfg.num_key_value_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _attention(cfg: Gemma2Config, q, k, v, sliding, positions, kv_len,
               attention_mask, segment_ids, kv_segment_ids):
    """Softcapped attention with optional sliding window.
    q [B,T,Hq,hd]; k,v [B,S,Hkv,hd]; positions [B,T] global q positions."""
    B, T, Hq, hd = q.shape
    S = k.shape[1]
    if k.shape[2] != Hq:
        rep = Hq // k.shape[2]
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = cfg.query_pre_attn_scalar ** -0.5
    logits = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    logits = _softcap(logits, cfg.attn_logit_softcapping)
    qpos = positions[:, None, :, None]                    # [B,1,T,1]
    kpos = jnp.arange(S)[None, None, None, :]
    mask = kpos <= qpos                                   # causal
    mask &= kpos < kv_len                                 # cache validity
    # sliding layers see the trailing `sliding_window` tokens inclusive
    # of the last (gemma2.py:44-47: window - 1 lookback)
    window = jnp.where(sliding, cfg.sliding_window, S + 1)
    mask &= (qpos - kpos) < window
    if attention_mask is not None:
        mask &= attention_mask[:, None, None, :]
    if segment_ids is not None:
        mask &= (segment_ids[:, None, :, None]
                 == kv_segment_ids[:, None, None, :])
    logits = jnp.where(mask, logits, -2.38e38)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def gemma2_apply(params: Params, cfg: Gemma2Config, *,
                 input_ids: Optional[jnp.ndarray] = None,
                 inputs_embeds: Optional[jnp.ndarray] = None,
                 attention_mask: Optional[jnp.ndarray] = None,
                 position_ids: Optional[jnp.ndarray] = None,
                 segment_ids: Optional[jnp.ndarray] = None,
                 kv_cache: Optional[Params] = None,
                 cache_len=0,
                 remat: bool = False,
                 ) -> Tuple[jnp.ndarray, Optional[Params]]:
    """Forward → (logits [B,T,V] fp32, updated kv_cache or None).
    Same contract as models.llama.llama_apply."""
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embed_tokens"], input_ids,
                                 axis=0)
    x = inputs_embeds
    B, T, _ = x.shape
    assert not (kv_cache is not None and segment_ids is not None), (
        "packed segment attention over a KV cache is unsupported (the "
        "cache does not track per-slot segments)")
    # HF casts the normalizer to the model dtype before multiplying
    normalizer = jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
    x = x * normalizer

    if position_ids is None:
        position_ids = jnp.arange(T)[None, :] + cache_len
        position_ids = jnp.broadcast_to(position_ids, (B, T))
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta,
                            None, dtype=jnp.float32)
    hq, hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)

    def layer(x, xs):
        if kv_cache is not None:
            lp, ck, cv = xs
        else:
            lp, ck, cv = xs, None, None
        h = _gemma_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        q = jnp.dot(h, lp["q"], preferred_element_type=jnp.float32
                    ).astype(h.dtype).reshape(B, T, hq, hd)
        k = jnp.dot(h, lp["k"], preferred_element_type=jnp.float32
                    ).astype(h.dtype).reshape(B, T, hkv, hd)
        v = jnp.dot(h, lp["v"], preferred_element_type=jnp.float32
                    ).astype(h.dtype).reshape(B, T, hkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        if ck is not None:
            ck = jax.lax.dynamic_update_slice(
                ck, k.astype(ck.dtype), (0, cache_len, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v.astype(cv.dtype), (0, cache_len, 0, 0))
            k_all, v_all = ck.astype(k.dtype), cv.astype(v.dtype)
            kv_len = cache_len + T
        else:
            k_all, v_all = k, v
            kv_len = T
        attn = _attention(cfg, q, k_all, v_all, lp["sliding"],
                          position_ids, kv_len, attention_mask,
                          segment_ids, segment_ids)
        attn = jnp.dot(attn.reshape(B, T, hq * hd), lp["o"],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        attn = _gemma_norm(attn, lp["post_attn_norm"], cfg.rms_norm_eps)
        x = x + attn

        h = _gemma_norm(x, lp["pre_ffw_norm"], cfg.rms_norm_eps)
        gate = jnp.dot(h, lp["gate"], preferred_element_type=jnp.float32
                       ).astype(jnp.float32)
        up = jnp.dot(h, lp["up"], preferred_element_type=jnp.float32
                     ).astype(jnp.float32)
        ffw = jnp.dot((jax.nn.gelu(gate, approximate=True) * up
                       ).astype(h.dtype), lp["down"],
                      preferred_element_type=jnp.float32).astype(x.dtype)
        ffw = _gemma_norm(ffw, lp["post_ffw_norm"], cfg.rms_norm_eps)
        x = x + ffw
        return x, (ck, cv) if kv_cache is not None else None

    body = jax.checkpoint(layer) if remat else layer
    xs = ((params["layers"], kv_cache["k"], kv_cache["v"])
          if kv_cache is not None else params["layers"])
    x, caches = jax.lax.scan(body, x, xs)

    x = _gemma_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = jnp.dot(x, params["embed_tokens"].T,
                     preferred_element_type=jnp.float32)
    logits = _softcap(logits, cfg.final_logit_softcapping)
    new_cache = None
    if kv_cache is not None:
        new_cache = {"k": caches[0], "v": caches[1]}
    return logits, new_cache


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def gemma2_config_from_hf(cfg: Dict[str, Any]) -> Gemma2Config:
    return Gemma2Config(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        num_key_value_heads=cfg["num_key_value_heads"],
        head_dim=cfg.get("head_dim", 256),
        max_position_embeddings=cfg.get("max_position_embeddings", 8192),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 10000.0),
        sliding_window=cfg.get("sliding_window", 4096),
        query_pre_attn_scalar=cfg.get("query_pre_attn_scalar", 256.0),
        attn_logit_softcapping=cfg.get("attn_logit_softcapping", 50.0),
        final_logit_softcapping=cfg.get("final_logit_softcapping", 30.0))


def gemma2_params_from_hf(sd: Dict[str, np.ndarray], cfg: Gemma2Config,
                          dtype=jnp.bfloat16) -> Params:
    """HF Gemma2ForCausalLM state dict → stacked-layer pytree."""
    from aurora_tpu.models.convert import _strip_prefix
    sd = _strip_prefix(sd, ("model.",))
    L = cfg.num_hidden_layers

    def stack(fmt, transpose=True):
        ws = [np.asarray(sd[fmt.format(i)]) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.asarray(np.stack(ws), dtype)

    return {
        "embed_tokens": jnp.asarray(sd["embed_tokens.weight"], dtype),
        "layers": {
            "input_norm": stack(
                "layers.{}.input_layernorm.weight", transpose=False),
            "post_attn_norm": stack(
                "layers.{}.post_attention_layernorm.weight",
                transpose=False),
            "pre_ffw_norm": stack(
                "layers.{}.pre_feedforward_layernorm.weight",
                transpose=False),
            "post_ffw_norm": stack(
                "layers.{}.post_feedforward_layernorm.weight",
                transpose=False),
            "q": stack("layers.{}.self_attn.q_proj.weight"),
            "k": stack("layers.{}.self_attn.k_proj.weight"),
            "v": stack("layers.{}.self_attn.v_proj.weight"),
            "o": stack("layers.{}.self_attn.o_proj.weight"),
            "gate": stack("layers.{}.mlp.gate_proj.weight"),
            "up": stack("layers.{}.mlp.up_proj.weight"),
            "down": stack("layers.{}.mlp.down_proj.weight"),
            "sliding": jnp.asarray(
                [i % 2 == 0 for i in range(L)], bool),
        },
        "final_norm": jnp.asarray(sd["norm.weight"], dtype),
    }


# ---------------------------------------------------------------------------
# Serving-engine mapping (serve/engine.py universal config + param layout)
# ---------------------------------------------------------------------------

def gemma2_serving_config(cfg: Gemma2Config):
    """Gemma2Config → the engine-facing LlamaConfig view (sglang serves
    gemma2 through the same radix engine, srt/models/gemma2.py:1-120)."""
    from aurora_tpu.models.llama import LlamaConfig
    return LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim_override=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        tie_word_embeddings=True,
        sliding_window=cfg.sliding_window,
        swa_every_other=True,
        attn_logit_softcap=cfg.attn_logit_softcapping,
        final_logit_softcap=cfg.final_logit_softcapping,
        scale_embeddings=True,
        hidden_act="gelu_tanh",
        query_pre_attn_scalar=cfg.query_pre_attn_scalar,
        norm_upcast_mul=True)


def gemma2_serving_params(params: Params) -> Params:
    """Gemma2 pytree → engine layout. The (1 + w) RMSNorm convention is
    absorbed into the stored weights (engine norms multiply by w in
    fp32 via norm_upcast_mul), and the four per-layer norms map to
    input_norm / post_attn_out_norm (attn output) / post_attn_norm
    (pre-ffw, the engine's MLP pre-norm slot) / post_ffw_norm. The
    per-layer `sliding` flags are dropped — the engine derives them
    from swa_every_other."""
    lp = params["layers"]
    one = lambda w: (1.0 + w.astype(jnp.float32)).astype(w.dtype)  # noqa
    return {
        "embed_tokens": params["embed_tokens"],
        "layers": {
            "input_norm": one(lp["input_norm"]),
            "post_attn_out_norm": one(lp["post_attn_norm"]),
            "post_attn_norm": one(lp["pre_ffw_norm"]),
            "post_ffw_norm": one(lp["post_ffw_norm"]),
            "q": lp["q"], "k": lp["k"], "v": lp["v"], "o": lp["o"],
            "gate": lp["gate"], "up": lp["up"], "down": lp["down"],
        },
        "final_norm": one(params["final_norm"]),
    }
