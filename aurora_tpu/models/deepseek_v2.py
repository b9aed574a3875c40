"""DeepSeek-V2 decoder family: Multi-head Latent Attention + shared-expert
MoE (model-zoo breadth).

Parity: HF transformers DeepseekV2 and the reference's vendored modeling
(src/xtuner/xtuner/model/transformers_models/deepseek_v2/
modeling_deepseek_v2.py) + sglang srt/models/deepseek_v2.py. Defining
pieces:

  * MLA — queries optionally low-rank (q_lora_rank); K/V decompress from a
    kv_lora_rank latent (kv_a_proj_with_mqa → RMSNorm → kv_b_proj); one
    shared rope sub-head (qk_rope_head_dim) per token broadcast across
    heads; attention dim qk_nope+qk_rope, value dim v_head_dim;
  * interleaved (complex-pair) rotary on the rope sub-heads — NOT the
    llama rotate-half layout;
  * MoE with shared experts: fp32 softmax gate, greedy top-k (the
    group_limited_greedy variant of the 236B model reduces to greedy when
    n_group=1), routed_scaling_factor, optional top-k renorm, plus an
    always-on shared-expert MLP; the first `first_k_dense_replace`
    layers stay dense.

Layers are heterogeneous (dense/MoE), so params are a per-layer list and
the forward is a Python loop — fine for zoo-scale use; the serving-
integrated families (llama/qwen2/mixtral) keep the stacked-scan layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.ops.norms import rms_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DeepseekV2Config:
    vocab_size: int = 102400
    hidden_size: int = 2048
    intermediate_size: int = 10944
    moe_intermediate_size: int = 1408
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    kv_lora_rank: int = 512
    q_lora_rank: Optional[int] = None      # None = V2-Lite (direct q)
    n_routed_experts: int = 64
    n_shared_experts: int = 2
    num_experts_per_tok: int = 6
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = False
    first_k_dense_replace: int = 1
    moe_layer_freq: int = 1
    max_position_embeddings: int = 163840
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # YaRN (every shipped V2 checkpoint ships rope_scaling type=yarn):
    # explicit per-pair inverse frequencies + cos/sin magnitude scaling,
    # computed at conversion time with HF's own rope-init function so the
    # rotation matches the reference bit-for-bit.
    rope_inv_freq: Optional[tuple] = None
    rope_attention_scaling: float = 1.0
    # MoE routing method ("greedy" | "group_limited_greedy")
    topk_method: str = "greedy"
    n_group: int = 1
    topk_group: int = 1

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    def is_moe_layer(self, idx: int) -> bool:
        return (self.n_routed_experts > 0
                and idx >= self.first_k_dense_replace
                and idx % self.moe_layer_freq == 0)

    @classmethod
    def v2_lite(cls) -> "DeepseekV2Config":
        return cls()

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "DeepseekV2Config":
        return cls(vocab_size=vocab_size, hidden_size=64,
                   intermediate_size=128, moe_intermediate_size=32,
                   num_hidden_layers=3, num_attention_heads=4,
                   qk_nope_head_dim=16, qk_rope_head_dim=8,
                   v_head_dim=16, kv_lora_rank=32, q_lora_rank=None,
                   n_routed_experts=4, n_shared_experts=1,
                   num_experts_per_tok=2, first_k_dense_replace=1,
                   max_position_embeddings=256)


def _rope_interleaved(x, positions, theta, inv_freq=None,
                      attention_scaling=1.0):
    """Complex-pair rotary (HF DeepseekV2 apply_rotary_emb): consecutive
    pairs (x[2i], x[2i+1]) rotate by angle pos·inv_freq[i]; YaRN supplies
    explicit inv_freq and scales cos/sin by attention_scaling.
    x [B, T, Hx, d]; positions [B, T]."""
    d = x.shape[-1]
    if inv_freq is not None:
        inv = jnp.asarray(inv_freq, jnp.float32)
    else:
        inv = theta ** (-jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    ang = positions[..., None].astype(jnp.float32) * inv     # [B, T, d/2]
    cos = (jnp.cos(ang) * attention_scaling)[:, :, None, :]
    sin = (jnp.sin(ang) * attention_scaling)[:, :, None, :]
    xr = x[..., 0::2].astype(jnp.float32)
    xi = x[..., 1::2].astype(jnp.float32)
    out_r = xr * cos - xi * sin
    out_i = xr * sin + xi * cos
    out = jnp.stack([out_r, out_i], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def _mlp(lp, x):
    gate = jnp.dot(x, lp["gate"], preferred_element_type=jnp.float32
                   ).astype(x.dtype)
    up = jnp.dot(x, lp["up"], preferred_element_type=jnp.float32
                 ).astype(x.dtype)
    return jnp.dot(jax.nn.silu(gate) * up, lp["down"],
                   preferred_element_type=jnp.float32).astype(x.dtype)


def _moe(cfg: DeepseekV2Config, lp, x):
    """fp32 softmax gate → greedy top-k → routed experts + shared MLP."""
    B, T, D = x.shape
    flat = x.reshape(-1, D)
    logits = jnp.dot(flat.astype(jnp.float32),
                     lp["gate_weight"].astype(jnp.float32).T)
    scores = jax.nn.softmax(logits, axis=-1)                 # [N, E]
    if cfg.topk_method == "group_limited_greedy" and cfg.n_group > 1:
        # 236B routing: keep only the topk_group expert groups (by each
        # group's max score), then top-k within the survivors
        N, E = scores.shape
        g = scores.reshape(N, cfg.n_group, E // cfg.n_group)
        gmax = jnp.max(g, axis=-1)                           # [N, G]
        _, gidx = jax.lax.top_k(gmax, cfg.topk_group)
        gmask = jnp.zeros_like(gmax).at[
            jnp.arange(N)[:, None], gidx].set(1.0)
        masked = (g * gmask[..., None]).reshape(N, E)
        topw, topi = jax.lax.top_k(masked, cfg.num_experts_per_tok)
    else:
        topw, topi = jax.lax.top_k(scores, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topw = topw / jnp.maximum(topw.sum(-1, keepdims=True), 1e-20)
    topw = topw * cfg.routed_scaling_factor
    # dense-compute combine: every expert over every token, masked by the
    # top-k weights (zoo-scale correctness path; the Mixtral family's
    # ops/moe.py holds the throughput formulation)
    combine = jnp.zeros_like(scores).at[
        jnp.arange(flat.shape[0])[:, None], topi].set(topw)  # [N, E]
    out = jnp.zeros_like(flat, dtype=jnp.float32)
    for e, ep in enumerate(lp["experts"]):
        out = out + combine[:, e:e + 1] * _mlp(ep, flat).astype(
            jnp.float32)
    out = out.astype(x.dtype).reshape(B, T, D)
    return out + _mlp(lp["shared"], x)


def _mla(cfg: DeepseekV2Config, lp, h, positions):
    """Multi-head Latent Attention. h [B, T, D]; returns [B, T, D].
    mask [B, 1, T, S] boolean (True = attend)."""
    B, T, D = h.shape
    H = cfg.num_attention_heads
    if "q_a" in lp:
        q = jnp.dot(h, lp["q_a"])
        q = rms_norm(q, lp["q_a_norm"], cfg.rms_norm_eps)
        q = jnp.dot(q, lp["q_b"])
    else:
        q = jnp.dot(h, lp["q"])
    q = q.reshape(B, T, H, cfg.qk_head_dim)
    q_nope = q[..., :cfg.qk_nope_head_dim]
    q_pe = q[..., cfg.qk_nope_head_dim:]

    ckv = jnp.dot(h, lp["kv_a"])            # [B, T, rank + rope]
    latent = ckv[..., :cfg.kv_lora_rank]
    k_pe = ckv[..., cfg.kv_lora_rank:][:, :, None, :]    # [B, T, 1, rope]
    kv = jnp.dot(rms_norm(latent, lp["kv_a_norm"], cfg.rms_norm_eps),
                 lp["kv_b"])
    kv = kv.reshape(B, T, H, cfg.qk_nope_head_dim + cfg.v_head_dim)
    k_nope = kv[..., :cfg.qk_nope_head_dim]
    v = kv[..., cfg.qk_nope_head_dim:]

    q_pe = _rope_interleaved(q_pe, positions, cfg.rope_theta,
                             cfg.rope_inv_freq,
                             cfg.rope_attention_scaling)
    k_pe = _rope_interleaved(k_pe, positions, cfg.rope_theta,
                             cfg.rope_inv_freq,
                             cfg.rope_attention_scaling)
    k_pe = jnp.broadcast_to(k_pe, (B, T, H, cfg.qk_rope_head_dim))
    qf = jnp.concatenate([q_nope, q_pe], axis=-1)
    kf = jnp.concatenate([k_nope, k_pe], axis=-1)
    return qf, kf, v


def _attend(cfg, qf, kf, v, mask):
    scale = cfg.qk_head_dim ** -0.5
    logits = jnp.einsum("bthd,bshd->bhts",
                        qf.astype(jnp.float32) * scale,
                        kf.astype(jnp.float32))
    logits = jnp.where(mask, logits, -2.38e38)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
    return out.astype(v.dtype)


def init_deepseek_v2_params(rng: jax.Array, cfg: DeepseekV2Config,
                            dtype=jnp.float32) -> Params:
    D, H = cfg.hidden_size, cfg.num_attention_heads
    counter = [0]

    def w(*shape):
        # fold-in key stream: unbounded (MoE layers consume
        # ~3·n_routed_experts keys each — a fixed split pool ran dry)
        counter[0] += 1
        k = jax.random.fold_in(rng, counter[0])
        return jax.random.normal(k, shape, dtype) * 0.02

    def mlp(inter):
        return {"gate": w(D, inter), "up": w(D, inter),
                "down": w(inter, D)}

    layers: List[Params] = []
    for i in range(cfg.num_hidden_layers):
        lp: Params = {
            "input_norm": jnp.ones((D,), dtype),
            "post_attn_norm": jnp.ones((D,), dtype),
            "kv_a": w(D, cfg.kv_lora_rank + cfg.qk_rope_head_dim),
            "kv_a_norm": jnp.ones((cfg.kv_lora_rank,), dtype),
            "kv_b": w(cfg.kv_lora_rank,
                      H * (cfg.qk_nope_head_dim + cfg.v_head_dim)),
            "o": w(H * cfg.v_head_dim, D),
        }
        if cfg.q_lora_rank:
            lp["q_a"] = w(D, cfg.q_lora_rank)
            lp["q_a_norm"] = jnp.ones((cfg.q_lora_rank,), dtype)
            lp["q_b"] = w(cfg.q_lora_rank, H * cfg.qk_head_dim)
        else:
            lp["q"] = w(D, H * cfg.qk_head_dim)
        if cfg.is_moe_layer(i):
            lp["gate_weight"] = w(cfg.n_routed_experts, D)
            lp["experts"] = [mlp(cfg.moe_intermediate_size)
                             for _ in range(cfg.n_routed_experts)]
            lp["shared"] = mlp(cfg.moe_intermediate_size
                               * cfg.n_shared_experts)
        else:
            lp["mlp"] = mlp(cfg.intermediate_size)
        layers.append(lp)
    return {"embed_tokens": w(cfg.vocab_size, D), "layers": layers,
            "final_norm": jnp.ones((D,), dtype),
            "lm_head": w(D, cfg.vocab_size)}


def init_deepseek_v2_kv_cache(cfg: DeepseekV2Config, batch: int,
                              max_len: int, dtype=jnp.bfloat16) -> Params:
    """Naive per-head cache (k at qk_head_dim, v at v_head_dim). The MLA
    latent-cache optimization (cache kv_lora_rank + rope only) is a
    serving-side follow-up."""
    H = cfg.num_attention_heads
    return {
        "k": jnp.zeros((cfg.num_hidden_layers, batch, max_len, H,
                        cfg.qk_head_dim), dtype),
        "v": jnp.zeros((cfg.num_hidden_layers, batch, max_len, H,
                        cfg.v_head_dim), dtype)}


def deepseek_v2_apply(params: Params, cfg: DeepseekV2Config, *,
                      input_ids: Optional[jnp.ndarray] = None,
                      inputs_embeds: Optional[jnp.ndarray] = None,
                      attention_mask: Optional[jnp.ndarray] = None,
                      position_ids: Optional[jnp.ndarray] = None,
                      kv_cache: Optional[Params] = None,
                      cache_len: int = 0,
                      ) -> Tuple[jnp.ndarray, Optional[Params]]:
    """Forward → (logits [B,T,V] fp32, updated cache or None).
    Same contract as models.llama.llama_apply."""
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embed_tokens"], input_ids,
                                 axis=0)
    x = inputs_embeds
    B, T, _ = x.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(
            jnp.arange(T)[None, :] + cache_len, (B, T))

    new_k, new_v = [], []
    for i, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        qf, kf, v = _mla(cfg, lp, h, position_ids)
        if kv_cache is not None:
            ck = jax.lax.dynamic_update_slice(
                kv_cache["k"][i], kf.astype(kv_cache["k"].dtype),
                (0, cache_len, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                kv_cache["v"][i], v.astype(kv_cache["v"].dtype),
                (0, cache_len, 0, 0))
            new_k.append(ck)
            new_v.append(cv)
            kf, v = ck.astype(qf.dtype), cv.astype(qf.dtype)
            S = kf.shape[1]
            kv_len = cache_len + T
        else:
            S = T
            kv_len = T
        qpos = position_ids[:, None, :, None]
        kpos = jnp.arange(S)[None, None, None, :]
        mask = (kpos <= qpos) & (kpos < kv_len)
        if attention_mask is not None:
            mask = mask & attention_mask[:, None, None, :]
        attn = _attend(cfg, qf, kf, v, mask)
        attn = jnp.dot(attn.reshape(B, T, -1), lp["o"],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        x = x + attn
        h = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps)
        x = x + (_moe(cfg, lp, h) if cfg.is_moe_layer(i)
                 else _mlp(lp["mlp"], h))

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = jnp.dot(x, params["lm_head"],
                     preferred_element_type=jnp.float32)
    cache = None
    if kv_cache is not None:
        cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}
    return logits, cache


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def _yarn_from_hf(cfg: Dict[str, Any]):
    """(inv_freq tuple, attention_scaling) via HF's own rope-init — exact
    parity with the reference's rotary for yarn-scaled checkpoints."""
    if not cfg.get("rope_scaling"):
        return None, 1.0
    import torch
    from transformers import DeepseekV2Config as HFCfg
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
    hf = HFCfg(**{k: v for k, v in cfg.items()
                  if k in HFCfg().to_dict()})
    rope_type = cfg["rope_scaling"].get(
        "rope_type", cfg["rope_scaling"].get("type", "yarn"))
    inv_freq, scaling = ROPE_INIT_FUNCTIONS[rope_type](
        hf, torch.device("cpu"))
    return tuple(float(x) for x in inv_freq), float(scaling)


def deepseek_v2_config_from_hf(cfg: Dict[str, Any]) -> DeepseekV2Config:
    inv_freq, att_scaling = _yarn_from_hf(cfg)
    return DeepseekV2Config(
        rope_inv_freq=inv_freq,
        rope_attention_scaling=att_scaling,
        topk_method=cfg.get("topk_method", "greedy"),
        n_group=cfg.get("n_group", 1) or 1,
        topk_group=cfg.get("topk_group", 1) or 1,
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        moe_intermediate_size=cfg.get("moe_intermediate_size", 1408),
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        qk_nope_head_dim=cfg.get("qk_nope_head_dim", 128),
        qk_rope_head_dim=cfg.get("qk_rope_head_dim", 64),
        v_head_dim=cfg.get("v_head_dim", 128),
        kv_lora_rank=cfg.get("kv_lora_rank", 512),
        q_lora_rank=cfg.get("q_lora_rank"),
        n_routed_experts=cfg.get("n_routed_experts", 0) or 0,
        n_shared_experts=cfg.get("n_shared_experts", 0) or 0,
        num_experts_per_tok=cfg.get("num_experts_per_tok", 6) or 6,
        routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
        norm_topk_prob=cfg.get("norm_topk_prob", False),
        first_k_dense_replace=cfg.get("first_k_dense_replace", 1),
        moe_layer_freq=cfg.get("moe_layer_freq", 1),
        max_position_embeddings=cfg.get("max_position_embeddings", 4096),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 10000.0))


def deepseek_v2_params_from_hf(sd: Dict[str, np.ndarray],
                               cfg: DeepseekV2Config,
                               dtype=jnp.bfloat16) -> Params:
    from aurora_tpu.models.convert import _strip_prefix
    sd = _strip_prefix(sd, ("model.",))

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T, dtype)

    def n(name):
        return jnp.asarray(sd[name], dtype)

    def mlp(prefix):
        return {"gate": t(f"{prefix}.gate_proj.weight"),
                "up": t(f"{prefix}.up_proj.weight"),
                "down": t(f"{prefix}.down_proj.weight")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}"
        lp: Params = {
            "input_norm": n(f"{p}.input_layernorm.weight"),
            "post_attn_norm": n(f"{p}.post_attention_layernorm.weight"),
            "kv_a": t(f"{p}.self_attn.kv_a_proj_with_mqa.weight"),
            "kv_a_norm": n(f"{p}.self_attn.kv_a_layernorm.weight"),
            "kv_b": t(f"{p}.self_attn.kv_b_proj.weight"),
            "o": t(f"{p}.self_attn.o_proj.weight"),
        }
        if cfg.q_lora_rank:
            lp["q_a"] = t(f"{p}.self_attn.q_a_proj.weight")
            lp["q_a_norm"] = n(f"{p}.self_attn.q_a_layernorm.weight")
            lp["q_b"] = t(f"{p}.self_attn.q_b_proj.weight")
        else:
            lp["q"] = t(f"{p}.self_attn.q_proj.weight")
        if cfg.is_moe_layer(i):
            lp["gate_weight"] = jnp.asarray(
                sd[f"{p}.mlp.gate.weight"], dtype)
            lp["experts"] = [mlp(f"{p}.mlp.experts.{e}")
                             for e in range(cfg.n_routed_experts)]
            lp["shared"] = mlp(f"{p}.mlp.shared_experts")
        else:
            lp["mlp"] = mlp(f"{p}.mlp")
        layers.append(lp)
    return {"embed_tokens": n("embed_tokens.weight"), "layers": layers,
            "final_norm": n("norm.weight"),
            "lm_head": t("lm_head.weight")}
