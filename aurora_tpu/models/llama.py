"""Llama-family decoder (Vicuna-7B-v1.5-16k is the AuroraCap LLM).

Replaces the reference's HF transformers LlamaForCausalLM + dispatched
flash-attn path (src/xtuner/xtuner/model/modules/dispatch/llama.py:38-157)
with a functional JAX implementation:

  * stacked layer params + `lax.scan` → one compiled layer body, fast
    compiles, natural pjit sharding on named axes;
  * KV cache as preallocated static-shape buffers updated with
    dynamic_update_slice (decode never changes shapes → one compiled step);
  * GQA (num_key_value_heads) so the same code serves Llama-3.1-8B, the
    VDC judge model (docs/auroracap/EVAL.md:81-92);
  * rotary with optional linear scaling ({"type":"linear","factor":4} in
    vicuna-7b-v1.5-16k's config);
  * segment-id varlen masking replaces cu_seqlens varlen flash-attn
    (dispatch/llama.py:330-396).

Numerics parity with HF: RMSNorm fp32 stats (LlamaRMSNorm), fp32 softmax,
SiLU MLP, no attention/MLP biases, untied lm_head (Vicuna).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from aurora_tpu.ops.attention import mha
from aurora_tpu.ops.norms import rms_norm
from aurora_tpu.ops.rope import apply_rope, rope_cos_sin
from aurora_tpu.utils.constants import IGNORE_INDEX

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 16384
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_linear_scaling: Optional[float] = None
    tie_word_embeddings: bool = False
    qkv_bias: bool = False   # Qwen2-family attention biases
    qk_norm: bool = False    # Qwen3-family per-head RMSNorm on q/k
    # --- StableLM/OLMo/GLM/Starcoder2-family structural knobs ---
    norm_type: str = "rmsnorm"   # "layernorm": torch LayerNorm with a
    #   '<key>_bias' param per norm (zeros for OLMo's non-parametric LN)
    partial_rotary_factor: float = 1.0  # rotate first rd dims only
    rope_interleaved: bool = False      # GLM adjacent-pair rope lanes
    clip_qkv: Optional[float] = None    # OLMo qkv activation clamp
    mlp_style: str = "gated"     # "mlp": up → act → down (Starcoder2)
    sliding_window: Optional[int] = None  # Mistral-family SWA
    num_experts: int = 0     # >0 → Mixtral-family MoE MLP
    num_experts_per_tok: int = 2
    # explicit head size; None derives hidden/heads. Set when the derived
    # value would be wrong — e.g. TP-local configs (heads divided across
    # the mesh, hidden unchanged) or models with non-standard head dims.
    head_dim_override: Optional[int] = None
    # --- Gemma2-family serving knobs (engine-facing universal config;
    #     models/gemma2.py gemma2_serving_* maps a Gemma2Config here) ---
    attn_logit_softcap: float = 0.0    # tanh softcap on attention logits
    final_logit_softcap: float = 0.0   # tanh softcap on lm_head logits
    scale_embeddings: bool = False     # embeds * sqrt(hidden)
    hidden_act: str = "silu"           # "gelu_tanh" → GeGLU
    query_pre_attn_scalar: Optional[float] = None  # attn scale override
    swa_every_other: bool = False      # even layers sliding, odd global
    norm_upcast_mul: bool = False      # RMSNorm weight mul in fp32
    # --- DeepSeek-V2 MLA serving knobs (engine-facing universal config;
    #     models/deepseek_v2.py deepseek_serving_* maps here). When
    #     mla_kv_lora_rank is set the engine caches ONLY the compressed
    #     latent + shared rope sub-head per token (num_key_value_heads=1,
    #     head_dim_override=rank+rope — the MQA-like layout sglang's
    #     MLATokenToKVPool exploits, memory_pool.py:180-251) and runs
    #     weight-absorbed attention (serve/mla.py) ---
    mla_kv_lora_rank: Optional[int] = None
    mla_q_lora_rank: Optional[int] = None
    mla_qk_nope_head_dim: int = 0
    mla_qk_rope_head_dim: int = 0
    mla_v_head_dim: int = 0
    mla_first_k_dense: int = 0         # leading dense layers (unrolled)
    rope_inv_freq: Optional[tuple] = None   # YaRN explicit freqs
    rope_attention_scaling: float = 1.0
    # DeepSeek MoE routing (vs the Mixtral default): fp32 softmax over
    # ALL experts, greedy/group-limited top-k, scaling + shared experts
    moe_router_mode: str = "mixtral"   # "mixtral" | "deepseek"
    moe_routed_scaling: float = 1.0
    moe_norm_topk: bool = False
    moe_topk_method: str = "greedy"
    moe_n_group: int = 1
    moe_topk_group: int = 1
    # --- Command-R (Cohere) family knobs (sglang srt/models/commandr.py
    #     parity): one shared input norm feeding attention AND MLP in
    #     parallel (x + attn(h) + mlp(h)), norm_type="cohere"
    #     (mean-centered bias-free LN, fp32 weight mul — also used for
    #     the optional per-head qk-norm), logits scaled by logit_scale
    #     before softmax ---
    parallel_block: bool = False
    logit_scale: Optional[float] = None
    # GPT-BigCode/Starcoder-v1 (sglang srt/models/gpt_bigcode.py): learned
    # absolute position embeddings (params["wpe"]) added to the token
    # embeds; NO rotary anywhere. MQA is just num_key_value_heads=1.
    learned_pos: bool = False
    # MiniCPM (sglang srt/models/minicpm.py): embeds * scale_emb, every
    # residual branch * scale_depth/sqrt(L), logits * dim_model_base/d
    # (the last rides logit_scale). Scalar multiplies fuse into the
    # surrounding elementwise chains under XLA — zero runtime cost.
    embed_scale: Optional[float] = None
    residual_scale: Optional[float] = None
    # DeepSeek (v1) MoE (sglang srt/models/deepseek.py): the first k
    # layers are DENSE (different MLP width than the MoE tail) — they
    # live unstacked in params["dense_layers"] (python list) and run as
    # an unrolled prefix before one lax.scan over the uniform stacked
    # tail, mirroring serve/mla.py's heterogeneous-layer layout.
    first_k_dense: int = 0
    # Grok-1 (sglang srt/models/grok.py:102): tanh softcap on the MoE
    # ROUTER logits before softmax routing — 30*tanh(l/30), distinct
    # from attn_logit_softcap (grok caps both, hardcoded 30.0 in the
    # reference module)
    moe_router_logit_softcap: float = 0.0

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @property
    def attn_scale(self) -> float:
        base = (self.query_pre_attn_scalar
                if self.query_pre_attn_scalar is not None
                else self.head_dim)
        return float(base) ** -0.5

    @classmethod
    def qwen2_7b(cls) -> "LlamaConfig":
        """Qwen2-7B-Instruct — same decoder family with qkv biases and
        GQA (sglang model-zoo parity, srt/models/qwen2.py)."""
        return cls(vocab_size=152064, hidden_size=3584,
                   intermediate_size=18944, num_hidden_layers=28,
                   num_attention_heads=28, num_key_value_heads=4,
                   max_position_embeddings=32768, rms_norm_eps=1e-6,
                   rope_theta=1e6, qkv_bias=True)

    @classmethod
    def mistral_7b(cls) -> "LlamaConfig":
        """mistralai/Mistral-7B-v0.1 — llama-family decoder with GQA and
        sliding-window attention (sglang srt/models/mistral.py)."""
        return cls(vocab_size=32000, hidden_size=4096,
                   intermediate_size=14336, num_hidden_layers=32,
                   num_attention_heads=32, num_key_value_heads=8,
                   max_position_embeddings=32768, rope_theta=10000.0,
                   sliding_window=4096)

    @classmethod
    def vicuna_7b_v15_16k(cls) -> "LlamaConfig":
        """lmsys/vicuna-7b-v1.5-16k — AuroraCap-7B decoder
        (configs/auroracap/auroracap_7b_pretrain_stage.py:28)."""
        return cls(rope_linear_scaling=4.0)

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "LlamaConfig":
        return cls(vocab_size=vocab_size, hidden_size=64,
                   intermediate_size=128, num_hidden_layers=3,
                   num_attention_heads=4, num_key_value_heads=2,
                   max_position_embeddings=512)


def init_llama_params(rng: jax.Array, cfg: LlamaConfig,
                      dtype=jnp.float32) -> Params:
    """Random-init params with stacked layers [L, ...]."""
    d, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    hd, hq, hkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    ks = jax.random.split(rng, 10)

    def w(key, *shape):
        return jax.random.normal(key, shape, dtype) * 0.02

    p: Params = {
        "embed_tokens": w(ks[0], cfg.vocab_size, d),
        "layers": {
            "input_norm": jnp.ones((L, d), dtype),
            "post_attn_norm": jnp.ones((L, d), dtype),
            "q": w(ks[1], L, d, hq * hd),
            "k": w(ks[2], L, d, hkv * hd),
            "v": w(ks[3], L, d, hkv * hd),
            "o": w(ks[4], L, hq * hd, d),
            "gate": w(ks[5], L, d, i),
            "up": w(ks[6], L, d, i),
            "down": w(ks[7], L, i, d),
        },
        "final_norm": jnp.ones((d,), dtype),
    }
    if cfg.qkv_bias:
        p["layers"]["q_bias"] = jnp.zeros((L, hq * hd), dtype)
        p["layers"]["k_bias"] = jnp.zeros((L, hkv * hd), dtype)
        p["layers"]["v_bias"] = jnp.zeros((L, hkv * hd), dtype)
    if cfg.qk_norm:
        if cfg.norm_type == "cohere":  # per-head LN weights
            p["layers"]["q_norm"] = jnp.ones((L, hq, hd), dtype)
            p["layers"]["k_norm"] = jnp.ones((L, hkv, hd), dtype)
        else:
            p["layers"]["q_norm"] = jnp.ones((L, hd), dtype)
            p["layers"]["k_norm"] = jnp.ones((L, hd), dtype)
    if cfg.parallel_block:  # shared input norm only
        del p["layers"]["post_attn_norm"]
    if cfg.learned_pos:
        p["wpe"] = w(jax.random.fold_in(ks[8], 1),
                     cfg.max_position_embeddings, d)
    if cfg.num_experts > 0:
        from aurora_tpu.ops.moe import init_moe_params
        moe_ps = [init_moe_params(k, cfg.num_experts, d, i, dtype)
                  for k in jax.random.split(ks[9], L)]
        for name in ("router", "gate", "up", "down"):
            p["layers"][f"moe_{name}"] = jnp.stack(
                [mp[name] for mp in moe_ps])
        for name in ("gate", "up", "down"):
            del p["layers"][name]
    if not cfg.tie_word_embeddings:
        p["lm_head"] = w(ks[8], d, cfg.vocab_size)
    return p


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16) -> Params:
    shape = (cfg.num_hidden_layers, batch, max_len,
             cfg.num_key_value_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _mlp_act(cfg: LlamaConfig, gate):
    """MLP activation — shared dispatch (ops/norms.py family_act)."""
    from aurora_tpu.ops.norms import family_act
    return family_act(cfg, gate)


def _dnorm(cfg: LlamaConfig, x, tree, key):
    """Decoder norm dispatch — shared with the serving engine
    (ops/norms.py family_norm): RMSNorm (default), torch LayerNorm with
    the '<key>_bias' companion param (StableLM/Starcoder2; OLMo stores
    ones/zeros for its non-parametric variant), or Cohere's bias-free
    mean-centered LN (Command-R)."""
    from aurora_tpu.ops.norms import family_norm
    return family_norm(cfg, x, tree[key], tree.get(key + "_bias"))


def _qknorm(cfg: LlamaConfig, x, w):
    """Per-head q/k norm: Qwen3 RMSNorm ([hd] weight) or Cohere
    mean-centered LN ([H, hd] per-head weights), pre-rope in both."""
    if cfg.norm_type == "cohere":
        from aurora_tpu.ops.norms import cohere_layer_norm
        return cohere_layer_norm(x, w, cfg.rms_norm_eps)
    return rms_norm(x, w, cfg.rms_norm_eps)


def _layer(cfg: LlamaConfig, x, lp, cache_k, cache_v, cos, sin,
           attention_mask, segment_ids, cache_len, use_flash,
           sp_attn=None):
    """One decoder layer. cache_k/v: [B, S, Hkv, hd] or None."""
    if any(isinstance(v, dict) and ("q8" in v or "q4" in v)
           for v in lp.values()):
        # QLoRA frozen base: int8/int4 kernels (+ injected LoRA factors)
        # dequantized here, inside the scan body — one layer's float
        # weights live at a time (train/quant.py)
        from aurora_tpu.train.quant import dequant_layer_params
        lp = dequant_layer_params(lp, x.dtype)
    B, T, D = x.shape
    hq, hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)

    h = h_in = _dnorm(cfg, x, lp, "input_norm")
    if "qkv" in lp:  # serving-fused stream (serve.engine
        # fuse_serving_weights) — the embeddings endpoint runs
        # llama_apply over the live engine params
        fused = jnp.dot(h, lp["qkv"], preferred_element_type=jnp.float32
                        ).astype(h.dtype)
        if "qkv_bias" in lp:
            fused = fused + lp["qkv_bias"]
        nq, nkv = hq * hd, hkv * hd
        q, k, v = (fused[..., :nq], fused[..., nq:nq + nkv],
                   fused[..., nq + nkv:])
    else:
        q = jnp.dot(h, lp["q"], preferred_element_type=jnp.float32
                    ).astype(h.dtype)
        k = jnp.dot(h, lp["k"], preferred_element_type=jnp.float32
                    ).astype(h.dtype)
        v = jnp.dot(h, lp["v"], preferred_element_type=jnp.float32
                    ).astype(h.dtype)
        if "q_bias" in lp:  # Qwen2 family
            q = q + lp["q_bias"]
            k = k + lp["k_bias"]
            v = v + lp["v_bias"]
    if cfg.clip_qkv:  # OLMo activation clamp
        q = jnp.clip(q, -cfg.clip_qkv, cfg.clip_qkv)
        k = jnp.clip(k, -cfg.clip_qkv, cfg.clip_qkv)
        v = jnp.clip(v, -cfg.clip_qkv, cfg.clip_qkv)
    q = q.reshape(B, T, hq, hd)
    k = k.reshape(B, T, hkv, hd)
    v = v.reshape(B, T, hkv, hd)
    if "q_norm" in lp:  # Qwen3/Cohere per-head norm on q/k, pre-rope
        q = _qknorm(cfg, q, lp["q_norm"])
        k = _qknorm(cfg, k, lp["k_norm"])
    if not cfg.learned_pos:
        q, k = apply_rope(q, k, cos, sin,
                          interleaved=cfg.rope_interleaved)

    if cache_k is not None:
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (0, cache_len, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (0, cache_len, 0, 0))
        k_all, v_all = cache_k.astype(k.dtype), cache_v.astype(v.dtype)
        q_offset = cache_len
    else:
        k_all, v_all = k, v
        q_offset = 0

    mask = None
    if attention_mask is not None:
        mask = attention_mask[:, None, None, :]  # [B,1,1,S] key-side
    if cfg.sliding_window:
        # Mistral SWA: each query sees the trailing `sliding_window`
        # keys. The flash kernel has no window masking; route through
        # the masked XLA path.
        qpos = q_offset + jnp.arange(T)[:, None]
        kpos = jnp.arange(k_all.shape[1])[None, :]
        wmask = ((qpos - kpos) < cfg.sliding_window)[None, None]
        mask = wmask if mask is None else (mask & wmask)
        use_flash = False

    if sp_attn is not None and cache_k is None:
        # explicit sequence-parallel attention (ulysses/ring/hybrid),
        # training path only. Right padding needs no key mask under
        # causality (pad keys sit after every valid query); packed
        # segments are forwarded for the ulysses backend.
        attn = sp_attn(q, k_all, v_all, segment_ids)
    else:
        attn = mha(q, k_all, v_all, causal=True, mask=mask,
                   q_segment_ids=segment_ids,
                   kv_segment_ids=segment_ids, q_offset=q_offset,
                   scale=cfg.attn_scale,
                   logit_cap=cfg.attn_logit_softcap,
                   use_flash=use_flash)
    attn = jnp.dot(attn.reshape(B, T, hq * hd), lp["o"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if "o_bias" in lp:
        attn = attn + lp["o_bias"]
    if "post_attn_out_norm" in lp:  # Gemma2/Grok: norm the attn output
        attn = _dnorm(cfg, attn, lp, "post_attn_out_norm")
    if cfg.residual_scale is not None:  # MiniCPM depth scaling
        attn = attn * cfg.residual_scale
    if cfg.parallel_block:  # Cohere: MLP reads the SAME normed input;
        h = h_in            # attn and MLP join the residual together
    else:
        x = x + attn
        h = _dnorm(cfg, x, lp, "post_attn_norm")
    if "moe_router" in lp:  # Mixtral/Qwen2-MoE-family sparse MLP
        from aurora_tpu.ops.moe import moe_mlp, shared_expert_mlp
        routed = moe_mlp(
            {"router": lp["moe_router"], "gate": lp["moe_gate"],
             "up": lp["moe_up"], "down": lp["moe_down"]},
            h, cfg.num_experts_per_tok,
            router_mode=("softmax_topk"
                         if cfg.moe_router_mode == "softmax_topk"
                         else "mixtral"),
            norm_topk=cfg.moe_norm_topk,
            router_logit_softcap=cfg.moe_router_logit_softcap)
        if "moe_shared_gate" in lp:  # Qwen2-MoE shared expert
            routed = routed + shared_expert_mlp(lp, h)
        h = routed.astype(x.dtype)
    elif "gateup" in lp:  # serving-fused stream
        fused = jnp.dot(h, lp["gateup"],
                        preferred_element_type=jnp.float32).astype(h.dtype)
        inter = fused.shape[-1] // 2
        gate, up = fused[..., :inter], fused[..., inter:]
        h = jnp.dot(_mlp_act(cfg, gate) * up, lp["down"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
    elif "gate" in lp:
        gate = jnp.dot(h, lp["gate"], preferred_element_type=jnp.float32
                       ).astype(h.dtype)
        up = jnp.dot(h, lp["up"], preferred_element_type=jnp.float32
                     ).astype(h.dtype)
        h = jnp.dot(_mlp_act(cfg, gate) * up, lp["down"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        if "down_bias" in lp:
            h = h + lp["down_bias"]
    else:  # non-gated MLP (Starcoder2 c_fc → act → c_proj)
        up = jnp.dot(h, lp["up"], preferred_element_type=jnp.float32
                     ).astype(h.dtype)
        if "up_bias" in lp:
            up = up + lp["up_bias"]
        h = jnp.dot(_mlp_act(cfg, up), lp["down"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        if "down_bias" in lp:
            h = h + lp["down_bias"]
    if "post_ffw_norm" in lp:  # Gemma2/Grok: norm the MLP output
        h = _dnorm(cfg, h, lp, "post_ffw_norm")
    if cfg.residual_scale is not None:  # MiniCPM depth scaling
        h = h * cfg.residual_scale
    if cfg.parallel_block:
        return x + attn + h, cache_k, cache_v
    return x + h, cache_k, cache_v


def llama_apply(params: Params, cfg: LlamaConfig, *,
                input_ids: Optional[jnp.ndarray] = None,
                inputs_embeds: Optional[jnp.ndarray] = None,
                attention_mask: Optional[jnp.ndarray] = None,
                position_ids: Optional[jnp.ndarray] = None,
                segment_ids: Optional[jnp.ndarray] = None,
                kv_cache: Optional[Params] = None,
                cache_len=0,
                remat: bool = False,
                use_flash: Optional[bool] = None,
                sp_attn=None,
                return_hidden: bool = False,
                ) -> Tuple[jnp.ndarray, Optional[Params]]:
    """Forward pass → (logits [B,T,V] fp32, updated kv_cache or None).
    return_hidden=True skips the LM head and returns the final-norm
    hidden states [B,T,D] instead (embedding endpoints).

    attention_mask: [B, S_kv] bool key-side padding mask (S_kv = cache size
    when kv_cache is given, else T). segment_ids: [B, T] varlen packing.
    cache_len: (traced ok) number of valid tokens already in the cache.
    """
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embed_tokens"], input_ids, axis=0)
    x = inputs_embeds
    if cfg.attn_logit_softcap > 0.0:
        use_flash = False  # softcap routes through the XLA path (mha)
    if cfg.scale_embeddings:  # gemma family: normalizer cast to model
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)  # dtype
    if cfg.embed_scale is not None:  # MiniCPM scale_emb
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    B, T, _ = x.shape
    assert not (kv_cache is not None and segment_ids is not None), (
        "packed segment attention over a KV cache is unsupported: the "
        "cache does not track per-slot segments (score packed batches "
        "without a cache)")

    if position_ids is None:
        position_ids = jnp.arange(T)[None, :] + cache_len
        position_ids = jnp.broadcast_to(position_ids, (B, T))
    if cfg.learned_pos:  # GPT-BigCode wpe; rope disabled
        x = x + jnp.take(params["wpe"], position_ids, axis=0)
        cos = sin = jnp.zeros((1, T, 0), jnp.float32)
    else:
        cos, sin = rope_cos_sin(position_ids, cfg.rotary_dim,
                                cfg.rope_theta, cfg.rope_linear_scaling,
                                dtype=jnp.float32)

    first_k = len(params.get("dense_layers", ()))
    pre_k, pre_v = [], []
    for i in range(first_k):  # unrolled dense prefix (DeepSeek v1)
        ck = kv_cache["k"][i] if kv_cache is not None else None
        cv = kv_cache["v"][i] if kv_cache is not None else None
        x, ck, cv = _layer(cfg, x, params["dense_layers"][i], ck, cv,
                           cos, sin, attention_mask, segment_ids,
                           cache_len, use_flash, sp_attn)
        pre_k.append(ck)
        pre_v.append(cv)

    def scan_fn(carry, xs):
        h = carry
        if kv_cache is not None:
            lp, ck, cv = xs
        else:
            lp, ck, cv = xs, None, None
        h, ck, cv = _layer(cfg, h, lp, ck, cv, cos, sin, attention_mask,
                           segment_ids, cache_len, use_flash, sp_attn)
        return h, (ck, cv) if kv_cache is not None else None

    if remat:
        # remat may name a jax.checkpoint_policies member (VERDICT r4
        # #7: full remat recomputes the matmuls too — dots_saveable /
        # dots_with_no_batch_dims_saveable keep MXU outputs and
        # recompute only the cheap elementwise ops, the selective
        # activation checkpointing the reference trains with,
        # llava_train_sp.py:836-841); True/'full' = recompute all
        policy = (getattr(jax.checkpoint_policies, remat)
                  if isinstance(remat, str) and remat != "full" else None)
        body = jax.checkpoint(scan_fn, policy=policy)
    else:
        body = scan_fn
    if kv_cache is not None:
        xs = (params["layers"], kv_cache["k"][first_k:],
              kv_cache["v"][first_k:])
    else:
        xs = params["layers"]
    x, caches = jax.lax.scan(body, x, xs)

    x = _dnorm(cfg, x, params, "final_norm")
    if return_hidden:
        logits = x
    else:
        head = (params["embed_tokens"].T if cfg.tie_word_embeddings
                else params["lm_head"])
        logits = jnp.dot(x, head, preferred_element_type=jnp.float32)
        if cfg.logit_scale is not None:  # Cohere / MiniCPM scaling
            logits = logits * cfg.logit_scale

    new_cache = None
    if kv_cache is not None:
        ck, cv = caches
        if first_k:
            ck = jnp.concatenate([jnp.stack(pre_k), ck])
            cv = jnp.concatenate([jnp.stack(pre_v), cv])
        new_cache = {"k": ck, "v": cv}
    return logits, new_cache


def llama_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                  reduce: bool = True):
    """Shifted next-token CE with IGNORE_INDEX(-100) masking — parity with
    HF LlamaForCausalLM loss. Returns (loss, num_valid_tokens)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None],
                                   axis=-1)[..., 0]
    token_loss = jnp.where(valid, -token_ll, 0.0)
    n = jnp.sum(valid)
    if reduce:
        return jnp.sum(token_loss) / jnp.maximum(n, 1), n
    return token_loss, n
