"""Checkpoint conversion: HF/xtuner torch checkpoints ↔ aurora_tpu pytrees.

The xtuner checkpoint-layout contract (inference.py:42-57 in the reference):
a model dir holds the HF Llama at the root plus `visual_encoder/` and
`projector/` subdirectories. `load_auroracap_dir` consumes exactly that
layout so reference users can point us at their existing checkpoints.

Torch is used host-side only (CPU tensor reads) — nothing torch touches the
TPU compute path.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from aurora_tpu.models.llama import LlamaConfig
from aurora_tpu.models.projector import ProjectorConfig
from aurora_tpu.models.vit import ViTConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# State-dict IO
# ---------------------------------------------------------------------------

def load_torch_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read a HF model dir (sharded/single safetensors or .bin) → numpy."""
    sd: Dict[str, np.ndarray] = {}
    st_index = os.path.join(model_dir, "model.safetensors.index.json")
    bin_index = os.path.join(model_dir, "pytorch_model.bin.index.json")
    if os.path.exists(st_index):
        with open(st_index) as f:
            files = sorted(set(json.load(f)["weight_map"].values()))
        for fn in files:
            sd.update(_load_safetensors(os.path.join(model_dir, fn)))
    elif os.path.exists(os.path.join(model_dir, "model.safetensors")):
        sd.update(_load_safetensors(
            os.path.join(model_dir, "model.safetensors")))
    elif os.path.exists(bin_index):
        with open(bin_index) as f:
            files = sorted(set(json.load(f)["weight_map"].values()))
        for fn in files:
            sd.update(_load_torch_bin(os.path.join(model_dir, fn)))
    elif os.path.exists(os.path.join(model_dir, "pytorch_model.bin")):
        sd.update(_load_torch_bin(
            os.path.join(model_dir, "pytorch_model.bin")))
    else:
        raise FileNotFoundError(f"no weights found under {model_dir}")
    return sd


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def _load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _t2np(v) for k, v in sd.items()}


def _t2np(t) -> np.ndarray:
    import torch
    if t.dtype == torch.bfloat16:
        return t.float().numpy()
    return t.numpy()


def state_dict_from_torch_module(mod) -> Dict[str, np.ndarray]:
    """Test helper: torch nn.Module → numpy state dict."""
    return {k: _t2np(v) for k, v in mod.state_dict().items()}


# ---------------------------------------------------------------------------
# Config parsing
# ---------------------------------------------------------------------------

def _read_config(model_dir: str) -> Dict[str, Any]:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


def vit_config_from_hf(cfg: Dict[str, Any]) -> ViTConfig:
    v = cfg.get("vision_config", cfg)
    model_type = cfg.get("model_type", "clip")
    return ViTConfig(
        hidden_size=v["hidden_size"],
        intermediate_size=v["intermediate_size"],
        num_hidden_layers=v["num_hidden_layers"],
        num_attention_heads=v["num_attention_heads"],
        image_size=v.get("image_size", 378),
        patch_size=v.get("patch_size", 14),
        layer_norm_eps=v.get("layer_norm_eps", 1e-5),
        hidden_act=v.get("hidden_act",
                         "quick_gelu" if "clip" in model_type
                         else "gelu_pytorch_tanh"),
        model_type="siglip" if "siglip" in model_type else "clip",
    )


def llama_config_from_hf(cfg: Dict[str, Any]) -> LlamaConfig:
    if cfg.get("model_type") == "dbrx":
        # DBRX nests attention/ffn knobs (sglang srt/models/dbrx.py zoo
        # parity): flatten to the canonical names. Router = fp32 softmax
        # over ALL experts → top-k → sum-normalize (p=1 norm), which is
        # exactly the softmax_topk + norm_topk mode.
        a, f = cfg["attn_config"], cfg["ffn_config"]
        norm_w = f.get("moe_normalize_expert_weights")
        assert norm_w in (None, 1, 1.0), \
            f"dbrx moe_normalize_expert_weights={norm_w} unsupported"
        cfg = dict(cfg,
                   hidden_size=cfg["d_model"],
                   num_attention_heads=cfg["n_heads"],
                   num_hidden_layers=cfg["n_layers"],
                   max_position_embeddings=cfg["max_seq_len"],
                   intermediate_size=f["ffn_hidden_size"],
                   num_key_value_heads=a["kv_n_heads"],
                   clip_qkv=a["clip_qkv"],
                   rope_theta=a.get("rope_theta", 10000.0),
                   num_experts=f["moe_num_experts"],
                   num_experts_per_tok=f["moe_top_k"],
                   norm_topk_prob=norm_w is not None)
    if cfg.get("model_type") == "exaone":
        # EXAONE (LG; sglang srt/models/exaone.py): llama semantics under
        # renamed keys/config fields (num_layers, activation_function).
        cfg = dict(cfg, num_hidden_layers=cfg["num_layers"],
                   rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
                   hidden_act=cfg.get("activation_function", "silu"))
    if cfg.get("model_type") == "qwen":
        # Qwen (v1; sglang srt/models/qwen.py): GPT-style transformer.h
        # layout, fused c_attn WITH bias, MLP w2(gate)/w1(up)/c_proj with
        # ffn width = intermediate_size // 2, RMSNorm under ln_ names.
        cfg = dict(cfg,
                   intermediate_size=cfg["intermediate_size"] // 2,
                   rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-6),
                   rope_theta=cfg.get("rotary_emb_base", 10000.0),
                   max_position_embeddings=cfg.get(
                       "seq_length",
                       cfg.get("max_position_embeddings", 8192)),
                   attention_bias=True)
    if cfg.get("model_type") == "chatglm":
        # ChatGLM-2/3 (THUDM; sglang srt/models/chatglm.py): GLM-family
        # structure — interleaved HALF rotary (is_neox_style=False,
        # rotary_dim = head_dim/2), MQA groups, fused query_key_value
        # with bias, SwiGLU dense_h_to_4h packing [gate; up].
        mqa = cfg.get("multi_query_attention", False)
        cfg = dict(cfg,
                   model_type="glm",  # shares every structural knob
                   intermediate_size=cfg["ffn_hidden_size"],
                   num_hidden_layers=cfg["num_layers"],
                   num_key_value_heads=(cfg["multi_query_group_num"]
                                        if mqa
                                        else cfg["num_attention_heads"]),
                   head_dim=cfg.get("kv_channels"),
                   rms_norm_eps=cfg.get("layernorm_epsilon", 1e-5),
                   partial_rotary_factor=0.5,
                   rope_theta=10000.0 * cfg.get("rope_ratio", 1.0),
                   max_position_embeddings=cfg.get("seq_length", 8192),
                   attention_bias=cfg.get("add_qkv_bias",
                                          cfg.get("add_bias_linear",
                                                  False)))
    if cfg.get("model_type") == "deepseek":
        # DeepSeek (v1) MoE (sglang srt/models/deepseek.py): standard
        # GQA attention + MoE tail with UNGATED always-on shared experts
        # and a dense prefix (first_k_dense_replace). Router = softmax
        # over all experts → top-k → optional renormalize.
        assert cfg.get("moe_layer_freq", 1) == 1, \
            "deepseek v1 with interleaved dense layers unsupported"
        cfg = dict(cfg,
                   num_experts=cfg.get("n_routed_experts") or 0,
                   first_k_dense=(cfg.get("first_k_dense_replace", 0)
                                  if cfg.get("n_routed_experts") else 0))
    if cfg.get("model_type") in ("grok-1", "grok1", "grok"):
        # Grok-1 (sglang srt/models/grok.py — the last sglang zoo
        # family): MoE every layer with fp32 softmax-over-ALL routing
        # and NO top-k renorm (FusedMoE renormalize=False, grok.py:91),
        # tanh softcaps HARDCODED at 30.0 on attention scores
        # (grok.py:116) and router logits (grok.py:102), four RMSNorms
        # per layer (grok.py:214-217), embeds *
        # embedding_multiplier_scale (grok.py:277), hidden *
        # output_multiplier_scale before the head (grok.py:284 — a
        # linear head makes it exactly logit_scale), head_dim pinned
        # to 128 (grok.py:137).
        cfg = dict(cfg,
                   model_type="grok",
                   attn_logit_softcap=30.0,
                   moe_router_logit_softcap=30.0,
                   embed_scale=float(
                       cfg.get("embedding_multiplier_scale", 1.0)),
                   logit_scale=float(
                       cfg.get("output_multiplier_scale", 1.0)),
                   head_dim=cfg.get("head_dim", 128))
    if cfg.get("model_type") == "minicpm":
        # MiniCPM (sglang srt/models/minicpm.py): llama keys with three
        # scalar scalings — embeds * scale_emb, residual branches *
        # scale_depth/sqrt(L), logits * dim_model_base/d (as logit_scale)
        cfg = dict(cfg,
                   embed_scale=float(cfg.get("scale_emb", 1.0)),
                   residual_scale=(float(cfg.get("scale_depth", 1.0))
                                   / cfg["num_hidden_layers"] ** 0.5),
                   logit_scale=(float(cfg.get("dim_model_base",
                                              cfg["hidden_size"]))
                                / cfg["hidden_size"]))
    if cfg.get("model_type") == "gpt_bigcode":
        # GPT-BigCode / Starcoder-v1 (sglang srt/models/gpt_bigcode.py):
        # GPT-2 config names, MQA (multi_query → 1 kv head), learned
        # absolute positions, non-gated GELU MLP, biases everywhere.
        cfg = dict(cfg,
                   hidden_size=cfg["n_embd"],
                   num_attention_heads=cfg["n_head"],
                   num_hidden_layers=cfg["n_layer"],
                   intermediate_size=(cfg.get("n_inner")
                                      or 4 * cfg["n_embd"]),
                   max_position_embeddings=cfg["n_positions"],
                   num_key_value_heads=(1 if cfg.get("multi_query", True)
                                        else cfg["n_head"]),
                   layer_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
                   hidden_act=cfg.get("activation_function",
                                      "gelu_pytorch_tanh"))
    scaling = cfg.get("rope_scaling") or {}
    linear = (scaling.get("factor")
              if scaling.get("type") == "linear" else None)
    if cfg.get("model_type") in ("qwen2_moe", "qwen3_moe"):
        # Qwen-MoE: every layer sparse in our layout (stacked scan)
        assert cfg.get("decoder_sparse_step", 1) == 1 \
            and not cfg.get("mlp_only_layers"), \
            "qwen moe with dense interleaving is not supported"
    if cfg.get("model_type") == "internlm2":
        assert not cfg.get("bias", False), \
            "internlm2 with attention bias is not supported"
    mt = cfg.get("model_type")
    gemma = mt == "gemma"
    # StableLM/Starcoder2 carry torch LayerNorm (+bias params); OLMo's
    # LN is non-parametric (ones/zeros are synthesized at conversion)
    layernorm = mt in ("stablelm", "olmo", "starcoder2", "gpt_bigcode")
    act_map = {"gelu_pytorch_tanh": "gelu_tanh", "gelu_new": "gelu_tanh",
               "gelu_tanh": "gelu_tanh", "gelu": "gelu"}
    return LlamaConfig(
        qkv_bias=(mt in ("qwen2", "qwen2_moe")
                  or cfg.get("attention_bias", False)
                  or (mt == "stablelm" and cfg.get("use_qkv_bias",
                                                   False))
                  or (mt == "starcoder2" and cfg.get("use_bias", True))
                  or mt == "gpt_bigcode"),
        learned_pos=mt == "gpt_bigcode",
        qk_norm=(mt in ("qwen3", "qwen3_moe")
                 or (mt == "cohere" and cfg.get("use_qk_norm", False))),
        # Command-R (sglang srt/models/commandr.py zoo parity): parallel
        # attn+MLP residual off ONE shared input norm, Cohere LN,
        # interleaved rotary, scaled logits, tied embeddings
        parallel_block=mt == "cohere",
        logit_scale=(cfg.get("logit_scale")
                     if mt in ("cohere", "minicpm", "grok") else None),
        attn_logit_softcap=cfg.get("attn_logit_softcap", 0.0),
        moe_router_logit_softcap=cfg.get("moe_router_logit_softcap",
                                         0.0),
        embed_scale=cfg.get("embed_scale"),
        residual_scale=cfg.get("residual_scale"),
        # Gemma1 (srt/models/gemma.py zoo parity): GeGLU MLP, sqrt(d)
        # embedding scale, (1+w) RMSNorm with fp32 weight multiply (the
        # +1 is absorbed into the stored weights at conversion)
        scale_embeddings=gemma,
        hidden_act=("gelu_tanh" if gemma else
                    act_map.get(cfg.get("hidden_act") or "silu",
                                "silu")),
        norm_upcast_mul=gemma,
        norm_type=("cohere" if mt == "cohere"
                   else "layernorm" if (layernorm or mt == "dbrx")
                   else "rmsnorm"),
        partial_rotary_factor=cfg.get("partial_rotary_factor", 1.0),
        rope_interleaved=mt in ("glm", "cohere"),
        clip_qkv=cfg.get("clip_qkv"),
        mlp_style=("mlp" if mt in ("starcoder2", "gpt_bigcode")
                   else "gated"),
        head_dim_override=cfg.get("head_dim"),
        num_experts=cfg.get("num_local_experts",
                            cfg.get("num_experts", 0)) or 0,
        num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
        moe_router_mode=("softmax_topk"
                         if cfg.get("model_type") in ("qwen2_moe",
                                                      "qwen3_moe",
                                                      "dbrx",
                                                      "deepseek",
                                                      "grok")
                         else "mixtral"),
        first_k_dense=cfg.get("first_k_dense", 0),
        moe_norm_topk=cfg.get("norm_topk_prob", False),
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        num_key_value_heads=cfg.get("num_key_value_heads",
                                    cfg["num_attention_heads"]),
        max_position_embeddings=cfg.get("max_position_embeddings", 4096),
        rms_norm_eps=(cfg.get("rms_norm_eps")
                      or cfg.get("layer_norm_eps")
                      or cfg.get("norm_epsilon") or 1e-5),
        rope_theta=cfg.get("rope_theta", 10000.0),
        rope_linear_scaling=linear,
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        sliding_window=(cfg.get("sliding_window")
                        if mt in ("mistral", "phi3", "starcoder2")
                        else None),
    )


# ---------------------------------------------------------------------------
# Param conversion
# ---------------------------------------------------------------------------

def _strip_prefix(sd: Dict[str, np.ndarray],
                  prefixes=("model.", "vision_model.",
                            "visual_encoder.")) -> Dict[str, np.ndarray]:
    """Normalize away wrapper prefixes so one mapping serves HF standalone
    models and xtuner composite state dicts."""
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            while k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def _j(a: np.ndarray, dtype) -> jnp.ndarray:
    return jnp.asarray(a, dtype=dtype)


def vit_params_from_hf(sd: Dict[str, np.ndarray], cfg: ViTConfig,
                       dtype=jnp.float32) -> Params:
    """CLIPVisionModel / SiglipVisionModel state dict → vit params.

    Handles HF naming incl. the `pre_layrnorm` typo in modeling_clip.
    """
    sd = _strip_prefix(sd)
    pk = sd["embeddings.patch_embedding.weight"]  # [D, C, p, p]
    p: Params = {
        "embeddings": {
            "patch_kernel": _j(pk.reshape(pk.shape[0], -1).T, dtype),
            "position_embedding": _j(
                sd["embeddings.position_embedding.weight"], dtype),
        },
        "layers": [],
        "post_layernorm": {
            "scale": _j(sd["post_layernorm.weight"], dtype),
            "bias": _j(sd["post_layernorm.bias"], dtype),
        },
    }
    if cfg.class_token:
        p["embeddings"]["class_embedding"] = _j(
            sd["embeddings.class_embedding"].reshape(-1), dtype)
        pre = ("pre_layrnorm" if "pre_layrnorm.weight" in sd
               else "pre_layernorm")
        p["pre_layernorm"] = {"scale": _j(sd[f"{pre}.weight"], dtype),
                              "bias": _j(sd[f"{pre}.bias"], dtype)}
    if "embeddings.patch_embedding.bias" in sd:
        p["embeddings"]["patch_bias"] = _j(
            sd["embeddings.patch_embedding.bias"], dtype)

    def lin(prefix):
        return {"kernel": _j(sd[f"{prefix}.weight"].T, dtype),
                "bias": _j(sd[f"{prefix}.bias"], dtype)}

    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        p["layers"].append({
            "ln1": {"scale": _j(sd[f"{pre}.layer_norm1.weight"], dtype),
                    "bias": _j(sd[f"{pre}.layer_norm1.bias"], dtype)},
            "attn": {"q": lin(f"{pre}.self_attn.q_proj"),
                     "k": lin(f"{pre}.self_attn.k_proj"),
                     "v": lin(f"{pre}.self_attn.v_proj"),
                     "o": lin(f"{pre}.self_attn.out_proj")},
            "ln2": {"scale": _j(sd[f"{pre}.layer_norm2.weight"], dtype),
                    "bias": _j(sd[f"{pre}.layer_norm2.bias"], dtype)},
            "mlp": {"fc1": lin(f"{pre}.mlp.fc1"),
                    "fc2": lin(f"{pre}.mlp.fc2")},
        })
    return p


def llama_params_from_hf(sd: Dict[str, np.ndarray], cfg: LlamaConfig,
                         dtype=jnp.bfloat16) -> Params:
    """LlamaForCausalLM state dict → stacked-layer params."""
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in sd.items() if not k.endswith(".inv_freq")}
    L = cfg.num_hidden_layers

    # DBRX (modeling_dbrx; sglang srt/models/dbrx.py): transformer.blocks
    # layout with fused Wqkv, LayerNorm norms without bias, and experts
    # stored FUSED as w1/v1/w2 [E*F, D] (w2 applied untransposed:
    # x @ w2_e). Remap host-side into the canonical per-expert layout.
    if "transformer.blocks.0.norm_attn_norm.attn.Wqkv.weight" in sd:
        E = cfg.num_experts
        F = cfg.intermediate_size
        out = {"embed_tokens.weight": sd["transformer.wte.weight"],
               "norm.weight": sd["transformer.norm_f.weight"],
               "lm_head.weight": sd["lm_head.weight"]}
        for i in range(L):
            b = f"transformer.blocks.{i}"
            out[f"layers.{i}.self_attn.qkv_proj.weight"] = \
                sd[f"{b}.norm_attn_norm.attn.Wqkv.weight"]
            out[f"layers.{i}.self_attn.o_proj.weight"] = \
                sd[f"{b}.norm_attn_norm.attn.out_proj.weight"]
            out[f"layers.{i}.input_layernorm.weight"] = \
                sd[f"{b}.norm_attn_norm.norm_1.weight"]
            out[f"layers.{i}.post_attention_layernorm.weight"] = \
                sd[f"{b}.norm_attn_norm.norm_2.weight"]
            out[f"layers.{i}.mlp.gate.weight"] = \
                sd[f"{b}.ffn.router.layer.weight"]
            w1 = sd[f"{b}.ffn.experts.mlp.w1"].reshape(E, F, -1)
            v1 = sd[f"{b}.ffn.experts.mlp.v1"].reshape(E, F, -1)
            w2 = sd[f"{b}.ffn.experts.mlp.w2"].reshape(E, F, -1)
            for e in range(E):
                out[f"layers.{i}.mlp.experts.{e}.gate_proj.weight"] = \
                    w1[e]
                out[f"layers.{i}.mlp.experts.{e}.up_proj.weight"] = v1[e]
                # w2_e is [F, D] used as x @ w2_e → down_proj.weight
                # ([D, F] torch convention) is its transpose
                out[f"layers.{i}.mlp.experts.{e}.down_proj.weight"] = \
                    np.ascontiguousarray(w2[e].T)
        sd = out

    def stack(fmt, transpose=False):
        if fmt.format(0) not in sd:  # e.g. dense mlp keys on MoE models
            return None
        mats = [sd[fmt.format(i)] for i in range(L)]
        arr = np.stack([m.T if transpose else m for m in mats])
        return _j(arr, dtype)

    # InternLM2 is llama semantics under renamed keys and a FUSED
    # GROUP-INTERLEAVED wqkv: [Hkv, q_per_kv + 2, hd, hidden] with each
    # kv group's q heads first, then its k, then its v (sglang
    # srt/models/internlm2.py:1-80 weight_loader; no HF-native class
    # exists — tests anchor via a remapped torch-llama oracle).
    if "layers.0.attention.wqkv.weight" in sd:
        hq, hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)
        qpk = hq // hkv
        for i in range(L):
            w = sd.pop(f"layers.{i}.attention.wqkv.weight")
            w = w.reshape(hkv, qpk + 2, hd, -1)
            sd[f"layers.{i}.self_attn.q_proj.weight"] = \
                w[:, :qpk].reshape(hq * hd, -1)
            sd[f"layers.{i}.self_attn.k_proj.weight"] = \
                w[:, qpk].reshape(hkv * hd, -1)
            sd[f"layers.{i}.self_attn.v_proj.weight"] = \
                w[:, qpk + 1].reshape(hkv * hd, -1)
            for a, b in (("attention.wo", "self_attn.o_proj"),
                         ("feed_forward.w1", "mlp.gate_proj"),
                         ("feed_forward.w3", "mlp.up_proj"),
                         ("feed_forward.w2", "mlp.down_proj"),
                         ("attention_norm", "input_layernorm"),
                         ("ffn_norm", "post_attention_layernorm")):
                sd[f"layers.{i}.{b}.weight"] = \
                    sd.pop(f"layers.{i}.{a}.weight")
        sd["embed_tokens.weight"] = sd.pop("tok_embeddings.weight")
        if "output.weight" in sd:
            sd["lm_head.weight"] = sd.pop("output.weight")

    # GPT-BigCode (modeling_gpt_bigcode; sglang srt/models/
    # gpt_bigcode.py): transformer.h layout, fused c_attn (q + MQA kv)
    # with bias, learned wpe, LayerNorm with bias, c_fc/c_proj MLP.
    if ("transformer.h.0.attn.c_attn.weight" in sd
            and "transformer.wpe.weight" in sd):
        nq = cfg.num_attention_heads * cfg.head_dim
        nkv = cfg.num_key_value_heads * cfg.head_dim
        out = {"embed_tokens.weight": sd["transformer.wte.weight"],
               "wpe.weight": sd["transformer.wpe.weight"],
               "norm.weight": sd["transformer.ln_f.weight"],
               "norm.bias": sd["transformer.ln_f.bias"]}
        for i in range(L):
            b = f"transformer.h.{i}"
            for suf in ("weight", "bias"):
                qkv = sd[f"{b}.attn.c_attn.{suf}"]
                out[f"layers.{i}.self_attn.q_proj.{suf}"] = qkv[:nq]
                out[f"layers.{i}.self_attn.k_proj.{suf}"] = \
                    qkv[nq:nq + nkv]
                out[f"layers.{i}.self_attn.v_proj.{suf}"] = \
                    qkv[nq + nkv:]
                for a, c in (("attn.c_proj", "self_attn.o_proj"),
                             ("mlp.c_fc", "mlp.up_proj"),
                             ("mlp.c_proj", "mlp.down_proj"),
                             ("ln_1", "input_layernorm"),
                             ("ln_2", "post_attention_layernorm")):
                    out[f"layers.{i}.{c}.{suf}"] = sd[f"{b}.{a}.{suf}"]
        sd = out

    # Qwen (v1): transformer.h layout, fused c_attn with bias (MHA
    # thirds), MLP w2=gate / w1=up / c_proj=down at half the config's
    # intermediate_size (sglang srt/models/qwen.py weight mapping).
    if "transformer.h.0.mlp.w1.weight" in sd:
        out = {"embed_tokens.weight": sd["transformer.wte.weight"],
               "norm.weight": sd["transformer.ln_f.weight"],
               "lm_head.weight": sd["lm_head.weight"]}
        n = cfg.num_attention_heads * cfg.head_dim
        for i in range(L):
            b = f"transformer.h.{i}"
            for suf in ("weight", "bias"):
                if f"{b}.attn.c_attn.{suf}" not in sd:
                    continue
                qkv = sd[f"{b}.attn.c_attn.{suf}"]
                out[f"layers.{i}.self_attn.q_proj.{suf}"] = qkv[:n]
                out[f"layers.{i}.self_attn.k_proj.{suf}"] = qkv[n:2 * n]
                out[f"layers.{i}.self_attn.v_proj.{suf}"] = qkv[2 * n:]
            for a, c in (("attn.c_proj", "self_attn.o_proj"),
                         ("mlp.w2", "mlp.gate_proj"),
                         ("mlp.w1", "mlp.up_proj"),
                         ("mlp.c_proj", "mlp.down_proj"),
                         ("ln_1", "input_layernorm"),
                         ("ln_2", "post_attention_layernorm")):
                out[f"layers.{i}.{c}.weight"] = sd[f"{b}.{a}.weight"]
        sd = out

    # EXAONE: llama semantics under transformer.h naming with
    # attn.attention.* projections and c_fc_0/c_fc_1 gate/up
    # (sglang srt/models/exaone.py weight mapping).
    if "transformer.h.0.attn.attention.q_proj.weight" in sd:
        out = {"embed_tokens.weight": sd["transformer.wte.weight"],
               "norm.weight": sd["transformer.ln_f.weight"],
               "lm_head.weight": sd["lm_head.weight"]}
        for i in range(L):
            b = f"transformer.h.{i}"
            for a, c in (("attn.attention.q_proj", "self_attn.q_proj"),
                         ("attn.attention.k_proj", "self_attn.k_proj"),
                         ("attn.attention.v_proj", "self_attn.v_proj"),
                         ("attn.attention.out_proj", "self_attn.o_proj"),
                         ("mlp.c_fc_0", "mlp.gate_proj"),
                         ("mlp.c_fc_1", "mlp.up_proj"),
                         ("mlp.c_proj", "mlp.down_proj"),
                         ("ln_1", "input_layernorm"),
                         ("ln_2", "post_attention_layernorm")):
                out[f"layers.{i}.{c}.weight"] = sd[f"{b}.{a}.weight"]
        sd = out

    # ChatGLM-2/3 (THUDM layout; sglang srt/models/chatglm.py): encoder
    # layers with fused query_key_value (+bias), SwiGLU dense_h_to_4h
    # packed [gate; up], dense_4h_to_h down, output_layer head.
    if "transformer.encoder.layers.0.self_attention.query_key_value." \
            "weight" in sd:
        out = {"embed_tokens.weight":
               sd["transformer.embedding.word_embeddings.weight"],
               "norm.weight":
               sd["transformer.encoder.final_layernorm.weight"],
               "lm_head.weight": sd["transformer.output_layer.weight"]}
        nq = cfg.num_attention_heads * cfg.head_dim
        nkv = cfg.num_key_value_heads * cfg.head_dim
        for i in range(L):
            b = f"transformer.encoder.layers.{i}"
            for suf in ("weight", "bias"):
                key = f"{b}.self_attention.query_key_value.{suf}"
                if key not in sd:
                    continue
                qkv = sd[key]
                out[f"layers.{i}.self_attn.q_proj.{suf}"] = qkv[:nq]
                out[f"layers.{i}.self_attn.k_proj.{suf}"] = \
                    qkv[nq:nq + nkv]
                out[f"layers.{i}.self_attn.v_proj.{suf}"] = \
                    qkv[nq + nkv:]
            gu = sd[f"{b}.mlp.dense_h_to_4h.weight"]
            F = gu.shape[0] // 2
            out[f"layers.{i}.mlp.gate_proj.weight"] = gu[:F]
            out[f"layers.{i}.mlp.up_proj.weight"] = gu[F:]
            for a, c in (("self_attention.dense", "self_attn.o_proj"),
                         ("mlp.dense_4h_to_h", "mlp.down_proj"),
                         ("input_layernorm", "input_layernorm"),
                         ("post_attention_layernorm",
                          "post_attention_layernorm")):
                out[f"layers.{i}.{c}.weight"] = sd[f"{b}.{a}.weight"]
        sd = out

    # Starcoder2 names its non-gated MLP c_fc/c_proj (GPT lineage);
    # canonicalize to up/down (sglang srt/models zoo parity)
    if "layers.0.mlp.c_fc.weight" in sd:
        for i in range(L):
            for a, b in (("c_fc", "up_proj"), ("c_proj", "down_proj")):
                for suf in ("weight", "bias"):
                    key = f"layers.{i}.mlp.{a}.{suf}"
                    if key in sd:
                        sd[f"layers.{i}.mlp.{b}.{suf}"] = sd.pop(key)

    # Grok-1 (sglang srt/models/grok.py:214-217): FOUR RMSNorms per
    # layer under pre/post_attn_norm + pre/post_moe_norm names — the
    # pre-norms map to the canonical input/MLP-pre slots, the output
    # norms to the gemma2-style post_attn_out_norm / post_ffw_norm
    # slots. Attention projections are already llama-named and experts
    # mixtral-named (block_sparse_moe.experts.N.w{1,2,3}).
    if "layers.0.pre_moe_norm.weight" in sd:
        for i in range(L):
            for a, b in (("pre_attn_norm", "input_layernorm"),
                         ("post_attn_norm", "post_attn_out_norm"),
                         ("pre_moe_norm", "post_attention_layernorm"),
                         ("post_moe_norm", "post_ffw_norm")):
                sd[f"layers.{i}.{b}.weight"] = \
                    sd.pop(f"layers.{i}.{a}.weight")

    # Phi-3 ships fused qkv_proj / gate_up_proj matrices (sglang zoo
    # parity, srt/models — phi-3 is llama semantics otherwise); split
    # them into the canonical q/k/v + gate/up layout up front.
    if "layers.0.self_attn.qkv_proj.weight" in sd:
        nq = cfg.num_attention_heads * cfg.head_dim
        nkv = cfg.num_key_value_heads * cfg.head_dim
        for i in range(L):
            qkv = sd.pop(f"layers.{i}.self_attn.qkv_proj.weight")
            sd[f"layers.{i}.self_attn.q_proj.weight"] = qkv[:nq]
            sd[f"layers.{i}.self_attn.k_proj.weight"] = qkv[nq:nq + nkv]
            sd[f"layers.{i}.self_attn.v_proj.weight"] = qkv[nq + nkv:]
    if "layers.0.mlp.gate_up_proj.weight" in sd:
        for i in range(L):
            gu = sd.pop(f"layers.{i}.mlp.gate_up_proj.weight")
            inter = gu.shape[0] // 2
            sd[f"layers.{i}.mlp.gate_proj.weight"] = gu[:inter]
            sd[f"layers.{i}.mlp.up_proj.weight"] = gu[inter:]

    if cfg.first_k_dense > 0:
        return _deepseek_v1_params(sd, cfg, dtype)

    p: Params = {
        "embed_tokens": _j(sd["embed_tokens.weight"], dtype),
        "layers": {
            "input_norm": stack("layers.{}.input_layernorm.weight"),
            "post_attn_norm": stack(
                "layers.{}.post_attention_layernorm.weight"),
            "q": stack("layers.{}.self_attn.q_proj.weight", True),
            "k": stack("layers.{}.self_attn.k_proj.weight", True),
            "v": stack("layers.{}.self_attn.v_proj.weight", True),
            "o": stack("layers.{}.self_attn.o_proj.weight", True),
            "gate": stack("layers.{}.mlp.gate_proj.weight", True),
            "up": stack("layers.{}.mlp.up_proj.weight", True),
            "down": stack("layers.{}.mlp.down_proj.weight", True),
        },
        "final_norm": (_j(sd["norm.weight"], dtype)
                       if "norm.weight" in sd
                       else jnp.ones((cfg.hidden_size,), dtype)),
    }
    if cfg.norm_upcast_mul:  # gemma (1+w) convention → absorb the +1
        for key in ("input_norm", "post_attn_norm"):
            p["layers"][key] = (p["layers"][key].astype(jnp.float32)
                                + 1.0).astype(dtype)
        p["final_norm"] = (p["final_norm"].astype(jnp.float32)
                           + 1.0).astype(dtype)
    if cfg.norm_type == "layernorm":
        # torch LayerNorm biases (StableLM/Starcoder2); OLMo's LN is
        # non-parametric — synthesize ones/zeros so one code path serves
        # all three (modeling_olmo.OlmoLayerNorm)
        for ours, theirs in (("input_norm", "input_layernorm"),
                             ("post_attn_norm",
                              "post_attention_layernorm")):
            if p["layers"][ours] is None:
                p["layers"][ours] = jnp.ones(
                    (L, cfg.hidden_size), dtype)
            b = stack("layers.{}." + theirs + ".bias")
            p["layers"][ours + "_bias"] = (
                b if b is not None
                else jnp.zeros((L, cfg.hidden_size), dtype))
        p["final_norm_bias"] = (_j(sd["norm.bias"], dtype)
                                if "norm.bias" in sd
                                else jnp.zeros((cfg.hidden_size,),
                                               dtype))
    # per-projection biases (Starcoder2 use_bias)
    for name, key in (("o", "self_attn.o_proj"), ("gate",
                                                  "mlp.gate_proj"),
                      ("up", "mlp.up_proj"), ("down", "mlp.down_proj")):
        b = stack("layers.{}." + key + ".bias")
        if b is not None:
            p["layers"][name + "_bias"] = b
    if "layers.0.self_attn.q_norm.weight" in sd:  # Qwen3 qk-norm
        p["layers"]["q_norm"] = stack(
            "layers.{}.self_attn.q_norm.weight")
        p["layers"]["k_norm"] = stack(
            "layers.{}.self_attn.k_norm.weight")
    if "layers.0.post_attn_out_norm.weight" in sd:  # Grok 4-norm layout
        p["layers"]["post_attn_out_norm"] = stack(
            "layers.{}.post_attn_out_norm.weight")
        p["layers"]["post_ffw_norm"] = stack(
            "layers.{}.post_ffw_norm.weight")
    if cfg.num_experts > 0 and "layers.0.mlp.gate.weight" in sd:
        # Qwen2/3-MoE layout: mlp.gate router + mlp.experts.{e}.*_proj;
        # Qwen2-MoE adds an always-on shared_expert with a scalar
        # sigmoid gate (Qwen3-MoE has none)
        E = cfg.num_experts
        # shared-expert prefix: Qwen2-MoE uses the SINGULAR
        # 'mlp.shared_expert.' (+ scalar sigmoid gate); DeepSeek-family
        # all-MoE checkpoints (first_k_dense_replace=0 skips the
        # dedicated deepseek-v1 path) use the PLURAL
        # 'mlp.shared_experts.' with NO scalar gate — probing only the
        # singular form silently dropped DeepSeek's always-on experts
        shared_pre = next(
            (pre for pre in ("mlp.shared_expert.", "mlp.shared_experts.")
             if f"layers.0.{pre}gate_proj.weight" in sd), None)
        del p["layers"]["gate"], p["layers"]["up"], p["layers"]["down"]
        p["layers"]["moe_router"] = _j(np.stack(
            [sd[f"layers.{i}.mlp.gate.weight"].T for i in range(L)]),
            dtype)
        for ours, theirs in (("moe_gate", "gate_proj"),
                             ("moe_up", "up_proj"),
                             ("moe_down", "down_proj")):
            p["layers"][ours] = _j(np.stack(
                [np.stack([sd[f"layers.{i}.mlp.experts.{e}."
                              f"{theirs}.weight"].T
                           for e in range(E)]) for i in range(L)]), dtype)
            if shared_pre:
                p["layers"][f"moe_shared_{ours[4:]}"] = _j(np.stack(
                    [sd[f"layers.{i}.{shared_pre}"
                        f"{theirs}.weight"].T for i in range(L)]), dtype)
        if shared_pre and "layers.0.mlp.shared_expert_gate.weight" in sd:
            p["layers"]["moe_shared_gate_w"] = _j(np.stack(
                [sd[f"layers.{i}.mlp.shared_expert_gate.weight"].T
                 for i in range(L)]), dtype)
    elif cfg.num_experts > 0:  # Mixtral layout: block_sparse_moe
        E = cfg.num_experts
        del p["layers"]["gate"], p["layers"]["up"], p["layers"]["down"]
        p["layers"]["moe_router"] = _j(np.stack(
            [sd[f"layers.{i}.block_sparse_moe.gate.weight"].T
             for i in range(L)]), dtype)
        for ours, theirs in (("moe_gate", "w1"), ("moe_down", "w2"),
                             ("moe_up", "w3")):
            p["layers"][ours] = _j(np.stack(
                [np.stack([sd[f"layers.{i}.block_sparse_moe.experts."
                              f"{e}.{theirs}.weight"].T
                           for e in range(E)]) for i in range(L)]), dtype)
    if cfg.qkv_bias:
        for name in ("q", "k", "v"):
            p["layers"][f"{name}_bias"] = stack(
                "layers.{}.self_attn." + name + "_proj.bias")
    if cfg.learned_pos:
        p["wpe"] = _j(sd["wpe.weight"], dtype)
    if "score.weight" in sd:
        # LlamaForSequenceClassification / reward-model head — served by
        # /v1/classify (sglang srt/models/llama_classification.py
        # parity). Such checkpoints carry no lm_head: synthesize the
        # tied fallback so generation paths stay loadable.
        p["score"] = _j(sd["score.weight"].T, dtype)
    if not cfg.tie_word_embeddings:
        if "lm_head.weight" in sd:
            p["lm_head"] = _j(sd["lm_head.weight"].T, dtype)
        else:  # classification checkpoints: tied fallback
            p["lm_head"] = _j(sd["embed_tokens.weight"].T, dtype)
    p["layers"] = {k: v for k, v in p["layers"].items() if v is not None}
    return p


def _deepseek_v1_params(sd: Dict[str, np.ndarray], cfg: LlamaConfig,
                        dtype) -> Params:
    """DeepSeek (v1) heterogeneous stack: dense prefix (first_k_dense
    layers, full intermediate_size) as an UNSTACKED python list under
    "dense_layers" + the uniform MoE tail stacked for lax.scan —
    mirroring serve/mla.py's DeepSeek-V2 layout. Shared experts are
    ungated (no moe_shared_gate_w). sglang srt/models/deepseek.py
    weight mapping."""
    L, fk = cfg.num_hidden_layers, cfg.first_k_dense
    E = cfg.num_experts

    def lin(i, key):
        return _j(sd[f"layers.{i}.{key}.weight"].T, dtype)

    def attn_keys(i):
        return {
            "input_norm": _j(sd[f"layers.{i}.input_layernorm.weight"],
                             dtype),
            "post_attn_norm": _j(
                sd[f"layers.{i}.post_attention_layernorm.weight"],
                dtype),
            "q": lin(i, "self_attn.q_proj"),
            "k": lin(i, "self_attn.k_proj"),
            "v": lin(i, "self_attn.v_proj"),
            "o": lin(i, "self_attn.o_proj"),
        }

    dense_layers = []
    for i in range(fk):
        lp = attn_keys(i)
        lp["gate"] = lin(i, "mlp.gate_proj")
        lp["up"] = lin(i, "mlp.up_proj")
        lp["down"] = lin(i, "mlp.down_proj")
        dense_layers.append(lp)

    tail: Dict[str, list] = {}
    for i in range(fk, L):
        lp = attn_keys(i)
        lp["moe_router"] = _j(sd[f"layers.{i}.mlp.gate.weight"].T, dtype)
        for ours, theirs in (("moe_gate", "gate_proj"),
                             ("moe_up", "up_proj"),
                             ("moe_down", "down_proj")):
            lp[ours] = _j(np.stack(
                [sd[f"layers.{i}.mlp.experts.{e}.{theirs}.weight"].T
                 for e in range(E)]), dtype)
            lp[f"moe_shared_{ours[4:]}"] = lin(
                i, f"mlp.shared_experts.{theirs}")
        for k, v in lp.items():
            tail.setdefault(k, []).append(v)

    return {
        "embed_tokens": _j(sd["embed_tokens.weight"], dtype),
        "dense_layers": dense_layers,
        "layers": {k: jnp.stack(v) for k, v in tail.items()},
        "final_norm": _j(sd["norm.weight"], dtype),
        "lm_head": _j(sd["lm_head.weight"].T, dtype),
    }


def projector_params_from_hf(sd: Dict[str, np.ndarray],
                             cfg: ProjectorConfig,
                             dtype=jnp.float32) -> Params:
    """ProjectorModel state dict (Sequential `model.{0,2,4...}`) → params."""
    sd = _strip_prefix(sd, ("projector.", "model."))
    layers = []
    for i in range(cfg.depth):
        idx = i * 2  # GELUs occupy odd Sequential slots
        layers.append({"kernel": _j(sd[f"{idx}.weight"].T, dtype),
                       "bias": _j(sd[f"{idx}.bias"], dtype)})
    return {"layers": layers}


# ---------------------------------------------------------------------------
# xtuner-format directory loader (the AuroraCap release layout)
# ---------------------------------------------------------------------------

def load_llava_hf_dir(model_dir: str, llm_dtype=jnp.bfloat16,
                      vit_dtype=jnp.float32,
                      ) -> Tuple[Params, LlamaConfig, Params, ViTConfig,
                                 Params, ProjectorConfig]:
    """llava-hf single-dir checkpoint (LlavaForConditionalGeneration) →
    the same tuple as load_auroracap_dir, so LLaVA-1.5 / LLaVA-NeXT-base
    / Yi-VL-style models serve through the AuroraCap multimodal path
    with token_kept_ratio=1.0 ⇒ EXACT LLaVA behavior (AuroraCap is the
    same architecture + ToMe; sglang srt/models/llava.py, llavavid.py,
    yivl.py zoo parity).

    vision_feature_layer=-2 + strategy "default" (drop CLS) is exactly
    our visual_select_layer=-2 + CLS-drop in models/aurora.encode_visual.
    Handles both the 4.52+ key layout (model.vision_tower /
    model.language_model + top-level lm_head) and the legacy one
    (vision_tower / language_model.model)."""
    cfg = _read_config(model_dir)
    assert cfg.get("model_type") in ("llava", "llava_next"), \
        f"not a llava checkpoint: {cfg.get('model_type')}"
    assert cfg.get("vision_feature_select_strategy",
                   "default") == "default", \
        "only the CLS-dropping 'default' feature strategy is supported"
    sel = cfg.get("vision_feature_layer", -2)

    llm_cfg = llama_config_from_hf(cfg["text_config"])
    vit_cfg = vit_config_from_hf({"vision_config": cfg["vision_config"],
                                  "model_type": "clip"})
    sd = load_torch_state_dict(model_dir)

    def split(marker):
        return {k.split(marker, 1)[1]: v for k, v in sd.items()
                if marker in k}

    vit_sd = split("vision_tower.")
    llm_sd = split("language_model.")
    if "lm_head.weight" in sd:  # 4.52+ layout: head at top level
        llm_sd["lm_head.weight"] = sd["lm_head.weight"]
    proj_sd = split("multi_modal_projector.")

    llm = llama_params_from_hf(llm_sd, llm_cfg, llm_dtype)
    vit = vit_params_from_hf(vit_sd, vit_cfg, vit_dtype)
    pj_cfg = ProjectorConfig(visual_hidden_size=vit_cfg.hidden_size,
                             llm_hidden_size=llm_cfg.hidden_size,
                             depth=2)
    pj_layers = []
    for i in (1, 2):
        lp = {"kernel": _j(proj_sd[f"linear_{i}.weight"].T, vit_dtype),
              "bias": _j(proj_sd[f"linear_{i}.bias"], vit_dtype)}
        if f"ln_{i}.weight" in proj_sd:  # Yi-VL projector LayerNorms
            lp["ln_scale"] = _j(proj_sd[f"ln_{i}.weight"], vit_dtype)
            lp["ln_bias"] = _j(proj_sd[f"ln_{i}.bias"], vit_dtype)
        pj_layers.append(lp)
    pj = {"layers": pj_layers}
    assert sel == -2, f"vision_feature_layer={sel} unsupported (-2 only)"
    return llm, llm_cfg, vit, vit_cfg, pj, pj_cfg


def load_auroracap_dir(model_dir: str, llm_dtype=jnp.bfloat16,
                       vit_dtype=jnp.float32,
                       ) -> Tuple[Params, LlamaConfig, Params, ViTConfig,
                                  Params, ProjectorConfig]:
    """Load an xtuner-format AuroraCap dir: HF llama at root +
    `visual_encoder/` + `projector/` (inference.py:42-57)."""
    llm_cfg = llama_config_from_hf(_read_config(model_dir))
    llm = llama_params_from_hf(load_torch_state_dict(model_dir), llm_cfg,
                               llm_dtype)

    ve_dir = os.path.join(model_dir, "visual_encoder")
    vit_cfg = vit_config_from_hf(_read_config(ve_dir))
    vit = vit_params_from_hf(load_torch_state_dict(ve_dir), vit_cfg,
                             vit_dtype)

    pj_dir = os.path.join(model_dir, "projector")
    pj_raw = _read_config(pj_dir)
    pj_cfg = ProjectorConfig(
        visual_hidden_size=pj_raw.get("visual_hidden_size",
                                      vit_cfg.hidden_size),
        llm_hidden_size=pj_raw.get("llm_hidden_size", llm_cfg.hidden_size),
        depth=pj_raw.get("depth", 2))
    pj = projector_params_from_hf(load_torch_state_dict(pj_dir), pj_cfg,
                                  vit_dtype)
    return llm, llm_cfg, vit, vit_cfg, pj, pj_cfg
