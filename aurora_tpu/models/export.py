"""Checkpoint export: aurora_tpu pytrees → torch-ecosystem formats.

Parity: AuroraModel.to_hf dispatch (src/xtuner/xtuner/model/aurora.py:295-597)
  * 'xtuner'      → root HF llama + visual_encoder/ + projector/ safetensors
                    (`to_xtuner_llava` :312-362) — round-trips through
                    aurora_tpu.models.convert.load_auroracap_dir;
  * 'huggingface' → LlavaForConditionalGeneration key layout
                    (`to_huggingface_llava` :364-496) incl. the vocab
                    resize-to-multiple-of-64 with mvn-sampled new rows
                    (:454-491);
  * 'official'    → LLaVA-repo layout (`to_official_llava` :498-597):
                    llama keys at root, ViT under
                    model.vision_tower.vision_tower.*, projector as
                    model.mm_projector.{0,2}, llava config fields.

Everything is numpy/safetensors — no torch needed to write.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import numpy as np

from aurora_tpu.models.llama import LlamaConfig
from aurora_tpu.models.projector import ProjectorConfig
from aurora_tpu.models.vit import ViTConfig


def _np(x) -> np.ndarray:
    import jax
    return np.asarray(jax.device_get(x), dtype=np.float32)


# ---------------------------------------------------------------------------
# pytree → HF state dicts
# ---------------------------------------------------------------------------

def llama_state_dict(params: Dict[str, Any],
                     cfg: LlamaConfig) -> Dict[str, np.ndarray]:
    sd = {"model.embed_tokens.weight": _np(params["embed_tokens"]),
          "model.norm.weight": _np(params["final_norm"])}
    if not cfg.tie_word_embeddings:
        sd["lm_head.weight"] = _np(params["lm_head"]).T
    L = cfg.num_hidden_layers
    lp = params["layers"]
    names = [("input_norm", "input_layernorm.weight", False),
             ("post_attn_norm", "post_attention_layernorm.weight", False),
             ("q", "self_attn.q_proj.weight", True),
             ("k", "self_attn.k_proj.weight", True),
             ("v", "self_attn.v_proj.weight", True),
             ("o", "self_attn.o_proj.weight", True),
             ("gate", "mlp.gate_proj.weight", True),
             ("up", "mlp.up_proj.weight", True),
             ("down", "mlp.down_proj.weight", True)]
    for ours, theirs, transpose in names:
        stacked = _np(lp[ours])
        for i in range(L):
            m = stacked[i]
            sd[f"model.layers.{i}.{theirs}"] = m.T if transpose else m
    for name in ("q", "k", "v"):
        if f"{name}_bias" in lp:
            stacked = _np(lp[f"{name}_bias"])
            for i in range(L):
                sd[f"model.layers.{i}.self_attn.{name}_proj.bias"] = \
                    stacked[i]
    return sd


def vit_state_dict(params: Dict[str, Any],
                   cfg: ViTConfig) -> Dict[str, np.ndarray]:
    emb = params["embeddings"]
    pk = _np(emb["patch_kernel"])  # [C*p*p, D] → [D, C, p, p]
    D = pk.shape[1]
    sd = {
        "vision_model.embeddings.patch_embedding.weight":
            pk.T.reshape(D, cfg.num_channels, cfg.patch_size,
                         cfg.patch_size),
        "vision_model.embeddings.position_embedding.weight":
            _np(emb["position_embedding"]),
        "vision_model.post_layernorm.weight":
            _np(params["post_layernorm"]["scale"]),
        "vision_model.post_layernorm.bias":
            _np(params["post_layernorm"]["bias"]),
    }
    if cfg.class_token:
        sd["vision_model.embeddings.class_embedding"] = _np(
            emb["class_embedding"])
        sd["vision_model.pre_layrnorm.weight"] = _np(
            params["pre_layernorm"]["scale"])
        sd["vision_model.pre_layrnorm.bias"] = _np(
            params["pre_layernorm"]["bias"])
    if "patch_bias" in emb:
        sd["vision_model.embeddings.patch_embedding.bias"] = _np(
            emb["patch_bias"])
    for i, lp in enumerate(params["layers"]):
        p = f"vision_model.encoder.layers.{i}"
        sd[f"{p}.layer_norm1.weight"] = _np(lp["ln1"]["scale"])
        sd[f"{p}.layer_norm1.bias"] = _np(lp["ln1"]["bias"])
        sd[f"{p}.layer_norm2.weight"] = _np(lp["ln2"]["scale"])
        sd[f"{p}.layer_norm2.bias"] = _np(lp["ln2"]["bias"])
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("o", "out_proj")):
            sd[f"{p}.self_attn.{theirs}.weight"] = _np(
                lp["attn"][ours]["kernel"]).T
            sd[f"{p}.self_attn.{theirs}.bias"] = _np(
                lp["attn"][ours]["bias"])
        sd[f"{p}.mlp.fc1.weight"] = _np(lp["mlp"]["fc1"]["kernel"]).T
        sd[f"{p}.mlp.fc1.bias"] = _np(lp["mlp"]["fc1"]["bias"])
        sd[f"{p}.mlp.fc2.weight"] = _np(lp["mlp"]["fc2"]["kernel"]).T
        sd[f"{p}.mlp.fc2.bias"] = _np(lp["mlp"]["fc2"]["bias"])
    return sd


def projector_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    sd = {}
    for i, lp in enumerate(params["layers"]):
        sd[f"model.{i * 2}.weight"] = _np(lp["kernel"]).T
        sd[f"model.{i * 2}.bias"] = _np(lp["bias"])
    return sd


# ---------------------------------------------------------------------------
# Config dicts
# ---------------------------------------------------------------------------

def llama_config_dict(cfg: LlamaConfig) -> Dict[str, Any]:
    d = {"architectures": ["LlamaForCausalLM"], "model_type": "llama",
         "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
         "intermediate_size": cfg.intermediate_size,
         "num_hidden_layers": cfg.num_hidden_layers,
         "num_attention_heads": cfg.num_attention_heads,
         "num_key_value_heads": cfg.num_key_value_heads,
         "max_position_embeddings": cfg.max_position_embeddings,
         "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": cfg.rope_theta,
         "tie_word_embeddings": cfg.tie_word_embeddings,
         "hidden_act": "silu", "torch_dtype": "float16",
         "bos_token_id": 1, "eos_token_id": 2}
    if cfg.rope_linear_scaling:
        d["rope_scaling"] = {"type": "linear",
                             "factor": cfg.rope_linear_scaling}
    return d


def vit_config_dict(cfg: ViTConfig) -> Dict[str, Any]:
    return {"architectures": ["CLIPVisionModel"],
            "model_type": "clip_vision_model",
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_hidden_layers,
            "num_attention_heads": cfg.num_attention_heads,
            "image_size": cfg.image_size, "patch_size": cfg.patch_size,
            "layer_norm_eps": cfg.layer_norm_eps,
            "hidden_act": cfg.hidden_act,
            "projection_dim": cfg.hidden_size}


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------

def _write(sd: Dict[str, np.ndarray], cfg_dict: Dict[str, Any],
           out_dir: str, max_shard_bytes: int = 5 * 1024 ** 3) -> None:
    """Write config + safetensors, sharding with an HF-style
    model.safetensors.index.json above max_shard_bytes (the reference's
    `xtuner convert split` capability folded into export)."""
    from safetensors.numpy import save_file
    os.makedirs(out_dir, exist_ok=True)
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    total = sum(v.nbytes for v in sd.values())
    if total <= max_shard_bytes:
        save_file(sd, os.path.join(out_dir, "model.safetensors"))
    else:
        shards, cur, cur_bytes = [], {}, 0
        for k, v in sd.items():
            if cur and cur_bytes + v.nbytes > max_shard_bytes:
                shards.append(cur)
                cur, cur_bytes = {}, 0
            cur[k] = v
            cur_bytes += v.nbytes
        if cur:
            shards.append(cur)
        n = len(shards)
        weight_map = {}
        for i, shard in enumerate(shards):
            fn = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
            save_file(shard, os.path.join(out_dir, fn))
            for k in shard:
                weight_map[k] = fn
        with open(os.path.join(out_dir,
                               "model.safetensors.index.json"), "w") as f:
            json.dump({"metadata": {"total_size": total},
                       "weight_map": weight_map}, f, indent=2)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2)


def export_xtuner_dir(params, llm_cfg: LlamaConfig, vit_cfg: ViTConfig,
                      pj_cfg: ProjectorConfig, out_dir: str,
                      tokenizer=None) -> None:
    """Write the xtuner checkpoint layout (to_xtuner_llava parity)."""
    _write(llama_state_dict(params["llm"], llm_cfg),
           llama_config_dict(llm_cfg), out_dir)
    _write(vit_state_dict(params["visual_encoder"], vit_cfg),
           vit_config_dict(vit_cfg), os.path.join(out_dir,
                                                  "visual_encoder"))
    _write(projector_state_dict(params["projector"]),
           {"model_type": "projector",
            "visual_hidden_size": pj_cfg.visual_hidden_size,
            "llm_hidden_size": pj_cfg.llm_hidden_size,
            "depth": pj_cfg.depth, "hidden_act": "gelu", "bias": True},
           os.path.join(out_dir, "projector"))
    if tokenizer is not None:
        tokenizer.save_pretrained(out_dir)


def _resize_vocab_mvn(embed: np.ndarray, head: np.ndarray, pad_to: int,
                      seed: int = 0):
    """Vocab resize with multivariate-normal sampled new rows
    (aurora.py:454-491: mean/covariance of existing embeddings)."""
    v, d = embed.shape
    n_new = pad_to - v
    if n_new <= 0:
        return embed, head
    rng = np.random.default_rng(seed)

    def sample(mat):
        mu = mat.mean(axis=0)
        centered = mat - mu
        cov = centered.T @ centered / mat.shape[0]
        # small jitter keeps cholesky happy for low-rank tiny models
        L = np.linalg.cholesky(cov + 1e-5 * np.eye(d, dtype=mat.dtype))
        z = rng.standard_normal((n_new, d)).astype(mat.dtype)
        return np.concatenate([mat, mu + z @ L.T], axis=0)

    return sample(embed), sample(head)


def export_hf_llava(params, llm_cfg: LlamaConfig, vit_cfg: ViTConfig,
                    pj_cfg: ProjectorConfig, out_dir: str,
                    pad_vocab_multiple: int = 64) -> None:
    """LlavaForConditionalGeneration layout (to_huggingface_llava parity,
    aurora.py:364-496): language_model.* / vision_tower.* /
    multi_modal_projector.linear_{1,2}.*, vocab padded to a multiple of
    64 with mvn-sampled rows."""
    llm_sd = llama_state_dict(params["llm"], llm_cfg)
    vit_sd = vit_state_dict(params["visual_encoder"], vit_cfg)
    pj_sd = projector_state_dict(params["projector"])

    pad_to = ((llm_cfg.vocab_size + pad_vocab_multiple - 1)
              // pad_vocab_multiple * pad_vocab_multiple)
    embed, head = _resize_vocab_mvn(
        llm_sd["model.embed_tokens.weight"],
        llm_sd.get("lm_head.weight",
                   llm_sd["model.embed_tokens.weight"]), pad_to)
    llm_sd["model.embed_tokens.weight"] = embed
    llm_sd["lm_head.weight"] = head

    sd: Dict[str, np.ndarray] = {}
    for k, v in llm_sd.items():
        if k.startswith("model."):
            sd["language_model.model." + k[len("model."):]] = v
        else:
            sd["language_model." + k] = v
    for k, v in vit_sd.items():
        sd["vision_tower." + k] = v
    name_map = {0: "linear_1", 1: "linear_2"}
    for i in range(pj_cfg.depth):
        sd[f"multi_modal_projector.{name_map.get(i, f'linear_{i+1}')}"
           f".weight"] = pj_sd[f"model.{i * 2}.weight"]
        sd[f"multi_modal_projector.{name_map.get(i, f'linear_{i+1}')}"
           f".bias"] = pj_sd[f"model.{i * 2}.bias"]

    cfg_dict = {
        "architectures": ["LlavaForConditionalGeneration"],
        "model_type": "llava",
        "text_config": llama_config_dict(llm_cfg) | {"vocab_size": pad_to},
        "vision_config": vit_config_dict(vit_cfg),
        "vision_feature_layer": -2,
        "vision_feature_select_strategy": "default",
        "image_token_index": 32000,
    }
    _write(sd, cfg_dict, out_dir)


def export_official_llava(params, llm_cfg: LlamaConfig,
                          vit_cfg: ViTConfig, pj_cfg: ProjectorConfig,
                          out_dir: str,
                          visual_select_layer: int = -2) -> None:
    """LLaVA-repo (haotian-liu) layout — to_official_llava parity
    (aurora.py:504-582): llama state dict at root, ViT remapped to
    model.vision_tower.vision_tower.vision_model.*, projector to
    model.mm_projector.{0,2}.*, LlavaConfig fields on the llama config."""
    sd = llama_state_dict(params["llm"], llm_cfg)
    vit_sd = vit_state_dict(params["visual_encoder"], vit_cfg)
    for k, v in vit_sd.items():
        sd["model.vision_tower.vision_tower." + k] = v
    pj_sd = projector_state_dict(params["projector"])
    for k, v in pj_sd.items():
        # model.{0,2}.* → model.mm_projector.{0,2}.*
        sd["model.mm_projector." + k[len("model."):]] = v

    cfg_dict = llama_config_dict(llm_cfg)
    cfg_dict.update({
        "model_type": "llava",
        "architectures": ["LlavaLlamaForCausalLM"],
        "image_aspect_ratio": "pad",
        "mm_hidden_size": vit_cfg.hidden_size,
        "mm_projector_type": f"mlp{pj_cfg.depth}x_gelu",
        "mm_use_im_patch_token": False,
        "mm_use_im_start_end": False,
        "mm_vision_select_feature": "patch",
        "mm_vision_select_layer": visual_select_layer,
        "unfreeze_mm_vision_tower": True,
        "use_cache": True,
        "use_mm_proj": True,
    })
    _write(sd, cfg_dict, out_dir)
