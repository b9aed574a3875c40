"""InternVL family: InternViT vision encoder + pixel-shuffle projector +
llama/qwen2 language model (model-zoo breadth).

Parity: the reference's InternVL_V1_5 xtuner model
(src/xtuner/xtuner/model/internvl.py) and HF transformers InternVL.
InternViT is a BEiT-style ViT that differs from CLIP-ViT in every joint:
CLS + absolute position embeddings added post-patchify, optional full-dim
q/k RMSNorm, per-layer LayerScale (λ1/λ2 vectors), layer_norm or rms_norm
blocks, GELU MLP, and mean-pooling (no final layernorm) by default.

The composite forward reuses the framework's multimodal machinery:
get_image_features (drop CLS → spatial reshape → pixel-shuffle downsample
→ LN+MLP projector) produces one visual group that fuse_multimodal
splices over IMAGE_TOKEN_INDEX markers; the decoder is any LlamaConfig
family member (InternVL2/3 ship qwen2 and internlm2 decoders).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.models.llama import LlamaConfig, llama_apply, llama_lm_loss
from aurora_tpu.ops.norms import rms_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class InternViTConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    use_qk_norm: bool = False
    attention_bias: bool = False
    norm_type: str = "layer_norm"           # "layer_norm" | "rms_norm"
    layer_scale_init_value: float = 0.1
    use_absolute_position_embeddings: bool = True
    use_mean_pooling: bool = True           # True → no final layernorm

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclasses.dataclass(frozen=True)
class InternVLConfig:
    vision: InternViTConfig = InternViTConfig()
    text: LlamaConfig = LlamaConfig()
    downsample_ratio: float = 0.5
    projector_hidden_act: str = "gelu"

    @property
    def n_visual_tokens(self) -> int:
        side = self.vision.image_size // self.vision.patch_size
        return int((side * self.downsample_ratio) ** 2)


def _norm(x, w, b, eps, kind):
    if kind == "rms_norm":
        return rms_norm(x, w, eps)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * w + b).astype(x.dtype)


def internvit_encode(params: Params, pixel_values, cfg: InternViTConfig):
    """pixel_values [B, C, H, W] → last hidden state [B, 1+N, D]."""
    B = pixel_values.shape[0]
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(params["patch_embed"].dtype),
        params["patch_embed"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = x.reshape(B, cfg.hidden_size, -1).transpose(0, 2, 1)  # [B, N, D]
    x = x + params["patch_bias"]
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    if cfg.use_absolute_position_embeddings:
        x = x + params["pos_embed"]

    H, hd = cfg.num_attention_heads, cfg.hidden_size // \
        cfg.num_attention_heads
    scale = hd ** -0.5
    for lp in params["layers"]:
        h = _norm(x, lp["norm1_w"], lp.get("norm1_b"), cfg.layer_norm_eps,
                  cfg.norm_type)
        q = jnp.dot(h, lp["q"]) + lp.get("q_bias", 0.0)
        k = jnp.dot(h, lp["k"]) + lp.get("k_bias", 0.0)
        v = jnp.dot(h, lp["v"]) + lp.get("v_bias", 0.0)
        if cfg.use_qk_norm:  # full embed-dim RMSNorm BEFORE head split
            q = rms_norm(q, lp["q_norm"], cfg.layer_norm_eps)
            k = rms_norm(k, lp["k_norm"], cfg.layer_norm_eps)
        T = h.shape[1]
        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, H, hd)
        v = v.reshape(B, T, H, hd)
        logits = jnp.einsum("bthd,bshd->bhts",
                            q.astype(jnp.float32) * scale,
                            k.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs,
                          v.astype(jnp.float32)).astype(x.dtype)
        attn = jnp.dot(attn.reshape(B, T, -1), lp["proj"]) + lp["proj_b"]
        x = x + lp["lambda1"] * attn

        h = _norm(x, lp["norm2_w"], lp.get("norm2_b"), cfg.layer_norm_eps,
                  cfg.norm_type)
        h = jnp.dot(h, lp["fc1"]) + lp["fc1_b"]
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
            x.dtype)
        h = jnp.dot(h, lp["fc2"]) + lp["fc2_b"]
        x = x + lp["lambda2"] * h

    if not cfg.use_mean_pooling:
        x = _norm(x, params["final_norm_w"], params["final_norm_b"],
                  cfg.layer_norm_eps, "layer_norm")
    return x


def pixel_shuffle(x, scale: float = 0.5):
    """[B, W, H, C] → [B, W·s, H·s, C/s²] (modeling_internvl.pixel_shuffle
    permute-for-permute)."""
    B, W, H, C = x.shape
    x = x.reshape(B, W, int(H * scale), int(C / scale))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(B, int(H * scale), int(W * scale), int(C / scale ** 2))
    return x.transpose(0, 2, 1, 3)


def internvl_image_features(params: Params, cfg: InternVLConfig,
                            pixel_values):
    """[B, C, H, W] → projected visual tokens [B, N_vis, D_text]."""
    feats = internvit_encode(params["vision"], pixel_values, cfg.vision)
    feats = feats[:, 1:]                     # drop CLS
    B, N, C = feats.shape
    side = int(N ** 0.5)
    feats = feats.reshape(B, side, side, C)
    feats = pixel_shuffle(feats, cfg.downsample_ratio)
    feats = feats.reshape(B, -1, feats.shape[-1])
    pj = params["projector"]
    h = _norm(feats, pj["ln_w"], pj["ln_b"], 1e-5, "layer_norm")
    h = jnp.dot(h, pj["fc1"]) + pj["fc1_b"]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
        h.dtype)
    return jnp.dot(h, pj["fc2"]) + pj["fc2_b"]


def internvl_forward(params: Params, cfg: InternVLConfig, input_ids,
                     pixel_values=None, attention_mask=None, labels=None,
                     mode: str = "tensor"):
    """input_ids carry IMAGE_TOKEN_INDEX (-200) markers — ONE per image;
    each expands to cfg.n_visual_tokens fused positions."""
    from aurora_tpu.models.aurora import fuse_multimodal
    if pixel_values is not None:
        feats = internvl_image_features(params, cfg, pixel_values)
        # fuse_multimodal groups are [B, n_images=1, N_vis, D]; an
        # unbatched [N, D] feats needs BOTH axes added (a bare [None]
        # would read D as the token count and splice garbage)
        group = feats[None, None] if feats.ndim == 2 else feats[:, None]
        fused = fuse_multimodal(params["text"]["embed_tokens"], input_ids,
                                [group], attention_mask, labels)
    else:
        embeds = jnp.take(params["text"]["embed_tokens"], input_ids,
                          axis=0)
        fused = {"inputs_embeds": embeds, "attention_mask": attention_mask,
                 "position_ids": None, "labels": labels}
    logits, _ = llama_apply(params["text"], cfg.text,
                            inputs_embeds=fused["inputs_embeds"],
                            attention_mask=fused["attention_mask"],
                            position_ids=fused["position_ids"])
    if mode == "loss":
        return llama_lm_loss(logits, fused["labels"])
    return logits


# ---------------------------------------------------------------------------
# HF weight conversion (InternVLForConditionalGeneration)
# ---------------------------------------------------------------------------

def internvit_config_from_hf(cfg: Dict[str, Any]) -> InternViTConfig:
    img = cfg.get("image_size", 448)
    patch = cfg.get("patch_size", 14)
    return InternViTConfig(
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        image_size=img[0] if isinstance(img, (list, tuple)) else img,
        patch_size=patch[0] if isinstance(patch, (list, tuple)) else patch,
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-6),
        use_qk_norm=cfg.get("use_qk_norm", False),
        attention_bias=cfg.get("attention_bias", False),
        norm_type=cfg.get("norm_type", "layer_norm"),
        layer_scale_init_value=cfg.get("layer_scale_init_value", 0.1),
        use_absolute_position_embeddings=cfg.get(
            "use_absolute_position_embeddings", True),
        use_mean_pooling=cfg.get("use_mean_pooling", True))


def internvit_params_from_hf(sd: Dict[str, np.ndarray],
                             cfg: InternViTConfig,
                             dtype=jnp.float32) -> Params:
    def a(name):
        return jnp.asarray(sd[name], dtype)

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T, dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}"
        lp = {
            "norm1_w": a(f"{p}.layernorm_before.weight"),
            "norm2_w": a(f"{p}.layernorm_after.weight"),
            "q": t(f"{p}.attention.q_proj.weight"),
            "k": t(f"{p}.attention.k_proj.weight"),
            "v": t(f"{p}.attention.v_proj.weight"),
            "proj": t(f"{p}.attention.projection_layer.weight"),
            "proj_b": a(f"{p}.attention.projection_layer.bias"),
            "fc1": t(f"{p}.mlp.fc1.weight"),
            "fc1_b": a(f"{p}.mlp.fc1.bias"),
            "fc2": t(f"{p}.mlp.fc2.weight"),
            "fc2_b": a(f"{p}.mlp.fc2.bias"),
            "lambda1": a(f"{p}.lambda_1"),
            "lambda2": a(f"{p}.lambda_2"),
        }
        if cfg.norm_type == "layer_norm":
            lp["norm1_b"] = a(f"{p}.layernorm_before.bias")
            lp["norm2_b"] = a(f"{p}.layernorm_after.bias")
        if cfg.attention_bias:
            for nm in ("q", "k", "v"):
                lp[f"{nm}_bias"] = a(f"{p}.attention.{nm}_proj.bias")
        if cfg.use_qk_norm:
            lp["q_norm"] = a(f"{p}.attention.q_norm.weight")
            lp["k_norm"] = a(f"{p}.attention.k_norm.weight")
        layers.append(lp)
    out = {
        "patch_embed": a(
            "embeddings.patch_embeddings.projection.weight"),
        "patch_bias": a("embeddings.patch_embeddings.projection.bias"),
        "cls_token": a("embeddings.cls_token")[0],
        "pos_embed": a("embeddings.position_embeddings")[0],
        "layers": layers,
    }
    if not cfg.use_mean_pooling:
        out["final_norm_w"] = a("layernorm.weight")
        out["final_norm_b"] = a("layernorm.bias")
    return out


def internvl_params_from_hf(sd: Dict[str, np.ndarray],
                            cfg: InternVLConfig,
                            dtype=jnp.float32) -> Params:
    from aurora_tpu.models.convert import llama_params_from_hf
    vit_sd = {k[len("model.vision_tower."):]: v for k, v in sd.items()
              if k.startswith("model.vision_tower.")}
    text_sd = {k[len("model.language_model."):]: v for k, v in sd.items()
               if k.startswith("model.language_model.")}
    if "lm_head.weight" in sd:
        text_sd["lm_head.weight"] = sd["lm_head.weight"]

    def t(name):
        return jnp.asarray(np.asarray(
            sd[f"model.multi_modal_projector.{name}"]).T, dtype)

    def a(name):
        return jnp.asarray(
            sd[f"model.multi_modal_projector.{name}"], dtype)

    return {
        "vision": internvit_params_from_hf(vit_sd, cfg.vision, dtype),
        "projector": {"ln_w": a("layer_norm.weight"),
                      "ln_b": a("layer_norm.bias"),
                      "fc1": t("linear_1.weight"),
                      "fc1_b": a("linear_1.bias"),
                      "fc2": t("linear_2.weight"),
                      "fc2_b": a("linear_2.bias")},
        "text": llama_params_from_hf(text_sd, cfg.text, dtype),
    }
