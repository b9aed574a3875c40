"""AuroraModel — the composite ViT→projector→LLM captioner.

Behavioral parity targets:
  * AuroraModel.forward visual path  — src/xtuner/xtuner/model/aurora.py:214-268
  * SlowFast path                    — aurora.py:223-246 (frame 0 at ratio 1.0,
                                       frames 1..F-1 merged)
  * prepare_inputs_labels_for_multimodal(_slowfast)
                                     — src/xtuner/xtuner/model/utils.py:138-431

TPU-first fusion
----------------
The reference fuses by Python-level splitting at IMAGE_TOKEN_INDEX and
torch.cat per sample — dynamic shapes everywhere. Here the fused length is a
compile-time constant: each sample carries exactly the configured image
markers, per-image visual token counts are static (ToMe schedule), so fusion
is two static-shape scatters (text rows, visual rows) computed from a cumsum
over the image-marker mask. Everything jits; batch is handled by vmap-style
indexing, no per-sample Python.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from aurora_tpu.models.llama import LlamaConfig, llama_apply, llama_lm_loss
from aurora_tpu.models.projector import ProjectorConfig, apply_projector
from aurora_tpu.models.vit import ViTConfig, vit_encode, vit_tome_r
from aurora_tpu.ops.tome import tome_schedule
from aurora_tpu.utils.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class AuroraConfig:
    vit: ViTConfig
    llm: LlamaConfig
    projector: ProjectorConfig
    visual_select_layer: int = -2
    slowfast: bool = False

    @classmethod
    def auroracap_7b(cls) -> "AuroraConfig":
        vit = ViTConfig.dfn5b_vit_h_378()
        llm = LlamaConfig.vicuna_7b_v15_16k()
        return cls(vit=vit, llm=llm,
                   projector=ProjectorConfig(
                       visual_hidden_size=vit.hidden_size,
                       llm_hidden_size=llm.hidden_size, depth=2))

    @classmethod
    def tiny(cls) -> "AuroraConfig":
        vit = ViTConfig(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=3, num_attention_heads=4,
                        image_size=56, patch_size=14)
        llm = LlamaConfig.tiny()
        return cls(vit=vit, llm=llm,
                   projector=ProjectorConfig(visual_hidden_size=32,
                                             llm_hidden_size=64, depth=2))


def num_visual_tokens(cfg: AuroraConfig, kept_ratio: float,
                      h: Optional[int] = None,
                      w: Optional[int] = None) -> int:
    """Static visual token count per frame at the selected hidden layer.

    select_layer=-2 means the input to the final ViT layer, i.e. after
    (L-1) merge steps of the static schedule, minus the CLS token.
    """
    h = h or cfg.vit.image_size
    w = w or cfg.vit.image_size
    r = vit_tome_r(cfg.vit, kept_ratio, h, w)
    n0 = (h // cfg.vit.patch_size) * (w // cfg.vit.patch_size)
    n0 += 1 if cfg.vit.class_token else 0
    sched = tome_schedule(n0, r, cfg.vit.num_hidden_layers, 1)
    sel = cfg.visual_select_layer
    # hidden_states list has L+1 entries; entry i is the input to layer i
    idx = sel if sel >= 0 else cfg.vit.num_hidden_layers + 1 + sel
    n = sched[idx].t_in if idx < cfg.vit.num_hidden_layers \
        else sched[-1].t_out
    # token 0 is always dropped (reference [:, 1:] is tower-agnostic)
    return n - 1


def encode_visual(params: Params, pixel_values: jnp.ndarray,
                  cfg: AuroraConfig, kept_ratio: float,
                  remat: bool = False) -> jnp.ndarray:
    """[B, F, C, H, W] → projected visual embeds [B, F, N, D_llm].

    Parity: aurora.py:249-256 — frames folded into batch for the ViT, then
    select layer −2, drop CLS, project, unfold.
    """
    B, F, C, H, W = pixel_values.shape
    frames = pixel_values.reshape(B * F, C, H, W)
    feats = vit_encode(params["visual_encoder"], frames, cfg.vit,
                       kept_ratio=kept_ratio,
                       select_layer=cfg.visual_select_layer, remat=remat)
    feats = apply_projector(params["projector"], feats, cfg.projector)
    return feats.reshape(B, F, feats.shape[1], feats.shape[2])


def encode_visual_slowfast(params: Params, pixel_values: jnp.ndarray,
                           cfg: AuroraConfig, kept_ratio: float,
                           remat: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SlowFast split (aurora.py:223-246): frame 0 un-merged ("slow" detail
    anchor), frames 1..F-1 at kept_ratio. Returns (hi [B,1,Nhi,D],
    lo [B,F-1,Nlo,D])."""
    hi = encode_visual(params, pixel_values[:, :1], cfg, 1.0, remat)
    lo = encode_visual(params, pixel_values[:, 1:], cfg, kept_ratio, remat)
    return hi, lo


# ---------------------------------------------------------------------------
# Multimodal fusion (static-shape scatter formulation)
# ---------------------------------------------------------------------------

def fuse_multimodal(embed_table: jnp.ndarray,
                    input_ids: jnp.ndarray,
                    visual_groups: Sequence[jnp.ndarray],
                    attention_mask: Optional[jnp.ndarray] = None,
                    labels: Optional[jnp.ndarray] = None,
                    segment_ids: Optional[jnp.ndarray] = None,
                    ) -> Dict[str, jnp.ndarray]:
    """Splice visual embeddings into the text sequence.

    input_ids: [B, T] with IMAGE_TOKEN_INDEX(-200) markers — every sample
    must carry exactly sum(group frame counts) markers (the reference's
    prompt builders guarantee this; see inference.py:84-86).
    visual_groups: sequence of [B, F_g, N_g, D] arrays; group order equals
    image-marker order (slowfast passes [hi, lo]).

    Returns dict(inputs_embeds [B,T_out,D], attention_mask [B,T_out] bool,
    position_ids [B,T_out], labels [B,T_out] or None) where
    T_out = T - F_total + Σ F_g·N_g — a static shape.

    Parity: model/utils.py:138-295 / :298-431 (fused layout: text chunks
    interleaved with per-image embeds, labels IGNORE under visual spans,
    positions 0..len-1, zero-pad to batch max — here pad is the static
    tail). The reference's per-sample Python concat is replaced by two
    scatters driven by a cumsum over the marker mask.
    """
    B, T = input_ids.shape
    sizes: List[int] = []   # per-image token counts, in marker order
    for g in visual_groups:
        sizes.extend([g.shape[2]] * g.shape[1])
    F_total = len(sizes)
    D = visual_groups[0].shape[-1] if visual_groups else embed_table.shape[1]
    T_out = T - F_total + sum(sizes)

    if attention_mask is None:
        attention_mask = jnp.ones((B, T), bool)
    else:
        attention_mask = attention_mask.astype(bool)

    is_img = input_ids == IMAGE_TOKEN_INDEX
    # ordinal of each image marker within its sample (0-based), and the
    # cumulative expansion each position inherits from markers before it
    before = jnp.cumsum(is_img, axis=1) - is_img.astype(jnp.int32)
    exp = jnp.asarray([0] + list(jnp.cumsum(jnp.asarray(
        [s - 1 for s in sizes]))), jnp.int32) if sizes else jnp.zeros(
            (1,), jnp.int32)
    shift = exp[jnp.clip(before, 0, F_total)]
    base_pos = jnp.arange(T)[None, :] + shift           # [B, T]

    # ---- text rows: scatter embeddings of non-marker tokens
    safe_ids = jnp.where(is_img | ~attention_mask, 0, input_ids)
    text_embeds = jnp.take(embed_table, safe_ids, axis=0)
    drop = T_out  # OOB → dropped by scatter mode "drop"
    text_pos = jnp.where(is_img | ~attention_mask, drop, base_pos)
    out = jnp.zeros((B, T_out, D), text_embeds.dtype)
    batch_ix = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    out = out.at[batch_ix, text_pos].set(text_embeds, mode="drop")

    # ---- visual rows: start of marker k = its own shifted position.
    # Rows may carry FEWER markers than F_total (batch-padded frames,
    # text rows collated with a zero frame): missing markers keep the
    # OOB sentinel so their frames scatter nowhere.
    marker_pos = jnp.where(is_img, base_pos, 0)
    onehot = jnp.where(is_img, before, F_total)  # marker k → ordinal
    starts = jnp.full((B, F_total), drop, jnp.int32).at[
        batch_ix, onehot].set(marker_pos, mode="drop")  # [B, F]

    k0 = 0
    for g in visual_groups:
        Fg, Ng = g.shape[1], g.shape[2]
        g_starts = starts[:, k0:k0 + Fg]                     # [B, Fg]
        vis_pos = g_starts[:, :, None] + jnp.arange(Ng)[None, None, :]
        vb = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, Fg, Ng))
        out = out.at[vb.reshape(B, -1), vis_pos.reshape(B, -1)].set(
            g.reshape(B, Fg * Ng, D).astype(out.dtype), mode="drop")
        k0 += Fg

    # ---- mask / labels / positions: expansion counts each row's OWN
    # markers (exp is the cumsum of per-marker growth)
    n_markers = jnp.sum(is_img, axis=1)
    new_len = (jnp.sum(attention_mask, axis=1)
               + exp[jnp.clip(n_markers, 0, F_total)]) if sizes else \
        jnp.sum(attention_mask, axis=1)
    out_mask = jnp.arange(T_out)[None, :] < new_len[:, None]
    position_ids = jnp.broadcast_to(jnp.arange(T_out)[None, :],
                                    (B, T_out)) * out_mask

    out_labels = None
    if labels is not None:
        out_labels = jnp.full((B, T_out), IGNORE_INDEX, labels.dtype)
        lab_pos = jnp.where(is_img | ~attention_mask, drop, base_pos)
        out_labels = out_labels.at[batch_ix, lab_pos].set(
            labels, mode="drop")

    out_segments = None
    if segment_ids is not None:
        # packed multimodal (SoftPackerMM): visual spans inherit their
        # marker's segment so packed attention stays per-document
        out_segments = jnp.full((B, T_out), -1, segment_ids.dtype)
        seg_pos = jnp.where(~attention_mask, drop, base_pos)
        out_segments = out_segments.at[batch_ix, seg_pos].set(
            segment_ids, mode="drop")  # markers write their own segment
        # group-independent: each marker's segment id, scattered once
        # (was recomputed per visual group — identical values)
        marker_seg = jnp.zeros((B, F_total), segment_ids.dtype).at[
            batch_ix, onehot].add(
                jnp.where(is_img, segment_ids, 0), mode="drop")
        k0 = 0
        for g in visual_groups:
            Fg, Ng = g.shape[1], g.shape[2]
            g_starts = starts[:, k0:k0 + Fg]
            vis_pos = g_starts[:, :, None] + jnp.arange(Ng)[None, None, :]
            vb = jnp.broadcast_to(jnp.arange(B)[:, None, None],
                                  (B, Fg, Ng))
            seg_vals = jnp.broadcast_to(
                marker_seg[:, k0:k0 + Fg, None], (B, Fg, Ng))
            out_segments = out_segments.at[
                vb.reshape(B, -1), vis_pos.reshape(B, -1)].set(
                    seg_vals.reshape(B, -1), mode="drop")
            k0 += Fg
        # positions past each row's live length are padding segment (-1)
        out_segments = jnp.where(out_mask, out_segments, -1)

    return {"inputs_embeds": out, "attention_mask": out_mask,
            "position_ids": position_ids, "labels": out_labels,
            "segment_ids": out_segments}


# ---------------------------------------------------------------------------
# Composite forward (modes mirror aurora.py:214-270)
# ---------------------------------------------------------------------------

def aurora_forward(params: Params, cfg: AuroraConfig,
                   input_ids: jnp.ndarray,
                   pixel_values: Optional[jnp.ndarray] = None,
                   attention_mask: Optional[jnp.ndarray] = None,
                   labels: Optional[jnp.ndarray] = None,
                   kept_ratio: float = 1.0,
                   mode: str = "loss",
                   remat: bool = False,
                   sp_attn=None,
                   segment_ids: Optional[jnp.ndarray] = None):
    """mode: 'loss' → (scalar loss, ntokens); 'tensor' → logits;
    'inference' → fused-input dict for the generation engine."""
    if pixel_values is not None:
        if pixel_values.ndim == 4:  # single image → one-frame video
            pixel_values = pixel_values[:, None]
        F = pixel_values.shape[1]
        if cfg.slowfast and F != 1:
            hi, lo = encode_visual_slowfast(params, pixel_values, cfg,
                                            kept_ratio, remat)
            groups = [hi, lo]
        else:
            groups = [encode_visual(params, pixel_values, cfg, kept_ratio,
                                    remat)]
        fused = fuse_multimodal(params["llm"]["embed_tokens"], input_ids,
                                groups, attention_mask, labels,
                                segment_ids=segment_ids)
    else:
        embeds = jnp.take(params["llm"]["embed_tokens"], input_ids, axis=0)
        fused = {"inputs_embeds": embeds, "attention_mask": attention_mask,
                 "position_ids": None, "labels": labels,
                 "segment_ids": segment_ids}

    if mode == "inference":
        return fused

    logits, _ = llama_apply(
        params["llm"], cfg.llm, inputs_embeds=fused["inputs_embeds"],
        attention_mask=fused["attention_mask"],
        position_ids=fused["position_ids"],
        segment_ids=fused.get("segment_ids"),
        remat=remat, sp_attn=sp_attn)
    if mode in ("tensor", "predict"):
        return logits
    if mode == "loss":
        return llama_lm_loss(logits, fused["labels"])
    raise ValueError(f"unknown mode {mode!r}")
