"""Multi-head Latent Attention serving: the DeepSeek-V2 engine path.

Parity: sglang serves DeepSeek-V2 with a latent KV pool
(srt/mem_cache/memory_pool.py:180-251 MLATokenToKVPool — one
kv_lora_rank+rope vector per token instead of per-head K/V) and
weight-absorbed attention (srt/models/deepseek_v2.py). TPU-first
redesign:

  * rows/pool reuse the engine's generic row machinery with a DUMMY
    head axis: rows["k"] is [L, B, 1, S_row, rank+rope]
    (num_key_value_heads=1, head_dim_override=rank+rope in the serving
    LlamaConfig) — radix prefix cache, _load_prefix/_store_prompt and
    HBM auto-sizing all work unchanged, at 1/14th of llama-7B KV bytes
    per token;
  * attention is ABSORBED into the latent space: q_lat = q_nope·W_uk,
    scores = q_lat·latent + q_pe·k_pe, out = (p·latent)·W_uv — the
    per-head K/V are never materialized (XLA einsums; the [B,H,T,S]
    score tile is transient and fuses);
  * heterogeneous layers (first_k_dense_replace) run as an unrolled
    dense prefix + ONE lax.scan over the uniform stacked tail
    (dense or MoE) — one compiled layer body either way;
  * MoE follows models/deepseek_v2.py:_moe semantics (fp32 softmax,
    greedy/group-limited top-k, routed scaling, shared experts) in a
    vectorized all-experts einsum (correctness-first; decode batches
    are tiny so dense-compute routing is cheap).

Unsupported in this path (asserted at engine init): kv_quant,
weight_quant, tp>1 — the latent cache is already 14x smaller and V2
serving across chips wants expert parallelism, a follow-up.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from aurora_tpu.models.deepseek_v2 import (DeepseekV2Config,
                                           _rope_interleaved)
from aurora_tpu.models.llama import LlamaConfig
from aurora_tpu.ops.norms import rms_norm

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# serving config/params mapping (per-layer list → dense prefix + stacked tail)
# ---------------------------------------------------------------------------

def deepseek_serving_config(d: DeepseekV2Config) -> LlamaConfig:
    """DeepseekV2Config → engine-facing universal LlamaConfig."""
    return LlamaConfig(
        vocab_size=d.vocab_size,
        hidden_size=d.hidden_size,
        intermediate_size=d.intermediate_size,
        num_hidden_layers=d.num_hidden_layers,
        num_attention_heads=d.num_attention_heads,
        num_key_value_heads=1,                      # latent = MQA-like
        head_dim_override=d.kv_lora_rank + d.qk_rope_head_dim,
        max_position_embeddings=d.max_position_embeddings,
        rms_norm_eps=d.rms_norm_eps,
        rope_theta=d.rope_theta,
        rope_inv_freq=d.rope_inv_freq,
        rope_attention_scaling=d.rope_attention_scaling,
        # attn scale is qk_head_dim^-0.5, NOT (rank+rope)^-0.5
        query_pre_attn_scalar=float(d.qk_head_dim),
        mla_kv_lora_rank=d.kv_lora_rank,
        mla_q_lora_rank=d.q_lora_rank,
        mla_qk_nope_head_dim=d.qk_nope_head_dim,
        mla_qk_rope_head_dim=d.qk_rope_head_dim,
        mla_v_head_dim=d.v_head_dim,
        mla_first_k_dense=(d.first_k_dense_replace
                           if d.n_routed_experts > 0
                           else d.num_hidden_layers),
        num_experts=d.n_routed_experts,
        num_experts_per_tok=d.num_experts_per_tok,
        moe_router_mode="deepseek",
        moe_routed_scaling=d.routed_scaling_factor,
        moe_norm_topk=d.norm_topk_prob,
        moe_topk_method=d.topk_method,
        moe_n_group=d.n_group,
        moe_topk_group=d.topk_group,
    )


def _attn_leaves(lp: Params) -> Params:
    out = {k: lp[k] for k in ("input_norm", "post_attn_norm", "kv_a",
                              "kv_a_norm", "kv_b", "o")}
    for k in ("q", "q_a", "q_a_norm", "q_b"):
        if k in lp:
            out[k] = lp[k]
    return out


def deepseek_serving_params(params: Params,
                            d: DeepseekV2Config) -> Params:
    """Per-layer list params (models/deepseek_v2.py layout) → serving
    layout: {"dense_layers": [dict, ...] python list (unrolled prefix),
    "layers": stacked uniform tail, embed/final_norm/lm_head}."""
    layers: List[Params] = params["layers"]
    first_k = (d.first_k_dense_replace if d.n_routed_experts > 0
               else d.num_hidden_layers)
    dense_prefix = []
    for lp in layers[:first_k]:
        e = _attn_leaves(lp)
        e.update({"gate": lp["mlp"]["gate"], "up": lp["mlp"]["up"],
                  "down": lp["mlp"]["down"]})
        dense_prefix.append(e)

    tail = layers[first_k:]
    stacked: Params = {}
    if tail:
        ex0 = tail[0]
        assert all(d.is_moe_layer(i + first_k)
                   for i in range(len(tail))), \
            "non-uniform tail (moe_layer_freq != 1) unsupported"
        for k in _attn_leaves(ex0):
            stacked[k] = jnp.stack([lp[k] for lp in tail])
        stacked["moe_gate_w"] = jnp.stack(
            [lp["gate_weight"] for lp in tail])          # [Lm, E, D]
        for nm in ("gate", "up", "down"):
            stacked[f"moe_{nm}"] = jnp.stack(
                [jnp.stack([ep[nm] for ep in lp["experts"]])
                 for lp in tail])                        # [Lm, E, ...]
            stacked[f"shared_{nm}"] = jnp.stack(
                [lp["shared"][nm] for lp in tail])       # [Lm, ...]
    return {"embed_tokens": params["embed_tokens"],
            "final_norm": params["final_norm"],
            "lm_head": params["lm_head"],
            "dense_layers": dense_prefix,
            "layers": stacked}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _ds_moe(cfg: LlamaConfig, lp: Params, x):
    """DeepSeek MoE (models/deepseek_v2.py:_moe semantics) over stacked
    per-layer leaves, vectorized across experts."""
    B, T, D = x.shape
    flat = x.reshape(-1, D)
    N = flat.shape[0]
    logits = jnp.dot(flat.astype(jnp.float32),
                     lp["moe_gate_w"].astype(jnp.float32).T)
    scores = jax.nn.softmax(logits, axis=-1)                 # [N, E]
    k = cfg.num_experts_per_tok
    if cfg.moe_topk_method == "group_limited_greedy" \
            and cfg.moe_n_group > 1:
        E = scores.shape[-1]
        g = scores.reshape(N, cfg.moe_n_group, E // cfg.moe_n_group)
        gmax = jnp.max(g, axis=-1)
        _, gidx = jax.lax.top_k(gmax, cfg.moe_topk_group)
        gmask = jnp.zeros_like(gmax).at[
            jnp.arange(N)[:, None], gidx].set(1.0)
        masked = (g * gmask[..., None]).reshape(N, E)
        topw, topi = jax.lax.top_k(masked, k)
    else:
        topw, topi = jax.lax.top_k(scores, k)
    if cfg.moe_norm_topk:
        topw = topw / jnp.maximum(topw.sum(-1, keepdims=True), 1e-20)
    topw = topw * cfg.moe_routed_scaling
    combine = jnp.zeros_like(scores).at[
        jnp.arange(N)[:, None], topi].set(topw)              # [N, E]

    xf = flat.astype(jnp.float32)
    gate = jnp.einsum("nd,edi->eni", xf,
                      lp["moe_gate"].astype(jnp.float32))
    up = jnp.einsum("nd,edi->eni", xf,
                    lp["moe_up"].astype(jnp.float32))
    act = jax.nn.silu(gate) * up
    down = jnp.einsum("eni,eid->end", act,
                      lp["moe_down"].astype(jnp.float32))
    routed = jnp.einsum("end,ne->nd", down, combine)

    sg = jnp.dot(xf, lp["shared_gate"].astype(jnp.float32))
    su = jnp.dot(xf, lp["shared_up"].astype(jnp.float32))
    shared = jnp.dot(jax.nn.silu(sg) * su,
                     lp["shared_down"].astype(jnp.float32))
    return (routed + shared).astype(x.dtype).reshape(B, T, D)


def _dense_mlp(lp: Params, x):
    gate = jnp.dot(x, lp["gate"], preferred_element_type=jnp.float32
                   ).astype(x.dtype)
    up = jnp.dot(x, lp["up"], preferred_element_type=jnp.float32
                 ).astype(x.dtype)
    return jnp.dot(jax.nn.silu(gate) * up, lp["down"],
                   preferred_element_type=jnp.float32).astype(x.dtype)


def _mla_layer(cfg: LlamaConfig, lp: Params, l, x, rows, ridx, wpos,
               positions, kv_lens, moe: bool):
    """One MLA decoder layer over the latent rows. l may be a traced
    scalar (scan) or a python int (dense prefix)."""
    Bk, T, D = x.shape
    S_row = rows["k"].shape[3]
    r = cfg.mla_kv_lora_rank
    dn, dr = cfg.mla_qk_nope_head_dim, cfg.mla_qk_rope_head_dim
    dv, H = cfg.mla_v_head_dim, cfg.num_attention_heads
    eps = cfg.rms_norm_eps

    h = rms_norm(x, lp["input_norm"], eps)
    if "q_a" in lp:
        q = jnp.dot(h, lp["q_a"])
        q = rms_norm(q, lp["q_a_norm"], eps)
        q = jnp.dot(q, lp["q_b"])
    else:
        q = jnp.dot(h, lp["q"])
    q = q.reshape(Bk, T, H, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]

    ckv = jnp.dot(h, lp["kv_a"])                     # [Bk, T, r+dr]
    lat = rms_norm(ckv[..., :r], lp["kv_a_norm"], eps)
    k_pe = _rope_interleaved(ckv[..., r:][:, :, None, :], positions,
                             cfg.rope_theta, cfg.rope_inv_freq,
                             cfg.rope_attention_scaling)[:, :, 0]
    q_pe = _rope_interleaved(q_pe, positions, cfg.rope_theta,
                             cfg.rope_inv_freq,
                             cfg.rope_attention_scaling)
    new = jnp.concatenate([lat, k_pe], axis=-1)      # [Bk, T, r+dr]
    rows["k"] = rows["k"].at[l, ridx, 0, wpos].set(
        new.astype(rows["k"].dtype), mode="drop")

    # absorbed attention over the latent cache
    W_kv = lp["kv_b"].reshape(r, H, dn + dv)
    W_uk, W_uv = W_kv[..., :dn], W_kv[..., dn:]
    cache = rows["k"][l][ridx[:, 0], 0]              # [Bk, S, r+dr]
    lat_c = cache[..., :r].astype(jnp.float32)
    pe_c = cache[..., r:].astype(jnp.float32)
    q_lat = jnp.einsum("bthd,rhd->bthr", q_nope.astype(jnp.float32),
                       W_uk.astype(jnp.float32))
    logits = (jnp.einsum("bthr,bsr->bhts", q_lat, lat_c)
              + jnp.einsum("bthd,bsd->bhts",
                           q_pe.astype(jnp.float32), pe_c))
    logits = logits * cfg.attn_scale
    qpos = positions[:, None, :, None]               # [Bk,1,T,1]
    kpos = jnp.arange(S_row)[None, None, None, :]
    mask = (kpos <= qpos) & (kpos < kv_lens[:, None, None, None])
    logits = jnp.where(mask, logits, -2.38e38)
    p = jax.nn.softmax(logits, axis=-1)
    o_lat = jnp.einsum("bhts,bsr->bthr", p, lat_c)
    attn = jnp.einsum("bthr,rhd->bthd", o_lat,
                      W_uv.astype(jnp.float32))
    attn = jnp.dot(attn.reshape(Bk, T, H * dv).astype(x.dtype),
                   lp["o"], preferred_element_type=jnp.float32
                   ).astype(x.dtype)
    x = x + attn

    h2 = rms_norm(x, lp["post_attn_norm"], eps)
    out = _ds_moe(cfg, lp, h2) if moe else _dense_mlp(lp, h2)
    return x + out, rows


def forward_rows_mla(params: Params, cfg: LlamaConfig, embeds, rows,
                     row_ids, q_offsets, kv_lens, chunk,
                     tp_axis=None) -> Tuple[jnp.ndarray, Params]:
    """engine._forward_rows twin for MLA configs — same contract:
    (last hidden [Bk, D], rows)."""
    assert tp_axis is None, "MLA serving is single-device (no TP yet)"
    x = embeds
    Bk, T, _ = x.shape
    S_row = rows["k"].shape[3]
    positions = q_offsets[:, None] + jnp.arange(T)[None, :]
    wpos = jnp.where(positions < kv_lens[:, None], positions, S_row)
    ridx = row_ids[:, None]

    for i, lp in enumerate(params["dense_layers"]):
        x, rows = _mla_layer(cfg, lp, i, x, rows, ridx, wpos,
                             positions, kv_lens, moe=False)

    first_k = len(params["dense_layers"])
    if params["layers"]:
        moe = "moe_gate_w" in params["layers"]

        def body(carry, xs):
            x, rows = carry
            lp, l = xs
            x, rows = _mla_layer(cfg, lp, l, x, rows, ridx, wpos,
                                 positions, kv_lens, moe=moe)
            return (x, rows), None

        (x, rows), _ = jax.lax.scan(
            body, (x, rows),
            (params["layers"],
             jnp.arange(first_k, cfg.num_hidden_layers)))

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    last = jnp.clip(kv_lens - q_offsets - 1, 0, T - 1)
    x = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    return x, rows
