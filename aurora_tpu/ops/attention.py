"""Attention ops: XLA reference path + dispatch to Pallas flash kernels.

Replaces the reference's CUDA stack (flash-attn2 via
src/xtuner/xtuner/model/modules/dispatch/attention.py and sglang's
FlashInfer/Triton backends) with a single interface:

  * `mha` — full-sequence multi-head attention with fp32 softmax, optional
    causal masking, additive bias, boolean mask, GQA, and segment-id varlen
    (the TPU-idiomatic replacement for cu_seqlens varlen flash-attn).
  * On TPU with no bias and supported shapes, dispatches to the Pallas flash
    kernel in aurora_tpu.ops.pallas.flash_attention.

Layout convention everywhere: [batch, seq, heads, head_dim] ("BTHD") — the
natural layout for TPU (contraction dims last, heads free for sharding).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_MASK_VALUE = -2.3819763e38  # ~ finfo(f32).min / 2, matches flash kernels


def _repeat_kv(k: jnp.ndarray, num_q_heads: int) -> jnp.ndarray:
    """Expand KV heads for grouped-query attention. k: [B, S, Hkv, D]."""
    hkv = k.shape[2]
    if hkv == num_q_heads:
        return k
    assert num_q_heads % hkv == 0
    return jnp.repeat(k, num_q_heads // hkv, axis=2)


def mha_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  *,
                  causal: bool = False,
                  bias: Optional[jnp.ndarray] = None,
                  mask: Optional[jnp.ndarray] = None,
                  q_segment_ids: Optional[jnp.ndarray] = None,
                  kv_segment_ids: Optional[jnp.ndarray] = None,
                  scale: Optional[float] = None,
                  q_offset: int = 0,
                  logit_cap: float = 0.0) -> jnp.ndarray:
    """XLA attention, fp32 softmax accumulation.

    q: [B, T, H, D]; k, v: [B, S, Hkv, D] (Hkv divides H → GQA).
    bias: additive, broadcastable to [B, H, T, S].
    mask: boolean, True = attend, broadcastable to [B, H, T, S].
    segment ids: [B, T] / [B, S]; attention only within equal segments
    (varlen packing — parity with flash-attn varlen cu_seqlens semantics).
    q_offset: position of q[0] within the kv sequence (decode steps).
    logit_cap: >0 → cap*tanh(scores/cap) on the raw scores pre-mask
    (Gemma2/Grok tanh softcap; sglang RadixAttention logit_cap).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    orig_dtype = q.dtype
    k = _repeat_kv(k, q.shape[2])
    v = _repeat_kv(v, q.shape[2])

    # [B, H, T, S]
    logits = jnp.einsum("bthd,bshd->bhts", q * scale, k,
                        preferred_element_type=jnp.float32)
    if logit_cap > 0.0:
        logits = logit_cap * jnp.tanh(logits / logit_cap)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)

    T, S = q.shape[1], k.shape[1]
    combined = None
    if causal:
        qi = jnp.arange(T)[:, None] + q_offset
        ki = jnp.arange(S)[None, :]
        combined = (qi >= ki)[None, None]
    if q_segment_ids is not None:
        seg = (q_segment_ids[:, None, :, None]
               == kv_segment_ids[:, None, None, :])
        combined = seg if combined is None else combined & seg
    if mask is not None:
        combined = mask if combined is None else combined & mask
    if combined is not None:
        logits = jnp.where(combined, logits, _MASK_VALUE)

    probs = jax.nn.softmax(logits, axis=-1).astype(orig_dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
        causal: bool = False,
        bias: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        q_segment_ids: Optional[jnp.ndarray] = None,
        kv_segment_ids: Optional[jnp.ndarray] = None,
        scale: Optional[float] = None,
        q_offset: int = 0,
        logit_cap: float = 0.0,
        use_flash: Optional[bool] = None) -> jnp.ndarray:
    """Dispatching attention entry point.

    use_flash: None → auto (Pallas flash on TPU when shapes allow);
    True/False force. The flash path covers the LLM hot loop (causal or
    segment-id varlen, no arbitrary bias); everything else falls back to
    the fused XLA path (which on TPU is still MXU-bound and fast for the
    short ViT sequences).
    """
    if use_flash is None:
        use_flash = (jax.default_backend() == "tpu" and bias is None
                     and mask is None and q.shape[1] >= 128
                     and q.shape[-1] % 128 == 0 and logit_cap == 0.0)
    assert not (use_flash and logit_cap > 0.0), \
        "flash path has no logit softcap; pass use_flash=False"
    if use_flash:
        from aurora_tpu.ops.pallas.flash_attention import flash_attention
        return flash_attention(
            q, k, v, causal=causal, scale=scale,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            q_offset=q_offset)
    return mha_reference(
        q, k, v, causal=causal, bias=bias, mask=mask,
        q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
        scale=scale, q_offset=q_offset, logit_cap=logit_cap)
