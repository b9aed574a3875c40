"""Ring attention: P2P KV rotation with online log-sum-exp merging.

Replaces the reference's vendored yunchang ring family
(src/xtuner_lite/_lite/yunchang/ring/ring_flash_attn.py:7-170 — P2P isend/
irecv KV rotation + `update_out_and_lse` online merge; zigzag_ring_flash_attn
.py for causal load balance; llama3_flash_attn_varlen.py for packed varlen)
with `shard_map` + `jax.lax.ppermute` loops built on the Pallas flash
kernel:

  * Every per-step block runs through `flash_attention_lse` — logits never
    materialize (the round-1 [T,T] einsum is gone); per-device memory is
    O(Tl·block), and the lse output is differentiable, so plain autodiff
    yields the backward ring (ppermute transposes to the reverse ring).
  * Block masking is CASE-STRUCTURED, not elementwise: for each ring step
    the (query chunk, kv chunk) relation picks full / causal-with-offset /
    skip flash calls via lax.switch — the flash kernel's block-level
    causal skipping then does the fine-grained work.

Block layouts over the 'sp' axis (reference: yunchang/comm/extract_local.py):
  * contiguous — device r holds q rows [r·Tl, (r+1)·Tl). Causal masking
    makes later devices do more work (the imbalance zigzag fixes).
  * zigzag     — device r holds chunks (r, 2·sp−1−r) of 2·sp chunks; every
    device then sees the same masked-block count. `zigzag_split` /
    `zigzag_unsplit` reorder global sequences host/graph-side.
    Case rules per step (src = owner of the KV block in hand):
      src == rank: q_lo×k_lo causal; q_hi×[k_lo|k_hi] causal at offset
      src  < rank: all q × k_lo (full)        — k_hi is in the future
      src  > rank: q_hi × all k (full)        — q_lo is in the past
  * stripe     — token g lives on device g mod sp (stripe_flash_attn.py):
    local q row i is global rank+i·sp, so vs a KV strip from src the
    causal relation collapses to plain flash-causal (src ≤ rank) or
    flash-causal shifted one row (src > rank, q_offset = −1) — perfect
    balance with no chunk splitting.

Varlen packing uses the llama3-style all-gather-KV ring
(`ring_varlen_local`): KV (in `heads_k_stride` head chunks) and segment
ids are all-gathered over the ring group and each device runs ONE varlen
flash call at its contiguous q_offset — the reference's production packed
path (_lite/modules/dispatches/internlm2.py:204-240).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aurora_tpu.ops.pallas.flash_attention import (flash_attention,
                                                   flash_attention_lse)

_NEG_INF = -1e30


def _merge(acc, lse_acc, out, lse):
    """Online merge of normalized partial attentions weighted by lse
    (yunchang ring/utils.py:45 `update_out_and_lse` in normalized form).
    acc/out: [B, T, H, D] fp32; lse_acc/lse: [B, H, T]."""
    m = jnp.maximum(lse_acc, lse)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w_acc = jnp.where(lse_acc <= _NEG_INF, 0.0, jnp.exp(lse_acc - m_safe))
    w_new = jnp.where(lse <= _NEG_INF, 0.0, jnp.exp(lse - m_safe))
    denom = jnp.maximum(w_acc + w_new, 1e-38)
    wa = (w_acc / denom).swapaxes(1, 2)[..., None]
    wn = (w_new / denom).swapaxes(1, 2)[..., None]
    merged = acc * wa + out * wn
    lse_new = m_safe + jnp.log(denom)
    lse_new = jnp.where((lse_acc <= _NEG_INF) & (lse <= _NEG_INF),
                        _NEG_INF, lse_new)
    return merged, lse_new


def _skip_block(q):
    B, Tl, H, D = q.shape
    return (jnp.zeros((B, Tl, H, D), jnp.float32),
            jnp.full((B, H, Tl), _NEG_INF, jnp.float32))


def _f32(out, lse):
    return out.astype(jnp.float32), lse.astype(jnp.float32)


def _ring_flash_loop(q, k, v, *, rank, size, perm, axis_name, causal,
                     layout, scale):
    """Shared ring loop (used by ring_mha and hybrid_mha's inner ring).
    q,k,v local [B, Tl, H/Hkv, D]; rank/size over the ring dimension."""
    B, Tl, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    half = Tl // 2

    def diag(q, k, v):
        if not causal:
            return _f32(*flash_attention_lse(q, k, v, causal=False,
                                             scale=scale))
        if layout in ("contiguous", "stripe"):
            return _f32(*flash_attention_lse(q, k, v, causal=True,
                                             scale=scale))
        # zigzag diagonal: chunks (a, b=2·size−1−a) — q_lo attends k_lo
        # causally; q_hi attends k_lo fully and k_hi causally, which is
        # exactly causal masking at q_offset=half over the whole block
        o1, l1 = flash_attention_lse(q[:, :half], k[:, :half],
                                     v[:, :half], causal=True, scale=scale)
        o2, l2 = flash_attention_lse(q[:, half:], k, v, causal=True,
                                     q_offset=half, scale=scale)
        return (jnp.concatenate([o1, o2], axis=1).astype(jnp.float32),
                jnp.concatenate([l1, l2], axis=2).astype(jnp.float32))

    def lower(q, k, v):   # KV "in the past" (src < rank)
        if not causal or layout == "contiguous":
            return _f32(*flash_attention_lse(q, k, v, causal=False,
                                             scale=scale))
        if layout == "stripe":
            # strip src precedes strip rank at every index → diagonal
            # inclusive, i.e. plain causal
            return _f32(*flash_attention_lse(q, k, v, causal=True,
                                             scale=scale))
        # zigzag: only the k_lo chunk precedes every local q row
        return _f32(*flash_attention_lse(q, k[:, :half], v[:, :half],
                                         causal=False, scale=scale))

    def upper(q, k, v):   # KV "in the future" (src > rank)
        if not causal:
            return _f32(*flash_attention_lse(q, k, v, causal=False,
                                             scale=scale))
        if layout == "contiguous":
            return _skip_block(q)
        if layout == "stripe":
            # strip src follows strip rank index-for-index → strictly
            # lower triangular = causal shifted one row
            return _f32(*flash_attention_lse(q, k, v, causal=True,
                                             q_offset=-1, scale=scale))
        # zigzag: only q_hi follows the whole KV block
        o, l = flash_attention_lse(q[:, half:], k, v, causal=False,
                                   scale=scale)
        zo, zl = _skip_block(q[:, :half])
        return (jnp.concatenate([zo, o.astype(jnp.float32)], axis=1),
                jnp.concatenate([zl, l.astype(jnp.float32)], axis=2))

    def block(i, k_cur, v_cur, acc, lse_acc):
        src = (rank - i) % size  # whose KV block we hold at step i
        case = jnp.where(src == rank, 0, jnp.where(src < rank, 1, 2))
        out, lse = jax.lax.switch(case, [diag, lower, upper],
                                  q, k_cur, v_cur)
        return _merge(acc, lse_acc, out, lse)

    def body(carry, i):
        k_cur, v_cur, acc, lse_acc = carry
        acc, lse_acc = block(i, k_cur, v_cur, acc, lse_acc)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, acc, lse_acc), None

    acc = jnp.zeros((B, Tl, H, D), jnp.float32)
    lse_acc = jnp.full((B, H, Tl), _NEG_INF, jnp.float32)
    # size-1 rotate-and-compute steps; the LAST block computes without
    # rotating (a full-size scan would ppermute K/V a final time and
    # discard the result — 2 dead collectives per attention call)
    (k_l, v_l, acc, lse_acc), _ = jax.lax.scan(
        body, (k, v, acc, lse_acc), jnp.arange(size - 1))
    acc, _ = block(jnp.asarray(size - 1, jnp.int32), k_l, v_l, acc,
                   lse_acc)
    return acc.astype(q.dtype)


def ring_attention_local(q, k, v, *, axis_name: str, causal: bool,
                         layout: str = "contiguous",
                         scale: Optional[float] = None):
    """Per-device ring loop. q,k,v local [B, Tl, H, D] (kv heads may be
    fewer — the flash wrapper repeats them per call, so the ring rotates
    the COMPACT kv)."""
    sp = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    return _ring_flash_loop(q, k, v, rank=rank, size=sp, perm=perm,
                            axis_name=axis_name, causal=causal,
                            layout=layout, scale=scale)


def ring_mha(q, k, v, mesh: Mesh, *, axis_name: str = "sp",
             causal: bool = True, layout: str = "contiguous", scale=None,
             batch_axes=None, head_axis=None):
    """Ring attention over GLOBAL [B, T, H, D] arrays, T sharded on
    `axis_name`. For causal work-balance pre-reorder the sequence with
    `zigzag_split` and pass layout='zigzag'. batch_axes/head_axis make
    those dims manual for composition with sharded programs."""
    def body(q, k, v):
        return ring_attention_local(q, k, v, axis_name=axis_name,
                                    causal=causal, layout=layout,
                                    scale=scale)
    spec = P(batch_axes, axis_name, head_axis, None)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)


# ---------------------------------------------------------------------------
# Varlen packing under ring SP: llama3-style all-gather-KV
# (_lite/yunchang/llama3_flash_attn_varlen.py + dispatches/internlm2.py)
# ---------------------------------------------------------------------------

def ring_varlen_local(q, k, v, q_segment_ids, *, axis_name: str,
                      heads_k_stride: int = 0, causal: bool = True,
                      scale: Optional[float] = None,
                      axis_index_groups=None, rank=None,
                      ring_size: Optional[int] = None):
    """Packed-varlen ring attention: all-gather KV (in head chunks of
    `heads_k_stride` to bound peak memory) + ONE varlen flash call per
    chunk at the device's contiguous q_offset.

    q [B, Tl, H, D]; k,v [B, Tl, Hkv, D]; q_segment_ids [B, Tl] (global
    segment numbering — identical packing across the ring group).

    The flash kernel's q_offset is compile-time static, but the ring rank
    is traced — a lax.switch over the `ring_size` possible offsets picks
    the right specialization (each branch compiles once per shape)."""
    if ring_size is None:
        ring_size = jax.lax.axis_size(axis_name)
    if rank is None:
        rank = jax.lax.axis_index(axis_name)
    B, Tl, H, D = q.shape
    Hkv = k.shape[2]
    G = H // Hkv
    if heads_k_stride <= 0 or heads_k_stride > Hkv:
        heads_k_stride = Hkv

    def ag(x, axis):
        return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True,
                                  axis_index_groups=axis_index_groups)

    kv_seg = ag(q_segment_ids, 1)                 # [B, T]

    def at_offset(r):
        def fn(qc, kc, vc, qs, ks):
            return flash_attention(qc, kc, vc, causal=causal, scale=scale,
                                   q_segment_ids=qs, kv_segment_ids=ks,
                                   q_offset=r * Tl)
        return fn

    branches = [at_offset(r) for r in range(ring_size)]
    outs = []
    for h0 in range(0, Hkv, heads_k_stride):
        kc = ag(k[:, :, h0:h0 + heads_k_stride], 1)   # [B, T, stride, D]
        vc = ag(v[:, :, h0:h0 + heads_k_stride], 1)
        qc = q[:, :, h0 * G:(h0 + heads_k_stride) * G]
        outs.append(jax.lax.switch(rank, branches, qc, kc, vc,
                                   q_segment_ids, kv_seg))
    return jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]


def ring_varlen_mha(q, k, v, segment_ids, mesh: Mesh, *,
                    axis_name: str = "sp", heads_k_stride: int = 0,
                    causal: bool = True, scale=None, batch_axes=None,
                    head_axis=None):
    """llama3-varlen ring over GLOBAL arrays (T on `axis_name`)."""
    def body(q, k, v, seg):
        return ring_varlen_local(q, k, v, seg, axis_name=axis_name,
                                 heads_k_stride=heads_k_stride,
                                 causal=causal, scale=scale)
    spec = P(batch_axes, axis_name, head_axis, None)
    sspec = P(batch_axes, axis_name)
    return jax.shard_map(body, mesh=mesh,
                         in_specs=(spec, spec, spec, sspec),
                         out_specs=spec, check_vma=False)(q, k, v,
                                                          segment_ids)


# ---------------------------------------------------------------------------
# Zigzag reordering (yunchang comm/extract_local.py:62 EXTRACT_FUNC_DICT)
# ---------------------------------------------------------------------------

def stripe_split(x: jnp.ndarray, sp: int, axis: int = 1) -> jnp.ndarray:
    """Reorder a global sequence so contiguous sp-shards hold token
    strips {r, r+sp, r+2sp, ...} (stripe_flash_attn layout)."""
    n = x.shape[axis]
    assert n % sp == 0
    idx = jnp.arange(n).reshape(n // sp, sp).T.reshape(-1)
    return jnp.take(x, idx, axis=axis)


def stripe_unsplit(x: jnp.ndarray, sp: int, axis: int = 1) -> jnp.ndarray:
    n = x.shape[axis]
    assert n % sp == 0
    idx = jnp.arange(n).reshape(sp, n // sp).T.reshape(-1)
    return jnp.take(x, idx, axis=axis)


def zigzag_split(x: jnp.ndarray, sp: int, axis: int = 1) -> jnp.ndarray:
    """Reorder a global sequence so contiguous sp-shards hold zigzag chunk
    pairs (r, 2sp-1-r). Apply before sharding on 'sp'; inverse below."""
    n = x.shape[axis]
    assert n % (2 * sp) == 0
    chunks = jnp.split(x, 2 * sp, axis=axis)
    order = []
    for r in range(sp):
        order += [r, 2 * sp - 1 - r]
    return jnp.concatenate([chunks[i] for i in order], axis=axis)


def zigzag_unsplit(x: jnp.ndarray, sp: int, axis: int = 1) -> jnp.ndarray:
    n = x.shape[axis]
    assert n % (2 * sp) == 0
    chunks = jnp.split(x, 2 * sp, axis=axis)
    inv = [0] * (2 * sp)
    pos = 0
    for r in range(sp):
        inv[r] = pos
        inv[2 * sp - 1 - r] = pos + 1
        pos += 2
    return jnp.concatenate([chunks[inv[i]] for i in range(2 * sp)],
                           axis=axis)
