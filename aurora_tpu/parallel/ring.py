"""Ring attention: P2P KV rotation with online log-sum-exp merging.

Replaces the reference's vendored yunchang ring family
(src/xtuner_lite/_lite/yunchang/ring/ring_flash_attn.py:7-170 — P2P isend/
irecv KV rotation + `update_out_and_lse` online merge; zigzag_ring_flash_attn
.py for causal load balance) with a `shard_map` + `jax.lax.ppermute` loop.
XLA double-buffers the permute against the block attention automatically;
autodiff through ppermute gives the backward ring for free.

Block layouts over the 'sp' axis (reference: yunchang/comm/extract_local.py):
  * contiguous — device r holds q rows [r·Tl, (r+1)·Tl). Causal masking
    makes later devices do more work (the imbalance zigzag fixes).
  * zigzag     — device r holds chunks (r, 2·sp−1−r) of 2·sp chunks; every
    device then sees the same masked-block count. `zigzag_split` /
    `zigzag_unsplit` reorder global sequences host/graph-side.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG_INF = -1e30


def _block_attn(q, k, v, mask, scale):
    """One [Tq, Tk] attention block → (out_unnormalized, m, l).

    q,k,v: [B, T, H, D]; mask broadcastable [B, 1, Tq, Tk] (True=attend).
    Returns out [B,T,H,D] (pre-normalization), row max m and partial
    denominator l, both [B, H, Tq]."""
    logits = jnp.einsum("bthd,bshd->bhts", q * scale, k,
                        preferred_element_type=jnp.float32)
    logits = jnp.where(mask, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1)                       # [B,H,T]
    p = jnp.exp(logits - m[..., None])
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", p.astype(q.dtype), v)
    return out.astype(jnp.float32), m, l


def _merge(acc, m_acc, l_acc, out, m, l):
    """Online LSE merge (parity: yunchang ring/utils.py:45
    `update_out_and_lse`, in max-normalized form)."""
    m_new = jnp.maximum(m_acc, m)
    a = jnp.exp(m_acc - m_new)
    b = jnp.exp(m - m_new)
    l_new = l_acc * a + l * b
    acc_new = acc * a.swapaxes(1, 2)[..., None] + out * b.swapaxes(
        1, 2)[..., None]
    return acc_new, m_new, l_new


def _match_kv_heads(q, k, v):
    h, hkv = q.shape[2], k.shape[2]
    if hkv != h:
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)
    return k, v


def ring_attention_local(q, k, v, *, axis_name: str, causal: bool,
                         layout: str = "contiguous",
                         scale: Optional[float] = None):
    """Per-device ring loop. q,k,v local [B, Tl, H, D]."""
    sp = jax.lax.axis_size(axis_name)
    k, v = _match_kv_heads(q, k, v)
    rank = jax.lax.axis_index(axis_name)
    B, Tl, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def global_rows(dev):
        """Row indices of a device's local chunk, [Tl]."""
        if layout == "contiguous":
            return dev * Tl + jnp.arange(Tl)
        # zigzag: chunks (dev, 2sp-1-dev) of size Tl//2
        half = Tl // 2
        lo = dev * half + jnp.arange(half)
        hi = (2 * sp - 1 - dev) * half + jnp.arange(half)
        return jnp.concatenate([lo, hi])

    q_rows = global_rows(rank)

    acc = jnp.zeros((B, Tl, H, D), jnp.float32)
    m_acc = jnp.full((B, H, Tl), _NEG_INF, jnp.float32)
    l_acc = jnp.zeros((B, H, Tl), jnp.float32)

    def body(i, state):
        k_cur, v_cur, acc, m_acc, l_acc = state
        src = (rank - i) % sp  # whose KV block we hold at step i
        if causal:
            k_rows = global_rows(src)
            mask = (q_rows[:, None] >= k_rows[None, :])[None, None]
        else:
            mask = jnp.ones((1, 1, Tl, Tl), bool)
        out, m, l = _block_attn(q, k_cur, v_cur, mask, scale)
        acc, m_acc, l_acc = _merge(acc, m_acc, l_acc, out, m, l)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return k_nxt, v_nxt, acc, m_acc, l_acc

    _, _, acc, m_acc, l_acc = jax.lax.fori_loop(
        0, sp, body, (k, v, acc, m_acc, l_acc))
    denom = jnp.maximum(l_acc, 1e-30).swapaxes(1, 2)[..., None]
    return (acc / denom).astype(q.dtype)


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
# Zigzag reordering (yunchang comm/extract_local.py:62 EXTRACT_FUNC_DICT)
# ---------------------------------------------------------------------------

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
