"""Hybrid Ulysses × Ring sequence parallelism.

Parity: yunchang's LongContextAttention
(src/xtuner_lite/_lite/yunchang/hybrid/attn_layer.py:12-110 —
SeqAllToAll4D → ring attention → SeqAllToAll4D over orthogonal process
groups built by set_seq_parallel_pg, globals.py:22-81).

Here both degrees live inside the ONE 'sp' mesh axis: with sp = u·r and
`use_ulysses_low` grouping (reference default), device s = g·u + j is
ulysses rank j inside ring group g. The ulysses all_to_all runs over
contiguous subgroups via `axis_index_groups`; the ring hop is a ppermute
with explicit (src → dst) pairs connecting same-j devices of adjacent
groups. Heads split u ways, sequence r ways — a2a volume shrinks by r and
ring hops shrink to r−1, the trade the reference built yunchang for.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aurora_tpu.parallel.ring import _block_attn, _merge, _NEG_INF


def _ulysses_groups(sp: int, u: int):
    return [[g * u + j for j in range(u)] for g in range(sp // u)]


def _ring_perm(sp: int, u: int):
    r = sp // u
    return [(g * u + j, ((g + 1) % r) * u + j)
            for g in range(r) for j in range(u)]


def hybrid_attention_local(q, k, v, *, axis_name: str, ulysses: int,
                           causal: bool,
                           scale: Optional[float] = None):
    """Per-device body. q,k,v local [B, T/sp, H, D]; requires u | H."""
    sp = jax.lax.axis_size(axis_name)
    u = ulysses
    r = sp // u
    assert sp % u == 0
    from aurora_tpu.parallel.ring import _match_kv_heads
    k, v = _match_kv_heads(q, k, v)
    B, Tl, H, D = q.shape
    assert H % u == 0, f"ulysses degree {u} must divide heads {H}"
    if scale is None:
        scale = D ** -0.5

    groups = _ulysses_groups(sp, u)

    def a2a(x, split_axis, concat_axis):
        return jax.lax.all_to_all(x, axis_name, split_axis=split_axis,
                                  concat_axis=concat_axis, tiled=True,
                                  axis_index_groups=groups)

    # ulysses: scatter heads u-ways, gather the group's sequence
    qg, kg, vg = (a2a(t, 2, 1) for t in (q, k, v))   # [B, Tl*u, H/u, D]

    ring_rank = jax.lax.axis_index(axis_name) // u
    T_ring = Tl * u
    perm = _ring_perm(sp, u)

    rows = jnp.arange(T_ring)
    acc = jnp.zeros(qg.shape, jnp.float32)
    m_acc = jnp.full((B, H // u, T_ring), _NEG_INF, jnp.float32)
    l_acc = jnp.zeros((B, H // u, T_ring), jnp.float32)

    def body(i, state):
        k_cur, v_cur, acc, m_acc, l_acc = state
        src = (ring_rank - i) % r
        if causal:
            q_rows = ring_rank * T_ring + rows
            k_rows = src * T_ring + rows
            mask = (q_rows[:, None] >= k_rows[None, :])[None, None]
        else:
            mask = jnp.ones((1, 1, T_ring, T_ring), bool)
        out, m, l = _block_attn(qg, k_cur, v_cur, mask, scale)
        acc, m_acc, l_acc = _merge(acc, m_acc, l_acc, out, m, l)
        return (jax.lax.ppermute(k_cur, axis_name, perm),
                jax.lax.ppermute(v_cur, axis_name, perm),
                acc, m_acc, l_acc)

    _, _, acc, m_acc, l_acc = jax.lax.fori_loop(
        0, r, body, (kg, vg, acc, m_acc, l_acc))
    denom = jnp.maximum(l_acc, 1e-30).swapaxes(1, 2)[..., None]
    out = (acc / denom).astype(q.dtype)

    return a2a(out, 1, 2)  # reverse: gather heads, scatter sequence


def hybrid_mha(q, k, v, mesh: Mesh, *, axis_name: str = "sp",
               ulysses: int = 1, causal: bool = True, scale=None,
               batch_axes=None, head_axis=None):
    """LongContextAttention over GLOBAL [B, T, H, D] arrays with T on
    `axis_name`; ulysses·ring = mesh.shape[axis_name]. batch_axes /
    head_axis make those dims manual for sharded-program composition."""
    def body(q, k, v):
        return hybrid_attention_local(q, k, v, axis_name=axis_name,
                                      ulysses=ulysses, causal=causal,
                                      scale=scale)
    spec = P(batch_axes, axis_name, head_axis, None)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)
