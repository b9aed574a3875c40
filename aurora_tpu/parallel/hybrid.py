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

The inner ring is the Pallas-flash loop from parallel.ring (no logits
materialization) and supports the zigzag causal load-balance layout: apply
`zigzag_split(x, r)` to the GLOBAL sequence (r = ring degree) before
sharding and pass layout='zigzag'. Packed varlen uses `hybrid_varlen_mha`
(ulysses a2a + llama3 all-gather-KV ring over the ring subgroups,
dispatches/internlm2.py:204-240 parity).
"""

from __future__ import annotations

import math

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aurora_tpu.parallel.ring import _ring_flash_loop, ring_varlen_local


def _ulysses_groups(sp: int, u: int):
    return [[g * u + j for j in range(u)] for g in range(sp // u)]


def _ring_groups(sp: int, u: int):
    r = sp // u
    return [[g * u + j for g in range(r)] for j in range(u)]


def _ring_perm(sp: int, u: int):
    r = sp // u
    return [(g * u + j, ((g + 1) % r) * u + j)
            for g in range(r) for j in range(u)]


def hybrid_attention_local(q, k, v, *, axis_name: str, ulysses: int,
                           causal: bool, layout: str = "contiguous",
                           scale: Optional[float] = None,
                           segment_ids=None, heads_k_stride: int = 0):
    """Per-device body. q,k,v local [B, T/sp, H, D]; requires u | H.
    segment_ids [B, T/sp] switches to the llama3 varlen ring (contiguous
    layout only)."""
    sp = jax.lax.axis_size(axis_name)
    u = ulysses
    r = sp // u
    assert sp % u == 0
    B, Tl, H, D = q.shape
    assert H % u == 0, f"ulysses degree {u} must divide heads {H}"
    if k.shape[2] % u != 0:
        # GQA with u ∤ Hkv: expand kv heads just enough for the
        # head-scatter a2a to divide evenly — lcm(Hkv, u), not H
        # (the ring kernels repeat GQA locally, so carrying H/Hkv×
        # the KV around the ring was pure bandwidth waste)
        hkv = k.shape[2]
        lcm = hkv * u // math.gcd(hkv, u)
        target = H  # fallback: full expansion
        for cand in range(lcm, H, lcm):
            if H % cand == 0:  # ring kernels' GQA repeat needs target|H
                target = cand
                break
        k = jnp.repeat(k, target // hkv, axis=2)
        v = jnp.repeat(v, target // hkv, axis=2)
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
    perm = _ring_perm(sp, u)

    if segment_ids is not None:
        assert layout == "contiguous", \
            "varlen ring uses the llama3 all-gather layout"
        seg = jax.lax.all_gather(segment_ids, axis_name, axis=1,
                                 tiled=True, axis_index_groups=groups)
        out = ring_varlen_local(qg, kg, vg, seg, axis_name=axis_name,
                                heads_k_stride=heads_k_stride,
                                causal=causal, scale=scale,
                                axis_index_groups=_ring_groups(sp, u),
                                rank=ring_rank, ring_size=r)
    else:
        out = _ring_flash_loop(qg, kg, vg, rank=ring_rank, size=r,
                               perm=perm, axis_name=axis_name,
                               causal=causal, layout=layout, scale=scale)
    return a2a(out, 1, 2)  # reverse: gather heads, scatter sequence


def hybrid_mha(q, k, v, mesh: Mesh, *, axis_name: str = "sp",
               ulysses: int = 1, causal: bool = True,
               layout: str = "contiguous", scale=None,
               batch_axes=None, head_axis=None):
    """LongContextAttention over GLOBAL [B, T, H, D] arrays with T on
    `axis_name`; ulysses·ring = mesh.shape[axis_name]. For layout='zigzag'
    pre-reorder the global sequence with zigzag_split(x, ring_degree).
    batch_axes/head_axis make those dims manual for sharded-program
    composition."""
    def body(q, k, v):
        return hybrid_attention_local(q, k, v, axis_name=axis_name,
                                      ulysses=ulysses, causal=causal,
                                      layout=layout, scale=scale)
    spec = P(batch_axes, axis_name, head_axis, None)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)


def hybrid_varlen_mha(q, k, v, segment_ids, mesh: Mesh, *,
                      axis_name: str = "sp", ulysses: int = 1,
                      heads_k_stride: int = 0, causal: bool = True,
                      scale=None, batch_axes=None, head_axis=None):
    """Packed-varlen LongContextAttention: ulysses a2a + llama3 ring."""
    def body(q, k, v, seg):
        return hybrid_attention_local(q, k, v, axis_name=axis_name,
                                      ulysses=ulysses, causal=causal,
                                      scale=scale, segment_ids=seg,
                                      heads_k_stride=heads_k_stride)
    spec = P(batch_axes, axis_name, head_axis, None)
    sspec = P(batch_axes, axis_name)
    return jax.shard_map(body, mesh=mesh,
                         in_specs=(spec, spec, spec, sspec),
                         out_specs=spec, check_vma=False)(q, k, v,
                                                          segment_ids)
