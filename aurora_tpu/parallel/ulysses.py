"""Ulysses sequence parallelism: head-scatter / seq-gather all_to_all.

Replaces the reference's DeepSpeed-Ulysses implementation
(src/xtuner/xtuner/parallel/sequence/comm.py:25-87 `_AllToAll` autograd op,
attention.py:16-127) with `jax.lax.all_to_all` under shard_map — autodiff of
the collective is free (all_to_all is its own transpose), so the reference's
hand-written backward disappears.

Dataflow per device (sp = axis size), fast path (sp | heads):
    q,k,v local [B, T/sp, H, D]
      → all_to_all(scatter heads, gather seq) → [B, T, H/sp, D]
      → full-sequence attention on the local head group
      → all_to_all back → [B, T/sp, H, D]

Inner-SP path (sp ∤ H, the reference's subgroup trick attention.py:24-93):
head_dim is split insp = sp//gcd(H, sp) ways ONLY in transit — local reshape
to insp·H pseudo-heads of dim D/insp (a2a-divisible), all_to_all, then an
all-gather over inner subgroups of size insp (jax `axis_index_groups`)
reassembles full-D heads. Devices inside an inner subgroup hold identical
heads (compute duplicated ×insp, as in the reference); the post path slices
the local D-shard back out before the reverse all_to_all.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P



def _a2a(x, axis_name, split_axis, concat_axis):
    return jax.lax.all_to_all(x, axis_name, split_axis=split_axis,
                              concat_axis=concat_axis, tiled=True)




def _match_kv_heads(q, k, v, sp: int = 0):
    """GQA: expand KV heads only as far as the head-scatter a2a needs.

    The a2a splits the head axis by sp, so Hkv must be a multiple of sp
    (or match H when the inner-SP pseudo-head path runs) — but the
    downstream attention already handles Hkv < H by repeating locally,
    so expanding all the way to H here multiplied the a2a bandwidth and
    HBM by H/Hkv for nothing. lcm(Hkv, sp) is the minimal legal count;
    full expansion only when the pseudo-head path (sp ∤ H) needs
    symmetric shapes."""
    h, hkv = q.shape[2], k.shape[2]
    if hkv == h:
        return k, v
    target = h
    if sp and h % sp == 0:  # plain path: minimal expansion
        # smallest multiple of hkv that the a2a can split (sp | target)
        # AND that the downstream GQA repeat can group (target | h)
        lcm = hkv * sp // math.gcd(hkv, sp)
        for cand in range(lcm, h, lcm):
            if cand % hkv == 0 and h % cand == 0:
                target = cand
                break
    if target != hkv:
        k = jnp.repeat(k, target // hkv, axis=2)
        v = jnp.repeat(v, target // hkv, axis=2)
    return k, v


def _inner_groups(sp: int, insp: int):
    return [[g * insp + j for j in range(insp)] for g in range(sp // insp)]


def _to_pseudo_heads(x, sp, insp):
    """[B, Tl, H, D] → [B, Tl, insp·H, D/insp] (attention.py:41-46 pattern:
    interleave so that the a2a lands subgroup-contiguous)."""
    b, tl, h, d = x.shape
    x = x.reshape(b, tl, sp // insp, h * insp // sp, insp, d // insp)
    x = x.swapaxes(3, 4)
    return x.reshape(b, tl, insp * h, d // insp)


def _from_pseudo_heads(x, sp, insp, h, d):
    """Inverse of _to_pseudo_heads (attention.py:123-125)."""
    b, tl = x.shape[:2]
    x = x.reshape(b, tl, sp // insp, insp, h * insp // sp, d // insp)
    x = x.swapaxes(3, 4)
    return x.reshape(b, tl, h, d)


def ulysses_attention_local(q, k, v, *, axis_name: str, causal: bool,
                            q_segment_ids=None, kv_segment_ids=None,
                            scale: Optional[float] = None):
    """Per-device body under shard_map. q,k,v: [B, T_local, H, D]."""
    sp = jax.lax.axis_size(axis_name)
    k, v = _match_kv_heads(q, k, v, sp)
    B, Tl, H, D = q.shape
    insp = sp // math.gcd(H, sp)
    if insp > 1:
        assert (H * insp) % sp == 0 and D % insp == 0, (
            f"inner-SP needs insp({insp}) | head_dim({D})")
        q = _to_pseudo_heads(q, sp, insp)
        k = _to_pseudo_heads(k, sp, insp)
        v = _to_pseudo_heads(v, sp, insp)

    qg = _a2a(q, axis_name, 2, 1)
    kg = _a2a(k, axis_name, 2, 1)
    vg = _a2a(v, axis_name, 2, 1)

    if insp > 1:
        groups = _inner_groups(sp, insp)
        gather = functools.partial(jax.lax.all_gather, axis_name=axis_name,
                                   axis=3, tiled=True,
                                   axis_index_groups=groups)
        qg, kg, vg = gather(qg), gather(kg), gather(vg)

    if q_segment_ids is not None:
        q_segment_ids = jax.lax.all_gather(q_segment_ids, axis_name,
                                           axis=1, tiled=True)
        kv_segment_ids = jax.lax.all_gather(kv_segment_ids, axis_name,
                                            axis=1, tiled=True)

    if scale is None:
        scale = D ** -0.5
    # the dispatching entry point (Pallas flash on TPU): mha_reference
    # here materialized the full [B, H/sp, T, T] fp32 logits over the
    # GATHERED global sequence — 32GB at T=32k — defeating the memory
    # purpose of sequence parallelism
    from aurora_tpu.ops.attention import mha
    out = mha(qg, kg, vg, causal=causal, scale=scale,
              q_segment_ids=q_segment_ids,
              kv_segment_ids=kv_segment_ids)

    if insp > 1:
        # take the local D-shard back out (split_forward_gather_backward,
        # attention.py:105-108), then reverse the a2a and the reshapes
        idx = jax.lax.axis_index(axis_name) % insp
        out = jax.lax.dynamic_slice_in_dim(out, idx * (D // insp),
                                           D // insp, axis=3)
        out = _a2a(out, axis_name, 1, 2)
        return _from_pseudo_heads(out, sp, insp, H, D)
    return _a2a(out, axis_name, 1, 2)


def ulysses_mha(q, k, v, mesh: Mesh, *, axis_name: str = "sp",
                causal: bool = True, q_segment_ids=None,
                kv_segment_ids=None, scale=None,
                batch_axes=None, head_axis=None):
    """Sequence-parallel attention over GLOBAL [B, T, H, D] arrays with T
    laid out on `axis_name`. Pass batch_axes (e.g. ('dp','fsdp')) and
    head_axis (e.g. 'tp') to compose with a sharded training program —
    those axes become manual too and the body sees local shards."""
    seg_specs, seg_args = (), ()
    bspec = P(batch_axes) if batch_axes else None
    if q_segment_ids is not None:
        seg_specs = (P(bspec[0] if batch_axes else None, axis_name),) * 2
        seg_args = (q_segment_ids, kv_segment_ids)

    def body(q, k, v, *segs):
        kw = {}
        if segs:
            kw = {"q_segment_ids": segs[0], "kv_segment_ids": segs[1]}
        return ulysses_attention_local(q, k, v, axis_name=axis_name,
                                       causal=causal, scale=scale, **kw)

    spec = P(batch_axes, axis_name, head_axis, None)
    return jax.shard_map(body, mesh=mesh,
                         in_specs=(spec, spec, spec) + seg_specs,
                         out_specs=spec,
                         check_vma=False)(q, k, v, *seg_args)
