"""Pallas TPU flash attention (forward + backward).

The TPU-native replacement for the reference's CUDA attention stack:
flash-attn2 (src/xtuner/xtuner/model/modules/dispatch/attention.py:7) and
sglang's FlashInfer/Triton kernels. Design is the classic flash algorithm:

  forward  — grid (batch·heads, q_blocks, kv_blocks), kv innermost; online
             softmax in fp32 VMEM scratch (running max m, denominator l,
             accumulator acc), logits never hit HBM; emits LSE for backward.
  backward — Δ = rowsum(dO∘O) precomputed in XLA; a dKV kernel iterates q
             blocks per kv block, a dQ kernel iterates kv blocks per q
             block, both recomputing p = exp(qk − lse) flash-style.

Causal masking supports a `q_offset` (decode / cache-extend) and block-level
skipping: fully-masked kv blocks contribute nothing and their compute is
predicated away with pl.when. Segment ids give varlen packing (the
cu_seqlens replacement). Layout: [B, T, H, D] at the API, [B·H, T, D]
inside; the q/kv sequence dims are padded to block multiples and bounds-
masked in-kernel.

Autodiff: custom_vjp; q/k/v grads only (no grads for segment ids).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -2.3819763e38
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_KV = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_to(x, multiple, axis):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, scale, causal, q_offset,
                t_q, t_kv, block_q, block_kv, use_segments):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q_pos = (iq * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 0) + q_offset)
    k_pos = ik * block_kv + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 1)

    # block-level causal skip: block needed iff some q_pos >= some k_pos
    if causal:
        first_q = iq * block_q + q_offset
        last_q = first_q + block_q - 1
        first_k = ik * block_kv
        needed = last_q >= first_k
    else:
        needed = True

    @pl.when(needed)
    def _compute():
        q = q_ref[0].astype(jnp.float32)          # [bq, D]
        k = k_ref[0].astype(jnp.float32)          # [bk, D]
        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = (k_pos < t_kv) & (q_pos - q_offset < t_q)
        if causal:
            mask &= q_pos >= k_pos
        if use_segments:
            qs = q_seg_ref[0, 0, pl.ds(iq * block_q, block_q)]   # [bq]
            ks = kv_seg_ref[0, 0, pl.ds(ik * block_kv, block_kv)]  # [bk]
            mask &= qs[:, None] == ks[None, :]
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_ref[:, 0]                       # [bq]
        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
        v = v_ref[0].astype(jnp.float32)
        acc_ref[:] = (acc_ref[:] * alpha[:, None]
                      + jax.lax.dot_general(
                          p, v, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32))
        m_ref[:, 0] = m_new
        l_ref[:, 0] = l_new

    @pl.when(ik == nk - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0], 1e-30)
        o_ref[0] = (acc_ref[:] / l[:, None]).astype(o_ref.dtype)
        lse_ref[0, :, 0] = m_ref[:, 0] + jnp.log(l)


def _flash_fwd(q, k, v, q_segment_ids, kv_segment_ids, *, causal, scale,
               q_offset, block_q, block_kv, t_q=None,
               t_kv=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q: [BH, Tq_pad, D], k/v: [BH, Tkv_pad, D]. t_q/t_kv are the TRUE
    (pre-padding) lengths used for bounds masking. Returns (out, lse)."""
    BH, Tq, D = q.shape
    Tkv = k.shape[1]
    t_q = Tq if t_q is None else t_q
    t_kv = Tkv if t_kv is None else t_kv
    bq = min(block_q, Tq)
    bk = min(block_kv, Tkv)
    grid = (BH, pl.cdiv(Tq, bq), pl.cdiv(Tkv, bk))
    use_segments = q_segment_ids is not None
    if not use_segments:
        # dummy segment rows keep the argument list static
        q_segment_ids = jnp.zeros((BH, 1, Tq), jnp.int32)
        kv_segment_ids = jnp.zeros((BH, 1, Tkv), jnp.int32)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, q_offset=q_offset,
        t_q=t_q, t_kv=t_kv, block_q=bq, block_kv=bk,
        use_segments=use_segments)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Tq), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, Tkv), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((BH, Tq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(q_segment_ids, kv_segment_ids, q, k, v)
    return out, lse[..., 0]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref,
                    lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                    scale, causal, q_offset, t_q, t_kv, block_q, block_kv,
                    use_segments):
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    if causal:
        first_q = iq * block_q + q_offset
        last_q = first_q + block_q - 1
        first_k = ik * block_kv
        needed = last_q >= first_k
    else:
        needed = True

    @pl.when(needed)
    def _compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(iq * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(iq * block_q, block_q)]

        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        q_pos = (iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 0) + q_offset)
        k_pos = ik * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 1)
        mask = (k_pos < t_kv) & (q_pos - q_offset < t_q)
        if causal:
            mask &= q_pos >= k_pos
        if use_segments:
            qs = q_seg_ref[0, 0, pl.ds(iq * block_q, block_q)]
            ks = kv_seg_ref[0, 0, pl.ds(ik * block_kv, block_kv)]
            mask &= qs[:, None] == ks[None, :]
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)

        dv_acc[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None]) * scale
        dk_acc[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref,
                   lse_ref, delta_ref, dq_ref, dq_acc, *, scale, causal,
                   q_offset, t_q, t_kv, block_q, block_kv, use_segments):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    if causal:
        first_q = iq * block_q + q_offset
        last_q = first_q + block_q - 1
        first_k = ik * block_kv
        needed = last_q >= first_k
    else:
        needed = True

    @pl.when(needed)
    def _compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(iq * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(iq * block_q, block_q)]

        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        q_pos = (iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 0) + q_offset)
        k_pos = ik * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 1)
        mask = (k_pos < t_kv) & (q_pos - q_offset < t_q)
        if causal:
            mask &= q_pos >= k_pos
        if use_segments:
            qs = q_seg_ref[0, 0, pl.ds(iq * block_q, block_q)]
            ks = kv_seg_ref[0, 0, pl.ds(ik * block_kv, block_kv)]
            mask &= qs[:, None] == ks[None, :]
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None]) * scale
        dq_acc[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd(res, g, *, causal, scale, q_offset, block_q, block_kv,
               t_q=None, t_kv=None, g_lse=None):
    q, k, v, q_seg, kv_seg, out, lse = res
    BH, Tq, D = q.shape
    Tkv = k.shape[1]
    t_q = Tq if t_q is None else t_q
    t_kv = Tkv if t_kv is None else t_kv
    bq = min(block_q, Tq)
    bk = min(block_kv, Tkv)
    use_segments = q_seg is not None
    if not use_segments:
        q_seg = jnp.zeros((BH, 1, Tq), jnp.int32)
        kv_seg = jnp.zeros((BH, 1, Tkv), jnp.int32)

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]   # [BH, 1, Tq]
    if g_lse is not None:
        # lse cotangent folds into delta: ds = p·(dP − Δ + ḡ_lse)
        # (∂lse_r/∂s_rj = p_rj), so Δ' = Δ − ḡ_lse feeds the same kernels
        delta = delta - g_lse.astype(jnp.float32)[:, None, :]
    lse = lse[:, None, :]                   # [BH, 1, Tq]

    kw = dict(scale=scale, causal=causal, q_offset=q_offset, t_q=t_q,
              t_kv=t_kv, block_q=bq, block_kv=bk,
              use_segments=use_segments)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **kw),
        grid=(BH, pl.cdiv(Tkv, bk), pl.cdiv(Tq, bq)),
        in_specs=[
            pl.BlockSpec((1, 1, Tq), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, Tkv), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, Tq), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, Tq), lambda b, j, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tkv, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Tkv, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        interpret=_interpret(),
    )(q_seg, kv_seg, q, k, v, g, lse, delta)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kw),
        grid=(BH, pl.cdiv(Tq, bq), pl.cdiv(Tkv, bk)),
        in_specs=[
            pl.BlockSpec((1, 1, Tq), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, Tkv), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, Tq), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, Tq), lambda b, i, j: (b, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0))],
        out_shape=[jax.ShapeDtypeStruct((BH, Tq, D), q.dtype)],
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        interpret=_interpret(),
    )(q_seg, kv_seg, q, k, v, g, lse, delta)[0]

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API ([B, T, H, D] layout, GQA, padding)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _flash_core(q, k, v, causal, scale, q_offset, block_q, block_kv,
                has_segments, t_q, t_kv, q_seg=None, kv_seg=None):
    out, _ = _flash_fwd(q, k, v, q_seg if has_segments else None,
                        kv_seg if has_segments else None, causal=causal,
                        scale=scale, q_offset=q_offset, block_q=block_q,
                        block_kv=block_kv, t_q=t_q, t_kv=t_kv)
    return out


def _flash_core_fwd(q, k, v, causal, scale, q_offset, block_q, block_kv,
                    has_segments, t_q, t_kv, q_seg=None, kv_seg=None):
    out, lse = _flash_fwd(q, k, v, q_seg if has_segments else None,
                          kv_seg if has_segments else None, causal=causal,
                          scale=scale, q_offset=q_offset, block_q=block_q,
                          block_kv=block_kv, t_q=t_q, t_kv=t_kv)
    return out, (q, k, v, q_seg if has_segments else None,
                 kv_seg if has_segments else None, out, lse)


def _flash_core_bwd(causal, scale, q_offset, block_q, block_kv,
                    has_segments, t_q, t_kv, res, g):
    dq, dk, dv = _flash_bwd(res, g, causal=causal, scale=scale,
                            q_offset=q_offset, block_q=block_q,
                            block_kv=block_kv, t_q=t_q, t_kv=t_kv)
    return dq, dk, dv, None, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_lse_core(q, k, v, causal, scale, q_offset, block_q, block_kv,
                    t_q, t_kv):
    """Flash attention that also returns a DIFFERENTIABLE log-sum-exp —
    the building block for ring attention, where per-block (out, lse)
    pairs are merged online and gradients must flow through the merge
    weights (yunchang ring_flash_attn.py parity, but via autodiff)."""
    return _flash_fwd(q, k, v, None, None, causal=causal, scale=scale,
                      q_offset=q_offset, block_q=block_q,
                      block_kv=block_kv, t_q=t_q, t_kv=t_kv)


def _flash_lse_core_fwd(q, k, v, causal, scale, q_offset, block_q,
                        block_kv, t_q, t_kv):
    out, lse = _flash_fwd(q, k, v, None, None, causal=causal, scale=scale,
                          q_offset=q_offset, block_q=block_q,
                          block_kv=block_kv, t_q=t_q, t_kv=t_kv)
    return (out, lse), (q, k, v, out, lse)


def _flash_lse_core_bwd(causal, scale, q_offset, block_q, block_kv, t_q,
                        t_kv, res, g):
    q, k, v, out, lse = res
    g_out, g_lse = g
    dq, dk, dv = _flash_bwd((q, k, v, None, None, out, lse), g_out,
                            causal=causal, scale=scale, q_offset=q_offset,
                            block_q=block_q, block_kv=block_kv, t_q=t_q,
                            t_kv=t_kv, g_lse=g_lse)
    return dq, dk, dv


_flash_lse_core.defvjp(_flash_lse_core_fwd, _flash_lse_core_bwd)


def _prepare_folded(q, k, v, scale, block_q, block_kv):
    """Shared entry preamble: scale default, GQA repeat, [B,T,H,D] →
    [B*H,T,D] fold, power-of-two block pick, padding. One copy so
    flash_attention and flash_attention_lse can never disagree on
    blocking/padding for identical inputs."""
    B, T, H, D = q.shape
    S = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    if k.shape[2] != H:
        rep = H // k.shape[2]
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], D)

    qf, kf, vf = fold(q), fold(k), fold(v)
    bq = min(block_q, max(128, 1 << (T - 1).bit_length()))
    bk = min(block_kv, max(128, 1 << (S - 1).bit_length()))
    qf = _pad_to(qf, bq, 1)
    kf = _pad_to(kf, bk, 1)
    vf = _pad_to(vf, bk, 1)
    return qf, kf, vf, float(scale), bq, bk, B, T, H, D, S


def flash_attention_lse(q, k, v, *, causal: bool = False,
                        scale: Optional[float] = None,
                        q_offset: int = 0,
                        block_q: int = DEFAULT_BLOCK_Q,
                        block_kv: int = DEFAULT_BLOCK_KV):
    """Flash attention returning (out [B,T,H,D], lse [B,H,T]).

    The lse output is differentiable (its cotangent routes through the
    backward kernels' delta term), so compositions that weight partial
    attention results by lse — ring attention's online merge — get exact
    gradients from plain autodiff."""
    (qf, kf, vf, scale, bq, bk,
     B, T, H, D, S) = _prepare_folded(q, k, v, scale, block_q, block_kv)
    out, lse = _flash_lse_core(qf, kf, vf, causal, scale,
                               int(q_offset), bq, bk, T, S)
    out = out[:, :T].reshape(B, H, T, D).transpose(0, 2, 1, 3)
    lse = lse[:, :T].reshape(B, H, T)
    return out, lse


def flash_attention(q, k, v, *, causal: bool = False,
                    scale: Optional[float] = None,
                    q_segment_ids=None, kv_segment_ids=None,
                    q_offset: int = 0,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_kv: int = DEFAULT_BLOCK_KV):
    """Flash attention, API-compatible with ops.attention.mha_reference.

    q: [B, T, H, D]; k, v: [B, S, Hkv, D] with Hkv | H (GQA heads are
    repeated here — fine for Tq ≫ 1 prefill; decode uses the paged kernel).
    """
    (qf, kf, vf, scale, bq, bk,
     B, T, H, D, S) = _prepare_folded(q, k, v, scale, block_q, block_kv)

    has_segments = q_segment_ids is not None
    seg_args = ()
    if has_segments:
        # pad with -1/-2 so padded q rows never match padded kv rows
        qs = jnp.broadcast_to(q_segment_ids[:, None, :],
                              (B, H, T)).reshape(B * H, 1, T)
        ks = jnp.broadcast_to(kv_segment_ids[:, None, :],
                              (B, H, S)).reshape(B * H, 1, S)
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, qf.shape[1] - T)),
                     constant_values=-1)
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, kf.shape[1] - S)),
                     constant_values=-2)
        seg_args = (qs, ks)

    out = _flash_core(qf, kf, vf, causal, scale, int(q_offset),
                      bq, bk, has_segments, T, S, *seg_args)
    out = out[:, :T].reshape(B, H, T, D).transpose(0, 2, 1, 3)
    return out
