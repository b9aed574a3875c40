"""Pallas TPU ragged (paged) attention over row-contiguous KV buffers.

The serving-engine attention kernel — the TPU-native answer to the
reference's Triton decode/extend kernels
(src/sglang/python/sglang/srt/layers/triton_attention/decode_attention.py:
1-649, extend_attention.py) and the FlashInfer backend
(srt/layers/radix_attention.py:62-76).

Design (TPU-first, not a Triton translation):
  * KV lives in HEAD-MAJOR row-contiguous buffers [B, Hkv, S, hd]: each
    request owns one row; a (row, head) slab [S, hd] is a contiguous HBM
    stripe, so the kernel streams KV at full HBM bandwidth — no
    token-granular gather (the round-1 XLA-gather path read the same
    bytes through a scatter/gather unit at ~half speed).
  * ONE kernel covers both serving modes: EXTEND (T new tokens appended
    at q_offset, e.g. batched prefill / chunked prefill) and DECODE
    (T=1). Queries are reshaped to [B, Hkv, G*T, hd] so GQA groups ride
    the same MXU dot as the token axis, with no jnp.repeat of K/V.
  * Per-row raggedness via scalar prefetch: kv_lens[b] clamps the chunk
    index map, so a row at length 130 reads ceil(130/chunk) chunks of its
    KV stripe, not the full S — the "read only what exists" property of
    paged attention. Skipped chunks re-map to the row's last valid chunk
    (Pallas elides the re-fetch of an unchanged block) and their compute
    is predicated away with pl.when.
  * fp32 online softmax (flash-style m/l/acc in VMEM scratch); logits
    never touch HBM.

Batch rows are addressed indirectly through row_ids, so a kernel call can
serve any subset of engine rows (batched prefill admits K requests and
extends them in one call, tp_worker.py:411-570 parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -2.3819763e38
DEFAULT_CHUNK = 512


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(lens_ref, offs_ref, rows_ref, win_ref, q_ref, k_ref, v_ref,
            *rest, scale, chunk, t_q, qr, quant, windowed):
    if quant:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
    i = pl.program_id(0)          # batch lane (indexes lens/offs/rows)
    c = pl.program_id(2)          # kv chunk
    nc = pl.num_programs(2)
    ln = lens_ref[i]
    off = offs_ref[i]
    w = win_ref[0]                # sliding window (<=0 disables)

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # windowed: chunks entirely below the earliest query's window start
    # carry no live keys — predicated away (and their fetch is deduped by
    # the index map's clamp)
    lo = jnp.where(windowed & (w > 0), jnp.maximum(off - w + 1, 0), 0)

    @pl.when((c * chunk < ln) & ((c + 1) * chunk > lo))
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)        # [QR, hd]
        k = k_ref[0, 0].astype(jnp.float32)        # [chunk, hd]
        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant:
            # per-key dequant applied on the LOGITS, where the key axis
            # is the LANE dim and the scales load as a lane-major [1,
            # chunk] vector — a [chunk, 1] sublane-vector broadcast cost
            # +0.39 ms/call in ablation (the relayout, not the DMA)
            s = s * ks_ref[0, 0]
        # query row qr = g * t_q + t → global query position off + t
        qr_ids = jax.lax.broadcasted_iota(jnp.int32, (qr, chunk), 0)
        qpos = off + qr_ids % t_q
        spos = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (qr, chunk), 1)
        mask = (spos <= qpos) & (spos < ln)
        if windowed:
            # Mistral/Gemma2 SWA: key must lie within the last w
            # positions of its query (spos > qpos - w)
            mask &= (w <= 0) | (spos > qpos - w)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_ref[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        p = jnp.where(mask, jnp.exp(s - m_new[:, None]), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
        v = v_ref[0, 0].astype(jnp.float32)
        if quant:  # fold the per-key V scale into p (lane-wise, cheap)
            p = p * vs_ref[0, 0]
        acc_ref[:] = (acc_ref[:] * alpha[:, None]
                      + jax.lax.dot_general(
                          p, v, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32))
        m_ref[:, 0] = m_new

    @pl.when(c == nc - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / l[:, None]).astype(o_ref.dtype)


def ragged_attention(q, k_rows, v_rows, kv_lens, q_offsets, row_ids, *,
                     scale=None, chunk: int = DEFAULT_CHUNK,
                     k_scales=None, v_scales=None, window=None):
    """Causal attention of new tokens against row-contiguous KV.

    q:        [Bk, T, Hq, hd] — new-token queries for Bk batch lanes
    k_rows:   [B, Hkv, S, hd] — per-row KV buffers (new tokens already
    v_rows:                     written at positions offs..offs+T)
    kv_lens:  [Bk] int32 — valid kv length per lane (incl. new tokens);
                          0 for padded lanes (output is then zeros)
    q_offsets:[Bk] int32 — global position of q[:, 0] per lane
    row_ids:  [Bk] int32 — which KV row each lane reads
    k_scales/v_scales: [B, Hkv, S] — per-token dequant scales for int8 KV
              (halves decode HBM traffic; scales add hd/4 overhead)
    window:   sliding-window width (Mistral SWA / Gemma2 local layers):
              int or traced int32 scalar; None/<=0 = full causal. May be
              traced so Gemma2's per-layer window works under lax.scan.
              Chunks wholly below the window are neither fetched nor
              computed.

    Returns [Bk, T, Hq, hd].
    """
    Bk, T, Hq, hd = q.shape
    _, Hkv, S, _ = k_rows.shape
    G = Hq // Hkv
    quant = k_scales is not None
    windowed = window is not None
    win = jnp.asarray(window if windowed else 0,
                      jnp.int32).reshape(1)
    if scale is None:
        scale = hd ** -0.5
    chunk = min(chunk, S)
    assert S % chunk == 0, (S, chunk)

    # [Bk, T, Hq, hd] → [Bk, Hkv, G*T, hd]; fp32 q rows (min tile (8,128))
    qh = q.reshape(Bk, T, Hkv, G, hd).transpose(0, 2, 3, 1, 4)
    qh = qh.reshape(Bk, Hkv, G * T, hd).astype(jnp.float32)
    qr = G * T
    qr_pad = max(8, -(-qr // 8) * 8)
    if qr_pad != qr:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, qr_pad - qr), (0, 0)))

    grid = (Bk, Hkv, S // chunk)
    kv_lens = kv_lens.astype(jnp.int32)
    q_offsets = q_offsets.astype(jnp.int32)
    row_ids = row_ids.astype(jnp.int32)

    def _chunk_clamp(c, i, lens, offs, win_arr):
        # clamp skipped chunks (past the row's length, or below the
        # sliding window) to a fetched one: the block index repeats, so
        # Pallas elides the re-fetch
        last = jnp.maximum(pl.cdiv(lens[i], chunk) - 1, 0)
        c = jnp.minimum(c, last)
        if windowed:
            w = win_arr[0]
            first = jnp.where(
                w > 0, jnp.maximum(offs[i] - w + 1, 0) // chunk, 0)
            c = jnp.maximum(c, jnp.minimum(first, last))
        return c

    def kv_map(i, h, c, lens, offs, rows, win_arr):
        return (rows[i], h, _chunk_clamp(c, i, lens, offs, win_arr), 0)

    def scale_map(i, h, c, lens, offs, rows, win_arr):
        return (rows[i], h, 0, _chunk_clamp(c, i, lens, offs, win_arr))

    in_specs = [
        pl.BlockSpec((1, 1, qr_pad, hd),
                     lambda i, h, c, lens, offs, rows, win_arr:
                         (i, h, 0, 0)),
        pl.BlockSpec((1, 1, chunk, hd), kv_map),
        pl.BlockSpec((1, 1, chunk, hd), kv_map),
    ]
    operands = [qh, k_rows, v_rows]
    if quant:
        # scales ride LANE-major as [B, Hkv, 1, S] with (1, 1, 1, chunk)
        # blocks: the kernel consumes them along the logits' key (lane)
        # axis, so no sublane-vector relayout happens
        in_specs += [pl.BlockSpec((1, 1, 1, chunk), scale_map),
                     pl.BlockSpec((1, 1, 1, chunk), scale_map)]
        operands += [k_scales.astype(jnp.float32)[:, :, None, :],
                     v_scales.astype(jnp.float32)[:, :, None, :]]

    out = pl.pallas_call(
        functools.partial(_kernel, scale=float(scale), chunk=chunk,
                          t_q=T, qr=qr_pad, quant=quant,
                          windowed=windowed),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, qr_pad, hd),
                lambda i, h, c, lens, offs, rows, win_arr: (i, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((qr_pad, hd), jnp.float32),
                pltpu.VMEM((qr_pad, 1), jnp.float32),
                pltpu.VMEM((qr_pad, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Bk, Hkv, qr_pad, hd), q.dtype),
        interpret=_interpret(),
    )(kv_lens, q_offsets, row_ids, win, *operands)

    out = out[:, :, :qr]                          # drop query-row padding
    out = out.reshape(Bk, Hkv, G, T, hd).transpose(0, 3, 1, 2, 4)
    return out.reshape(Bk, T, Hq, hd)


def ragged_attention_reference(q, k_rows, v_rows, kv_lens, q_offsets,
                               row_ids, *, scale=None, window=None):
    """Pure-XLA oracle for tests (same contract as ragged_attention)."""
    Bk, T, Hq, hd = q.shape
    _, Hkv, S, _ = k_rows.shape
    if scale is None:
        scale = hd ** -0.5
    k = jnp.take(k_rows, row_ids, axis=0)          # [Bk, Hkv, S, hd]
    v = jnp.take(v_rows, row_ids, axis=0)
    if Hkv != Hq:
        rep = Hq // Hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    logits = jnp.einsum("bthd,bhsd->bhts", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    qpos = q_offsets[:, None] + jnp.arange(T)[None, :]        # [Bk, T]
    spos = jnp.arange(S)
    mask = (spos[None, None, None, :] <= qpos[:, None, :, None]) & \
        (spos[None, None, None, :] < kv_lens[:, None, None, None])
    if window is not None and window > 0:
        mask &= (spos[None, None, None, :]
                 > qpos[:, None, :, None] - window)
    logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(mask, probs, 0.0)
    out = jnp.einsum("bhts,bhsd->bthd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)
