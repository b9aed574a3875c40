"""Pallas TPU ragged (paged) attention over row-contiguous KV buffers.

The serving-engine attention kernel — the TPU-native answer to the
reference's Triton decode/extend kernels
(src/sglang/python/sglang/srt/layers/triton_attention/decode_attention.py:
1-649, extend_attention.py) and the FlashInfer backend
(srt/layers/radix_attention.py:62-76).

Design (TPU-first, not a Triton translation):
  * KV lives in HEAD-MAJOR row-contiguous buffers [L, B, Hkv, S, hd]:
    each request owns one row per layer; a (layer, row, head) slab
    [S, hd] is a contiguous HBM stripe, so the kernel streams KV at full
    HBM bandwidth — no token-granular gather (the round-1 XLA-gather path
    read the same bytes through a scatter/gather unit at ~half speed).
  * The LAYER is selected by a scalar-prefetch index instead of slicing
    the buffer outside: the engine threads the full [L, ...] buffer
    through `lax.scan` as a CARRY (in-place under donation) and each
    layer's kernel call reads its stripe directly. Slicing a carry to
    [B, Hkv, S, hd] per layer would materialize a full copy of the
    slice per step (round-2's donation-failure regression: scan xs→ys
    threading allocated two full-size AllocateBuffer temps and every
    decode step copied the whole KV).
  * ONE kernel covers both serving modes: EXTEND (T new tokens appended
    at q_offset, e.g. batched prefill / chunked prefill) and DECODE
    (T=1). Queries are reshaped to [B, Hkv, G*T, hd] so GQA groups ride
    the same MXU dot as the token axis, with no jnp.repeat of K/V.
  * HEAD-BLOCKING: each grid program covers `hb` KV heads (batched dots
    over the head axis), so per-program overhead is amortized over
    hb×chunk×hd-sized DMAs — decode at small chunks is grid-overhead-
    bound otherwise (measured b8/ctx1k chunk=256: 26% of HBM
    speed-of-light per-head, >70% with hb=8).
  * Per-row raggedness via scalar prefetch: kv_lens[b] clamps the chunk
    index map, so a row at length 130 reads ceil(130/chunk) chunks of its
    KV stripe, not the full S — the "read only what exists" property of
    paged attention. Skipped chunks re-map to the row's last valid chunk
    (Pallas elides the re-fetch of an unchanged block) and their compute
    is predicated away with pl.when. Sliding windows additionally skip
    chunks wholly below the earliest query's window.
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
# nibble-packed int4 KV: one int8 byte holds TWO tokens of the same
# 256-token segment — token seg*256+j in the low nibble and
# seg*256+j+128 in the high nibble (j < 128), i.e. packed row
# seg*128+j. The pairing is confined to the kernel's own chunk so a
# packed block splits into two half-chunk PLANES that reuse the
# existing per-chunk compute verbatim (two online-softmax merges per
# grid cell); every in-kernel op stays >=128-lane tile-aligned (int32
# shifts + aligned value slices only — the ops the Mosaic feature
# matrix probes proved safe; int8 shifts and sub-128 lane slicing are
# deliberately avoided).
PACK_SEG = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _unpack_planes(x):
    """int8 packed nibbles → (lo, hi) sign-extended int32 planes.
    Accepts int8 or int32 input; masks to the low byte first so the
    shift trick is correct for both."""
    byte = jnp.bitwise_and(x.astype(jnp.int32), 0xFF)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(byte, 28), 28)
    hi = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(byte, 24), 28)
    return lo, hi


def _kernel(lens_ref, offs_ref, rows_ref, win_ref, layer_ref,
            q_ref, k_ref, v_ref, *rest,
            scale, chunk, t_q, qb, hb, quant, windowed, aligned,
            logit_cap=0.0, kv_pack=False):
    if quant:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
    i = pl.program_id(0)          # batch lane (indexes lens/offs/rows)
    b = pl.program_id(2)          # query-row block
    c = pl.program_id(3)          # kv chunk
    nc = pl.num_programs(3)
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
    # causal upper bound: the LAST query position in this row block
    # (query row g*t_q + t sits at global position off + t). When the
    # block tiling is t-aligned (t_q % qb == 0) the block's t range is
    # contiguous; otherwise fall back to the conservative bound.
    qmax = off + ((b * qb) % t_q + qb - 1 if aligned else t_q - 1)

    @pl.when((c * chunk < ln) & ((c + 1) * chunk > lo)
             & (c * chunk <= qmax))
    def _compute():
        # f32 dots only on the fp32 (test/CPU) path; production (bf16/
        # int8 stores) runs bf16 MXU dots with f32 accumulation — the
        # standard flash recipe, ~4x the fp32 MXU rate
        cdt = (jnp.float32 if q_ref.dtype == jnp.float32
               else jnp.bfloat16)
        q = q_ref[0].astype(cdt)                   # [hb, qb, hd]

        def plane(k, v, ks, vs, base, width):
            """One key plane: `width` keys at token positions
            c*chunk+base+[0,width) — the whole chunk when unpacked, a
            half-chunk nibble plane when kv_pack. Sequential calls
            merge through the online-softmax state (m/l/acc)."""
            s = jax.lax.dot_general(q, k,
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32
                                    ) * scale
            if quant:
                # per-key dequant applied on the LOGITS, where the key
                # axis is the LANE dim. Scales block as [hb, chunk]
                # (the buffer's own natural (Hkv, S) tile): a 5-d
                # [hb, 1, chunk] block avoided this sublane broadcast
                # in-kernel but forced a NON-default operand layout
                # outside it — XLA relayout-copied the FULL
                # [L,B,Hkv,S] scale planes every layer of the decode
                # scan (2x33.5MB/layer at 7B, the whole int8-KV decode
                # regression)
                s = s * ks[:, None, :]
            if logit_cap > 0.0:  # Gemma2 attention softcapping
                s = logit_cap * jnp.tanh(s / logit_cap)
            # head-independent [qb, width] mask (broadcast over hb) —
            # the [hb, qr, chunk] iotas of the untiled kernel were what
            # blew the 16MB scoped-vmem limit at T=1024
            qr_ids = jax.lax.broadcasted_iota(jnp.int32, (qb, width), 0)
            qpos = off + (b * qb + qr_ids) % t_q
            spos = c * chunk + base + jax.lax.broadcasted_iota(
                jnp.int32, (qb, width), 1)
            mask = (spos <= qpos) & (spos < ln)
            if windowed:
                # Mistral/Gemma2 SWA: key must lie within the last w
                # positions of its query (spos > qpos - w)
                mask &= (w <= 0) | (spos > qpos - w)
            s = jnp.where(mask[None], s, _NEG_INF)

            m_prev = m_ref[:, :, 0]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=2))
            p = jnp.where(mask[None], jnp.exp(s - m_new[:, :, None]),
                          0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:, :, 0] = (l_ref[:, :, 0] * alpha
                              + jnp.sum(p, axis=2))
            if quant:  # fold the per-key V scale into p (lane-wise)
                p = p * vs[:, None, :]
            acc_ref[:] = (acc_ref[:] * alpha[:, :, None]
                          + jax.lax.dot_general(
                              p.astype(cdt), v,
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32))
            m_ref[:, :, 0] = m_new

        if kv_pack:
            # nibble-packed int4: the [hb, chunk/2, hd] packed block
            # splits into lo/hi half-chunk planes (see PACK_SEG)
            half = chunk // 2
            klo, khi = _unpack_planes(k_ref[0, 0])
            vlo, vhi = _unpack_planes(v_ref[0, 0])
            ks = ks_ref[0, 0]
            vs = vs_ref[0, 0]
            plane(klo.astype(cdt), vlo.astype(cdt),
                  ks[:, :half], vs[:, :half], 0, half)
            plane(khi.astype(cdt), vhi.astype(cdt),
                  ks[:, half:], vs[:, half:], half, half)
        else:
            plane(k_ref[0, 0].astype(cdt), v_ref[0, 0].astype(cdt),
                  ks_ref[0, 0] if quant else None,
                  vs_ref[0, 0] if quant else None, 0, chunk)

    @pl.when(c == nc - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :, 0], 1e-30)
        o_ref[0] = (acc_ref[:] / l[:, :, None]).astype(o_ref.dtype)


def pack_int4_rows(q4):
    """Token-space int8 grid values [..., S, hd] (each in [-7, 7]) →
    nibble-packed rows [..., S/2, hd] with the PACK_SEG pairing (token
    seg*256+j low nibble, seg*256+j+128 high). XLA-side helper for the
    engine's extend/prefix write paths and test oracles; the kernels'
    in-VMEM twin is _unpack_planes."""
    *lead, S, hd = q4.shape
    assert S % PACK_SEG == 0, (S,)
    half = PACK_SEG // 2
    x = q4.reshape(*lead, S // PACK_SEG, 2, half, hd)
    lo = x[..., 0, :, :].astype(jnp.int32)
    hi = x[..., 1, :, :].astype(jnp.int32)
    b = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                       jnp.bitwise_and(jnp.left_shift(hi, 4), 0xF0))
    return b.astype(jnp.int8).reshape(*lead, S // 2, hd)


def unpack_int4_rows(pk):
    """Inverse of pack_int4_rows: [..., S/2, hd] → [..., S, hd] int8."""
    *lead, S2, hd = pk.shape
    half = PACK_SEG // 2
    assert S2 % half == 0, (S2,)
    nseg = S2 // half
    b = jnp.bitwise_and(pk.astype(jnp.int32), 0xFF)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(b, 28), 28).reshape(*lead, nseg, half, hd)
    hi = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(b, 24), 28).reshape(*lead, nseg, half, hd)
    out = jnp.concatenate([lo, hi], axis=-2)    # [..., nseg, 256, hd]
    return out.reshape(*lead, 2 * S2, hd).astype(jnp.int8)


def _pick_hb(Hkv: int, want: int) -> int:
    """Largest head-block ≤ want that divides Hkv and is Mosaic-legal:
    a PARTIAL block on a sublane-adjacent axis must be 8-aligned (the
    k_new [1, hb, hd] block), while a FULL block (hb == Hkv) may be any
    size. NOTE: head counts with no 8-aligned divisor (e.g. 36) always
    escalate to the FULL block — callers must re-budget (shrink the KV
    chunk via _fit_chunk) when that overshoots their VMEM target."""
    hb = min(want, Hkv)
    while Hkv % hb:
        hb -= 1
    if hb != Hkv and hb % 8:
        hb = Hkv if Hkv <= want * 2 else 8 if Hkv % 8 == 0 else Hkv
    return hb


def _fit_chunk(Hkv: int, hd: int, kvb: int, chunk: int, S: int,
               head_block: int, extra_per_head: int = 0, qb: int = 0):
    """(hb, chunk) whose double-buffered KV blocks fit scoped VMEM.

    When Hkv has no 8-aligned divisor, _pick_hb escalates to the full
    head block; honoring the budget then requires SHRINKING the KV
    chunk, not silently compiling an oversized kernel (Hkv=36 at
    chunk=512 bf16 ≈ 19.6MB vs the 16MB scoped-VMEM limit — a latent
    TPU compile failure the CPU interpret tests never see).

    extra_per_head: chunk-independent per-head bytes beyond the KV
    blocks — the EXTEND kernel's fp32 acc scratch and double-buffered
    q/out blocks all scale with hb (≈ qb*hd*12 bytes/head); decode's
    qr_pad blocks are small enough to live in the slack.

    qb: the query-row block size. Mosaic stack-allocates the kernel's
    COMPUTE INTERMEDIATES — the f32 logits `s` and probs `p`, each
    [hb, qb, chunk] — in scoped VMEM alongside the pipeline blocks, so
    they must be budgeted too (≈ 8*qb*chunk bytes/head). Omitting them
    let the int8 EXTEND path pick hb=16 (its KV blocks are half the
    bf16 size) and blow the 16MB limit by 6MB at T=1024: the kernel
    failed to COMPILE on TPU while every CPU interpret test passed,
    and the engine's poison-request isolation converted the
    deterministic failure into silent per-request compile thrash —
    int8-KV serving produced zero tokens (round-4 driver bench)."""
    while True:
        per_head = (8 * chunk * hd * kvb + 32 * chunk + (1 << 14)
                    + extra_per_head + 8 * qb * chunk)
        want = max(head_block, min(Hkv, (11 << 20) // per_head))
        hb = _pick_hb(Hkv, want)
        if hb * per_head <= (13 << 20) or chunk <= 128 or chunk % 2 \
                or S % (chunk // 2):
            return hb, chunk
        chunk //= 2


def ragged_attention(q, k_rows, v_rows, kv_lens, q_offsets, row_ids, *,
                     scale=None, chunk: int = DEFAULT_CHUNK,
                     k_scales=None, v_scales=None, window=None,
                     layer=None, head_block: int = 8,
                     logit_cap: float = 0.0, kv_pack: bool = False):
    """Causal attention of new tokens against row-contiguous KV.

    q:        [Bk, T, Hq, hd] — new-token queries for Bk batch lanes
    k_rows:   [B, Hkv, S, hd] or [L, B, Hkv, S, hd] — per-row KV buffers
    v_rows:     (new tokens already written at positions offs..offs+T);
                the 5-D layout selects the layer via `layer` (traced OK),
                letting callers thread the full multi-layer buffer
                through lax.scan as an in-place carry
    kv_lens:  [Bk] int32 — valid kv length per lane (incl. new tokens);
                          0 for padded lanes (output is then zeros)
    q_offsets:[Bk] int32 — global position of q[:, 0] per lane
    row_ids:  [Bk] int32 — which KV row each lane reads
    k_scales/v_scales: [(L,) B, Hkv, S] — per-token dequant scales for
              int8 KV (halves decode HBM traffic; scales add hd/4
              overhead)
    window:   sliding-window width (Mistral SWA / Gemma2 local layers):
              int or traced int32 scalar; None/<=0 = full causal. May be
              traced so Gemma2's per-layer window works under lax.scan.
              Chunks wholly below the window are neither fetched nor
              computed.
    layer:    layer index into 5-D buffers (int or traced int32 scalar);
              required iff k_rows is 5-D
    head_block: KV heads per grid program (clipped to a divisor of Hkv)

    Returns [Bk, T, Hq, hd].
    """
    if k_rows.ndim == 4:
        assert layer is None
        k_rows = k_rows[None]
        v_rows = v_rows[None]
        if k_scales is not None:
            k_scales = k_scales[None]
            v_scales = v_scales[None]
        layer = 0
    else:
        assert layer is not None
    Bk, T, Hq, hd = q.shape
    _, _, Hkv, S, _ = k_rows.shape
    G = Hq // Hkv
    quant = k_scales is not None
    windowed = window is not None
    win = jnp.asarray(window if windowed else 0, jnp.int32).reshape(1)
    lay = jnp.asarray(layer, jnp.int32).reshape(1)
    if scale is None:
        scale = hd ** -0.5
    if kv_pack:
        # nibble-packed int4 rows: the buffer's S axis holds S/2 packed
        # rows (PACK_SEG pairing); kernel positions stay in TOKEN space.
        # chunk pins to PACK_SEG so a block is exactly one segment.
        assert quant, "packed int4 KV requires per-token scales"
        S = 2 * S
        chunk = PACK_SEG
        assert S % chunk == 0, (S, chunk)
    else:
        chunk = min(chunk, S)
        assert S % chunk == 0, (S, chunk)
    qr = G * T
    # 2D flash tiling: query-row blocks of qb rows bound the kernel's
    # working set (the untiled kernel at T=1024 requested 21MB of
    # scoped vmem against the 16MB limit) AND let causal upper-triangle
    # (block, chunk) pairs be skipped entirely — ~2x less compute on
    # long extends. aligned (T % qb == 0) makes each block's t-range
    # contiguous so the causal skip bound is tight.
    import os as _os
    # bf16 q rows (min tile (16,128)) on the production path; fp32 only
    # when the caller computes in fp32 (CPU tests)
    qdt = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
    align = 8 if qdt == jnp.float32 else 16
    qb = int(_os.environ.get("AURORA_EXTEND_QB", "256"))
    if qr <= qb:
        qb = max(align, -(-qr // align) * align)
    # head counts with no 8-aligned divisor (36, 20, …) escalate to the
    # FULL head block — shrink the KV chunk (and, if the chunk bottoms
    # out, the query block) to keep the cell inside scoped VMEM.
    # extend's acc scratch + q/out blocks also scale with hb (≈ qb*hd*
    # 12 B/head: fp32 acc + double-buffered bf16 q and out)
    kvb = 1 if quant else k_rows.dtype.itemsize
    while True:
        hb, chunk = _fit_chunk(Hkv, hd, kvb, chunk, S, head_block,
                               extra_per_head=qb * hd * 12, qb=qb)
        cell = hb * (8 * chunk * hd * kvb + 32 * chunk + (1 << 14)
                     + qb * hd * 12 + 8 * qb * chunk)
        if cell <= (13 << 20) or qb <= 2 * align:
            break
        qb = max(align, -(-(qb // 2) // align) * align)
    aligned = T % qb == 0
    qr_pad = -(-qr // qb) * qb
    if kv_pack:
        assert chunk == PACK_SEG, \
            (chunk, "packed int4 KV needs chunk 256 (VMEM shrank it)")
    if _os.environ.get("AURORA_KERNEL_DEBUG"):
        import sys as _sys
        print(f"[ragged] extend hb={hb} qb={qb} qr_pad={qr_pad} "
              f"chunk={chunk} quant={quant} pack={kv_pack} "
              f"aligned={aligned}", file=_sys.stderr)

    # [Bk, T, Hq, hd] → [Bk, Hkv, G*T, hd]
    qh = q.reshape(Bk, T, Hkv, G, hd).transpose(0, 2, 3, 1, 4)
    qh = qh.reshape(Bk, Hkv, G * T, hd).astype(qdt)
    if qr_pad != qr:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, qr_pad - qr), (0, 0)))

    grid = (Bk, Hkv // hb, qr_pad // qb, S // chunk)
    kv_lens = kv_lens.astype(jnp.int32)
    q_offsets = q_offsets.astype(jnp.int32)
    row_ids = row_ids.astype(jnp.int32)

    def _chunk_clamp(c, i, b, lens, offs, win_arr):
        # clamp skipped chunks (past the row's length, above the query
        # block's causal bound, or below the sliding window) to a
        # fetched one: the block index repeats, so Pallas elides the
        # re-fetch
        last = jnp.maximum(pl.cdiv(lens[i], chunk) - 1, 0)
        qmax = offs[i] + ((b * qb) % T + qb - 1 if aligned else T - 1)
        c = jnp.minimum(jnp.minimum(c, last),
                        jnp.maximum(qmax // chunk, 0))
        if windowed:
            w = win_arr[0]
            first = jnp.where(
                w > 0, jnp.maximum(offs[i] - w + 1, 0) // chunk, 0)
            c = jnp.maximum(c, jnp.minimum(first, last))
        return c

    def kv_map(i, g, b, c, lens, offs, rows, win_arr, lay_arr):
        return (lay_arr[0], rows[i], g,
                _chunk_clamp(c, i, b, lens, offs, win_arr), 0)

    def scale_map(i, g, b, c, lens, offs, rows, win_arr, lay_arr):
        return (lay_arr[0], rows[i], g,
                _chunk_clamp(c, i, b, lens, offs, win_arr))

    def q_map(i, g, b, c, lens, offs, rows, win_arr, lay_arr):
        return (i, g, b, 0)

    kc = chunk // 2 if kv_pack else chunk   # packed rows per block
    in_specs = [
        pl.BlockSpec((1, hb, qb, hd), q_map),
        pl.BlockSpec((1, 1, hb, kc, hd), kv_map),
        pl.BlockSpec((1, 1, hb, kc, hd), kv_map),
    ]
    operands = [qh, k_rows, v_rows]
    if quant:
        # scales block 4-d as (1, 1, hb, chunk) over the buffer's own
        # [L, B, Hkv, S] shape — the natural (Hkv, S) tile, so the
        # pallas operand needs NO layout change. The earlier 5-d
        # [L, B, Hkv, 1, S] lane-major trick made a (1, chunk) block
        # broadcast for free in-kernel but pushed a full-plane relayout
        # copy OUTSIDE the kernel on every layer of the decode scan
        # (Mosaic wants default layouts; a default-layout 5-d buffer
        # pads the singleton sublane dim 8x), which dominated the int8
        # decode step (TPU HLO census, probe6 round 4).
        in_specs += [pl.BlockSpec((1, 1, hb, chunk), scale_map),
                     pl.BlockSpec((1, 1, hb, chunk), scale_map)]
        operands += [k_scales.astype(jnp.float32),
                     v_scales.astype(jnp.float32)]

    out = pl.pallas_call(
        functools.partial(_kernel, scale=float(scale), chunk=chunk,
                          t_q=T, qb=qb, hb=hb, quant=quant,
                          windowed=windowed, aligned=aligned,
                          logit_cap=float(logit_cap), kv_pack=kv_pack),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hb, qb, hd), q_map),
            scratch_shapes=[
                pltpu.VMEM((hb, qb, hd), jnp.float32),
                pltpu.VMEM((hb, qb, 1), jnp.float32),
                pltpu.VMEM((hb, qb, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Bk, Hkv, qr_pad, hd), q.dtype),
        interpret=_interpret(),
    )(kv_lens, q_offsets, row_ids, win, lay, *operands)

    out = out[:, :, :qr]                          # drop query-row padding
    out = out.reshape(Bk, Hkv, G, T, hd).transpose(0, 3, 1, 2, 4)
    return out.reshape(Bk, T, Hq, hd)


def _decode_kernel(lens_ref, offs_ref, rows_ref, win_ref, layer_ref,
                   q_ref, k_ref, v_ref, *rest,
                   scale, chunk, qr, hb, quant, windowed,
                   logit_cap=0.0, kv_maxq=127.0, kv_pack=False):
    if quant:
        (ks_ref, vs_ref, kn_ref, vn_ref,
         o_ref, ok_ref, ov_ref, oks_ref, ovs_ref,
         acc_ref, m_ref, l_ref) = rest
    else:
        (kn_ref, vn_ref, o_ref, ok_ref, ov_ref,
         acc_ref, m_ref, l_ref) = rest
    i = pl.program_id(0)
    c = pl.program_id(2)
    nc = pl.num_programs(2)
    ln = lens_ref[i]
    off = ln - 1                  # write/query position (T == 1)
    w = win_ref[0]
    last_c = jnp.maximum(pl.cdiv(ln, chunk) - 1, 0)

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    def new_quantized():
        """Quantize the new token in-kernel (the extend path's
        _kv_quantize twin). Returns int32 grid values + scales."""
        knf = kn_ref[0].astype(jnp.float32)             # [hb, hd]
        vnf = vn_ref[0].astype(jnp.float32)
        s_k = jnp.maximum(jnp.max(jnp.abs(knf), axis=-1),
                          1e-8) / kv_maxq               # [hb]
        s_v = jnp.maximum(jnp.max(jnp.abs(vnf), axis=-1),
                          1e-8) / kv_maxq
        k8 = jnp.clip(jnp.round(knf / s_k[:, None]), -kv_maxq, kv_maxq)
        v8 = jnp.clip(jnp.round(vnf / s_v[:, None]), -kv_maxq, kv_maxq)
        return k8, v8, s_k, s_v

    def merged_scales(s_k, s_v):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        sel_l = c * chunk + lane == off                 # [1, chunk]
        ks_m = jnp.where(sel_l, s_k[:, None], ks_ref[0, 0])
        vs_m = jnp.where(sel_l, s_v[:, None], vs_ref[0, 0])
        return ks_m, vs_m

    def merged_packed():
        """Packed block (int32 byte form, low 8 bits live) with the new
        token's NIBBLE merged at its (byte row, plane); the mate nibble
        is preserved. Identity when this block doesn't contain off."""
        half = chunk // 2
        joff = off % chunk
        in_c = c == off // chunk
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, half, 1), 1)
        sel = in_c & (sub == joff % half)               # byte row
        is_hi = joff >= half
        k8, v8, s_k, s_v = new_quantized()

        def merge(buf_ref, q8):
            b8 = jnp.bitwise_and(buf_ref[0, 0].astype(jnp.int32), 0xFF)
            nib = jnp.bitwise_and(q8.astype(jnp.int32), 0xF)[:, None, :]
            lo_case = jnp.bitwise_or(jnp.bitwise_and(b8, 0xF0), nib)
            hi_case = jnp.bitwise_or(jnp.bitwise_and(b8, 0x0F),
                                     jax.lax.shift_left(nib, 4))
            return jnp.where(sel, jnp.where(is_hi, hi_case, lo_case),
                             b8)

        pk_m = merge(k_ref, k8)
        pv_m = merge(v_ref, v8)
        ks_m, vs_m = merged_scales(s_k, s_v)
        return pk_m, pv_m, ks_m, vs_m

    def merged():
        """Current chunk's K/V (+scales) with the new token merged in.
        Identity for chunks that don't contain `off` (mask empty)."""
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, chunk, 1), 1)
        sel = c * chunk + sub == off                    # [1, chunk, 1]
        k_in, v_in = k_ref[0, 0], v_ref[0, 0]           # [hb, chunk, hd]
        if quant:
            k8, v8, s_k, s_v = new_quantized()
            k_m = jnp.where(sel, k8.astype(jnp.int8)[:, None, :], k_in)
            v_m = jnp.where(sel, v8.astype(jnp.int8)[:, None, :], v_in)
            ks_m, vs_m = merged_scales(s_k, s_v)
            return k_m, v_m, ks_m, vs_m                 # scales [hb, chunk]
        k_m = jnp.where(sel, kn_ref[0].astype(k_in.dtype)[:, None, :],
                        k_in)
        v_m = jnp.where(sel, vn_ref[0].astype(v_in.dtype)[:, None, :],
                        v_in)
        return k_m, v_m, None, None

    lo = jnp.where(windowed & (w > 0), jnp.maximum(off - w + 1, 0), 0)

    @pl.when((c * chunk < ln) & ((c + 1) * chunk > lo))
    def _compute():
        # bf16 MXU dots with f32 accumulation on the production path —
        # the same recipe as the extend kernel (int8 values ≤127 are
        # EXACT in bf16; the f32 dots this kernel originally ran cost a
        # 4-byte VPU convert per streamed KV byte and were the whole
        # 546-vs-785GB/s gap to the extend kernel). fp32 only when the
        # caller computes in fp32 (CPU tests).
        cdt = (jnp.float32 if q_ref.dtype == jnp.float32
               else jnp.bfloat16)
        q = q_ref[0].astype(cdt)                        # [hb, QR, hd]

        def plane(k_m, v_m, ks_m, vs_m, base, width):
            """Keys at token positions c*chunk+base+[0,width) — the
            whole chunk when unpacked, a nibble plane when kv_pack."""
            s = jax.lax.dot_general(q, k_m.astype(cdt),
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32
                                    ) * scale
            if quant:
                s = s * ks_m[:, None, :]
            if logit_cap > 0.0:  # Gemma2 attention softcapping
                s = logit_cap * jnp.tanh(s / logit_cap)
            spos = c * chunk + base + jax.lax.broadcasted_iota(
                jnp.int32, (hb, qr, width), 2)
            mask = (spos <= off) & (spos < ln)  # all query rows sit at off
            if windowed:
                mask &= (w <= 0) | (spos > off - w)
            s = jnp.where(mask, s, _NEG_INF)
            m_prev = m_ref[:, :, 0]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=2))
            p = jnp.where(mask, jnp.exp(s - m_new[:, :, None]), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:, :, 0] = l_ref[:, :, 0] * alpha + jnp.sum(p, axis=2)
            if quant:
                p = p * vs_m[:, None, :]
            acc_ref[:] = (acc_ref[:] * alpha[:, :, None]
                          + jax.lax.dot_general(
                              p.astype(cdt), v_m.astype(cdt),
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32))
            m_ref[:, :, 0] = m_new

        if kv_pack:
            half = chunk // 2
            pk_m, pv_m, ks_m, vs_m = merged_packed()
            klo, khi = _unpack_planes(pk_m)
            vlo, vhi = _unpack_planes(pv_m)
            plane(klo.astype(cdt), vlo.astype(cdt),
                  ks_m[:, :half], vs_m[:, :half], 0, half)
            plane(khi.astype(cdt), vhi.astype(cdt),
                  ks_m[:, half:], vs_m[:, half:], half, half)
        else:
            k_m, v_m, ks_m, vs_m = merged()
            plane(k_m, v_m, ks_m, vs_m, 0, chunk)

    @pl.when(c == last_c)
    def _writeback():
        # the output blocks alias the KV rows at the write chunk; flush
        # happens once per (lane, head-group) when the block index
        # changes. ln == 0 lanes write their chunk 0 back unmodified.
        if kv_pack:
            pk_m, pv_m, ks_m, vs_m = merged_packed()
            ok_ref[0, 0] = pk_m.astype(jnp.int8)
            ov_ref[0, 0] = pv_m.astype(jnp.int8)
            oks_ref[0, 0] = ks_m
            ovs_ref[0, 0] = vs_m
        else:
            k_m, v_m, ks_m, vs_m = merged()
            ok_ref[0, 0] = k_m
            ov_ref[0, 0] = v_m
            if quant:
                oks_ref[0, 0] = ks_m
                ovs_ref[0, 0] = vs_m

    @pl.when(c == nc - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :, 0], 1e-30)
        o_ref[0] = (acc_ref[:] / l[:, :, None]).astype(o_ref.dtype)


def ragged_decode_attention(q, k_new, v_new, k_rows, v_rows, kv_lens,
                            row_ids, *, layer, scale=None,
                            chunk: int = DEFAULT_CHUNK,
                            k_scales=None, v_scales=None, window=None,
                            head_block: int = 8, logit_cap: float = 0.0,
                            kv_maxq: float = 127.0,
                            kv_pack: bool = False):
    """Fused DECODE step: write each lane's new K/V token into its row
    (quantizing to int8 in-kernel when scales are given) AND attend over
    the row — one kernel, no XLA scatter/DUS, KV buffers updated in place
    via input_output_aliases.

    The XLA write paths measured 0.3-0.7 ms/layer on TPU regardless of
    payload (advanced-index scatter AND per-lane DUS chains); at 32
    layers that dominated the decode step. Here the write rides the
    block that attention already fetched.

    q:          [B, 1, Hq, hd] — current-token queries
    k_new/v_new:[B, Hkv, hd]   — current-token K (post-RoPE) / V
    k_rows/...: [L, B, Hkv, S, hd] (+[L, B, Hkv, S] scales when int8)
    kv_lens:    [B] int32 — row length INCLUDING the new token (write
                position = kv_lens-1); 0 = inactive lane (no write)
    row_ids:    [B] int32 — must be distinct per lane (each lane owns
                its row; decode always passes arange)

    Returns (attn [B, 1, Hq, hd], k_rows', v_rows'[, k_scales',
    v_scales']).
    """
    B, T, Hq, hd = q.shape
    assert T == 1
    L, _, Hkv, S, _ = k_rows.shape
    G = Hq // Hkv
    quant = k_scales is not None
    windowed = window is not None
    win = jnp.asarray(window if windowed else 0, jnp.int32).reshape(1)
    lay = jnp.asarray(layer, jnp.int32).reshape(1)
    if scale is None:
        scale = hd ** -0.5
    if kv_pack:
        # nibble-packed int4 rows: S axis holds S/2 packed rows
        # (PACK_SEG pairing); positions stay in TOKEN space
        assert quant, "packed int4 KV requires per-token scales"
        S = 2 * S
        chunk = PACK_SEG
        assert S % chunk == 0, (S, chunk)
    else:
        chunk = min(chunk, S)
        assert S % chunk == 0, (S, chunk)
    # vmem-aware head block: the decode step is dominated by grid-cell
    # overhead, not DMA (per-layer call ~0.44ms at b8/ctx1k while the KV
    # bytes are ~0.1ms) — fewer, fatter cells are strictly better as
    # long as the double-buffered in+out (aliased) KV blocks fit scoped
    # vmem. int8 KV at chunk=256 fits all 32 heads in ONE block.
    kvb = 1 if quant else k_rows.dtype.itemsize
    qr = G
    qr_pad = max(8, -(-qr // 8) * 8)
    hb, chunk = _fit_chunk(Hkv, hd, kvb, chunk, S, head_block,
                           qb=qr_pad)
    if kv_pack:
        assert chunk == PACK_SEG, \
            (chunk, "packed int4 KV needs chunk 256 (VMEM shrank it)")
    import os as _os
    if _os.environ.get("AURORA_KERNEL_DEBUG"):
        import sys as _sys
        print(f"[ragged] decode hb={hb} chunk={chunk} "
              f"quant={quant} pack={kv_pack}", file=_sys.stderr)

    # bf16 q on the production path (the kernel computes bf16 MXU dots
    # with f32 accumulation, like extend); fp32 only when the caller
    # computes in fp32 (CPU tests)
    qdt = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
    qh = q.reshape(B, Hkv, G, hd).astype(qdt)
    if qr_pad != qr:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, qr_pad - qr), (0, 0)))

    grid = (B, Hkv // hb, S // chunk)
    kv_lens = kv_lens.astype(jnp.int32)
    offs = jnp.maximum(kv_lens - 1, 0)
    row_ids = row_ids.astype(jnp.int32)

    def _last(i, lens):
        return jnp.maximum(pl.cdiv(lens[i], chunk) - 1, 0)

    def kv_map(i, g, c, lens, offs_, rows, win_arr, lay_arr):
        c = jnp.minimum(c, _last(i, lens))
        if windowed:
            w = win_arr[0]
            first = jnp.where(
                w > 0, jnp.maximum(offs_[i] - w + 1, 0) // chunk, 0)
            c = jnp.maximum(c, jnp.minimum(first, _last(i, lens)))
        return (lay_arr[0], rows[i], g, c, 0)

    def scale_map(i, g, c, lens, offs_, rows, win_arr, lay_arr):
        idx = kv_map(i, g, c, lens, offs_, rows, win_arr, lay_arr)
        return (idx[0], idx[1], idx[2], idx[3])

    def wc_map(i, g, c, lens, offs_, rows, win_arr, lay_arr):
        return (lay_arr[0], rows[i], g, _last(i, lens), 0)

    def wcs_map(i, g, c, lens, offs_, rows, win_arr, lay_arr):
        return (lay_arr[0], rows[i], g, _last(i, lens))

    def q_map(i, g, c, lens, offs_, rows, win_arr, lay_arr):
        return (i, g, 0, 0)

    def new_map(i, g, c, lens, offs_, rows, win_arr, lay_arr):
        return (i, g, 0)

    kc = chunk // 2 if kv_pack else chunk   # packed rows per block
    in_specs = [
        pl.BlockSpec((1, hb, qr_pad, hd), q_map),
        pl.BlockSpec((1, 1, hb, kc, hd), kv_map),
        pl.BlockSpec((1, 1, hb, kc, hd), kv_map),
    ]
    operands = [qh, k_rows, v_rows]
    out_shapes = [
        jax.ShapeDtypeStruct((B, Hkv, qr_pad, hd), q.dtype),
        jax.ShapeDtypeStruct(k_rows.shape, k_rows.dtype),
        jax.ShapeDtypeStruct(v_rows.shape, v_rows.dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, hb, qr_pad, hd), q_map),
        pl.BlockSpec((1, 1, hb, kc, hd), wc_map),
        pl.BlockSpec((1, 1, hb, kc, hd), wc_map),
    ]
    # flattened operand indices (scalars included): lens=0 offs=1 rows=2
    # win=3 lay=4 q=5 k=6 v=7 [ks=8 vs=9 kn=10 vn=11 | kn=8 vn=9]
    aliases = {6: 1, 7: 2}
    if quant:
        # 4-d scale blocks over the buffer's own [L, B, Hkv, S] shape:
        # the operand keeps its default (Hkv, S)-tiled layout, so the
        # alias holds with ZERO relayout copies around the layer scan
        # (see the extend kernel's quant comment / probe6 HLO census)
        in_specs += [pl.BlockSpec((1, 1, hb, chunk), scale_map),
                     pl.BlockSpec((1, 1, hb, chunk), scale_map)]
        operands += [k_scales.astype(jnp.float32),
                     v_scales.astype(jnp.float32)]
        # sized from the SCALE buffers' own row dim (like k/v above) —
        # q.shape[0] breaks the alias when a decode wave covers a
        # subset of engine rows (Bk != R)
        out_shapes += [
            jax.ShapeDtypeStruct((L, k_scales.shape[1], Hkv, S),
                                 jnp.float32),
            jax.ShapeDtypeStruct((L, v_scales.shape[1], Hkv, S),
                                 jnp.float32)]
        out_specs += [pl.BlockSpec((1, 1, hb, chunk), wcs_map),
                      pl.BlockSpec((1, 1, hb, chunk), wcs_map)]
        aliases.update({8: 3, 9: 4})
    in_specs += [pl.BlockSpec((1, hb, hd), new_map),
                 pl.BlockSpec((1, hb, hd), new_map)]
    operands += [k_new, v_new]

    res = pl.pallas_call(
        functools.partial(_decode_kernel, scale=float(scale),
                          chunk=chunk, qr=qr_pad, hb=hb, quant=quant,
                          windowed=windowed,
                          logit_cap=float(logit_cap),
                          kv_maxq=float(kv_maxq), kv_pack=kv_pack),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((hb, qr_pad, hd), jnp.float32),
                pltpu.VMEM((hb, qr_pad, 1), jnp.float32),
                pltpu.VMEM((hb, qr_pad, 1), jnp.float32),
            ],
        ),
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(kv_lens, offs, row_ids, win, lay, *operands)

    out = res[0][:, :, :qr]
    out = out.reshape(B, Hkv, G, 1, hd).transpose(0, 3, 1, 2, 4)
    out = out.reshape(B, 1, Hq, hd)
    if quant:
        return out, res[1], res[2], res[3], res[4]
    return out, res[1], res[2]


def ragged_attention_reference(q, k_rows, v_rows, kv_lens, q_offsets,
                               row_ids, *, scale=None, window=None,
                               logit_cap: float = 0.0):
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
    if logit_cap > 0.0:
        logits = logit_cap * jnp.tanh(logits / logit_cap)
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
