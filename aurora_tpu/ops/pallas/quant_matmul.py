"""Pallas W8A8 streaming matmul for decode-shaped GEMMs.

Role parity: the weight-stream half of sglang's w8a8 path
(src/sglang/python/sglang/srt/layers/quantization/ — GPU side leans on
CUTLASS int8 GEMMs). On TPU the decode matmul [B≈8-32, K] x [K, N] is
pure HBM-bandwidth: the MXU is idle waiting on the int8 weight stream.
XLA's generic int8 dot measures ~63% of speed-of-light at these shapes
(tools/bench_wdot.py); this kernel hand-pipelines the stream:

  grid (N/bn,) — each program DMAs one [K, bn] int8 weight tile to VMEM
  (double-buffered by the Pallas pipeline), runs the int8xint8->int32 MXU
  dot against the (pre-quantized, VMEM-resident) activations, and scales
  by per-token activation scales x per-output-channel weight scales.

Activations are quantized ONCE per call on the XLA side (per-token
absmax, the same recipe as serve/engine.py:_wdot) — they are tiny
([B, K] int8) next to the weight stream, so fusing that step into the
kernel buys nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s_a_ref, h_ref, w_ref, s_w_ref, out_ref):
    acc = jax.lax.dot_general(
        h_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[...] = (acc.astype(jnp.float32) * s_a_ref[...]
                    * s_w_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "out_dtype",
                                             "interpret"))
def w8a8_matmul(h8: jnp.ndarray, s_a: jnp.ndarray, w8: jnp.ndarray,
                s_w: jnp.ndarray, *, block_n: int = 256,
                out_dtype=jnp.bfloat16, interpret=None):
    """[B, K] int8 x [K, N] int8 -> [B, N] out_dtype.

    s_a: [B, 1] f32 per-token activation scales; s_w: [N] or [1, N] f32
    per-output-channel weight scales. B is padded to the int8 sublane
    tile (32) inside; N % block_n must be 0 (weights ship pre-padded —
    serve/engine.py pads fused streams to 256).
    """
    B, K = h8.shape
    Kw, N = w8.shape
    assert K == Kw and N % block_n == 0, (h8.shape, w8.shape, block_n)
    s_w = s_w.reshape(1, N).astype(jnp.float32)
    Bp = max(32, -(-B // 32) * 32)
    if Bp != B:
        h8 = jnp.pad(h8, ((0, Bp - B), (0, 0)))
        s_a = jnp.pad(s_a, ((0, Bp - B), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((Bp, 1), lambda j: (0, 0)),       # s_a
            pl.BlockSpec((Bp, K), lambda j: (0, 0)),       # h8
            pl.BlockSpec((K, block_n), lambda j: (0, j)),  # w tile
            pl.BlockSpec((1, block_n), lambda j: (0, j)),  # s_w tile
        ],
        out_specs=pl.BlockSpec((Bp, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Bp, N), out_dtype),
        interpret=(jax.default_backend() != "tpu"
                   if interpret is None else interpret),
    )(s_a.astype(jnp.float32), h8, w8, s_w)
    return out[:B]


def _kernel4(h_even_ref, h_odd_ref, pk_ref, s_w_ref, out_ref, *,
             groups: int):
    """One [K/2, bn] packed-int4 weight tile: unpack both nibble planes
    in VMEM, dequantize with the per-(group, out-channel) scales, and
    run two bf16 MXU dots (even input rows hit the low nibble, odd the
    high). HBM traffic for the tile is the PACKED bytes only — the
    unpacked/dequantized planes never leave VMEM (the property the XLA
    path lacks: its unpack materializes int8 planes through HBM)."""
    pk = pk_ref[...]                                     # [K/2, bn] i8
    four = jnp.int8(4)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(pk, four), four)
    hi = jax.lax.shift_right_arithmetic(pk, four)
    k2, bn = lo.shape
    s = s_w_ref[...]                                     # [G, bn] f32
    sw = jnp.broadcast_to(s[:, None, :], (groups, k2 // groups, bn)
                          ).reshape(k2, bn).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        h_even_ref[...], lo.astype(jnp.bfloat16) * sw,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        h_odd_ref[...], hi.astype(jnp.bfloat16) * sw,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "out_dtype",
                                             "interpret"))
def w4a16_matmul(h: jnp.ndarray, pk: jnp.ndarray, s_w: jnp.ndarray, *,
                 block_n: int = 512, out_dtype=jnp.bfloat16,
                 interpret=None):
    """[B, K] bf16 x nibble-packed W4 [G, g/2, N] -> [B, N].

    pk: packed int8, even input row in the low nibble (engine
    quantize_weights_int4 layout); s_w: [G, 1, N] f32 grouped scales.
    Activations stay bf16 (W4A16 — no activation quantization error).
    N % block_n must be 0."""
    B, K = h.shape
    G, gh, N = pk.shape
    assert 2 * G * gh == K and N % block_n == 0, (h.shape, pk.shape)
    h = h.astype(jnp.bfloat16)
    he, ho = h[:, 0::2], h[:, 1::2]
    Bp = max(16, -(-B // 16) * 16)
    if Bp != B:
        he = jnp.pad(he, ((0, Bp - B), (0, 0)))
        ho = jnp.pad(ho, ((0, Bp - B), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel4, groups=G),
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((Bp, K // 2), lambda j: (0, 0)),      # h even
            pl.BlockSpec((Bp, K // 2), lambda j: (0, 0)),      # h odd
            pl.BlockSpec((K // 2, block_n),
                         lambda j: (0, j)),                    # packed
            pl.BlockSpec((G, block_n), lambda j: (0, j)),      # scales
        ],
        out_specs=pl.BlockSpec((Bp, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Bp, N), out_dtype),
        interpret=(jax.default_backend() != "tpu"
                   if interpret is None else interpret),
    )(he, ho, pk.reshape(K // 2, N), s_w.reshape(G, N))
    return out[:B]


def _kernel_w4a8(he_ref, ho_ref, s_a_ref, pk_ref, sw_ref, out_ref,
                 acc_ref, *, gh: int):
    """One [bk, bn] packed-int4 tile, W4A8 grouped:

      lo*16 = pk << 4 ; hi = pk >> 4           (1 VPU shift per plane —
                                                the arithmetic unpack
                                                (pk<<4)>>4 is folded
                                                into the int32 partials
                                                as an exact >>4)
      per-group int8 MXU dots against the even/odd activation rows
      partial[g] = (dot(he_g, lo16_g) >> 4) + dot(ho_g, hi_g)   (int32)
      acc += sum_g partial[g] * s_w[g]                          (f32)

    The group scales apply to PARTIAL SUMS in VMEM — the property the
    XLA path lacks: its [G, N_tok, O] grouped accumulator and unpacked
    nibble planes round-trip HBM (w4_xla measured 233GB/s effective on
    a 3.24GB stream; the W8 dots on the same shapes do 535GB/s)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pk = pk_ref[...]                  # [bk, bn] (flat) or [1, 1, bk, bn]
    bk, bn = pk.shape[-2], pk.shape[-1]
    pk = pk.reshape(bk, bn)
    gk = bk // gh
    # int8 SHIFTS crash this backend's Mosaic compiler (probe round 1:
    # tpu_compile_helper exit 1 on any int8 shift; int8 dots/reshapes/
    # batched dots all fine) — unpack through int32 lanes instead
    pki = pk.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(pki, 28), 28).astype(jnp.int8)
    hi = jax.lax.shift_right_arithmetic(pki, 4).astype(jnp.int8)
    dn = (((2,), (1,)), ((0,), (0,)))
    p_lo = jax.lax.dot_general(he_ref[...], lo.reshape(gk, gh, bn), dn,
                               preferred_element_type=jnp.int32)
    p_hi = jax.lax.dot_general(ho_ref[...], hi.reshape(gk, gh, bn), dn,
                               preferred_element_type=jnp.int32)
    part = p_lo + p_hi
    sw = sw_ref[...].reshape(gk, bn)               # [gk, bn] f32
    acc_ref[...] += jnp.sum(part.astype(jnp.float32) * sw[:, None, :],
                            axis=0)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[...] = (acc_ref[...] * s_a_ref[...]).astype(out_ref.dtype)


def _w4_block_k(G: int, gh: int, block_n: int,
                budget: int = 3 << 20) -> int:
    """Largest gk dividing G with a [gk*gh, block_n] int8 tile under
    `budget` bytes (the packed tile is double-buffered by the pipeline
    and its two unpacked planes live once in VMEM — ~4x the tile)."""
    cap = max(1, budget // (gh * block_n))
    gk = 0
    for d in range(1, G + 1):
        if G % d == 0 and d <= cap:
            gk = d
    return gk * gh


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                             "out_dtype", "interpret"))
def w4a8_matmul(h: jnp.ndarray, pk: jnp.ndarray, s_w: jnp.ndarray, *,
                block_n: int = 512, block_k: int | None = None,
                out_dtype=jnp.bfloat16, interpret=None):
    """[B, K] float x nibble-packed W4 [G, g/2, N] -> [B, N] out_dtype.

    Decode-path W4 matmul: per-token int8 activation quantization (the
    engine _w4dot recipe — same numerics), packed HBM stream, in-VMEM
    unpack + grouped rescale. pk/s_w use the engine quantize_weights_int4
    layout (even input row in the low nibble; s_w [G, 1, N] f32).
    N % block_n must be 0 (the engine pads fused streams to 256)."""
    B, K = h.shape
    G, gh, N = pk.shape
    assert 2 * G * gh == K and N % block_n == 0, (h.shape, pk.shape)
    h8, s_a = quantize_activations(h)
    Bp = max(32, -(-B // 32) * 32)
    if Bp != B:
        h8 = jnp.pad(h8, ((0, Bp - B), (0, 0)))
        s_a = jnp.pad(s_a, ((0, Bp - B), (0, 0)))
    # even/odd input rows, grouped to match the packing: [G, Bp, g/2]
    he = h8[:, 0::2].reshape(Bp, G, gh).transpose(1, 0, 2)
    ho = h8[:, 1::2].reshape(Bp, G, gh).transpose(1, 0, 2)
    bk = block_k if block_k is not None else _w4_block_k(G, gh, block_n)
    assert bk % gh == 0 and (G * gh) % bk == 0, (bk, G, gh)
    gk = bk // gh
    out = pl.pallas_call(
        functools.partial(_kernel_w4a8, gh=gh),
        grid=(N // block_n, (G * gh) // bk),
        in_specs=[
            pl.BlockSpec((gk, Bp, gh), lambda j, k: (k, 0, 0)),   # he
            pl.BlockSpec((gk, Bp, gh), lambda j, k: (k, 0, 0)),   # ho
            pl.BlockSpec((Bp, 1), lambda j, k: (0, 0)),           # s_a
            pl.BlockSpec((bk, block_n), lambda j, k: (k, j)),     # packed
            pl.BlockSpec((gk, block_n), lambda j, k: (k, j)),     # scales
        ],
        out_specs=pl.BlockSpec((Bp, block_n), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Bp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((Bp, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=(jax.default_backend() != "tpu"
                   if interpret is None else interpret),
    )(he, ho, s_a.astype(jnp.float32), pk.reshape(G * gh, N),
      s_w.reshape(G, N).astype(jnp.float32))
    return out[:B]


def w4_tile_layout(pk: jnp.ndarray, s_w: jnp.ndarray, *,
                   block_n: int | None = None, budget: int = 3 << 20):
    """Engine W4 layout ([G, g/2, N] packed + [G, 1, N] scales, optional
    leading layer-stack dim) → the tile-contiguous decode layout:

      pkt [Nb, Kb, bk, bn] int8,  swt [Nb, Gb, gk, bn] f32

    where each (j, k) grid block of the kernel is ONE contiguous HBM
    stripe. The flat layout reads every (bk, bn) block as a strided DMA
    of bn-byte bursts (stride N up to 22016) — TPU-measured 389GB/s on
    the fused 7B decode stream vs ~530GB/s for the same-shape W8 dots;
    pre-tiling once at quantize time converts those into single ~1-3MB
    contiguous reads. Geometry (bn, bk) is a pure function of the
    shapes, recomputed identically by the matmul (shapes self-describe:
    gh = bk // gk, G = Gb*gk, N = Nb*bn)."""
    if pk.ndim == 4:                       # [L, G, g/2, N] layer stack
        L, G, gh, N = pk.shape
        bn = block_n if block_n is not None else (512 if N % 512 == 0
                                                  else 256)
        bk = _w4_block_k(G, gh, bn, budget)
        gk = bk // gh
        K2 = G * gh
        pkt = (pk.reshape(L, K2 // bk, bk, N // bn, bn)
               .transpose(0, 3, 1, 2, 4))
        swt = (s_w.reshape(L, G // gk, gk, N // bn, bn)
               .astype(jnp.float32).transpose(0, 3, 1, 2, 4))
        return pkt, swt
    G, gh, N = pk.shape
    bn = block_n if block_n is not None else (512 if N % 512 == 0
                                              else 256)
    assert N % bn == 0, (pk.shape, bn)
    bk = _w4_block_k(G, gh, bn, budget)
    gk = bk // gh
    K2 = G * gh
    pkt = pk.reshape(K2 // bk, bk, N // bn, bn).transpose(2, 0, 1, 3)
    swt = (s_w.reshape(G // gk, gk, N // bn, bn).astype(jnp.float32)
           .transpose(2, 0, 1, 3))
    return pkt, swt


def w4_untile_layout(pkt: jnp.ndarray, swt: jnp.ndarray):
    """Inverse of w4_tile_layout for one layer: (pkt, swt) → the engine
    ([G, g/2, N], [G, 1, N]) layout — a pure XLA transpose expression
    for the paths that want flat weights (prefill bf16 dequant; CPU)."""
    Nb, Kb, bk, bn = pkt.shape
    gk = swt.shape[2]
    gh = bk // gk
    K2, N = Kb * bk, Nb * bn
    G = K2 // gh
    pk = pkt.transpose(1, 2, 0, 3).reshape(K2, N).reshape(G, gh, N)
    s_w = swt.transpose(1, 2, 0, 3).reshape(G, 1, N)
    return pk, s_w


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def w4a8_matmul_tiled(h: jnp.ndarray, pkt: jnp.ndarray,
                      swt: jnp.ndarray, *, out_dtype=jnp.bfloat16,
                      interpret=None):
    """w4a8_matmul over the tile-contiguous layout (w4_tile_layout).

    Same kernel math (exact _w4dot numerics, parity-tested); the only
    change is the weight/scale BlockSpecs: every grid block is one
    contiguous HBM read instead of a strided burst train. B pads to the
    next sublane multiple (8) rather than the fixed 32 — at decode B=8
    the 32-pad spent 4x the MACs/VMEM for nothing (TPU-measured
    8.33ms vs 8.73ms on the fused 7B stream)."""
    B, K = h.shape
    Nb, Kb, bk, bn = pkt.shape
    gk = swt.shape[2]
    gh = bk // gk
    K2, N = Kb * bk, Nb * bn
    G = K2 // gh
    assert 2 * K2 == K, (h.shape, pkt.shape)
    h8, s_a = quantize_activations(h)
    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        h8 = jnp.pad(h8, ((0, Bp - B), (0, 0)))
        s_a = jnp.pad(s_a, ((0, Bp - B), (0, 0)))
    he = h8[:, 0::2].reshape(Bp, G, gh).transpose(1, 0, 2)
    ho = h8[:, 1::2].reshape(Bp, G, gh).transpose(1, 0, 2)
    out = pl.pallas_call(
        functools.partial(_kernel_w4a8, gh=gh),
        grid=(Nb, Kb),
        in_specs=[
            pl.BlockSpec((gk, Bp, gh), lambda j, k: (k, 0, 0)),   # he
            pl.BlockSpec((gk, Bp, gh), lambda j, k: (k, 0, 0)),   # ho
            pl.BlockSpec((Bp, 1), lambda j, k: (0, 0)),           # s_a
            pl.BlockSpec((1, 1, bk, bn), lambda j, k: (j, k, 0, 0)),
            pl.BlockSpec((1, 1, gk, bn), lambda j, k: (j, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Bp, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Bp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((Bp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=(jax.default_backend() != "tpu"
                   if interpret is None else interpret),
    )(he, ho, s_a.astype(jnp.float32), pkt, swt)
    return out[:B]


def _kernel_mlp_w4(he_ref, ho_ref, s_a_ref, gu_ref, gs_ref, dw_ref,
                   ds_ref, out_ref, acc_ref, *, gh: int, ti: int,
                   cdt=jnp.bfloat16):
    """One MLP I-tile: gate/up W4A8 grouped dots → silu·mul in VMEM →
    W4A16 down-proj partial into the f32 accumulator.

    Fusing the three projections into ONE kernel removes a kernel
    boundary per layer from the decode block (the r5 bisection measured
    the block SUPERADDITIVE: ~4ms/step of pipeline drain across the 5
    custom-call boundaries per layer — see docs/STATUS.md) and the
    [B, I] intermediate never exists in HBM. The down dot runs bf16
    against in-VMEM dequantized weights (W4A16 — strictly tighter
    numerics than the separate-call A8 path, whose per-token re-quant
    of the activations added a second rounding)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # ---- gate/up: grouped W4A8, exact _w4dot recipe --------------------
    pk = gu_ref[...]                              # [1, D2, 2ti] int8
    D2 = pk.shape[-2]
    pk = pk.reshape(D2, 2 * ti)
    # int8 shifts crash this backend's Mosaic compiler — int32 lanes
    pki = pk.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(pki, 28), 28).astype(jnp.int8)
    hi = jax.lax.shift_right_arithmetic(pki, 4).astype(jnp.int8)
    G = D2 // gh
    dn = (((2,), (1,)), ((0,), (0,)))
    p_lo = jax.lax.dot_general(he_ref[...], lo.reshape(G, gh, 2 * ti),
                               dn, preferred_element_type=jnp.int32)
    p_hi = jax.lax.dot_general(ho_ref[...], hi.reshape(G, gh, 2 * ti),
                               dn, preferred_element_type=jnp.int32)
    part = p_lo + p_hi                            # [G, Bp, 2ti] int32
    sw = gs_ref[...].reshape(G, 2 * ti)           # f32
    gu = jnp.sum(part.astype(jnp.float32) * sw[:, None, :], axis=0)
    gu = gu * s_a_ref[...]                        # [Bp, 2ti] f32
    gate, up = gu[:, :ti], gu[:, ti:]
    act = (gate / (1.0 + jnp.exp(-gate))) * up    # silu·mul, f32
    act = act.astype(cdt)                         # [Bp, ti]

    # ---- down: W4A16, dequantize the tile in VMEM ----------------------
    dpk = dw_ref[...]                             # [1, ti/2, D] int8
    D = dpk.shape[-1]
    ti2 = ti // 2
    dpki = dpk.reshape(ti2, D).astype(jnp.int32)
    dlo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(dpki, 28), 28).astype(jnp.int8)
    dhi = jax.lax.shift_right_arithmetic(dpki, 4).astype(jnp.int8)
    dsw = ds_ref[...]                             # [1, gkt, D] f32
    gkt = dsw.shape[-2]
    swb = jnp.broadcast_to(dsw.reshape(gkt, 1, D),
                           (gkt, ti2 // gkt, D)).reshape(ti2, D)
    swb = swb.astype(cdt)
    acc_ref[...] += (
        jax.lax.dot_general(act[:, 0::2], dlo.astype(cdt) * swb,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(act[:, 1::2], dhi.astype(cdt) * swb,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32))

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def w4_mlp_tile_layout(gu_pk, gu_s, dn_pk, dn_s, *, ti: int = 256):
    """Engine flat W4 layouts for the fused gateup ([.., G, g/2, 2I]) and
    down ([.., Gd, g/2, D]) streams → the fused-MLP I-tile layout:

      mgu [.., Ib, D/2, 2ti] int8   (tile j = gate cols j ‖ up cols j)
      mgs [.., Ib, G,   2ti] f32
      mdw [.., Ib, ti/2, D ] int8   (tile j = packed I-rows of tile j)
      mds [.., Ib, gkt,  D ] f32    (gkt = ti/group scales per tile)

    Each fused_mlp_w4 grid step reads exactly one contiguous [j] block
    of all four arrays. Leading layer-stack dims pass through."""
    *lead, G, gh, N2 = gu_pk.shape
    I = N2 // 2
    assert I % ti == 0, (gu_pk.shape, ti)
    Ib, D2 = I // ti, G * gh
    lead = tuple(lead)
    mgu = (gu_pk.reshape(*lead, D2, 2, Ib, ti)
           .transpose(*range(len(lead)), len(lead) + 2, len(lead),
                      len(lead) + 1, len(lead) + 3)
           .reshape(*lead, Ib, D2, 2 * ti))
    mgs = (gu_s.astype(jnp.float32).reshape(*lead, G, 2, Ib, ti)
           .transpose(*range(len(lead)), len(lead) + 2, len(lead),
                      len(lead) + 1, len(lead) + 3)
           .reshape(*lead, Ib, G, 2 * ti))
    *dlead, Gd, ghd, D = dn_pk.shape
    assert Gd * ghd == I // 2 and tuple(dlead) == lead, (dn_pk.shape, I)
    gkt = Gd // Ib
    mdw = dn_pk.reshape(*lead, Ib, ti // 2, D)
    mds = dn_s.astype(jnp.float32).reshape(*lead, Ib, gkt, D)
    return mgu, mgs, mdw, mds


def w4_mlp_untile_layout(mgu, mgs, mdw, mds):
    """Inverse of w4_mlp_tile_layout for ONE layer — flat engine views
    for the prefill paths (a pure XLA transpose expression). The down
    group size is recovered from the shapes (group = ti / gkt)."""
    group = 2 * mdw.shape[1] // mds.shape[1]
    Ib, D2, ti2x = mgu.shape
    ti = ti2x // 2
    G = mgs.shape[1]
    gh = D2 // G
    I = Ib * ti
    gu_pk = (mgu.reshape(Ib, D2, 2, ti).transpose(1, 2, 0, 3)
             .reshape(D2, 2 * I).reshape(G, gh, 2 * I))
    gu_s = (mgs.reshape(Ib, G, 2, ti).transpose(1, 2, 0, 3)
            .reshape(G, 1, 2 * I))
    D = mdw.shape[-1]
    ghd = group // 2
    dn_pk = mdw.reshape(I // 2, D).reshape((I // 2) // ghd, ghd, D)
    dn_s = mds.reshape((I // 2) // ghd, 1, D)
    return gu_pk, gu_s, dn_pk, dn_s


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fused_mlp_w4(h: jnp.ndarray, mgu, mgs, mdw, mds, *,
                 out_dtype=jnp.bfloat16, interpret=None):
    """silu(h @ Wg) * (h @ Wu) @ Wd in ONE Pallas call over the fused-MLP
    tile layout (w4_mlp_tile_layout). h: [B, D] float → [B, D] out.

    Gate/up run the grouped W4A8 recipe (per-token int8 activations,
    group scales on int32 partials — exact _w4dot numerics); the down
    projection runs W4A16 (bf16 activations × in-VMEM dequantized bf16
    weights), avoiding the separate-call path's second activation
    quantization. SiLU families only (llama/vicuna/qwen/mistral)."""
    B, K = h.shape
    Ib, D2, ti2x = mgu.shape
    ti = ti2x // 2
    G = mgs.shape[1]
    gh = D2 // G
    D = mdw.shape[-1]
    assert K == 2 * D2 and mdw.shape[1] == ti // 2, (h.shape, mgu.shape,
                                                     mdw.shape)
    h8, s_a = quantize_activations(h)
    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        h8 = jnp.pad(h8, ((0, Bp - B), (0, 0)))
        s_a = jnp.pad(s_a, ((0, Bp - B), (0, 0)))
    he = h8[:, 0::2].reshape(Bp, G, gh).transpose(1, 0, 2)
    ho = h8[:, 1::2].reshape(Bp, G, gh).transpose(1, 0, 2)
    gkt = mds.shape[1]
    run_interp = (jax.default_backend() != "tpu"
                  if interpret is None else interpret)
    # f32 down-dots on the interpret (CPU/test) path — the CPU DotThunk
    # has no bf16 kernels; production runs bf16 MXU dots
    cdt = jnp.float32 if run_interp else jnp.bfloat16
    out = pl.pallas_call(
        functools.partial(_kernel_mlp_w4, gh=gh, ti=ti, cdt=cdt),
        grid=(Ib,),
        in_specs=[
            pl.BlockSpec((G, Bp, gh), lambda j: (0, 0, 0)),      # he
            pl.BlockSpec((G, Bp, gh), lambda j: (0, 0, 0)),      # ho
            pl.BlockSpec((Bp, 1), lambda j: (0, 0)),             # s_a
            pl.BlockSpec((1, D2, 2 * ti), lambda j: (j, 0, 0)),  # mgu
            pl.BlockSpec((1, G, 2 * ti), lambda j: (j, 0, 0)),   # mgs
            pl.BlockSpec((1, ti // 2, D), lambda j: (j, 0, 0)),  # mdw
            pl.BlockSpec((1, gkt, D), lambda j: (j, 0, 0)),      # mds
        ],
        out_specs=pl.BlockSpec((Bp, D), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, D), out_dtype),
        scratch_shapes=[pltpu.VMEM((Bp, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=run_interp,
    )(he, ho, s_a.astype(jnp.float32), mgu, mgs, mdw, mds)
    return out[:B]


def quantize_activations(h: jnp.ndarray):
    """Per-token absmax int8 quantization (engine _wdot recipe).
    h: [..., K] float -> (h8 int8, s_a f32 [..., 1])."""
    hf = h.astype(jnp.float32)
    s_a = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
                      / 127.0, 1e-12)
    h8 = jnp.clip(jnp.round(hf / s_a), -127, 127).astype(jnp.int8)
    return h8, s_a
