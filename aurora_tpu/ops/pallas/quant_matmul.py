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


def quantize_activations(h: jnp.ndarray):
    """Per-token absmax int8 quantization (engine _wdot recipe).
    h: [..., K] float -> (h8 int8, s_a f32 [..., 1])."""
    hf = h.astype(jnp.float32)
    s_a = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
                      / 127.0, 1e-12)
    h8 = jnp.clip(jnp.round(hf / s_a), -127, 127).astype(jnp.int8)
    return h8, s_a
