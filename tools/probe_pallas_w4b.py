"""Probe round 2: int8 SHIFTS crash the Mosaic compiler on this backend
(tools/probe_pallas_w4.py round 1 — int8 dots, batched dots, reshapes,
3-d BlockSpecs all PASS; both shift probes CRASH the compile helper).
Find a working nibble unpack:

  P1 int32 shifts        — convert up, shift, convert back
  P2 int8 multiply       — lo*16 via wrap-around int8 mul (1 VPU op)
  P3 int4 bitcast + dot  — bitcast_convert_type int8->int4[...,2],
                           MXU int8 x int4 dot (unpack would be FREE)
  P4 timing              — scan 32x the 7B fused shapes with the best
                           working unpack vs the w4_xla 14.06ms baseline

Usage: python tools/probe_pallas_w4b.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(tag, fn):
    try:
        r = fn()
        jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
        print(f"[probe] {tag}: PASS", file=sys.stderr)
        return r
    except Exception as e:  # noqa: BLE001
        print(f"[probe] {tag}: FAIL {str(e)[:140]}", file=sys.stderr)
        return None


def main():
    rng = np.random.default_rng(0)
    pk_host = rng.integers(-128, 128, size=(512, 256)).astype(np.int8)
    pk = jnp.asarray(pk_host)
    h8 = jnp.asarray(rng.integers(-127, 128, size=(32, 512)), jnp.int8)

    lo_want = np.right_shift(np.left_shift(pk_host, 4), 4)
    hi_want = np.right_shift(pk_host, 4)

    # P1: int32 shifts
    def k_i32shift(pk_ref, lo_ref, hi_ref):
        pki = pk_ref[...].astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(pki, 28), 28)
        hi = jax.lax.shift_right_arithmetic(pki, 4)
        lo_ref[...] = lo.astype(jnp.int8)
        hi_ref[...] = hi.astype(jnp.int8)

    r = probe("i32_shift_unpack", lambda: pl.pallas_call(
        k_i32shift, out_shape=(jax.ShapeDtypeStruct((512, 256), jnp.int8),
                               jax.ShapeDtypeStruct((512, 256), jnp.int8)),
        interpret=False)(pk))
    if r is not None:
        lo_got, hi_got = map(np.asarray, r)
        ok = (lo_got == lo_want).all() and (hi_got == hi_want).all()
        print(f"[probe] i32_shift_unpack values: "
              f"{'OK' if ok else 'WRONG'}", file=sys.stderr)

    # P2: int8 multiply wraparound (lo*16 in one op)
    def k_mul(pk_ref, o_ref):
        o_ref[...] = pk_ref[...] * jnp.int8(16)

    r = probe("i8_mul16", lambda: pl.pallas_call(
        k_mul, out_shape=jax.ShapeDtypeStruct((512, 256), jnp.int8),
        interpret=False)(pk))
    if r is not None:
        ok = (np.asarray(r) == (lo_want * 16).astype(np.int8)).all()
        print(f"[probe] i8_mul16 values: {'OK' if ok else 'WRONG'} "
              "(wraparound lo<<4)", file=sys.stderr)

    # P3: int4 bitcast + MXU dot (element 0 of the pair = LOW nibble)
    def k_int4(h_ref, pk_ref, o_ref):
        w4 = jax.lax.bitcast_convert_type(pk_ref[...], jnp.int4)
        lo = w4[..., 0].astype(jnp.int8)
        hi = w4[..., 1].astype(jnp.int8)
        o_ref[...] = jax.lax.dot_general(
            h_ref[...], lo + hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    r = probe("int4_bitcast_dot", lambda: pl.pallas_call(
        k_int4, out_shape=jax.ShapeDtypeStruct((32, 256), jnp.int32),
        interpret=False)(h8, pk))
    if r is not None:
        want = np.asarray(h8).astype(np.int32) @ (
            lo_want + hi_want).astype(np.int32)
        ok = (np.asarray(r) == want).all()
        print(f"[probe] int4_bitcast_dot values: "
              f"{'OK' if ok else 'WRONG'}", file=sys.stderr)

    # P3b: dot DIRECTLY in int4 (no astype back to int8)
    def k_int4d(h_ref, pk_ref, o_ref):
        w4 = jax.lax.bitcast_convert_type(pk_ref[...], jnp.int4)
        o_ref[...] = (jax.lax.dot_general(
            h_ref[...], w4[..., 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
            + jax.lax.dot_general(
            h_ref[...], w4[..., 1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))

    r = probe("int4_native_dot", lambda: pl.pallas_call(
        k_int4d, out_shape=jax.ShapeDtypeStruct((32, 256), jnp.int32),
        interpret=False)(h8, pk))
    if r is not None:
        want = np.asarray(h8).astype(np.int32) @ (
            lo_want + hi_want).astype(np.int32)
        ok = (np.asarray(r) == want).all()
        print(f"[probe] int4_native_dot values: "
              f"{'OK' if ok else 'WRONG'}", file=sys.stderr)

    # P4: timing — w4a8_matmul with whatever unpack now compiles,
    # over the 7B fused decode stream (32-layer scan), vs w4_xla 14.06
    from aurora_tpu.ops.pallas.quant_matmul import w4a8_matmul
    from aurora_tpu.serve.engine import _w4

    shapes = [(4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096)]
    layers = {}
    for i, (K, N) in enumerate(shapes):
        w = jnp.asarray(rng.standard_normal((1, K, N)) * 0.02,
                        jnp.bfloat16).astype(jnp.float32)
        pk_i, s_i = _w4(w)
        layers[f"pk{i}"], layers[f"s{i}"] = pk_i[0], s_i[0]
        del w
    x = jnp.zeros((8, 4096), jnp.bfloat16)
    xi = jnp.zeros((8, 11008), jnp.bfloat16)

    def body(carry, _):
        h, hi_ = carry
        outs = []
        for i, (K, N) in enumerate(shapes):
            hh = h if K == 4096 else hi_
            outs.append(w4a8_matmul(hh, layers[f"pk{i}"],
                                    layers[f"s{i}"], block_n=512))
        h = (h + outs[1] + outs[3]).astype(jnp.bfloat16)
        hi_ = (hi_ + outs[2][:, :11008]).astype(jnp.bfloat16)
        return (h, hi_), None

    @jax.jit
    def scan32(layers, x, xi):
        (h, hi_), _ = jax.lax.scan(
            lambda c, _: body(c, None), (x, xi), None, length=32)
        return h

    try:
        r = scan32(layers, x, xi)
        jax.device_get(r.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(8):
            r = scan32(layers, x, xi)
        jax.device_get(r.ravel()[0])
        ms = (time.perf_counter() - t0) / 8 * 1e3
        gb = sum(layers[f"pk{i}"].nbytes for i in range(4)) * 32 / 1e9
        print(f"[probe] w4a8_scan32: {ms:.2f} ms for {gb:.2f}GB packed "
              f"-> {gb / ms * 1e3:.0f}GB/s", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"[probe] w4a8_scan32: FAIL {str(e)[:140]}", file=sys.stderr)


if __name__ == "__main__":
    main()
