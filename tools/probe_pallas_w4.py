"""Isolate which Pallas feature crashes the TPU compile helper for the
W4 kernels (both w4a16_matmul and w4a8_matmul die with
'tpu_compile_helper subprocess exit code 1' — a compiler CRASH, no
diagnostic). Compiles micro-kernels one feature at a time at tiny
shapes; prints PASS/CRASH per probe.

Usage: python tools/probe_pallas_w4.py
"""

import functools
import os
import sys

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
        return True
    except Exception as e:  # noqa: BLE001
        print(f"[probe] {tag}: FAIL {str(e)[:140]}", file=sys.stderr)
        return False


def main():
    rng = np.random.default_rng(0)
    pk = jnp.asarray(rng.integers(-128, 127, size=(512, 256)), jnp.int8)
    h8 = jnp.asarray(rng.integers(-127, 127, size=(32, 512)), jnp.int8)

    # A: int8 shifts only
    def k_shift(pk_ref, o_ref):
        four = jnp.int8(4)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(pk_ref[...], four), four)
        o_ref[...] = lo + jax.lax.shift_right_arithmetic(pk_ref[...], four)

    probe("int8_shifts", lambda: pl.pallas_call(
        k_shift, out_shape=jax.ShapeDtypeStruct((512, 256), jnp.int8),
        interpret=False)(pk))

    # B: plain int8 dot (sanity — w8a8 kernel already compiles)
    def k_dot(h_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            h_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    probe("int8_dot", lambda: pl.pallas_call(
        k_dot, out_shape=jax.ShapeDtypeStruct((32, 256), jnp.int32),
        interpret=False)(h8, pk))

    # B2: shift then dot (the unpack feeding the MXU)
    def k_shiftdot(h_ref, w_ref, o_ref):
        four = jnp.int8(4)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w_ref[...], four), four)
        o_ref[...] = jax.lax.dot_general(
            h_ref[...], lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    probe("int8_shift_then_dot", lambda: pl.pallas_call(
        k_shiftdot, out_shape=jax.ShapeDtypeStruct((32, 256), jnp.int32),
        interpret=False)(h8, pk))

    # C: in-kernel reshape splitting the sublane dim (int8)
    def k_reshape(pk_ref, o_ref):
        x = pk_ref[...].reshape(8, 64, 256)
        o_ref[...] = jnp.sum(x.astype(jnp.int32), axis=0)

    probe("int8_sublane_split_reshape", lambda: pl.pallas_call(
        k_reshape, out_shape=jax.ShapeDtypeStruct((64, 256), jnp.int32),
        interpret=False)(pk))

    # D: batched int8 dot_general (dims the w4a8 kernel uses)
    heg = jnp.asarray(rng.integers(-127, 127, size=(8, 32, 64)), jnp.int8)
    pkg = jnp.asarray(rng.integers(-128, 127, size=(8, 64, 256)), jnp.int8)

    def k_batched(h_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            h_ref[...], w_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)

    probe("int8_batched_dot", lambda: pl.pallas_call(
        k_batched, out_shape=jax.ShapeDtypeStruct((8, 32, 256), jnp.int32),
        interpret=False)(heg, pkg))

    # D2: batched BF16 dot_general (is it batching or int8-batching?)
    def k_batched16(h_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            h_ref[...].astype(jnp.bfloat16),
            w_ref[...].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    probe("bf16_batched_dot", lambda: pl.pallas_call(
        k_batched16,
        out_shape=jax.ShapeDtypeStruct((8, 32, 256), jnp.float32),
        interpret=False)(heg, pkg))

    # E: 3-d BlockSpec grid slicing
    def k_3d(h_ref, o_ref):
        o_ref[...] = jnp.sum(h_ref[...].astype(jnp.int32), axis=0)

    probe("3d_blockspec", lambda: pl.pallas_call(
        k_3d, grid=(2,),
        in_specs=[pl.BlockSpec((4, 32, 64), lambda k: (k, 0, 0))],
        out_specs=pl.BlockSpec((32, 64), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((32, 64), jnp.int32),
        interpret=False)(heg))

    # F: the real kernels at tiny shapes
    from aurora_tpu.ops.pallas.quant_matmul import w4a16_matmul, w4a8_matmul
    from aurora_tpu.serve.engine import _w4
    w = jnp.asarray(rng.standard_normal((1, 512, 512)), jnp.float32)
    pk4, s4 = _w4(w, group=128)
    h = jnp.asarray(rng.standard_normal((8, 512)), jnp.bfloat16)
    probe("w4a8_tiny", lambda: w4a8_matmul(
        h, pk4[0], s4[0], block_n=256, interpret=False))
    probe("w4a8_tiny_multik", lambda: w4a8_matmul(
        h, pk4[0], s4[0], block_n=256, block_k=64, interpret=False))
    probe("w4a16_tiny", lambda: w4a16_matmul(
        h, pk4[0], s4[0], block_n=256, interpret=False))

    # G: production shape (the gateup stream, biggest tile)
    w2 = jnp.asarray(rng.standard_normal((1, 4096, 1024)) * 0.02,
                     jnp.float32)
    pk5, s5 = _w4(w2, group=128)
    h2 = jnp.asarray(rng.standard_normal((8, 4096)), jnp.bfloat16)
    probe("w4a8_k4096", lambda: w4a8_matmul(
        h2, pk5[0], s5[0], block_n=512, interpret=False))


if __name__ == "__main__":
    main()
