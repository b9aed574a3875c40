"""Probe round 3: cut the W4 kernel's VPU unpack cost.

Round 2 landed the int32-shift unpack at 9.49ms/3.24GB (341GB/s) for
the 32-layer fused decode stream — better than w4_xla's 14.06 but far
off the 535GB/s the same-shape W8 dots sustain. Candidates:

  A  int8<->int32 lane bitcast sanity (values)
  B  mask-unpack: view 4 packed bytes as one int32;
       lo16 = (x << 4) & 0xF0F0F0F0 ; hi16 = x & 0xF0F0F0F0
     (≈3 VPU ops per 4 bytes vs ~6 per byte for the shift chain);
     both planes are nibble*16, folded out by ONE exact >>4 on the
     int32 partial sums
  C  floor: no unpack at all (dot the packed bytes as-is, garbage
     values) — isolates DMA + MXU + grid from the VPU cost
  D  scan32 timing of each at the 7B fused shapes

Usage: python tools/probe_pallas_w4c.py
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


# plain Python int (sign-correct for int32): a module-level jnp scalar
# would be a device array the Pallas kernel "captures" — rejected
MASK = 0xF0F0F0F0 - (1 << 32)


def _mask_unpack(pk):
    """[bk, bn] int8 -> (lo16, hi16) int8 planes via int32-lane masks."""
    bk, bn = pk.shape
    x = jax.lax.bitcast_convert_type(
        pk.reshape(bk, bn // 4, 4), jnp.int32)          # [bk, bn/4]
    lo16 = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(jax.lax.shift_left(x, 4), MASK),
        jnp.int8).reshape(bk, bn)
    hi16 = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(x, MASK), jnp.int8).reshape(bk, bn)
    return lo16, hi16


def main():
    rng = np.random.default_rng(0)
    pk_host = rng.integers(-128, 128, size=(512, 256)).astype(np.int8)
    pk = jnp.asarray(pk_host)

    lo_want = np.right_shift(np.left_shift(pk_host, 4), 4)
    hi_want = np.right_shift(pk_host, 4)

    # A: value sanity for the mask unpack
    def k_mask(pk_ref, lo_ref, hi_ref):
        lo16, hi16 = _mask_unpack(pk_ref[...])
        lo_ref[...] = lo16
        hi_ref[...] = hi16

    r = probe("mask_unpack", lambda: pl.pallas_call(
        k_mask, out_shape=(jax.ShapeDtypeStruct((512, 256), jnp.int8),
                           jax.ShapeDtypeStruct((512, 256), jnp.int8)),
        interpret=False)(pk))
    if r is not None:
        lo_got, hi_got = map(np.asarray, r)
        ok = ((lo_got == (lo_want * 16).astype(np.int8)).all()
              and (hi_got == (hi_want * 16).astype(np.int8)).all())
        print(f"[probe] mask_unpack values: {'OK' if ok else 'WRONG'}",
              file=sys.stderr)
        if not ok:
            return

    # D: scan32 timings — variant kernels over the fused 7B shapes
    from aurora_tpu.serve.engine import _w4

    shapes = [(4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096)]
    layers = {}
    for i, (K, N) in enumerate(shapes):
        w = jnp.asarray(rng.standard_normal((1, K, N)) * 0.02,
                        jnp.float32)
        pk_i, s_i = _w4(w)
        layers[f"pk{i}"], layers[f"s{i}"] = pk_i[0], s_i[0]
        del w
    gb = sum(layers[f"pk{i}"].nbytes for i in range(4)) * 32 / 1e9

    def make_matmul(variant, block_n):
        def kernel(he_ref, ho_ref, s_a_ref, pk_ref, sw_ref, out_ref,
                   acc_ref, *, gh):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            pkt = pk_ref[...]
            bk, bn = pkt.shape
            gk = bk // gh
            if variant == "floor":          # garbage values, real traffic
                lo = pkt
                hi = pkt
                shift = 0
            elif variant == "mask":
                lo, hi = _mask_unpack(pkt)  # nibble*16 planes
                shift = 4
            elif variant == "mask32":       # input arrives as int32 lanes
                n4 = bn
                bn = bn * 4
                lo = jax.lax.bitcast_convert_type(
                    jnp.bitwise_and(jax.lax.shift_left(pkt, 4), MASK),
                    jnp.int8).reshape(bk, bn)
                hi = jax.lax.bitcast_convert_type(
                    jnp.bitwise_and(pkt, MASK),
                    jnp.int8).reshape(bk, bn)
                shift = 4
            else:                           # i32shift
                pki = pkt.astype(jnp.int32)
                lo = jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(pki, 28), 28).astype(jnp.int8)
                hi = jax.lax.shift_right_arithmetic(
                    pki, 4).astype(jnp.int8)
                shift = 0
            dn = (((2,), (1,)), ((0,), (0,)))
            p = (jax.lax.dot_general(he_ref[...], lo.reshape(gk, gh, bn),
                                     dn, preferred_element_type=jnp.int32)
                 + jax.lax.dot_general(ho_ref[...],
                                       hi.reshape(gk, gh, bn), dn,
                                       preferred_element_type=jnp.int32))
            if shift:
                p = jax.lax.shift_right_arithmetic(p, shift)
            sw = sw_ref[...]
            acc_ref[...] += jnp.sum(p.astype(jnp.float32)
                                    * sw[:, None, :], axis=0)

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                out_ref[...] = (acc_ref[...] * s_a_ref[...]
                                ).astype(out_ref.dtype)

        @functools.partial(jax.jit, static_argnames=())
        def matmul(h, pk, s_w):
            from aurora_tpu.ops.pallas.quant_matmul import (
                _w4_block_k, quantize_activations)
            B, K = h.shape
            G, gh, N = pk.shape
            h8, s_a = quantize_activations(h)
            Bp = 32
            h8 = jnp.pad(h8, ((0, Bp - B), (0, 0)))
            s_a = jnp.pad(s_a, ((0, Bp - B), (0, 0)))
            he = h8[:, 0::2].reshape(Bp, G, gh).transpose(1, 0, 2)
            ho = h8[:, 1::2].reshape(Bp, G, gh).transpose(1, 0, 2)
            bk = _w4_block_k(G, gh, block_n)
            gk = bk // gh
            pk_in = pk.reshape(G * gh, N)
            pk_spec = pl.BlockSpec((bk, block_n), lambda j, k: (k, j))
            if variant == "mask32":
                pk_in = jax.lax.bitcast_convert_type(
                    pk_in.reshape(G * gh, N // 4, 4), jnp.int32)
                pk_spec = pl.BlockSpec((bk, block_n // 4),
                                       lambda j, k: (k, j))
            return pl.pallas_call(
                functools.partial(kernel, gh=gh),
                grid=(N // block_n, (G * gh) // bk),
                in_specs=[
                    pl.BlockSpec((gk, Bp, gh), lambda j, k: (k, 0, 0)),
                    pl.BlockSpec((gk, Bp, gh), lambda j, k: (k, 0, 0)),
                    pl.BlockSpec((Bp, 1), lambda j, k: (0, 0)),
                    pk_spec,
                    pl.BlockSpec((gk, block_n), lambda j, k: (k, j)),
                ],
                out_specs=pl.BlockSpec((Bp, block_n),
                                       lambda j, k: (0, j)),
                out_shape=jax.ShapeDtypeStruct((Bp, N), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((Bp, block_n), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(he, ho, s_a.astype(jnp.float32), pk_in,
              s_w.reshape(G, N).astype(jnp.float32))[:B]
        return matmul

    x0 = jnp.zeros((8, 4096), jnp.bfloat16)
    xi0 = jnp.zeros((8, 11008), jnp.bfloat16)

    for variant in ("mask", "mask32", "floor", "i32shift"):
        for bn in (512, 256):
            if variant != "mask" and bn != 512:
                continue
            mm = make_matmul(variant, bn)

            def body(c, _):
                h, hi_ = c
                outs = [mm(h if K == 4096 else hi_, layers[f"pk{i}"],
                           layers[f"s{i}"])
                        for i, (K, N) in enumerate(shapes)]
                h = (h + outs[1] + outs[3]).astype(jnp.bfloat16)
                hi_ = (hi_ + outs[2][:, :11008]).astype(jnp.bfloat16)
                return (h, hi_), None

            @jax.jit
            def scan32(layers, x, xi):
                (h, _), _ = jax.lax.scan(body, (x, xi), None, length=32)
                return h

            tag = f"{variant}_bn{bn}"
            try:
                r = scan32(layers, x0, xi0)
                jax.device_get(r.ravel()[0])
                t0 = time.perf_counter()
                for _ in range(8):
                    r = scan32(layers, x0, xi0)
                jax.device_get(r.ravel()[0])
                ms = (time.perf_counter() - t0) / 8 * 1e3
                print(f"[probe] scan32_{tag}: {ms:.2f} ms "
                      f"-> {gb / ms * 1e3:.0f}GB/s", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"[probe] scan32_{tag}: FAIL {str(e)[:140]}",
                      file=sys.stderr)


if __name__ == "__main__":
    main()
