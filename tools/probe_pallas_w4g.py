"""Probe round 7: tile-contiguous W4 weight layout.

The shipping kernel reads (bk, bn) blocks out of the flat row-major
[K/2, N] packed array: every block is a strided DMA of bn=512-byte
bursts (stride N up to 22016) — a classic HBM-efficiency killer and
the prime suspect for the 386GB/s no-unpack floor vs the 530GB/s the
same-shape W8 dots reach. Pre-tiling the packed bytes ONCE at
quantize time into [N/bn, K2/bk, bk, bn] makes every grid block one
contiguous ~1MB read. The relayout here happens on the HOST before
timing (in the shipping path it happens once at weight-quantize time).

Variants (scan32 over the fused 7B decode shapes, B=8):
  tiled_i32shift_bn512_bp8    expected winner vs flat 8.33ms
  tiled_floor_bn512_bp8       DMA+MXU floor under contiguity
  tiled_i32shift_bn1024_bp8   longer bursts
  tiled_i32shift_bn512_bp32   the b20 e2e case
  flat_i32shift_bn512_bp8     same-process baseline
Plus: int4-native dtype feasibility (jnp.int4 operand -> astype int8).

Usage: python tools/probe_pallas_w4g.py
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


def _gk_for(G, gh, bn, budget=3 << 20):
    cap = max(1, budget // (gh * bn))
    return max(d for d in range(1, G + 1) if G % d == 0 and d <= cap)


def make_kernel(gh):
    def kernel(he_ref, ho_ref, s_a_ref, pk_ref, sw_ref, out_ref,
               acc_ref, *, variant):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        pkt = pk_ref[...]
        bk, bn_ = pkt.shape[-2], pkt.shape[-1]
        pkt = pkt.reshape(bk, bn_)
        gk = bk // gh
        if variant == "floor":
            lo = pkt
            hi = pkt
        else:
            pki = pkt.astype(jnp.int32)
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(pki, 28), 28).astype(jnp.int8)
            hi = jax.lax.shift_right_arithmetic(pki, 4).astype(jnp.int8)
        dn = (((2,), (1,)), ((0,), (0,)))
        p = (jax.lax.dot_general(he_ref[...], lo.reshape(gk, gh, bn_),
                                 dn, preferred_element_type=jnp.int32)
             + jax.lax.dot_general(ho_ref[...],
                                   hi.reshape(gk, gh, bn_), dn,
                                   preferred_element_type=jnp.int32))
        sw = sw_ref[...].reshape(gk, bn_)
        acc_ref[...] += jnp.sum(p.astype(jnp.float32) * sw[:, None, :],
                                axis=0)

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            out_ref[...] = (acc_ref[...] * s_a_ref[...]
                            ).astype(out_ref.dtype)
    return kernel


def make_matmul(layout, variant, bp, bn, G, gh, N):
    gk = _gk_for(G, gh, bn)
    bk = gk * gh
    K2 = G * gh
    kern = functools.partial(make_kernel(gh), variant=variant)
    if layout == "tiled":
        pk_spec = pl.BlockSpec((1, 1, bk, bn), lambda j, k: (j, k, 0, 0))
        sw_spec = pl.BlockSpec((1, 1, gk, bn), lambda j, k: (j, k, 0, 0))
    else:
        pk_spec = pl.BlockSpec((bk, bn), lambda j, k: (k, j))
        sw_spec = pl.BlockSpec((gk, bn), lambda j, k: (k, j))

    @jax.jit
    def matmul(h, pk_in, sw_in):
        from aurora_tpu.ops.pallas.quant_matmul import (
            quantize_activations)
        B = h.shape[0]
        h8, s_a = quantize_activations(h)
        h8 = jnp.pad(h8, ((0, bp - B), (0, 0)))
        s_a = jnp.pad(s_a, ((0, bp - B), (0, 0)))
        he = h8[:, 0::2].reshape(bp, G, gh).transpose(1, 0, 2)
        ho = h8[:, 1::2].reshape(bp, G, gh).transpose(1, 0, 2)
        return pl.pallas_call(
            kern,
            grid=(N // bn, K2 // bk),
            in_specs=[
                pl.BlockSpec((gk, bp, gh), lambda j, k: (k, 0, 0)),
                pl.BlockSpec((gk, bp, gh), lambda j, k: (k, 0, 0)),
                pl.BlockSpec((bp, 1), lambda j, k: (0, 0)),
                pk_spec,
                sw_spec,
            ],
            out_specs=pl.BlockSpec((bp, bn), lambda j, k: (0, j)),
            out_shape=jax.ShapeDtypeStruct((bp, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bp, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(he, ho, s_a.astype(jnp.float32), pk_in, sw_in)[:B]
    return matmul


def main():
    rng = np.random.default_rng(0)

    # int4-native feasibility: can a kernel take an int4 operand?
    def k_i4(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(jnp.int8)

    x4 = jnp.broadcast_to(jnp.arange(-8, 8, dtype=jnp.int8), (8, 16))
    probe("int4_native_operand", lambda: pl.pallas_call(
        k_i4, out_shape=jax.ShapeDtypeStruct((8, 16), jnp.int8),
    )(x4.astype(jnp.int4)))

    from aurora_tpu.serve.engine import _w4

    shapes = [(4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096)]
    host = {}
    meta = {}
    for i, (K, N) in enumerate(shapes):
        w = jnp.asarray(rng.standard_normal((1, K, N)) * 0.02,
                        jnp.float32)
        pk_i, s_i = _w4(w)
        G, gh, _ = pk_i[0].shape
        host[f"pk{i}"] = np.asarray(jax.device_get(pk_i[0]))
        host[f"s{i}"] = np.asarray(jax.device_get(s_i[0]),
                                   dtype=np.float32)
        meta[i] = (G, gh, N)
        del w, pk_i, s_i
    gb = sum(host[f"pk{i}"].nbytes for i in range(4)) * 32 / 1e9

    cases = [
        ("tiled", "i32shift", 8, 512),
        ("tiled", "floor", 8, 512),
        ("tiled", "i32shift", 8, 1024),
        ("tiled", "i32shift", 32, 512),
        ("flat", "i32shift", 8, 512),
    ]
    x0 = jnp.zeros((8, 4096), jnp.bfloat16)
    xi0 = jnp.zeros((8, 11008), jnp.bfloat16)

    for layout, variant, bp, bn in cases:
        tag = f"{layout}_{variant}_bn{bn}_bp{bp}"
        try:
            mms, opnds = [], []
            for i, (K, N) in enumerate(shapes):
                G, gh, _ = meta[i]
                gk = _gk_for(G, gh, bn)
                bk = gk * gh
                K2 = G * gh
                pk2 = host[f"pk{i}"].reshape(K2, N)
                sw2 = host[f"s{i}"].reshape(G, N)
                if layout == "tiled":
                    pk_in = np.ascontiguousarray(
                        pk2.reshape(K2 // bk, bk, N // bn, bn
                                    ).transpose(2, 0, 1, 3))
                    sw_in = np.ascontiguousarray(
                        sw2.reshape(G // gk, gk, N // bn, bn
                                    ).transpose(2, 0, 1, 3))
                else:
                    pk_in, sw_in = pk2, sw2
                mms.append(make_matmul(layout, variant, bp, bn,
                                       G, gh, N))
                opnds.append((jnp.asarray(pk_in), jnp.asarray(sw_in)))

            @jax.jit
            def scan32(ops, x, xi):
                def body(c, _):
                    h, hi_ = c
                    outs = [mms[i](h if K == 4096 else hi_, *ops[i])
                            for i, (K, N) in enumerate(shapes)]
                    h = (h + outs[1] + outs[3]).astype(jnp.bfloat16)
                    hi_ = (hi_ + outs[2][:, :11008]
                           ).astype(jnp.bfloat16)
                    return (h, hi_), None
                (h, _), _ = jax.lax.scan(body, (x, xi), None, length=32)
                return h

            r = scan32(opnds, x0, xi0)
            jax.device_get(r.ravel()[0])
            t0 = time.perf_counter()
            for _ in range(8):
                r = scan32(opnds, x0, xi0)
            jax.device_get(r.ravel()[0])
            ms = (time.perf_counter() - t0) / 8 * 1e3
            print(f"[probe] scan32_{tag}: {ms:.2f} ms "
                  f"-> {gb / ms * 1e3:.0f}GB/s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"[probe] scan32_{tag}: FAIL {str(e)[:140]}",
                  file=sys.stderr)
        finally:
            opnds = None


if __name__ == "__main__":
    main()
