"""Probe round 4b: W4 kernel DMA geometry, scales as 3-d [G, 1, N].

Round 4a found bn>512 failed ONLY on the scales BlockSpec: block
(gk, bn) over [G, N] needs gk % 8 == 0 or gk == G. Reshaping scales to
[G, 1, N] makes gk a LEADING dim (unconstrained) and the block
[gk, 1, bn] broadcasts straight against the [gk, Bp, bn] partials.
bn1024/2048 still skip N=22016 (21.5 blocks); fullN covers it.

Usage: python tools/probe_pallas_w4d.py
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


def main():
    rng = np.random.default_rng(0)
    from aurora_tpu.serve.engine import _w4, _w4dot

    shapes = [(4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096)]
    layers = {}
    for i, (K, N) in enumerate(shapes):
        w = jnp.asarray(rng.standard_normal((1, K, N)) * 0.02,
                        jnp.float32)
        pk_i, s_i = _w4(w)
        layers[f"pk{i}"], layers[f"s{i}"] = pk_i[0], s_i[0]
        del w
    gb = sum(layers[f"pk{i}"].nbytes for i in range(4)) * 32 / 1e9

    def make_matmul(variant, block_n, budget):
        unpack = variant.startswith("u")

        def kernel(he_ref, ho_ref, s_a_ref, pk_ref, sw_ref, out_ref,
                   acc_ref, *, gh):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            pkt = pk_ref[...]
            bk, bn = pkt.shape
            gk = bk // gh
            if unpack:
                pki = pkt.astype(jnp.int32)
                lo = jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(pki, 28), 28).astype(jnp.int8)
                hi = jax.lax.shift_right_arithmetic(
                    pki, 4).astype(jnp.int8)
            else:                       # floor: garbage values
                lo = pkt
                hi = pkt
            dn = (((2,), (1,)), ((0,), (0,)))
            p = (jax.lax.dot_general(he_ref[...], lo.reshape(gk, gh, bn),
                                     dn, preferred_element_type=jnp.int32)
                 + jax.lax.dot_general(ho_ref[...],
                                       hi.reshape(gk, gh, bn), dn,
                                       preferred_element_type=jnp.int32))
            acc_ref[...] += jnp.sum(p.astype(jnp.float32) * sw_ref[...],
                                    axis=0)

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                out_ref[...] = (acc_ref[...] * s_a_ref[...]
                                ).astype(out_ref.dtype)

        @jax.jit
        def matmul(h, pk, s_w):
            from aurora_tpu.ops.pallas.quant_matmul import (
                quantize_activations)
            B, K = h.shape
            G, gh, N = pk.shape
            bn = N if (block_n == 0 or N % block_n) else block_n
            h8, s_a = quantize_activations(h)
            Bp = 32
            h8 = jnp.pad(h8, ((0, Bp - B), (0, 0)))
            s_a = jnp.pad(s_a, ((0, Bp - B), (0, 0)))
            he = h8[:, 0::2].reshape(Bp, G, gh).transpose(1, 0, 2)
            ho = h8[:, 1::2].reshape(Bp, G, gh).transpose(1, 0, 2)
            cap = max(1, budget // (gh * bn))
            gk = max(d for d in range(1, G + 1)
                     if G % d == 0 and d <= cap)
            bk = gk * gh
            return pl.pallas_call(
                functools.partial(kernel, gh=gh),
                grid=(N // bn, (G * gh) // bk),
                in_specs=[
                    pl.BlockSpec((gk, Bp, gh), lambda j, k: (k, 0, 0)),
                    pl.BlockSpec((gk, Bp, gh), lambda j, k: (k, 0, 0)),
                    pl.BlockSpec((Bp, 1), lambda j, k: (0, 0)),
                    pl.BlockSpec((bk, bn), lambda j, k: (k, j)),
                    pl.BlockSpec((gk, 1, bn), lambda j, k: (k, 0, j)),
                ],
                out_specs=pl.BlockSpec((Bp, bn), lambda j, k: (0, j)),
                out_shape=jax.ShapeDtypeStruct((Bp, N), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((Bp, bn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(he, ho, s_a.astype(jnp.float32), pk.reshape(G * gh, N),
              s_w.reshape(G, 1, N).astype(jnp.float32))[:B]
        return matmul

    # value check once (u_i32shift, fullN, vs the engine's _w4dot)
    mm0 = make_matmul("u_i32shift", 0, 2 << 20)
    h0 = jnp.asarray(rng.standard_normal((8, 11008)), jnp.bfloat16)
    got = np.asarray(jax.device_get(
        mm0(h0, layers["pk3"], layers["s3"])), np.float32)
    want = np.asarray(jax.device_get(
        _w4dot(h0, layers["pk3"], layers["s3"])), np.float32)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"[probe] value check (fullN, G=86): rel_err={err:.2e}",
          file=sys.stderr)

    x0 = jnp.zeros((8, 4096), jnp.bfloat16)
    xi0 = jnp.zeros((8, 11008), jnp.bfloat16)

    cases = [("bn512", 512, 3 << 20), ("bn1024", 1024, 3 << 20),
             ("bn2048", 2048, 2 << 20), ("fullN", 0, 2 << 20),
             ("fullN_big", 0, 4 << 20)]
    for variant in ("floor", "u_i32shift"):
        for tag, bn, budget in cases:
            mm = make_matmul(variant, bn, budget)

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

            try:
                r = scan32(layers, x0, xi0)
                jax.device_get(r.ravel()[0])
                t0 = time.perf_counter()
                for _ in range(8):
                    r = scan32(layers, x0, xi0)
                jax.device_get(r.ravel()[0])
                ms = (time.perf_counter() - t0) / 8 * 1e3
                print(f"[probe] scan32_{variant}_{tag}: {ms:.2f} ms "
                      f"-> {gb / ms * 1e3:.0f}GB/s", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"[probe] scan32_{variant}_{tag}: FAIL "
                      f"{str(e)[:140]}", file=sys.stderr)


if __name__ == "__main__":
    main()
