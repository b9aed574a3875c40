"""Probe round 6: W4A8 kernel batch-pad (Bp) and k-tile budget sweep.

The kernel pads B to 32 sublanes; at decode B=8 that is 4x the MACs
and 4x the acc/out VMEM. int8 operands might want 32 sublanes (native
int8 tile (32, 128)) — or might not: measure Bp 8/16/32 x budget 3/6MB
at the fused 7B decode shapes (scan32, bn512, i32shift unpack).

Usage: python tools/probe_pallas_w4f.py
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

    def make_matmul(bp, budget, bn=512):
        def kernel(he_ref, ho_ref, s_a_ref, pk_ref, sw_ref, out_ref,
                   acc_ref, *, gh):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            pkt = pk_ref[...]
            bk, bn_ = pkt.shape
            gk = bk // gh
            pki = pkt.astype(jnp.int32)
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(pki, 28), 28).astype(jnp.int8)
            hi = jax.lax.shift_right_arithmetic(pki, 4).astype(jnp.int8)
            dn = (((2,), (1,)), ((0,), (0,)))
            p = (jax.lax.dot_general(he_ref[...],
                                     lo.reshape(gk, gh, bn_), dn,
                                     preferred_element_type=jnp.int32)
                 + jax.lax.dot_general(ho_ref[...],
                                       hi.reshape(gk, gh, bn_), dn,
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
            h8, s_a = quantize_activations(h)
            Bp = bp
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

    x0 = jnp.zeros((8, 4096), jnp.bfloat16)
    xi0 = jnp.zeros((8, 11008), jnp.bfloat16)

    for bp in (8, 16, 32):
        for budget in (3 << 20, 6 << 20):
            mm = make_matmul(bp, budget)

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

            tag = f"bp{bp}_bud{budget >> 20}M"
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
