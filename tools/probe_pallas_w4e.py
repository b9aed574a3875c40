"""Probe round 5: isolate the fullN failure per shape, full traceback."""

import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build(K, N, budget=2 << 20):
    from aurora_tpu.serve.engine import _w4
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((1, K, N)) * 0.02, jnp.float32)
    pk, s = _w4(w)
    pk, s = pk[0], s[0]

    def kernel(he_ref, ho_ref, s_a_ref, pk_ref, sw_ref, out_ref,
               acc_ref, *, gh):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        pkt = pk_ref[...]
        bk, bn = pkt.shape
        gk = bk // gh
        pki = pkt.astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(pki, 28), 28).astype(jnp.int8)
        hi = jax.lax.shift_right_arithmetic(pki, 4).astype(jnp.int8)
        dn = (((2,), (1,)), ((0,), (0,)))
        p = (jax.lax.dot_general(he_ref[...], lo.reshape(gk, gh, bn),
                                 dn, preferred_element_type=jnp.int32)
             + jax.lax.dot_general(ho_ref[...], hi.reshape(gk, gh, bn),
                                   dn, preferred_element_type=jnp.int32))
        acc_ref[...] += jnp.sum(p.astype(jnp.float32)
                                * sw_ref[...][:, None, :], axis=0)

        @pl.when(k == pl.num_programs(0) - 1)
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
        Bp = 32
        h8 = jnp.pad(h8, ((0, Bp - B), (0, 0)))
        s_a = jnp.pad(s_a, ((0, Bp - B), (0, 0)))
        he = h8[:, 0::2].reshape(Bp, G, gh).transpose(1, 0, 2)
        ho = h8[:, 1::2].reshape(Bp, G, gh).transpose(1, 0, 2)
        cap = max(1, budget // (gh * N))
        gk = max(d for d in range(1, G + 1) if G % d == 0 and d <= cap)
        bk = gk * gh
        print(f"  shapes: G={G} gh={gh} gk={gk} bk={bk} N={N} "
              f"grid=({(G * gh) // bk},)", file=sys.stderr)
        return pl.pallas_call(
            functools.partial(kernel, gh=gh),
            grid=((G * gh) // bk,),
            in_specs=[
                pl.BlockSpec((gk, Bp, gh), lambda k: (k, 0, 0)),
                pl.BlockSpec((gk, Bp, gh), lambda k: (k, 0, 0)),
                pl.BlockSpec((Bp, 1), lambda k: (0, 0)),
                pl.BlockSpec((bk, N), lambda k: (k, 0)),
                pl.BlockSpec((gk, N), lambda k: (k, 0)),
            ],
            out_specs=pl.BlockSpec((Bp, N), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((Bp, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((Bp, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(he, ho, s_a.astype(jnp.float32), pk.reshape(G * gh, N),
          s_w.reshape(G, N).astype(jnp.float32))[:B]
    return matmul, pk, s


def main():
    from aurora_tpu.serve.engine import _w4dot
    rng = np.random.default_rng(1)
    for K, N in [(4096, 4096), (4096, 12288), (4096, 22016),
                 (11008, 4096)]:
        print(f"[probe] fullN K={K} N={N}", file=sys.stderr)
        try:
            mm, pk, s = build(K, N)
            h = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
            out = mm(h, pk, s)
            got = np.asarray(jax.device_get(out), np.float32)
            want = np.asarray(jax.device_get(_w4dot(h, pk, s)),
                              np.float32)
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            # timing: 32 chained calls
            outs = [mm(h, pk, s) for _ in range(32)]
            jax.device_get(outs[-1].ravel()[0])
            t0 = time.perf_counter()
            outs = [mm(h, pk, s) for _ in range(64)]
            jax.device_get(outs[-1].ravel()[0])
            ms = (time.perf_counter() - t0) / 64 * 1e3
            gbs = pk.nbytes / (ms / 1e3) / 1e9
            print(f"[probe]   OK rel_err={err:.2e} {ms:.3f}ms "
                  f"{gbs:.0f}GB/s", file=sys.stderr)
        except Exception:  # noqa: BLE001
            traceback.print_exc()
            print(f"[probe]   FAIL (above)", file=sys.stderr)


if __name__ == "__main__":
    main()
