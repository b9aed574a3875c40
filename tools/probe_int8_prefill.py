"""Probe: does XLA reach the v5e int8 MXU rate (2x bf16) at PREFILL
shapes, and what does the full W4->int8 per-column requant chain cost?

The extend phase is pure MXU compute (r5b: 4.84s for 390 TFLOP at b20 =
80.2 TFLOPs = 40.7% of the 197-TFLOP bf16 peak). v5e's int8 pipe peaks
at 394 TOPs; if XLA emits int8 MXU matmuls at anywhere near that, a
W4A8 prefill path (per-layer requant of the resident packed-W4 tree to
per-column int8 + per-token A8 activations — the same numerics family
as the shipped W4A8 decode kernel) roughly halves the extend wall.

Run on the real TPU, ONE process:
  python tools/probe_int8_prefill.py [--t 5568]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warm=3):
    for _ in range(warm):
        r = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0][0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=5568)  # 4 lanes x 1392
    args = ap.parse_args()
    T = args.t
    shapes = [(4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096)]
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} T={T}")

    tot_bf, tot_i8, tot_chain = 0.0, 0.0, 0.0
    for K, O in shapes:
        h = jax.random.normal(key, (T, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, O), jnp.bfloat16)
        h8 = jnp.clip(jnp.round(h.astype(jnp.float32)), -127,
                      127).astype(jnp.int8)
        w8 = jnp.clip(jnp.round(w.astype(jnp.float32) * 50), -127,
                      127).astype(jnp.int8)
        flop = 2 * T * K * O

        @jax.jit
        def dot_bf(h, w):
            return jnp.dot(h, w, preferred_element_type=jnp.float32)

        @jax.jit
        def dot_i8(h8, w8):
            return jax.lax.dot_general(
                h8, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        t_bf = timeit(dot_bf, h, w)
        t_i8 = timeit(dot_i8, h8, w8)
        tot_bf += t_bf
        tot_i8 += t_i8
        print(f"[{K}x{O}] bf16 {t_bf*1e3:7.2f}ms {flop/t_bf/1e12:6.1f}"
              f" TF | int8 {t_i8*1e3:7.2f}ms {flop/t_i8/1e12:6.1f} TOPs"
              f" | speedup {t_bf/t_i8:4.2f}x")

        # full chain at wave shapes: W4 unpack + per-col requant + A8
        # activation quant + int8 dot + rescale (what _w4dot a8 would do)
        G, gh = K // 128, 64
        pk = jnp.clip(jnp.round(jax.random.normal(key, (G, gh, O)) * 8),
                      -127, 127).astype(jnp.int8)
        s4 = jnp.abs(jax.random.normal(key, (G, 1, O),
                                       jnp.float32)) * 0.01 + 1e-3

        @jax.jit
        def chain(h, pk, s4):
            four = jnp.int8(4)
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(pk, four), four)
            hi = jax.lax.shift_right_arithmetic(pk, four)
            q = jnp.stack([lo, hi], axis=2).reshape(G, 2 * gh, O)
            cs = jnp.max(s4, axis=0, keepdims=True) * (8.0 / 127.0)
            m = (s4 / cs).astype(jnp.float32)
            w8 = jnp.clip(jnp.round(q.astype(jnp.float32) * m), -127,
                          127).astype(jnp.int8).reshape(K, O)
            hf = h.astype(jnp.float32)
            s_a = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1,
                                      keepdims=True) / 127.0, 1e-12)
            h8 = jnp.clip(jnp.round(hf / s_a), -127,
                          127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                h8, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s_a
                    * cs.reshape(1, O)).astype(jnp.bfloat16)

        t_ch = timeit(chain, h, pk, s4)
        tot_chain += t_ch
        print(f"          a8 chain {t_ch*1e3:7.2f}ms "
              f"{flop/t_ch/1e12:6.1f} TF-equiv | vs bf16 "
              f"{t_bf/t_ch:4.2f}x")

    print(f"TOTAL bf16 {tot_bf*1e3:.2f}ms | int8 {tot_i8*1e3:.2f}ms "
          f"({tot_bf/tot_i8:.2f}x) | chain {tot_chain*1e3:.2f}ms "
          f"({tot_bf/tot_chain:.2f}x)")


if __name__ == "__main__":
    main()
