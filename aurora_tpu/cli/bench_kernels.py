"""Decode-attention kernel microbenchmark: ragged Pallas kernel vs the
round-1 XLA-gather path, at serving shapes (b8 x ctx2048, 7B head config).

Measures the bandwidth-bound serving hot op in isolation (no 13.5GB of
weights), reporting ms/call, achieved GB/s, and % of HBM speed-of-light.
Parity target: the reference's Triton decode kernel
(src/sglang/python/sglang/srt/layers/triton_attention/decode_attention.py).

Usage: python -m aurora_tpu.cli.bench_kernels [--batch 8] [--ctx 2048]
       [--layers 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

HBM_SOL_GBPS = {"v5e": 819.0, "v4": 1228.0, "v5p": 2765.0}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--ctx", type=int, default=2048)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--kv-heads", type=int, default=32)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--layers", type=int, default=8,
                   help="calls chained per dispatch (amortizes overhead)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--chunk", type=int, default=512)
    p.add_argument("--sol-gbps", type=float, default=819.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from aurora_tpu.ops.pallas.ragged_attention import ragged_attention

    B, S, Hq, Hkv, hd = (args.batch, args.ctx, args.heads, args.kv_heads,
                         args.head_dim)
    L = args.layers
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, hd)), jnp.bfloat16)
    k_rows = jnp.asarray(rng.standard_normal((B, Hkv, S, hd)) * 0.1,
                         jnp.bfloat16)
    v_rows = jnp.asarray(rng.standard_normal((B, Hkv, S, hd)) * 0.1,
                         jnp.bfloat16)
    kv_lens = jnp.full((B,), S, jnp.int32)
    offs = jnp.full((B,), S - 1, jnp.int32)
    row_ids = jnp.arange(B, dtype=jnp.int32)
    # gather-path operands: flat slot pool + per-row slot tables
    pool_k = jnp.asarray(
        rng.standard_normal((B * S, Hkv, hd)) * 0.1, jnp.bfloat16)
    pool_v = jnp.asarray(
        rng.standard_normal((B * S, Hkv, hd)) * 0.1, jnp.bfloat16)
    table = jnp.asarray(
        rng.permutation(B * S).reshape(B, S).astype(np.int32))
    kv_mask = jnp.ones((B, S), bool)
    q_pos = jnp.full((B, 1), S - 1, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_ragged(q, k_rows, v_rows, kv_lens, offs, row_ids, n):
        out = q
        for _ in range(n):
            out = ragged_attention(out.astype(q.dtype), k_rows, v_rows,
                                   kv_lens, offs, row_ids,
                                   chunk=args.chunk)
        return out

    def gather_attn(q, pk, pv, table, kv_mask, q_pos):
        """Round-1 serving decode attention (engine.py@1745ce7
        _pool_attention): token-granular gather + masked softmax."""
        k = pk[table]                      # [B, S, Hkv, hd]
        v = pv[table]
        if Hkv != Hq:
            k = jnp.repeat(k, Hq // Hkv, axis=2)
            v = jnp.repeat(v, Hq // Hkv, axis=2)
        scale = hd ** -0.5
        logits = jnp.einsum("bthd,bshd->bhts", q.astype(k.dtype) * scale,
                            k, preferred_element_type=jnp.float32)
        kv_pos = jnp.arange(S)[None, None, None, :]
        mask = kv_mask[:, None, None, :] & (kv_pos <= q_pos[:, None, :, None])
        logits = jnp.where(mask, logits, -2.38e38)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhts,bshd->bthd", probs, v)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_gather(q, pk, pv, table, kv_mask, q_pos, n):
        out = q
        for _ in range(n):
            out = gather_attn(out.astype(q.dtype), pk, pv, table, kv_mask,
                              q_pos)
        return out

    def time_fn(fn, *ops):
        # tunnel-safe timing: chain dispatches, sync once via device_get.
        # per-call = (long window − short window) / extra iterations, with
        # EACH window sampled twice and min-taken — a latency spike in
        # either leg would otherwise skew the difference in either
        # direction (the relay's RTT fluctuates run to run).
        def window(n_iters):
            t0 = time.perf_counter()
            out = None
            for _ in range(n_iters):
                out = fn(*ops, n=L)
            float(np.asarray(jax.device_get(out))[0, 0, 0, 0])
            return time.perf_counter() - t0
        t0 = time.perf_counter()
        window(1)  # compile + warm
        warm = time.perf_counter() - t0
        t1 = min(window(1), window(1))
        tN = min(window(args.iters + 1), window(args.iters + 1))
        per_call = max(tN - t1, 1e-9) / max(args.iters, 1) / L
        return warm, per_call

    kv_bytes = 2 * B * S * Hkv * hd * 2  # K+V, bf16

    print(f"[kbench] shapes B={B} S={S} Hq={Hq} Hkv={Hkv} hd={hd} "
          f"KV/call={kv_bytes / 1e6:.0f}MB backend={jax.default_backend()}",
          file=sys.stderr)
    warm_r, t_ragged = time_fn(run_ragged, q, k_rows, v_rows, kv_lens,
                               offs, row_ids)
    print(f"[kbench] ragged warm={warm_r:.1f}s per-call="
          f"{t_ragged * 1e3:.3f}ms", file=sys.stderr)
    warm_g, t_gather = time_fn(run_gather, q, pool_k, pool_v, table,
                               kv_mask, q_pos)
    print(f"[kbench] gather warm={warm_g:.1f}s per-call="
          f"{t_gather * 1e3:.3f}ms", file=sys.stderr)

    out = {
        "batch": B, "ctx": S, "kv_mb_per_call": round(kv_bytes / 1e6, 1),
        "ragged_ms": round(t_ragged * 1e3, 3),
        "gather_ms": round(t_gather * 1e3, 3),
        "ragged_gbps": round(kv_bytes / t_ragged / 1e9, 1),
        "gather_gbps": round(kv_bytes / t_gather / 1e9, 1),
        "ragged_pct_sol": round(100 * kv_bytes / t_ragged / 1e9
                                / args.sol_gbps, 1),
        "gather_pct_sol": round(100 * kv_bytes / t_gather / 1e9
                                / args.sol_gbps, 1),
        "speedup": round(t_gather / t_ragged, 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
