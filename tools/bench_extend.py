"""Extend (prefill) breakdown on TPU: where did 8x1024 tok/s go?

Times, at the bench's exact wave shape (Bk=8, T=1024, 7B, W8+int8 KV):
  attn_kernel : ONE ragged_attention call (layer 0)
  extend_step : the engine's full compiled _extend_step (32 layers)

AURORA_EXTEND_QB sweeps the query-block size.
Usage: python tools/bench_extend.py [--t 1024] [--chunk 256]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--kv-quant", default="int8", choices=["int8", "none"])
    ap.add_argument("--weight-quant", default="int8",
                    choices=["int8", "int4"])
    ap.add_argument("--skip-step", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aurora_tpu.models.llama import LlamaConfig, init_llama_params
    from aurora_tpu.ops.pallas.ragged_attention import ragged_attention
    from aurora_tpu.serve.engine import (EngineConfig, ServeEngine,
                                         fuse_serving_weights,
                                         quantize_weights_int4,
                                         quantize_weights_int8)
    from aurora_tpu.serve.scheduler import Request

    cfg = LlamaConfig.vicuna_7b_v15_16k()
    B, T = args.batch, args.t
    L, H, hd = (cfg.num_hidden_layers, cfg.num_attention_heads,
                cfg.head_dim)
    S = -(-max(1280, T + 128) // 256) * 256
    quant = args.kv_quant == "int8"
    out = {"B": B, "T": T, "chunk": args.chunk, "kvq": args.kv_quant,
           "wq": args.weight_quant,
           "qb": os.environ.get("AURORA_EXTEND_QB", "256")}

    def timed(tag, fn, warm=1, iters=4):
        for _ in range(warm):
            r = fn()
        jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
        ms = (time.perf_counter() - t0) / iters * 1e3
        out[tag + "_ms"] = round(ms, 2)
        print(f"[ext] {tag}: {ms:.2f} ms", file=sys.stderr)

    # --- raw attention kernel at the wave shape -------------------------
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, T, H, hd), jnp.bfloat16)
    kdt = jnp.int8 if quant else jnp.bfloat16
    k_rows = jnp.zeros((L, B, H, S, hd), kdt)
    v_rows = jnp.zeros((L, B, H, S, hd), kdt)
    scales = (jnp.ones((L, B, H, S), jnp.float32) * 0.02
              if quant else None)
    lens = jnp.full((B,), T, jnp.int32)
    offs = jnp.zeros((B,), jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)

    attn = jax.jit(lambda q, k, v, ks, vs: ragged_attention(
        q, k, v, lens, offs, rows, chunk=args.chunk, layer=0,
        k_scales=ks, v_scales=vs))
    timed("attn_kernel", lambda: attn(q, k_rows, v_rows, scales, scales))
    out["attn_kernel_x32_ms"] = round(out["attn_kernel_ms"] * 32, 1)
    del k_rows, v_rows, scales

    if args.skip_step:
        print(__import__("json").dumps(out))
        return

    # --- full engine extend wave ---------------------------------------
    params = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    quantize = (quantize_weights_int4 if args.weight_quant == "int4"
                else quantize_weights_int8)
    params = quantize(params, free_source=True)
    params = fuse_serving_weights(params, free_source=True)
    ecfg = EngineConfig(max_batch=B, max_seq_len=S, num_slots=128,
                        prefill_buckets=(T,), kv_chunk=args.chunk,
                        kv_quant=args.kv_quant)
    eng = ServeEngine(params, cfg, ecfg)
    host = np.random.default_rng(0)

    def wave(tag):
        for i in range(B):
            eng.add_request(Request(
                rid=f"{tag}{i}",
                input_ids=[int(x) for x in host.integers(10, 30000,
                                                         size=T)],
                max_new_tokens=2, eos_ids=(-1,)))
        t0 = time.perf_counter()
        while eng.has_work():
            eng.step()
        return time.perf_counter() - t0

    wave("w")  # compile
    s = min(wave("a"), wave("b"))
    out["extend_wave_s"] = round(s, 3)
    out["prefill_tok_per_s"] = round(B * T / s, 1)
    print(__import__("json").dumps(out))


if __name__ == "__main__":
    main()
