"""Serving latency/throughput microbench.

Parity: sglang bench_latency.py (src/sglang/python/sglang/bench_latency.py)
— measures prefill latency and decode tokens/s of the continuous-batching
engine on randomly initialized weights of a given size.

  python -m aurora_tpu.cli.bench_latency --preset vicuna-7b \
      --batch 8 --prompt-len 512 --decode-steps 64
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


PRESETS = {
    "tiny": dict(vocab_size=32000, hidden_size=512, intermediate_size=1024,
                 num_hidden_layers=8, num_attention_heads=8,
                 num_key_value_heads=8),
    "1b": dict(vocab_size=32000, hidden_size=2048, intermediate_size=5504,
               num_hidden_layers=16, num_attention_heads=16,
               num_key_value_heads=16),
    "vicuna-7b": dict(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=32,
                      max_position_embeddings=16384,
                      rope_linear_scaling=4.0),
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="tiny", choices=sorted(PRESETS))
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prompt-len", type=int, default=512)
    p.add_argument("--decode-steps", type=int, default=64)
    p.add_argument("--max-seq-len", type=int, default=2048)
    p.add_argument("--block-steps", type=int, default=1,
                   help="decode steps fused into one compiled program "
                        "(EngineConfig.decode_steps)")
    p.add_argument("--kv-quant", default="none", choices=["none", "int8", "int4"])
    p.add_argument("--weight-quant", default="none",
                   choices=["none", "int8", "int4"])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    args = p.parse_args()

    from aurora_tpu.models.llama import LlamaConfig, init_llama_params
    from aurora_tpu.serve.engine import EngineConfig, ServeEngine
    from aurora_tpu.serve.scheduler import Request

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = LlamaConfig(**PRESETS[args.preset])
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype)
    from aurora_tpu.serve.engine import (fuse_serving_weights,
                                         quantize_weights_int4,
                                         quantize_weights_int8)
    if args.weight_quant == "int8":
        params = quantize_weights_int8(params, free_source=True)
    elif args.weight_quant == "int4":
        params = quantize_weights_int4(params, free_source=True)
    params = fuse_serving_weights(params, free_source=True)
    ecfg = EngineConfig(
        max_batch=args.batch, max_seq_len=args.max_seq_len,
        num_slots=args.batch * args.max_seq_len + 1,
        prefill_buckets=(args.prompt_len,), kv_dtype=dtype,
        decode_steps=args.block_steps, kv_quant=args.kv_quant,
        weight_quant=args.weight_quant)
    engine = ServeEngine(params, cfg, ecfg)

    rng = np.random.default_rng(0)

    def submit_all():
        for i in range(args.batch):
            ids = [int(x) for x in
                   rng.integers(3, cfg.vocab_size, size=args.prompt_len)]
            engine.add_request(Request(
                rid=f"w{i}", input_ids=ids, eos_ids=(-1,),
                max_new_tokens=args.decode_steps))

    # warmup: compile extend + decode
    submit_all()
    while engine.has_work():
        engine.step()

    # timed run
    submit_all()
    t0 = time.perf_counter()
    engine._admit()
    # force completion of all extends before timing decode
    jax.block_until_ready(engine.rows["k"])
    t_prefill = time.perf_counter() - t0

    steps = 0
    t0 = time.perf_counter()
    while engine.has_work():
        engine.step()
        steps += 1
    jax.block_until_ready(engine.rows["k"])
    t_decode = time.perf_counter() - t0

    decode_tokens = args.batch * args.decode_steps
    print(json.dumps({
        "preset": args.preset, "batch": args.batch,
        "prompt_len": args.prompt_len,
        "prefill_s": round(t_prefill, 3),
        "prefill_tokens_per_s": round(
            args.batch * args.prompt_len / max(t_prefill, 1e-9), 1),
        "decode_steps": args.decode_steps,
        "decode_tokens_per_s": round(
            decode_tokens / max(t_decode, 1e-9), 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
