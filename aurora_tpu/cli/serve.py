"""Serving launch CLI.

Parity: src/sglang/python/sglang/launch_server_auroracap.py:10-20 and
launch_server (srt/server.py) flags that AuroraCap's docs exercise
(docs/auroracap/EVAL.md:81-92 — the VDC judge runs through this too).

  python -m aurora_tpu.cli.serve --model_path <hf-or-xtuner dir> \
      --port 30000 --max-batch 8 --mem-fraction 0.8
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True,
                   help="HF llama dir or xtuner-format AuroraCap dir")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=30000)
    p.add_argument("--max-batch", type=int, default=8,
                   help="running-batch rows; 0 → auto from free HBM")
    p.add_argument("--max-seq-len", type=int, default=4096)
    p.add_argument("--num-slots", type=int, default=0,
                   help="KV slots; 0 → sized from profiled free HBM "
                        "x --mem-fraction")
    p.add_argument("--mem-fraction", type=float, default=0.8)
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel replicas, one per local device "
                        "(sglang --dp / ControllerMulti parity)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel devices per replica: params on "
                        "heads/MLP width, KV rows on the head axis "
                        "(sglang --tp / TP-worker parity); must divide "
                        "num_key_value_heads")
    p.add_argument("--dispatch", default="shortest_queue",
                   choices=["shortest_queue", "round_robin"])
    p.add_argument("--decode-steps", type=int, default=1,
                   help="decode steps per host sync (hides dispatch "
                        "latency; sglang --num-continuous-decode-steps)")
    p.add_argument("--schedule-policy", default="lpm",
                   choices=["lpm", "fcfs", "lof", "random", "dfs-weight"])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--kv-quant", default="none", choices=["none", "int8", "int4"],
                   help="int8 KV + per-token scales: ~half the decode "
                        "HBM traffic, ~2x batch*context per chip")
    p.add_argument("--weight-quant", default="none",
                   choices=["none", "int8", "int4"],
                   help="int8 weights (per-output-channel): ~half the "
                        "weight HBM stream, up to ~2x decode throughput; "
                        "int4 (nibble-packed, g=128 grouped scales): "
                        "half of W8 again — buys KV rows/batch")
    p.add_argument("--disable-radix-cache", action="store_true",
                   help="disable prefix caching (sglang "
                        "--disable-radix-cache / ChunkCache): every "
                        "request prefills from scratch; skips the "
                        "prompt-KV pool copy on finish")
    p.add_argument("--aurora", action="store_true",
                   help="model_path is an xtuner-format AuroraCap dir; "
                        "enable multimodal /generate "
                        "(launch_server_auroracap parity)")
    p.add_argument("--token-kept-ratio", type=float, default=0.1,
                   help="ToMe ratio for serving "
                        "(launch_server_auroracap.py:18 tome_ratio)")
    p.add_argument("--image-size", type=int, default=378)
    args = p.parse_args()

    import os
    from transformers import AutoTokenizer
    from aurora_tpu.models.convert import (llama_config_from_hf,
                                           llama_params_from_hf,
                                           load_torch_state_dict,
                                           _read_config)
    from aurora_tpu.serve.api import launch_server
    from aurora_tpu.serve.engine import EngineConfig
    from aurora_tpu.serve.scheduler import SchedulePolicy

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    mm = None
    if args.aurora:
        from aurora_tpu.cli.infer import load_model
        from aurora_tpu.serve.multimodal import AuroraCapServing
        aparams, acfg, tokenizer = load_model(args.model_path, dtype)
        params, cfg = aparams["llm"], acfg.llm
        mm = AuroraCapServing(aparams, acfg, tokenizer,
                              kept_ratio=args.token_kept_ratio,
                              image_size=args.image_size)
    else:
        hf_cfg = _read_config(args.model_path)
        archs = hf_cfg.get("architectures") or []
        if any("Gemma2" in a for a in archs):
            from aurora_tpu.models.gemma2 import (gemma2_config_from_hf,
                                                  gemma2_params_from_hf,
                                                  gemma2_serving_config,
                                                  gemma2_serving_params)
            gcfg = gemma2_config_from_hf(hf_cfg)
            gparams = gemma2_params_from_hf(
                load_torch_state_dict(args.model_path), gcfg, dtype)
            cfg = gemma2_serving_config(gcfg)
            params = gemma2_serving_params(gparams)
        elif any("DeepseekV2" in a for a in archs):
            from aurora_tpu.models.deepseek_v2 import (
                deepseek_v2_config_from_hf, deepseek_v2_params_from_hf)
            from aurora_tpu.serve.mla import (deepseek_serving_config,
                                              deepseek_serving_params)
            dcfg = deepseek_v2_config_from_hf(hf_cfg)
            dparams = deepseek_v2_params_from_hf(
                load_torch_state_dict(args.model_path), dcfg, dtype)
            cfg = deepseek_serving_config(dcfg)
            params = deepseek_serving_params(dparams, dcfg)
        else:  # llama/vicuna/qwen2/mistral/mixtral families
            cfg = llama_config_from_hf(hf_cfg)
            params = llama_params_from_hf(
                load_torch_state_dict(args.model_path), cfg, dtype)
        tokenizer = AutoTokenizer.from_pretrained(args.model_path)

    if args.weight_quant == "int8":
        # quantize before the engine with free_source so peak HBM stays
        # ~1x the model (the engine-side flag would hold both copies)
        from aurora_tpu.serve.engine import quantize_weights_int8
        params = quantize_weights_int8(params, free_source=True)
    elif args.weight_quant == "int4":
        assert args.tp == 1, \
            "W4 packed layout is single-device (use W8 with --tp>1)"
        from aurora_tpu.serve.engine import quantize_weights_int4
        params = quantize_weights_int4(params, free_source=True)
    if args.tp == 1 and "layers" in params \
            and "q" in params.get("layers", {}):
        # pre-fuse qkv/gateup streams with free_source (same peak-HBM
        # argument); the engine skips its non-mutating fusion when the
        # tree is already fused
        from aurora_tpu.serve.engine import fuse_serving_weights
        params = fuse_serving_weights(params, free_source=True)

    ecfg = EngineConfig(max_batch=args.max_batch,
                        max_seq_len=args.max_seq_len,
                        num_slots=args.num_slots,
                        policy=SchedulePolicy(args.schedule_policy),
                        kv_dtype=dtype,
                        kv_quant=args.kv_quant,
                        decode_steps=args.decode_steps,
                        disable_radix_cache=args.disable_radix_cache,
                        tp=args.tp)
    if args.max_batch <= 0 or args.num_slots <= 0:
        # profile free HBM NOW (weights are resident, so they're already
        # subtracted) and size batch rows + radix pool from the rest —
        # sglang model_runner.py:317 profile_max_num_token analog
        from aurora_tpu.serve.engine import auto_engine_config
        ecfg = auto_engine_config(cfg, ecfg,
                                  mem_fraction=args.mem_fraction)
        print(f"[serve] auto-sized from free HBM: max_batch="
              f"{ecfg.max_batch} num_slots={ecfg.num_slots}")
    launch_server(params, cfg, tokenizer, host=args.host, port=args.port,
                  engine_cfg=ecfg, mm=mm, dp=args.dp,
                  dispatch=args.dispatch)


if __name__ == "__main__":
    main()
