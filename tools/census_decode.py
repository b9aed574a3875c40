"""HLO census of the compiled W4+int8KV decode block (VERDICT r5 #1's
"where does the remaining time go" note).

Decomposition so far (TPU, b8/ctx1k, 32-layer block, ms/step):
  engine 18.33 = block 17.69 + 0.64 host
  block ≈ W4 weight stream 9.2 (Pallas kernel, measured standalone)
        + int8 KV attention ~3.0 (2.1GB @ 710GB/s)
        + lm_head int8 ~0.4
        + ~5 UNACCOUNTED — this census hunts that remainder.

Prints: cost_analysis totals (bytes accessed / flops), the HBM-scale
ops in the optimized HLO (fusions/copies/convert touching >16MB), and
per-category byte totals. Usage:
  python tools/census_decode.py [--batch 8] [--ctx 1024]
"""

import argparse
import collections
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1,
                "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f16": 2,
                "u64": 8, "s64": 8}


def _shape_bytes(sh: str) -> int:
    """'f32[32,8,32,1024]{...}' -> byte count (0 for tuples/tokens)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", sh)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--min-mb", type=float, default=16.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aurora_tpu.models.llama import LlamaConfig, init_llama_params
    from aurora_tpu.serve.engine import (EngineConfig, ServeEngine,
                                         fuse_serving_weights,
                                         quantize_weights_int4)
    from aurora_tpu.serve.scheduler import Request

    cfg = LlamaConfig.vicuna_7b_v15_16k()
    params = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    params = quantize_weights_int4(params, free_source=True)
    params = fuse_serving_weights(params, free_source=True)
    B, K = args.batch, args.steps
    ecfg = EngineConfig(max_batch=B, max_seq_len=args.ctx + 256,
                        num_slots=128, prefill_buckets=(args.ctx,),
                        kv_chunk=256, decode_steps=K, kv_quant="int8")
    eng = ServeEngine(params, cfg, ecfg)
    host = np.random.default_rng(0)
    for i in range(B):
        eng.add_request(Request(
            rid=f"s{i}",
            input_ids=[int(t) for t in host.integers(10, 30000,
                                                     size=args.ctx)],
            max_new_tokens=200, eos_ids=(-1,)))
    for _ in range(10000):
        eng.step()
        if all(r is not None and r.output_ids for r in eng.row_reqs):
            break
    print("[census] batch live", file=sys.stderr)

    from aurora_tpu.serve.engine import _samp_arrays
    rows_live = [r for r in eng.row_reqs if r is not None]
    samp = _samp_arrays(rows_live, B, [r.batch_row for r in rows_live])
    tok = jnp.zeros((B,), jnp.int32)
    act = jnp.ones((B,), bool)
    pos = jnp.asarray([args.ctx + 2] * B, jnp.int32)
    key = jax.random.PRNGKey(1)

    from aurora_tpu.serve import engine as E
    lowered = E._decode_block.lower(
        eng.params, eng.rows, eng.counts, eng.seen, tok, pos, act,
        samp, key, cfg=cfg, chunk=min(ecfg.kv_chunk, ecfg.s_row),
        K=K, all_greedy=True, want_logprobs=False)
    comp = lowered.compile()

    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    ba = float(ca.get("bytes accessed", 0.0))
    fl = float(ca.get("flops", 0.0))
    print(f"[census] cost_analysis: bytes accessed "
          f"{ba / 1e9:.2f}GB/block = {ba / 1e9 / K:.3f}GB/step; "
          f"flops {fl / 1e12:.2f}T/block", file=sys.stderr)
    # per-step theoretical time at the ragged kernel's measured 710GB/s
    print(f"[census] stream floor @710GB/s: "
          f"{ba / 710e9 / K * 1e3:.2f} ms/step", file=sys.stderr)

    hlo = comp.as_text()
    # census: top ops by output bytes (optimized HLO, post-fusion)
    pat = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*([a-z0-9]+\["
                     r"[\d,]*\][^ ]*)\s+([a-z\-]+)\(", re.M)
    cat = collections.Counter()
    big = []
    for name, shape, op in pat.findall(hlo):
        b = _shape_bytes(shape)
        cat[op] += b
        if b >= args.min_mb * 1e6:
            big.append((b, op, name, shape.split("{")[0]))
    print(f"[census] output-bytes by op (top 12):", file=sys.stderr)
    for op, b in cat.most_common(12):
        print(f"  {op:<22s} {b / 1e9:8.2f} GB/block "
              f"{b / 1e9 / K:7.3f} GB/step", file=sys.stderr)
    big.sort(reverse=True)
    print(f"[census] ops with output >= {args.min_mb}MB:",
          file=sys.stderr)
    for b, op, name, shape in big[:25]:
        print(f"  {b / 1e6:9.1f}MB {op:<14s} {name:<40s} {shape}",
              file=sys.stderr)
    print("CENSUS DONE", file=sys.stderr)


if __name__ == "__main__":
    main()
