"""Decode-step time breakdown on real TPU (VERDICT r2 weak-item 3).

Measures, at b8/ctx1k on the 7B:
  matmul_bound : 32 layers x 7 W8A8 matmuls only (the weight stream)
  step_chain   : _decode_step dispatched per token (donated buffers)
  block        : _decode_block (lax.scan over K) per token
  engine       : full ServeEngine.step() path per token

Chained dispatches + ONE final device_get (the relay does not sync on
block_until_ready). Usage: python tools/profile_decode.py [--steps 32]
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
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--weight-quant", default="int8",
                    choices=["int8", "int4", "none"])
    ap.add_argument("--kv-quant", default="int8", choices=["int8", "none"])
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CPU smoke of the harness itself)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aurora_tpu.models.llama import LlamaConfig, init_llama_params
    from aurora_tpu.serve.engine import (EngineConfig, ServeEngine,
                                         quantize_weights_int4,
                                         quantize_weights_int8, _wdot)
    from aurora_tpu.serve.scheduler import Request

    cfg = (LlamaConfig.tiny(vocab_size=1024) if args.tiny
           else LlamaConfig.vicuna_7b_v15_16k())
    params = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if args.weight_quant == "int8":
        params = quantize_weights_int8(params, free_source=True)
    elif args.weight_quant == "int4":
        params = quantize_weights_int4(params, free_source=True)
    K, B = args.steps, args.batch
    out = {"B": B, "ctx": args.ctx, "K": K, "wq": args.weight_quant,
           "kvq": args.kv_quant}

    def timed(tag, fn, warm=2, iters=4, per_call_tokens=1):
        for _ in range(warm):
            r = fn()
        jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
        ms = (time.perf_counter() - t0) / iters / per_call_tokens * 1e3
        out[tag + "_ms_per_step"] = round(ms, 2)
        print(f"[prof] {tag}: {ms:.2f} ms/step", file=sys.stderr)

    # --- 1. pure weight stream: x through every layer's 7 matmuls ------
    @jax.jit
    def matmul_only(params, x):
        # touches all 7 weight matrices once per layer; q/k/v/o outputs
        # are all [B, 4096] for vicuna (Hkv=Hq), so summing is legal
        def body(h, lp):
            s = (_wdot(h, lp, "q") + _wdot(h, lp, "k")
                 + _wdot(h, lp, "v") + _wdot(h, lp, "o"))
            g = _wdot(h, lp, "gate")
            u = _wdot(h, lp, "up")
            h = (h + s + _wdot(jax.nn.silu(g) * u, lp, "down")
                 ).astype(h.dtype)
            return h, None
        h, _ = jax.lax.scan(body, x, params["layers"])
        return h

    x = jnp.zeros((B, cfg.hidden_size), jnp.bfloat16)
    if not args.tiny:  # tiny GQA shapes break the q+k+v+o sum
        timed("matmul_bound", lambda: matmul_only(params, x))

    # --- engine setup (pre-fused like production: cli/serve.py) --------
    from aurora_tpu.serve.engine import fuse_serving_weights
    params = fuse_serving_weights(params, free_source=True)
    ecfg = EngineConfig(max_batch=B, max_seq_len=args.ctx + 256,
                        num_slots=128, prefill_buckets=(args.ctx,),
                        kv_chunk=256, decode_steps=K,
                        kv_quant=args.kv_quant)
    eng = ServeEngine(params, cfg, ecfg)
    host = np.random.default_rng(0)

    def submit(tag, n_new):
        for i in range(B):
            eng.add_request(Request(
                rid=f"{tag}{i}",
                input_ids=[int(t) for t in
                           host.integers(10, 30000, size=args.ctx)],
                max_new_tokens=n_new, eos_ids=(-1,)))

    # prefill B long-lived rows (eos -1; budget sized to the row space —
    # an unbounded max_new would fail sglang-style token-budget
    # admission); every later measurement reuses this live batch
    submit("s", 200)
    for _ in range(10000):
        finished = eng.step()
        bad = [r for r in finished if r.error is not None]
        if bad:
            raise RuntimeError(
                f"{len(bad)} requests failed in admission/extend: "
                f"{bad[0].rid}: {bad[0].error}")
        if all(r is not None and r.output_ids for r in eng.row_reqs):
            break
        if not eng.has_work():
            raise RuntimeError(
                "engine drained without a live batch (all requests "
                "finished or failed before timing)")
    print("[prof] batch live", file=sys.stderr)

    from aurora_tpu.serve.engine import _samp_arrays
    rows_live = [r for r in eng.row_reqs if r is not None
                 and r.finished is None]
    assert len(rows_live) == B, len(rows_live)
    samp_probe = _samp_arrays(rows_live, B,
                              [r.batch_row for r in rows_live])
    tok = jnp.zeros((B,), jnp.int32)
    act = jnp.ones((B,), bool)
    pos = jnp.asarray([args.ctx + 2] * B, jnp.int32)
    key = jax.random.PRNGKey(1)

    # --- 2. chained single-step dispatches ------------------------------
    def chain_steps():
        t = tok
        for j in range(K):
            (t, _lp, _tl, _ti, eng.counts, eng.seen,
             eng.rows) = eng._decode_fn(
                eng.params, eng.rows, eng.counts, eng.seen, t, pos,
                act, samp_probe, None, key, all_greedy=True,
                want_logprobs=False)
        return t
    timed("step_chain", chain_steps, per_call_tokens=K)

    # --- 3. the K-step block (lax.scan) ---------------------------------
    def block():
        (sampled, _tl, _tp, _ti, eng.counts, eng.seen,
         eng.rows, _tok_next, _pos_next) = eng._decode_block_fn(
            eng.params, eng.rows, eng.counts, eng.seen, tok, pos,
            act, samp_probe, key, K=K, all_greedy=True,
            want_logprobs=False)
        return sampled
    timed("block", block, per_call_tokens=K)

    # --- 4. full engine decode loop (admission/prefill excluded) --------
    def engine_blocks():
        t0 = time.perf_counter()
        for _ in range(2):
            eng.step()
        return (time.perf_counter() - t0) / (2 * K) * 1e3

    engine_blocks()  # warm any remaining shape
    ms = min(engine_blocks(), engine_blocks())
    out["engine_ms_per_step"] = round(ms, 2)
    print(f"[prof] engine: {ms:.2f} ms/step", file=sys.stderr)
    eng.fail_running()

    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
