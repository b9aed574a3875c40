"""Decode-block IN-CONTEXT bisection on real TPU.

The additive decomposition (standalone probes: weights 8.1 + attention
~3.3 + head 1.2 + norms 0.4) predicts ~13ms/step, but the block holds
at ~17.7 regardless of kernel improvements (tiled weights −1.4ms
isolated, bf16 attention dots — block unchanged both times). So the
block's bound is structural, not the kernels. This probe recompiles
the REAL _decode_block with components stubbed to zeros (shapes
preserved) and diffs in ONE process:

  full            the shipping block
  no_attn         ragged_decode_attention -> zeros passthrough
  no_wdot         every layer matmul -> zeros
  no_head         _lm_head -> zeros (sampling kept)
  no_attn_wdot    both kernels out — the scan/VPU/sampling skeleton

Usage: python tools/probe_block_bisect.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import aurora_tpu.serve.engine as eng
    from aurora_tpu.models.llama import LlamaConfig, init_llama_params

    cfg = LlamaConfig.vicuna_7b_v15_16k()
    L, B, S, K = cfg.num_hidden_layers, 8, 1280, 32
    Hq, Hkv, hd, V = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.head_dim, cfg.vocab_size)

    params = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    params = eng.quantize_weights_int4(params, free_source=True)
    params = eng.fuse_serving_weights(params, free_source=True)
    params = eng._w4_tile_params(params)
    jax.device_get(jax.tree.leaves(params)[0].ravel()[0])
    print("[bisect] params ready", file=sys.stderr)

    rows = {
        "k": jnp.zeros((L, B, Hkv, S, hd), jnp.int8),
        "v": jnp.zeros((L, B, Hkv, S, hd), jnp.int8),
        "ks": jnp.ones((L, B, Hkv, S), jnp.float32),
        "vs": jnp.ones((L, B, Hkv, S), jnp.float32),
    }
    counts = jnp.zeros((B, V), jnp.int32)
    seen = jnp.zeros((B, V), jnp.bool_)
    tok = jnp.zeros((B,), jnp.int32)
    pos = jnp.asarray([1026] * B, jnp.int32)
    act = jnp.ones((B,), bool)
    key = jax.random.PRNGKey(1)
    samp = {"temp": np.zeros(B, np.float32),
            "top_k": np.zeros(B, np.int32),
            "top_p": np.ones(B, np.float32),
            "min_p": np.zeros(B, np.float32),
            "freq": np.zeros(B, np.float32),
            "pres": np.zeros(B, np.float32),
            "rep": np.ones(B, np.float32)}

    real_attn = eng.ragged_decode_attention
    real_wdot = eng._wdot
    real_head = eng._lm_head

    def stub_attn(q, k_new, v_new, k_rows, v_rows, kv_lens, row_ids, *,
                  layer, k_scales=None, v_scales=None, **kw):
        z = jnp.zeros(q.shape, q.dtype)
        if k_scales is not None:
            return z, k_rows, v_rows, k_scales, v_scales
        return z, k_rows, v_rows

    def stub_wdot(h, lp, name):
        w = lp[name]
        if name + "_scale4" in lp:
            O = (w.shape[0] * w.shape[3] if w.ndim == 4
                 else w.shape[-1])
        else:
            O = w.shape[-1]
        return jnp.zeros((*h.shape[:-1], O), h.dtype)

    def stub_head(params, cfg, x):
        return jnp.zeros((*x.shape[:-1], V), jnp.float32)

    def run(tag):
        nonlocal rows, counts, seen
        jax.clear_caches()

        def call():
            nonlocal rows, counts, seen
            out = eng._decode_block(params, rows, counts, seen, tok,
                                    pos, act, samp, key, cfg=cfg,
                                    chunk=256, K=K, all_greedy=True,
                                    want_logprobs=False)
            (sampled, _tl, _tp, _ti, counts, seen, rows,
             _tn, _pn) = out
            return sampled

        t0 = time.perf_counter()
        r = call()
        jax.device_get(r.ravel()[0])
        print(f"[bisect] {tag}: compile {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        for _ in range(4):
            r = call()
        jax.device_get(r.ravel()[0])
        ms = (time.perf_counter() - t0) / 4 / K * 1e3
        print(f"[bisect] {tag}: {ms:.2f} ms/step", file=sys.stderr)
        return ms

    out = {}
    out["full"] = run("full")

    eng.ragged_decode_attention = stub_attn
    out["no_attn"] = run("no_attn")
    eng.ragged_decode_attention = real_attn

    eng._wdot = stub_wdot
    out["no_wdot"] = run("no_wdot")
    eng._wdot = real_wdot

    eng._lm_head = stub_head
    out["no_head"] = run("no_head")
    eng._lm_head = real_head

    eng.ragged_decode_attention = stub_attn
    eng._wdot = stub_wdot
    out["no_attn_wdot"] = run("no_attn_wdot")
    eng.ragged_decode_attention = real_attn
    eng._wdot = real_wdot

    import json
    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
