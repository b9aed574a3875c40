"""In-context decode-block geometry sweep on real TPU.

probe_block_bisect found the block is SUPERADDITIVE: weights-only
8.47ms + attention-only 5.86ms + skeleton 0.4ms but the full block is
17.76 — a ~4ms/step interaction penalty (kernel-boundary stalls /
pipeline ramps between the 5 custom calls per layer). Isolated-best
geometry may not be in-context-best: sweep attention chunk and weight
tile (bn, budget) inside the REAL _decode_block.

Usage: python tools/probe_block_sweep.py
"""

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
    from aurora_tpu.ops.pallas.quant_matmul import w4_tile_layout

    cfg = LlamaConfig.vicuna_7b_v15_16k()
    L, B, S, K = cfg.num_hidden_layers, 8, 1280, 32
    Hkv, hd, V = (cfg.num_key_value_heads, cfg.head_dim, cfg.vocab_size)

    params = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    params = eng.quantize_weights_int4(params, free_source=True)
    flat = eng.fuse_serving_weights(params, free_source=True)
    jax.device_get(jax.tree.leaves(flat)[0].ravel()[0])
    print("[sweep] flat params ready", file=sys.stderr)

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

    def tile(bn, budget):
        layers = dict(flat["layers"])
        for name in list(layers):
            if not name.endswith("_scale4"):
                continue
            base = name[:-7]
            pk = layers[base]
            if pk.ndim != 4 or pk.shape[-1] % bn:
                continue
            layers[base], layers[name] = w4_tile_layout(
                pk, layers[name], block_n=bn, budget=budget)
        return {**flat, "layers": layers}

    def run(tag, p, chunk):
        nonlocal rows, counts, seen
        jax.clear_caches()

        def call():
            nonlocal rows, counts, seen
            out = eng._decode_block(p, rows, counts, seen, tok, pos,
                                    act, samp, key, cfg=cfg,
                                    chunk=chunk, K=K, all_greedy=True,
                                    want_logprobs=False)
            (sampled, _tl, _tp, _ti, counts, seen, rows,
             _tn, _pn) = out
            return sampled

        try:
            t0 = time.perf_counter()
            r = call()
            jax.device_get(r.ravel()[0])
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(4):
                r = call()
            jax.device_get(r.ravel()[0])
            ms = (time.perf_counter() - t0) / 4 / K * 1e3
            print(f"[sweep] {tag}: {ms:.2f} ms/step (compile {dt:.0f}s)",
                  file=sys.stderr)
            return ms
        except Exception as e:  # noqa: BLE001
            print(f"[sweep] {tag}: FAIL {str(e)[:120]}", file=sys.stderr)
            return None

    out = {}
    for bn, bud, wtag in ((512, 3 << 20, "bn512b3M"),
                          (256, 3 << 20, "bn256b3M"),
                          (512, 1 << 20, "bn512b1M"),
                          (512, 6 << 20, "bn512b6M")):
        p = tile(bn, bud)
        jax.device_get(jax.tree.leaves(p)[0].ravel()[0])
        for chunk in (256, 640):
            tag = f"{wtag}_ck{chunk}"
            out[tag] = run(tag, p, chunk)
        del p
    # flat (untiled) baseline at the best chunk for reference
    out["flat_ck256"] = run("flat_ck256", flat, 256)

    import json
    print(json.dumps({k: (round(v, 2) if v else None)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
