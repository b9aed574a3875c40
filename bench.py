"""Round benchmark on real TPU hardware.

Primary metric: AuroraCap-7B (Vicuna-7B shape) batched decode throughput —
the serving hot loop (one compiled step, batch 8, 512-token context), the
path sglang accelerates with CUDA graphs + FlashInfer in the reference.
Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is null: the reference publishes no wall-clock numbers
(BASELINE.md — `published` is empty).

Environment notes (see .claude/skills/verify): the TPU is reached through a
single-stream relay whose transport stalls on large messages —
block_until_ready does not sync, and multi-MB HLO payloads (e.g. the
32-distinct-shape ToMe ViT unroll) can wedge it. The decode program is a
compact lax.scan HLO and the 7B weights are initialized on device, so
nothing big crosses the pipe; timing chains N dispatches host-side and
syncs once with device_get ((t_N − t_1)/(N − 1) cancels the RPC constant).
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from aurora_tpu.models.llama import (LlamaConfig, init_kv_cache,
                                         init_llama_params, llama_apply)

    cfg = LlamaConfig.vicuna_7b_v15_16k()
    B, CTX, S = 8, 128, 256   # 7B bf16 ≈13.5G; KV ≈1.1G; v5e has 15.75G
    print("[bench] init 7B params on device", file=sys.stderr)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    cache = init_kv_cache(cfg, B, S, jnp.bfloat16)

    # fill the cache to CTX with one prefill call (compact scan HLO)
    ids = jnp.ones((B, CTX), jnp.int32)
    print("[bench] prefill", file=sys.stderr)

    @jax.jit
    def prefill(params, ids, cache):
        _, cache = llama_apply(params, cfg, input_ids=ids, kv_cache=cache,
                               cache_len=0)
        return cache
    t0 = time.perf_counter()
    cache = prefill(params, ids, cache)
    jax.device_get(cache["k"][0, 0, 0, 0, 0])
    compile_prefill = time.perf_counter() - t0
    t0 = time.perf_counter()
    cache = prefill(params, ids, cache)
    jax.device_get(cache["k"][0, 0, 0, 0, 0])
    prefill_s = time.perf_counter() - t0
    print(f"[bench] prefill {prefill_s:.2f}s "
          f"(compile {compile_prefill:.1f}s)", file=sys.stderr)

    # params MUST be jit arguments: closing over them embeds 13.5GB of
    # constants into the HLO, which has to cross the relay pipe — the
    # root cause of every earlier bench stall.
    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_step(params, tok, cache):
        logits, cache = llama_apply(params, cfg, input_ids=tok,
                                    kv_cache=cache, cache_len=CTX)
        nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        return nxt, cache

    tok = jnp.ones((B, 1), jnp.int32)

    def run(n, cache):
        t = tok
        for _ in range(n):
            t, cache = decode_step(params, t, cache)
        float(np.asarray(jax.device_get(t))[0, 0])  # sync
        return cache

    t0 = time.perf_counter()
    cache = run(2, cache)
    print(f"[bench] compile+warm {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    cache = run(1, cache)
    t1 = time.perf_counter() - t0
    iters = 100
    t0 = time.perf_counter()
    cache = run(iters + 1, cache)
    tN = time.perf_counter() - t0
    dt = max(tN - t1, 1e-9) / iters
    print(f"[bench] t1={t1:.2f}s tN={tN:.2f}s per-step={dt*1e3:.2f}ms",
          file=sys.stderr)

    detail = {"ms_per_step": round(dt * 1e3, 2),
              "batch": B, "context": CTX,
              "prefill_s": round(prefill_s, 3),
              "prefill_tokens_per_s": round(B * CTX / prefill_s, 1),
              "backend": jax.default_backend()}

    # secondary: flagship ViT-H/14 + ToMe visual encode (8 frames @378,
    # ratio 0.1) — params free first so the 7B weights don't pin HBM
    try:
        del params, cache
        detail.update(_vit_encode_bench(jax, jnp))
    except Exception as e:  # noqa: BLE001
        detail["vit_encode_error"] = str(e)[:200]

    print(json.dumps({
        "metric": "auroracap7b_decode_throughput_b8_bf16",
        "value": round(B / dt, 1),
        "unit": "tokens/s (batched serving decode, 1x v5e chip)",
        "vs_baseline": None,
        "detail": detail,
    }))


def _vit_encode_bench(jax, jnp, frames=8, kept_ratio=0.1, iters=50):
    from aurora_tpu.models.vit import (ViTConfig, init_vit_params,
                                       vit_encode)
    from aurora_tpu.models.projector import (ProjectorConfig,
                                             apply_projector,
                                             init_projector_params)
    cfg = ViTConfig.dfn5b_vit_h_378()
    pj_cfg = ProjectorConfig(visual_hidden_size=cfg.hidden_size,
                             llm_hidden_size=4096, depth=2)
    rng = jax.random.PRNGKey(0)
    params = init_vit_params(rng, cfg, dtype=jnp.bfloat16)
    pj = init_projector_params(rng, pj_cfg, dtype=jnp.bfloat16)
    px = jnp.asarray(np.random.default_rng(0).standard_normal(
        (frames, 3, 378, 378)), jnp.bfloat16)

    @jax.jit
    def enc(params, pj, px):
        feats = vit_encode(params, px, cfg, kept_ratio=kept_ratio,
                           select_layer=-2)
        return jnp.sum(apply_projector(pj, feats, pj_cfg)
                       .astype(jnp.float32))

    def run(n):
        out = None
        for _ in range(n):
            out = enc(params, pj, px)
        return float(np.asarray(jax.device_get(out)))

    t0 = time.perf_counter()
    run(2)
    print(f"[bench] vit compile+warm {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    run(1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(iters + 1)
    tN = time.perf_counter() - t0
    dt = max(tN - t1, 1e-9) / iters
    print(f"[bench] vit per-clip={dt*1e3:.2f}ms", file=sys.stderr)
    return {"vit_encode_ms_per_8f_clip_r0.1": round(dt * 1e3, 2),
            "vit_encode_clips_per_s": round(1.0 / dt, 1)}


def main_with_retries(attempts: int = 3):
    """The remote-TPU tunnel drops connections under load; retry transient
    transport failures inside one process (the claim survives)."""
    for i in range(attempts):
        try:
            return main()
        except Exception as e:  # noqa: BLE001 — transport errors vary
            if i == attempts - 1:
                raise
            print(f"[bench] attempt {i + 1} failed ({e}); retrying",
                  file=sys.stderr)
            time.sleep(30)


if __name__ == "__main__":
    main_with_retries()
