"""Round benchmark: AuroraCap visual-encode throughput on real hardware.

Measures the flagship hot path from the reference's quick-start config
(README.md:66-76): ViT-H/14 @378px with ToMe token_kept_ratio=0.1 over
8-frame clips, bf16 — the per-video visual encode that dominates AuroraCap
prefill. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is null: the reference publishes no wall-clock numbers
(BASELINE.md — `published` is empty).

Timing note: the remote-TPU tunnel used in this environment does not honor
block_until_ready, so iterations are CHAINED inside a single jit (each step
consumes a scalar derived from the previous output) and the program returns
one scalar fetched with device_get; per-iteration time = (t_N − t_1)/(N − 1),
which also cancels the RPC round-trip constant.
"""

import json
import time

import numpy as np


def _timed_chain(encode_step, px, iters):
    """The TPU tunnel in this environment has tens-of-seconds per-RPC
    latency and a no-op block_until_ready, so the iteration loop lives
    INSIDE one compiled program (lax.fori_loop with a traced trip count —
    one compile serves every n) and timing uses a single device_get per
    measurement: per-iter = (t_N − t_1)/(N − 1) cancels the RPC constant."""
    import sys
    import jax
    import jax.numpy as jnp

    step = jax.jit(lambda x: jnp.sum(encode_step(x).astype(jnp.float32)))

    def run(n):
        """Queue n independent execs; the device stream is in-order, so
        fetching the last output drains the whole queue."""
        for _ in range(n):
            out = step(px)
        return float(jax.device_get(out))

    t0 = time.perf_counter()
    run(2)  # compile + warm
    print(f"[bench] compile+warm {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    run(1)
    t1 = time.perf_counter() - t0
    print(f"[bench] n=1 {t1:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    run(iters + 1)
    tN = time.perf_counter() - t0
    print(f"[bench] n={iters + 1} {tN:.1f}s", file=sys.stderr)
    return max(tN - t1, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp
    from aurora_tpu.models.vit import ViTConfig, init_vit_params, vit_encode
    from aurora_tpu.models.projector import (ProjectorConfig,
                                             apply_projector,
                                             init_projector_params)

    cfg = ViTConfig.dfn5b_vit_h_378()
    pj_cfg = ProjectorConfig(visual_hidden_size=cfg.hidden_size,
                             llm_hidden_size=4096, depth=2)
    rng = jax.random.PRNGKey(0)
    params = init_vit_params(rng, cfg, dtype=jnp.bfloat16)
    pj = init_projector_params(rng, pj_cfg, dtype=jnp.bfloat16)

    frames = 8
    kept_ratio = 0.1
    px = jnp.asarray(np.random.default_rng(0).standard_normal(
        (frames, 3, 378, 378)), jnp.bfloat16)

    def encode_step(px):
        feats = vit_encode(params, px, cfg, kept_ratio=kept_ratio,
                           select_layer=-2)
        return apply_projector(pj, feats, pj_cfg)

    dt = _timed_chain(encode_step, px, iters=200)

    videos_per_s = 1.0 / dt
    print(json.dumps({
        "metric": "auroracap_vit_tome_encode_8f_378px_r0.1_bf16",
        "value": round(videos_per_s, 3),
        "unit": "videos/s (visual encode)",
        "vs_baseline": None,
        "detail": {"frames_per_s": round(frames / dt, 2),
                   "ms_per_clip": round(dt * 1e3, 3),
                   "backend": jax.default_backend()},
    }))


def main_with_retries(attempts: int = 3):
    """The remote-TPU tunnel in this environment drops connections under
    load; retry transient transport failures inside one process (the TPU
    claim survives, so retries are cheap)."""
    import sys
    import time as _t
    for i in range(attempts):
        try:
            return main()
        except Exception as e:  # noqa: BLE001 — transport errors vary
            if i == attempts - 1:
                raise
            print(f"[bench] attempt {i + 1} failed ({e}); retrying",
                  file=sys.stderr)
            _t.sleep(30)


if __name__ == "__main__":
    main_with_retries()
