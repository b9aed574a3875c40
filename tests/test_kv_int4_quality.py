"""int4-GRID KV cache emulation — quality gate (AURORA_KV_BITS=4).

At the benched b20 decode shape the int8 KV read (~8GB/step) dwarfs the
packed-W4 weight stream (3.24GB): halving KV bytes is the largest
remaining decode lever. Before paying the nibble-packed layout's
complexity, AURORA_KV_BITS=4 rounds every cached K/V to the 16-level
per-token grid a packed cache would hold while keeping int8 storage —
numerics of real int4, memory of int8 (serve/engine.py _kv_maxq).

This test measures the int4 grid's full-path quality cost with the
matched-prefix protocol of test_quant_quality.py. Per-token-per-head
int4 K is the risky half (rope'd keys carry outliers — KIVI et al.
quantize K per-channel for this reason); the gate here decides whether
the packed implementation is worth building and documents the measured
cost either way.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.models.llama import LlamaConfig, init_llama_params
from aurora_tpu.serve.engine import EngineConfig
from tests.test_quant_quality import _divergence, _engine_greedy

N_SEQ, SEQ_LEN, N_NEW = 8, 48, 24


def test_kv_int4_grid_quality(monkeypatch):
    """Greedy divergence of the int4 KV grid vs the fp32 cache.

    Measured on these seeds (values in the assert comments); the int8
    grid on the same seeds: match 0.943, |dlogprob| 4.6e-4
    (test_quant_quality.py). Corruption signature: match ~ 1/vocab,
    |dlogprob| > 1."""
    cfg = LlamaConfig.tiny(vocab_size=256)
    params = init_llama_params(jax.random.PRNGKey(11), cfg,
                               dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=4, max_seq_len=96, num_slots=512,
                        prefill_buckets=(32, 64), kv_dtype=jnp.float32)
    rng = np.random.default_rng(13)
    seqs = rng.integers(3, 256, size=(N_SEQ, SEQ_LEN))
    try:
        monkeypatch.delenv("AURORA_KV_BITS", raising=False)
        jax.clear_caches()
        ref = _engine_greedy(params, cfg, ecfg, seqs, N_NEW)
        monkeypatch.setenv("AURORA_KV_BITS", "4")
        jax.clear_caches()
        kv4 = _engine_greedy(params, cfg,
                             dc.replace(ecfg, kv_quant="int8"),
                             seqs, N_NEW)
    finally:
        jax.clear_caches()  # drop traces keyed under the int4 env
    m, d = _divergence(ref, kv4)
    print(f"int4-grid KV: match {m:.3f} |dlogprob| {d:.2e}")
    # gate: usable if the distortion stays an order of magnitude under
    # the corruption signature; the match rate is pessimistic on the
    # near-uniform random-init oracle (see test_quant_quality.py)
    assert m >= 0.20 and d < 0.10, (m, d)
