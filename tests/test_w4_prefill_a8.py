"""A8 (int8-MXU) prefill path for W4 serving — numerics gates.

AURORA_W4_PREFILL=a8 switches _w4dot's many-token branch from per-layer
bf16 dequantization to a per-output-channel int8 requant + per-token
int8 activations (serve/engine.py _w4dot) so the extend wave rides the
v5e int8 MXU pipe (2x the bf16 peak). Numerics family = the shipped
W4A8 decode kernel; these tests pin the added distortion:

  1. _w4dot-level relative error vs the bf16-dequant branch (pure A8
     activation-quant noise — the weight requant error is ~6% of the W4
     grid step);
  2. full-engine greedy divergence a8-prefill vs bf16-prefill on the
     SAME W4 tree (test_quant_quality.py's matched-prefix protocol —
     pessimistic on the random-init oracle, so the scale-free
     |dlogprob| bound is the real gate).

The env knob is read at TRACE time, so the engine test clears the jit
cache around each mode (same static cfg + shapes would otherwise reuse
the other mode's trace).
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.models.llama import LlamaConfig, init_llama_params
from aurora_tpu.serve.engine import (EngineConfig, _w4, _w4dot,
                                     quantize_weights_int4)
from tests.test_quant_quality import _divergence, _engine_greedy

N_SEQ, SEQ_LEN, N_NEW = 8, 48, 24


def test_w4dot_a8_close_to_bf16(monkeypatch):
    """Output of the a8 prefill branch tracks the bf16-dequant branch to
    A8 activation-quant noise (~1% rel L2 on gaussian data)."""
    monkeypatch.delenv("AURORA_W4_PREFILL", raising=False)
    w = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 192),
                          jnp.float32)
    pk, s = _w4(w)
    h = jax.random.normal(jax.random.PRNGKey(1), (96, 256), jnp.float32)
    ref = np.asarray(_w4dot(h, pk[0], s[0]), np.float64)
    monkeypatch.setenv("AURORA_W4_PREFILL", "a8")
    a8 = np.asarray(_w4dot(h, pk[0], s[0]), np.float64)
    rel = np.linalg.norm(a8 - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.03, rel
    # corruption signature (wrong scale axis / nibble swap) is rel ~ 1
    assert rel > 1e-6  # the branch actually ran (paths must differ)


def test_engine_greedy_a8_prefill(monkeypatch):
    """Full serving path: a8-prefill vs bf16-prefill on the same W4 tree.

    Measured on these seeds: both prefill modes start from logits that
    differ only by A8 noise, so the matched-prefix rate sits far above
    the W4-vs-fp32 rate (0.385 in test_quant_quality) and |dlogprob|
    stays in the A8 band. Corruption signature: match ~ 1/vocab and
    |dlogprob| > 1."""
    cfg = LlamaConfig.tiny(vocab_size=256)
    params = init_llama_params(jax.random.PRNGKey(11), cfg,
                               dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=4, max_seq_len=96, num_slots=512,
                        prefill_buckets=(32, 64), kv_dtype=jnp.float32,
                        weight_quant="int4")
    rng = np.random.default_rng(13)
    seqs = rng.integers(3, 256, size=(N_SEQ, SEQ_LEN))
    try:
        monkeypatch.delenv("AURORA_W4_PREFILL", raising=False)
        jax.clear_caches()
        ref = _engine_greedy(quantize_weights_int4(dict(params)), cfg,
                             ecfg, seqs, N_NEW)
        monkeypatch.setenv("AURORA_W4_PREFILL", "a8")
        jax.clear_caches()
        a8 = _engine_greedy(quantize_weights_int4(dict(params)), cfg,
                            ecfg, seqs, N_NEW)
    finally:
        # traces created under the a8 env are keyed only by shapes —
        # drop them so later tests in this process retrace cleanly
        jax.clear_caches()
    m, d = _divergence(ref, a8)
    assert m >= 0.30 and d < 0.05, (m, d)
