"""Serving-engine model-family coverage: Gemma2 (softcaps, 4 norms,
GeGLU, alternating SWA, scaled embeddings) and Mixtral (sparse MoE MLP)
served through the radix engine, parity-tested against the offline model
code — turning the model zoo from a training claim into a SERVING claim
(round-2 VERDICT item 5; sglang srt/models/gemma2.py + fused_moe/layer.py
parity)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aurora_tpu.models.gemma2 import (Gemma2Config, gemma2_apply,
                                      gemma2_serving_config,
                                      gemma2_serving_params,
                                      init_gemma2_params)
from aurora_tpu.models.llama import LlamaConfig, init_llama_params
from aurora_tpu.serve.engine import EngineConfig, ServeEngine
from aurora_tpu.serve.scheduler import Request


def _run_engine(engine, reqs):
    for r in reqs:
        engine.add_request(r)
    done = []
    for _ in range(500):
        done += engine.step()
        if not engine.has_work():
            break
    return {r.rid: r for r in done}


def _gemma2_offline_greedy(params, cfg, ids, max_new):
    """Greedy decode by full re-forward each step (tiny model oracle)."""
    ids = list(ids)
    out = []
    for _ in range(max_new):
        logits, _ = gemma2_apply(params, cfg,
                                 input_ids=jnp.asarray([ids + out]))
        tok = int(jnp.argmax(logits[0, -1]))
        out.append(tok)
    return out


@pytest.fixture(scope="module")
def tiny_gemma2():
    cfg = Gemma2Config.tiny(vocab_size=128)
    params = init_gemma2_params(jax.random.PRNGKey(3), cfg,
                                dtype=jnp.float32)
    return params, cfg


@pytest.mark.parametrize("tp", [1, 2])
def test_gemma2_served_matches_offline(tiny_gemma2, rng, tp):
    """Engine greedy decode == offline gemma2_apply greedy, with a
    prompt long enough (24 > window 8) that the alternating sliding
    windows actually bite, on one device and TP-sharded."""
    params, cfg = tiny_gemma2
    scfg = gemma2_serving_config(cfg)
    sparams = gemma2_serving_params(params)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16, tp=tp)
    engine = ServeEngine(sparams, scfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=24)]
    want = _gemma2_offline_greedy(params, cfg, ids, 6)
    done = _run_engine(engine, [Request(rid="g", input_ids=list(ids),
                                        max_new_tokens=6,
                                        eos_ids=(-1,))])
    assert done["g"].output_ids == want
    assert engine.check_memory()["leaked"] == 0


def test_gemma2_served_prefix_reuse(tiny_gemma2, rng):
    """Radix-cache prefix reuse stays correct under the gemma2 layer
    shape (scaled embeds + softcaps must not leak into cached KV)."""
    params, cfg = tiny_gemma2
    scfg = gemma2_serving_config(cfg)
    sparams = gemma2_serving_params(params)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    engine = ServeEngine(sparams, scfg, ecfg)
    base = [int(x) for x in rng.integers(3, 128, size=12)]
    w = _gemma2_offline_greedy(params, cfg, base, 5)
    d1 = _run_engine(engine, [Request(rid="1", input_ids=list(base),
                                      max_new_tokens=5, eos_ids=(-1,))])
    assert d1["1"].output_ids == w
    d2 = _run_engine(engine, [Request(rid="2", input_ids=list(base),
                                      max_new_tokens=5, eos_ids=(-1,))])
    assert d2["2"].output_ids == w
    assert len(d2["2"].prefix_slots) > 0  # cache hit happened


def test_mixtral_served_matches_offline(rng):
    """Sparse-MoE MLP (Mixtral family) through the serving engine:
    greedy decode == offline llama_apply-based generate."""
    from aurora_tpu.generate import generate
    cfg = dataclasses.replace(LlamaConfig.tiny(vocab_size=128),
                              num_experts=4, num_experts_per_tok=2)
    params = init_llama_params(jax.random.PRNGKey(5), cfg,
                               dtype=jnp.float32)
    assert "moe_router" in params["layers"]
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=14)]
    embeds = jnp.take(params["embed_tokens"], jnp.asarray([ids]), axis=0)
    res = generate(params, cfg, embeds, jnp.ones((1, len(ids)), bool),
                   max_new_tokens=6, eos_ids=(2,))
    want = [int(t) for t in
            np.asarray(res.tokens[0, :int(res.lengths[0])])]
    done = _run_engine(engine, [Request(rid="m", input_ids=list(ids),
                                        max_new_tokens=6)])
    assert done["m"].output_ids == want
    assert engine.check_memory()["leaked"] == 0
