"""Gemma2 family parity vs HF transformers (eager attention): embeddings
scaling, (1+w) norms, GeGLU, softcapping, alternating sliding window, and
KV-cache decode (sglang srt/models/gemma2.py capability parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from aurora_tpu.models.gemma2 import (Gemma2Config, gemma2_apply,
                                      gemma2_config_from_hf,
                                      gemma2_params_from_hf)

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_gemma2():
    cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=128,
        sliding_window=8, query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        rms_norm_eps=1e-6, attn_implementation="eager")
    torch.manual_seed(0)
    model = transformers.Gemma2ForCausalLM(cfg).eval()
    # non-trivial norm weights (init is zeros → (1+w) = identity)
    with torch.no_grad():
        for p in model.named_parameters():
            if "layernorm" in p[0] or p[0].endswith("norm.weight"):
                p[1].uniform_(-0.3, 0.3)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    jcfg = gemma2_config_from_hf(cfg.to_dict())
    params = gemma2_params_from_hf(sd, jcfg, dtype=jnp.float32)
    return model, jcfg, params


def test_gemma2_logits_match_hf(hf_gemma2, rng):
    model, cfg, params = hf_gemma2
    # T > sliding_window so even layers actually window
    ids = rng.integers(3, 256, size=(2, 24))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.float().numpy()
    got, _ = gemma2_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                               atol=2e-3)


def test_gemma2_sliding_window_matters(hf_gemma2, rng):
    """Tokens beyond the window must NOT influence sliding layers: editing
    a token > window positions back changes global layers' output, which
    still shows — but an all-global variant must differ from the windowed
    one (guards against silently ignoring the window)."""
    model, cfg, params = hf_gemma2
    ids = rng.integers(3, 256, size=(1, 24))
    got, _ = gemma2_apply(params, cfg, input_ids=jnp.asarray(ids))
    no_window = {**params, "layers": {**params["layers"],
                 "sliding": jnp.zeros_like(params["layers"]["sliding"])}}
    got_g, _ = gemma2_apply(no_window, cfg, input_ids=jnp.asarray(ids))
    assert not np.allclose(np.asarray(got), np.asarray(got_g),
                           atol=1e-4)


def test_gemma2_kv_cache_decode_matches_full(hf_gemma2, rng):
    from aurora_tpu.models.gemma2 import init_gemma2_kv_cache
    model, cfg, params = hf_gemma2
    ids = rng.integers(3, 256, size=(1, 20))
    full, _ = gemma2_apply(params, cfg, input_ids=jnp.asarray(ids))

    cache = init_gemma2_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    logits, cache = gemma2_apply(params, cfg,
                                 input_ids=jnp.asarray(ids[:, :12]),
                                 kv_cache=cache, cache_len=0)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full[:, :12]),
                               rtol=2e-3, atol=2e-3)
    for t in range(12, 20):
        logits, cache = gemma2_apply(params, cfg,
                                     input_ids=jnp.asarray(ids[:, t:t+1]),
                                     kv_cache=cache, cache_len=t)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   rtol=2e-3, atol=2e-3)
