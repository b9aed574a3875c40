"""Mistral family: llama decoder + GQA + sliding-window attention, HF
parity (sglang srt/models/mistral.py capability parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from aurora_tpu.models.convert import (llama_config_from_hf,
                                       llama_params_from_hf)
from aurora_tpu.models.llama import LlamaConfig, llama_apply

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_mistral():
    cfg = transformers.MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        sliding_window=8, rms_norm_eps=1e-5,
        attn_implementation="eager")
    torch.manual_seed(1)
    model = transformers.MistralForCausalLM(cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    jcfg = llama_config_from_hf(cfg.to_dict())
    assert jcfg.sliding_window == 8
    params = llama_params_from_hf(sd, jcfg, dtype=jnp.float32)
    return model, jcfg, params


def test_mistral_logits_match_hf(hf_mistral, rng):
    model, cfg, params = hf_mistral
    ids = rng.integers(3, 256, size=(2, 24))  # T > window
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.float().numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                               atol=2e-3)


def test_mistral_window_masks_distant_tokens(hf_mistral, rng):
    """Editing a token farther back than the window must not change the
    last-position logits (pure SWA model)."""
    model, cfg, params = hf_mistral
    ids = rng.integers(3, 256, size=(1, 30))
    ids2 = ids.copy()
    ids2[0, 2] = (ids2[0, 2] + 1) % 250 + 3  # far outside every window
    a, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    b, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids2))
    # distance from pos 2 to pos 29 is 27 > 3 layers * window 8 = 24?
    # information propagates one window per layer: 3*8 = 24 < 27 → no path
    np.testing.assert_allclose(np.asarray(a[0, -1]), np.asarray(b[0, -1]),
                               rtol=1e-4, atol=1e-4)


def test_mistral_kv_cache_decode(hf_mistral, rng):
    from aurora_tpu.models.llama import init_kv_cache
    model, cfg, params = hf_mistral
    ids = rng.integers(3, 256, size=(1, 20))
    full, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    logits, cache = llama_apply(params, cfg,
                                input_ids=jnp.asarray(ids[:, :10]),
                                kv_cache=cache, cache_len=0)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full[:, :10]), rtol=2e-3,
                               atol=2e-3)
    for t in range(10, 20):
        logits, cache = llama_apply(params, cfg,
                                    input_ids=jnp.asarray(ids[:, t:t+1]),
                                    kv_cache=cache, cache_len=t)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, t]), rtol=2e-3,
                                   atol=2e-3)
