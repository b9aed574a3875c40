"""DeepSeek-V2 MLA + shared-expert MoE parity vs HF transformers
(xtuner transformers_models/deepseek_v2 + sglang srt/models/deepseek_v2
capability parity)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from aurora_tpu.models.deepseek_v2 import (DeepseekV2Config,
                                           deepseek_v2_apply,
                                           deepseek_v2_config_from_hf,
                                           deepseek_v2_params_from_hf,
                                           init_deepseek_v2_kv_cache)

transformers = pytest.importorskip("transformers")


def _build(q_lora_rank=None, seed=0):
    cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        kv_lora_rank=32, q_lora_rank=q_lora_rank, head_dim=24,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        routed_scaling_factor=1.0, norm_topk_prob=False,
        topk_method="greedy", n_group=1, topk_group=1,
        first_k_dense_replace=1, moe_layer_freq=1,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        attn_implementation="eager")
    torch.manual_seed(seed)
    model = transformers.DeepseekV2ForCausalLM(cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    jcfg = deepseek_v2_config_from_hf(cfg.to_dict())
    params = deepseek_v2_params_from_hf(sd, jcfg, dtype=jnp.float32)
    return model, jcfg, params


@pytest.mark.parametrize("q_lora", [None, 24])
def test_deepseek_v2_logits_match_hf(q_lora, rng):
    """Both the V2-Lite (direct q) and full-V2 (q LoRA) MLA variants."""
    model, cfg, params = _build(q_lora_rank=q_lora)
    assert cfg.is_moe_layer(1) and not cfg.is_moe_layer(0)
    ids = rng.integers(3, 256, size=(2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.float().numpy()
    got, _ = deepseek_v2_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3,
                               atol=3e-3)


def test_deepseek_v2_kv_cache_decode(rng):
    model, cfg, params = _build()
    ids = rng.integers(3, 256, size=(1, 14))
    full, _ = deepseek_v2_apply(params, cfg, input_ids=jnp.asarray(ids))
    cache = init_deepseek_v2_kv_cache(cfg, 1, 20, dtype=jnp.float32)
    logits, cache = deepseek_v2_apply(
        params, cfg, input_ids=jnp.asarray(ids[:, :8]), kv_cache=cache,
        cache_len=0)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full[:, :8]),
                               rtol=3e-3, atol=3e-3)
    for t in range(8, 14):
        logits, cache = deepseek_v2_apply(
            params, cfg, input_ids=jnp.asarray(ids[:, t:t+1]),
            kv_cache=cache, cache_len=t)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full[:, t]),
                                   rtol=3e-3, atol=3e-3)


def test_init_params_with_realistic_expert_count():
    """Round-2 review: the fixed key pool ran dry at real expert counts
    (v2_lite has 64 routed experts)."""
    import jax
    cfg = DeepseekV2Config.tiny()
    import dataclasses as dc
    cfg = dc.replace(cfg, n_routed_experts=64, num_experts_per_tok=6)
    from aurora_tpu.models.deepseek_v2 import init_deepseek_v2_params
    p = init_deepseek_v2_params(jax.random.PRNGKey(0), cfg)
    assert len(p["layers"][1]["experts"]) == 64


def test_yarn_rope_parity(rng):
    """Every shipped V2 checkpoint uses YaRN; the converter must carry
    HF's exact inv_freq + attention scaling."""
    cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        kv_lora_rank=32, q_lora_rank=None, head_dim=24,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        topk_method="greedy", n_group=1, topk_group=1,
        first_k_dense_replace=1, max_position_embeddings=512,
        rope_scaling={"type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 128,
                      "beta_fast": 32, "beta_slow": 1},
        attn_implementation="eager")
    torch.manual_seed(5)
    model = transformers.DeepseekV2ForCausalLM(cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    jcfg = deepseek_v2_config_from_hf(cfg.to_dict())
    assert jcfg.rope_inv_freq is not None
    params = deepseek_v2_params_from_hf(sd, jcfg, dtype=jnp.float32)
    ids = rng.integers(3, 256, size=(1, 200))  # past the original 128
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.float().numpy()
    got, _ = deepseek_v2_apply(params, jcfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3,
                               atol=3e-3)


def test_group_limited_greedy_routing(rng):
    cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        kv_lora_rank=32, q_lora_rank=None, head_dim=24,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        topk_method="group_limited_greedy", n_group=4, topk_group=2,
        first_k_dense_replace=1, max_position_embeddings=128,
        attn_implementation="eager")
    torch.manual_seed(7)
    model = transformers.DeepseekV2ForCausalLM(cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    jcfg = deepseek_v2_config_from_hf(cfg.to_dict())
    assert jcfg.topk_method == "group_limited_greedy"
    params = deepseek_v2_params_from_hf(sd, jcfg, dtype=jnp.float32)
    ids = rng.integers(3, 256, size=(2, 10))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.float().numpy()
    got, _ = deepseek_v2_apply(params, jcfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3,
                               atol=3e-3)
