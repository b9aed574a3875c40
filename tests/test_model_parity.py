"""Golden-parity tests vs HF transformers (torch CPU) on tiny configs.

Pattern follows the reference's own parity harness
(src/sglang/python/sglang/test/runners.py: HFRunner vs SRTRunner).
"""

import numpy as np
import pytest
import jax.numpy as jnp
import jax

from aurora_tpu.models.convert import (llama_config_from_hf,
                                       llama_params_from_hf,
                                       projector_params_from_hf,
                                       state_dict_from_torch_module,
                                       vit_config_from_hf,
                                       vit_params_from_hf)
from aurora_tpu.models.llama import (LlamaConfig, init_kv_cache, llama_apply,
                                     llama_lm_loss)
from aurora_tpu.models.projector import ProjectorConfig, apply_projector
from aurora_tpu.models.vit import ViTConfig, vit_encode

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# ViT vs transformers CLIP / SigLIP (token_kept_ratio = 1.0 → pure CLIP)
# ---------------------------------------------------------------------------

def _tiny_clip_cfg():
    from transformers import CLIPVisionConfig
    return CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14)


def test_vit_matches_hf_clip_ratio1(rng):
    from transformers import CLIPVisionModel
    torch.manual_seed(0)
    hf_cfg = _tiny_clip_cfg()
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = vit_config_from_hf(hf_cfg.to_dict() | {"model_type": "clip"})
    params = vit_params_from_hf(state_dict_from_torch_module(hf), cfg)

    px = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(px), output_hidden_states=True)
    want = hf_out.hidden_states[-2][:, 1:].numpy()

    got = np.asarray(vit_encode(params, jnp.asarray(px), cfg,
                                kept_ratio=1.0, select_layer=-2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_vit_pos_embed_interpolation_matches_torch_bicubic(rng):
    """Non-native resolution path: our static-table bicubic must equal
    torch F.interpolate(mode='bicubic', scale_factor=(r+0.1)/n)."""
    import math
    from aurora_tpu.models.vit import interpolate_pos_embedding

    cfg = ViTConfig(hidden_size=16, intermediate_size=32,
                    num_hidden_layers=2, num_attention_heads=2,
                    image_size=56, patch_size=14)  # native grid 4x4
    n = 4
    pos = rng.standard_normal((n * n + 1, 16)).astype(np.float32)

    h, w = 84, 112  # → 6 x 8 grid
    got = np.asarray(interpolate_pos_embedding(jnp.asarray(pos), cfg, h, w))

    pe = torch.from_numpy(pos)
    cls, patch = pe[:1], pe[1:]
    rows, cols = h // 14, w // 14  # reference's (w0, h0) = (rows, cols)
    out = torch.nn.functional.interpolate(
        patch.reshape(1, n, n, 16).permute(0, 3, 1, 2),
        scale_factor=((rows + 0.1) / math.sqrt(n * n),
                      (cols + 0.1) / math.sqrt(n * n)),
        mode="bicubic")
    out = out.permute(0, 2, 3, 1).reshape(-1, 16)
    want = torch.cat([cls, out], dim=0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vit_tome_reduces_tokens_and_runs(rng):
    cfg = ViTConfig(hidden_size=32, intermediate_size=64,
                    num_hidden_layers=3, num_attention_heads=4,
                    image_size=56, patch_size=14)
    from aurora_tpu.models.vit import init_vit_params, vit_tome_r
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    px = jnp.asarray(rng.standard_normal((1, 3, 56, 56)), jnp.float32)
    out_full = vit_encode(params, px, cfg, kept_ratio=1.0)
    out_merged = vit_encode(params, px, cfg, kept_ratio=0.1)
    assert out_full.shape[1] == 16
    r = vit_tome_r(cfg, 0.1, 56, 56)
    # select_layer=-2 → merges applied over first L-1 layers
    assert out_merged.shape[1] == 16 - (cfg.num_hidden_layers - 1) * r
    assert np.isfinite(np.asarray(out_merged)).all()


# ---------------------------------------------------------------------------
# Llama vs transformers LlamaForCausalLM
# ---------------------------------------------------------------------------

def _tiny_llama(rope_scaling=None):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    torch.manual_seed(1)
    hf_cfg = HFLlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_scaling=rope_scaling, attn_implementation="eager",
        tie_word_embeddings=False)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    return hf, cfg, params


@pytest.mark.parametrize("rope_scaling", [None,
                                          {"type": "linear", "factor": 4.0}])
def test_llama_logits_match_hf(rng, rope_scaling):
    hf, cfg, params = _tiny_llama(rope_scaling)
    ids = rng.integers(0, 128, size=(2, 17))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_llama_kv_cache_decode_matches_full_forward(rng):
    hf, cfg, params = _tiny_llama()
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 24)))
    full_logits, _ = llama_apply(params, cfg, input_ids=ids)

    # prefill 16 then decode 8 one at a time through the cache
    cache = init_kv_cache(cfg, 1, 64, dtype=jnp.float32)
    logits_p, cache = llama_apply(params, cfg, input_ids=ids[:, :16],
                                  kv_cache=cache, cache_len=0)
    step_logits = [logits_p[:, -1]]
    for t in range(16, 24):
        lg, cache = llama_apply(params, cfg, input_ids=ids[:, t:t + 1],
                                kv_cache=cache, cache_len=t)
        step_logits.append(lg[:, -1])
    got = jnp.stack(step_logits, axis=1)  # positions 15..23
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(full_logits[:, 15:24]),
                               rtol=1e-4, atol=1e-4)


def test_llama_greedy_matches_hf_generate(rng):
    hf, cfg, params = _tiny_llama()
    prompt = rng.integers(0, 128, size=(1, 9))
    with torch.no_grad():
        want = hf.generate(torch.from_numpy(prompt), max_new_tokens=12,
                           do_sample=False).numpy()[0, 9:]

    cache = init_kv_cache(cfg, 1, 64, dtype=jnp.float32)
    logits, cache = llama_apply(params, cfg,
                                input_ids=jnp.asarray(prompt),
                                kv_cache=cache, cache_len=0)
    toks = []
    tok = jnp.argmax(logits[:, -1], axis=-1)
    for t in range(12):
        toks.append(int(tok[0]))
        if t == 11:
            break
        lg, cache = llama_apply(params, cfg, input_ids=tok[:, None],
                                kv_cache=cache, cache_len=9 + t)
        tok = jnp.argmax(lg[:, -1], axis=-1)
    np.testing.assert_array_equal(np.asarray(toks), want)


def test_llama_loss_matches_hf(rng):
    hf, cfg, params = _tiny_llama()
    ids = rng.integers(0, 128, size=(2, 15))
    labels = ids.copy()
    labels[:, :5] = -100
    with torch.no_grad():
        want = hf(torch.from_numpy(ids),
                  labels=torch.from_numpy(labels)).loss.item()
    logits, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    got, n = llama_lm_loss(logits, jnp.asarray(labels))
    assert n == (labels[:, 1:] != -100).sum()
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


# ---------------------------------------------------------------------------
# Projector vs torch Sequential
# ---------------------------------------------------------------------------

def test_projector_matches_torch(rng):
    torch.manual_seed(2)
    seq = torch.nn.Sequential(
        torch.nn.Linear(24, 40), torch.nn.GELU(), torch.nn.Linear(40, 40))
    cfg = ProjectorConfig(visual_hidden_size=24, llm_hidden_size=40, depth=2)
    sd = {f"model.{k}": v.detach().numpy()
          for k, v in seq.state_dict().items()}
    params = projector_params_from_hf(sd, cfg)
    x = rng.standard_normal((2, 7, 24)).astype(np.float32)
    with torch.no_grad():
        want = seq(torch.from_numpy(x)).numpy()
    got = np.asarray(apply_projector(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_qwen2_logits_and_greedy_match_hf(rng):
    """Qwen2 family (qkv bias + GQA + tied embeddings) — sglang model-zoo
    breadth (srt/models/qwen2.py)."""
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM
    torch.manual_seed(9)
    hf_cfg = HFQwen2Config(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-6, rope_theta=10000,
        tie_word_embeddings=True, attn_implementation="eager")
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert cfg.qkv_bias and cfg.tie_word_embeddings
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    ids = rng.integers(0, 160, size=(2, 13))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)

    prompt = ids[:1, :7]
    with torch.no_grad():
        want_gen = hf.generate(torch.from_numpy(prompt), max_new_tokens=8,
                               do_sample=False).numpy()[0, 7:]
    from aurora_tpu.generate import generate
    embeds = jnp.take(params["embed_tokens"], jnp.asarray(prompt), axis=0)
    res = generate(params, cfg, embeds, jnp.ones((1, 7), bool),
                   max_new_tokens=8, eos_ids=(-1,))
    np.testing.assert_array_equal(np.asarray(res.tokens[0]), want_gen)


def test_mixtral_moe_logits_match_hf(rng):
    """Mixtral MoE family — top-2 renormalized routing, expert MLPs
    (xtuner transformers_models/mixtral + sglang fused_moe surface)."""
    from transformers import MixtralConfig as HFMixtralConfig
    from transformers import MixtralForCausalLM
    torch.manual_seed(10)
    hf_cfg = HFMixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False)
    hf = MixtralForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    ids = rng.integers(0, 128, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=4e-4, atol=4e-4)


def test_moe_grouped_matches_dense(rng):
    """Grouped (sort-by-expert + ragged_dot) MoE must equal the dense
    einsum formulation — same Mixtral routing, different schedule."""
    from aurora_tpu.ops.moe import init_moe_params, moe_mlp, moe_mlp_grouped
    params = init_moe_params(jax.random.PRNGKey(3), 4, 32, 48)
    x = jnp.asarray(rng.standard_normal((2, 9, 32)), jnp.float32)
    dense = moe_mlp(params, x, 2)
    grouped = moe_mlp_grouped(params, x, 2)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
    # router-logits variant agrees as well
    g2, logits = moe_mlp_grouped(params, x, 2, return_router_logits=True)
    _, logits_d = moe_mlp(params, x, 2, return_router_logits=True)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(logits_d), rtol=1e-6, atol=1e-6)
    # degenerate: every token to one expert (empty groups must be fine)
    params_skew = dict(params)
    params_skew["router"] = params["router"].at[:, 1:].set(-1e9)
    d = moe_mlp(params_skew, x, 2)
    g = moe_mlp_grouped(params_skew, x, 2)
    np.testing.assert_allclose(np.asarray(g), np.asarray(d),
                               rtol=2e-5, atol=2e-5)


def test_moe_load_balancing_loss(rng):
    from aurora_tpu.ops.moe import load_balancing_loss
    logits = jnp.asarray(rng.standard_normal((2, 10, 4)), jnp.float32)
    lb = float(load_balancing_loss(logits, 2))
    assert np.isfinite(lb) and lb > 0
    # perfectly uniform router → loss == E * E * (1/E) * (1/E) = 1
    uniform = jnp.zeros((2, 40, 4), jnp.float32)
    lb_u = float(load_balancing_loss(uniform, 2))
    np.testing.assert_allclose(lb_u, 1.0, rtol=1e-5)


def test_phi3_logits_match_hf(rng):
    """Phi-3 family — fused qkv_proj/gate_up_proj HF layout split into
    the canonical stacked params; llama semantics otherwise (sglang
    model-zoo parity)."""
    from transformers import Phi3Config as HFPhi3Config
    from transformers import Phi3ForCausalLM
    torch.manual_seed(11)
    hf_cfg = HFPhi3Config(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rms_norm_eps=1e-5, sliding_window=None, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False)
    hf = Phi3ForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    ids = rng.integers(0, 160, size=(2, 13))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=4e-4, atol=4e-4)
    # greedy decode parity through the generate path
    with torch.no_grad():
        want_gen = hf.generate(torch.from_numpy(ids[:1, :7]),
                               max_new_tokens=6,
                               do_sample=False).numpy()[0, 7:]
    from aurora_tpu.generate import generate
    embeds = jnp.take(params["embed_tokens"], jnp.asarray(ids[:1, :7]),
                      axis=0)
    res = generate(params, cfg, embeds, jnp.ones((1, 7), bool),
                   max_new_tokens=6, eos_ids=(-1,))
    np.testing.assert_array_equal(np.asarray(res.tokens[0]), want_gen)


def test_stablelm_logits_match_hf(rng):
    """StableLM family: torch LayerNorm (+bias) decoder norms, PARTIAL
    rotary (rotary_ndims = head_dim * partial_rotary_factor), optional
    qkv biases (modeling_stablelm; sglang srt/models/stablelm.py)."""
    from transformers import StableLmConfig, StableLmForCausalLM
    torch.manual_seed(51)
    hf_cfg = StableLmConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, partial_rotary_factor=0.25,
        use_qkv_bias=True, layer_norm_eps=1e-5,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False)
    hf = StableLmForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert (cfg.norm_type == "layernorm" and cfg.qkv_bias
            and cfg.rotary_dim == 4)  # 16 * 0.25
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    assert "input_norm_bias" in params["layers"]
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_olmo_logits_match_hf(rng):
    """OLMo family: NON-PARAMETRIC LayerNorm (ones/zeros synthesized at
    conversion) and the clip_qkv activation clamp (modeling_olmo;
    sglang srt/models/olmo.py)."""
    from transformers import OlmoConfig, OlmoForCausalLM
    torch.manual_seed(52)
    hf_cfg = OlmoConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, clip_qkv=0.4,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False)
    hf = OlmoForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert cfg.norm_type == "layernorm" and cfg.clip_qkv == 0.4
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    assert np.all(np.asarray(params["layers"]["input_norm"]) == 1.0)
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_glm4_logits_match_hf(rng):
    """GLM-4 family: INTERLEAVED-pair rotary lanes at partial factor
    0.5, fused gate_up MLP, qkv biases without o bias (modeling_glm;
    sglang srt/models/chatglm.py zoo parity)."""
    from transformers import GlmConfig, GlmForCausalLM
    torch.manual_seed(53)
    hf_cfg = GlmConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=256, rms_norm_eps=1e-5, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False)
    hf = GlmForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert cfg.rope_interleaved and cfg.rotary_dim == 8 and cfg.qkv_bias
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_starcoder2_logits_match_hf(rng):
    """Starcoder2 family: NON-GATED c_fc→gelu→c_proj MLP with biases
    everywhere (use_bias), LayerNorm norms (modeling_starcoder2;
    sglang srt/models zoo parity)."""
    from transformers import Starcoder2Config, Starcoder2ForCausalLM
    torch.manual_seed(54)
    hf_cfg = Starcoder2Config(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, use_bias=True, norm_epsilon=1e-5,
        hidden_act="gelu_pytorch_tanh", sliding_window=None,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False)
    hf = Starcoder2ForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert (cfg.norm_type == "layernorm" and cfg.mlp_style == "mlp"
            and cfg.hidden_act == "gelu_tanh" and cfg.qkv_bias)
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    assert "gate" not in params["layers"]
    assert "up_bias" in params["layers"]
    assert "o_bias" in params["layers"]
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_internlm2_remap_matches_llama_oracle(rng):
    """InternLM2 ships llama semantics under renamed keys and a fused
    group-interleaved wqkv (sglang srt/models/internlm2.py). No HF
    class exists in-image, so the oracle is a tiny torch llama whose
    state dict is re-packed INTO the internlm2 layout here (per-kv-group
    [q heads..., k, v] interleave) — converting it back through
    llama_params_from_hf must reproduce the llama logits exactly."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    torch.manual_seed(41)
    hq, hkv, hd = 4, 2, 16
    hf = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=hq,
        num_key_value_heads=hkv, max_position_embeddings=256,
        rms_norm_eps=1e-5, attn_implementation="eager",
        tie_word_embeddings=False)).eval()
    sd = state_dict_from_torch_module(hf)
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in sd.items()}

    # re-pack into internlm2 naming + fused interleaved wqkv
    qpk = hq // hkv
    out = {"tok_embeddings.weight": sd["embed_tokens.weight"],
           "norm.weight": sd["norm.weight"],
           "output.weight": sd["lm_head.weight"]}
    for i in range(2):
        q = sd[f"layers.{i}.self_attn.q_proj.weight"].reshape(
            hkv, qpk, hd, -1)
        k = sd[f"layers.{i}.self_attn.k_proj.weight"].reshape(
            hkv, 1, hd, -1)
        v = sd[f"layers.{i}.self_attn.v_proj.weight"].reshape(
            hkv, 1, hd, -1)
        out[f"layers.{i}.attention.wqkv.weight"] = np.concatenate(
            [q, k, v], axis=1).reshape(hkv * (qpk + 2) * hd, -1)
        for a, b in (("attention.wo", "self_attn.o_proj"),
                     ("feed_forward.w1", "mlp.gate_proj"),
                     ("feed_forward.w3", "mlp.up_proj"),
                     ("feed_forward.w2", "mlp.down_proj"),
                     ("attention_norm", "input_layernorm"),
                     ("ffn_norm", "post_attention_layernorm")):
            out[f"layers.{i}.{a}.weight"] = sd[f"layers.{i}.{b}.weight"]

    cfg_dict = hf.config.to_dict()
    cfg_dict["model_type"] = "internlm2"
    cfg_dict["bias"] = False
    cfg = llama_config_from_hf(cfg_dict)
    params = llama_params_from_hf(out, cfg, dtype=jnp.float32)
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_gemma1_logits_match_hf(rng):
    """Gemma (v1) through the UNIVERSAL llama path (no dedicated
    modeling file needed): GeGLU MLP, sqrt(d) embedding scale, (1+w)
    fp32-multiply RMSNorm absorbed at conversion, explicit head_dim,
    tied embeddings (modeling_gemma; sglang srt/models/gemma.py)."""
    from transformers import GemmaConfig as HFGemmaConfig
    from transformers import GemmaForCausalLM
    torch.manual_seed(31)
    hf_cfg = HFGemmaConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=24,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        hidden_activation="gelu_pytorch_tanh",
        attn_implementation="eager", tie_word_embeddings=True)
    hf = GemmaForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert (cfg.scale_embeddings and cfg.hidden_act == "gelu_tanh"
            and cfg.norm_upcast_mul and cfg.tie_word_embeddings)
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    assert "lm_head" not in params
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_qwen3_logits_match_hf(rng):
    """Qwen3 family — per-head RMSNorm on q/k pre-rope (qk-norm) and an
    explicit head_dim decoupled from hidden/heads
    (modeling_qwen3.Qwen3Attention; sglang srt/models zoo parity)."""
    from transformers import Qwen3Config as HFQwen3Config
    from transformers import Qwen3ForCausalLM
    torch.manual_seed(21)
    hf_cfg = HFQwen3Config(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=24,  # != hidden // heads
        max_position_embeddings=256, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False)
    hf = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert cfg.qk_norm and cfg.head_dim == 24 and not cfg.qkv_bias
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    assert params["layers"]["q_norm"].shape == (2, 24)
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_qwen3_moe_logits_match_hf(rng):
    """Qwen3-MoE — qk-norm attention + softmax-topk routing with
    norm_topk_prob, NO shared expert (modeling_qwen3_moe)."""
    from transformers import Qwen3MoeConfig as HFQwen3MoeConfig
    from transformers import Qwen3MoeForCausalLM
    torch.manual_seed(22)
    hf_cfg = HFQwen3MoeConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=256, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False)
    hf = Qwen3MoeForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert cfg.qk_norm and cfg.moe_router_mode == "softmax_topk"
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    assert "moe_shared_gate_w" not in params["layers"]  # no shared exp
    ids = rng.integers(0, 144, size=(2, 9))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_qwen2_moe_logits_match_hf(rng):
    """Qwen2-MoE family — softmax-then-topk routing (+optional renorm)
    and the sigmoid-gated always-on shared expert
    (modeling_qwen2_moe.Qwen2MoeSparseMoeBlock; sglang srt/models/
    qwen2_moe.py zoo parity)."""
    from transformers import Qwen2MoeConfig as HFQwen2MoeConfig
    from transformers import Qwen2MoeForCausalLM
    torch.manual_seed(12)
    hf_cfg = HFQwen2MoeConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=256, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False)
    hf = Qwen2MoeForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert cfg.moe_router_mode == "softmax_topk" and cfg.moe_norm_topk
    assert cfg.qkv_bias
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    assert "moe_shared_gate_w" in params["layers"]
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_commandr_logits_match_hf(rng):
    """Command-R (Cohere) family through the universal llama path:
    parallel attn+MLP residual off ONE shared input norm, bias-free
    mean-centered Cohere LayerNorm (fp32 weight mul), INTERLEAVED
    rotary lanes, per-head qk LayerNorm, logit_scale, tied embeddings
    (modeling_cohere; sglang srt/models/commandr.py zoo parity)."""
    from transformers import CohereConfig as HFCohereConfig
    from transformers import CohereForCausalLM
    torch.manual_seed(41)
    hf_cfg = HFCohereConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, use_qk_norm=True, logit_scale=0.25,
        layer_norm_eps=1e-5, max_position_embeddings=256,
        attn_implementation="eager", tie_word_embeddings=True)
    hf = CohereForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert (cfg.parallel_block and cfg.norm_type == "cohere"
            and cfg.rope_interleaved and cfg.qk_norm
            and cfg.logit_scale == 0.25 and cfg.tie_word_embeddings)
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    assert "post_attn_norm" not in params["layers"]
    assert params["layers"]["q_norm"].shape == (2, 4, 16)  # per-head
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_dbrx_logits_match_hf(rng):
    """DBRX through the universal llama path: fused Wqkv + clip_qkv,
    bias-free LayerNorms, and the fused-expert MoE (w1/v1/w2 [E*F, D],
    fp32-softmax-all → top-k → sum-normalized router) remapped into the
    per-expert layout (modeling_dbrx; sglang srt/models/dbrx.py)."""
    from transformers import DbrxConfig as HFDbrxConfig
    from transformers import DbrxForCausalLM
    from transformers.models.dbrx.configuration_dbrx import (
        DbrxAttentionConfig, DbrxFFNConfig)
    torch.manual_seed(43)
    hf_cfg = HFDbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=256,
        vocab_size=144,
        attn_config=DbrxAttentionConfig(kv_n_heads=2, clip_qkv=6.0,
                                        rope_theta=1e6),
        ffn_config=DbrxFFNConfig(ffn_hidden_size=48, moe_num_experts=4,
                                 moe_top_k=2,
                                 moe_normalize_expert_weights=1.0),
        attn_implementation="eager")
    hf = DbrxForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert (cfg.norm_type == "layernorm" and cfg.clip_qkv == 6.0
            and cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
            and cfg.moe_router_mode == "softmax_topk"
            and cfg.moe_norm_topk and cfg.rope_theta == 1e6)
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    assert "moe_router" in params["layers"]
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_gpt_bigcode_logits_match_hf(rng):
    """GPT-BigCode / Starcoder-v1 through the universal llama path:
    MQA (1 kv head) via fused c_attn split, LEARNED absolute position
    embeddings instead of rotary, non-gated GELU MLP, LayerNorm+bias,
    tied embeddings (modeling_gpt_bigcode; sglang
    srt/models/gpt_bigcode.py zoo parity)."""
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM
    torch.manual_seed(45)
    hf_cfg = GPTBigCodeConfig(
        vocab_size=144, n_embd=64, n_inner=128, n_layer=2, n_head=4,
        n_positions=256, multi_query=True,
        activation_function="gelu_pytorch_tanh",
        layer_norm_epsilon=1e-5, attn_implementation="eager",
        tie_word_embeddings=True)
    hf = GPTBigCodeForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert (cfg.learned_pos and cfg.num_key_value_heads == 1
            and cfg.mlp_style == "mlp" and cfg.norm_type == "layernorm"
            and cfg.qkv_bias and cfg.tie_word_embeddings)
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    assert params["wpe"].shape == (256, 64)
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_qwen_v1_remap_matches_llama_oracle(rng):
    """Qwen (v1) GPT-style layout: fused c_attn WITH bias, MLP
    w2=gate/w1=up/c_proj at intermediate_size//2, RMSNorm ln_ names.
    No HF-native class (trust_remote_code upstream) — oracle is a torch
    llama whose weights are re-emitted in the Qwen layout (the
    internlm2-test pattern; sglang srt/models/qwen.py weight mapping)."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    torch.manual_seed(47)
    hf = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=144, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, attention_bias=True,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        attn_implementation="eager", tie_word_embeddings=False)).eval()
    # qwen has no o-proj bias: zero it in the oracle so both sides match
    with torch.no_grad():
        for lyr in hf.model.layers:
            lyr.self_attn.o_proj.bias.zero_()
    sd = state_dict_from_torch_module(hf)
    out = {"transformer.wte.weight": sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for i in range(2):
        p = f"model.layers.{i}"
        b = f"transformer.h.{i}"
        for suf in ("weight", "bias"):
            out[f"{b}.attn.c_attn.{suf}"] = np.concatenate(
                [sd[f"{p}.self_attn.q_proj.{suf}"],
                 sd[f"{p}.self_attn.k_proj.{suf}"],
                 sd[f"{p}.self_attn.v_proj.{suf}"]], axis=0)
        out[f"{b}.attn.c_proj.weight"] = sd[f"{p}.self_attn.o_proj.weight"]
        out[f"{b}.mlp.w2.weight"] = sd[f"{p}.mlp.gate_proj.weight"]
        out[f"{b}.mlp.w1.weight"] = sd[f"{p}.mlp.up_proj.weight"]
        out[f"{b}.mlp.c_proj.weight"] = sd[f"{p}.mlp.down_proj.weight"]
        out[f"{b}.ln_1.weight"] = sd[f"{p}.input_layernorm.weight"]
        out[f"{b}.ln_2.weight"] = \
            sd[f"{p}.post_attention_layernorm.weight"]
    cfg = llama_config_from_hf({
        "model_type": "qwen", "vocab_size": 144, "hidden_size": 64,
        "intermediate_size": 192, "num_hidden_layers": 2,
        "num_attention_heads": 4, "layer_norm_epsilon": 1e-6,
        "rotary_emb_base": 10000.0, "seq_length": 256})
    assert cfg.qkv_bias and cfg.intermediate_size == 96
    params = llama_params_from_hf(out, cfg, dtype=jnp.float32)
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_exaone_remap_matches_llama_oracle(rng):
    """EXAONE: llama semantics under transformer.h / attn.attention /
    c_fc_0+c_fc_1 naming (sglang srt/models/exaone.py mapping)."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    torch.manual_seed(48)
    hf = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rms_norm_eps=1e-5, attn_implementation="eager",
        tie_word_embeddings=False)).eval()
    sd = state_dict_from_torch_module(hf)
    out = {"transformer.wte.weight": sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for i in range(2):
        p = f"model.layers.{i}"
        b = f"transformer.h.{i}"
        for a, c in (("attn.attention.q_proj", "self_attn.q_proj"),
                     ("attn.attention.k_proj", "self_attn.k_proj"),
                     ("attn.attention.v_proj", "self_attn.v_proj"),
                     ("attn.attention.out_proj", "self_attn.o_proj"),
                     ("mlp.c_fc_0", "mlp.gate_proj"),
                     ("mlp.c_fc_1", "mlp.up_proj"),
                     ("mlp.c_proj", "mlp.down_proj"),
                     ("ln_1", "input_layernorm"),
                     ("ln_2", "post_attention_layernorm")):
            out[f"{b}.{a}.weight"] = sd[f"{p}.{c}.weight"]
    cfg = llama_config_from_hf({
        "model_type": "exaone", "vocab_size": 144, "hidden_size": 64,
        "intermediate_size": 128, "num_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "layer_norm_epsilon": 1e-5, "activation_function": "silu",
        "max_position_embeddings": 256})
    params = llama_params_from_hf(out, cfg, dtype=jnp.float32)
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_chatglm_remap_matches_glm_oracle(rng):
    """ChatGLM-2/3 THUDM layout (fused query_key_value + bias, SwiGLU
    dense_h_to_4h [gate; up], MQA groups, interleaved half rotary) maps
    onto the validated GLM structural knobs — oracle is a torch
    GlmForCausalLM re-emitted in the chatglm key layout (sglang
    srt/models/chatglm.py parity)."""
    import transformers
    torch.manual_seed(49)
    hf = transformers.GlmForCausalLM(transformers.GlmConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, partial_rotary_factor=0.5,
        attention_bias=True, max_position_embeddings=256,
        rms_norm_eps=1e-5, pad_token_id=0, attn_implementation="eager",
        tie_word_embeddings=False)).eval()
    sd = state_dict_from_torch_module(hf)
    out = {"transformer.embedding.word_embeddings.weight":
           sd["model.embed_tokens.weight"],
           "transformer.encoder.final_layernorm.weight":
           sd["model.norm.weight"],
           "transformer.output_layer.weight": sd["lm_head.weight"]}
    for i in range(2):
        p = f"model.layers.{i}"
        b = f"transformer.encoder.layers.{i}"
        for suf in ("weight", "bias"):
            out[f"{b}.self_attention.query_key_value.{suf}"] = \
                np.concatenate([sd[f"{p}.self_attn.q_proj.{suf}"],
                                sd[f"{p}.self_attn.k_proj.{suf}"],
                                sd[f"{p}.self_attn.v_proj.{suf}"]],
                               axis=0)
        out[f"{b}.self_attention.dense.weight"] = \
            sd[f"{p}.self_attn.o_proj.weight"]
        # Glm HF packs gate_up_proj exactly like dense_h_to_4h
        out[f"{b}.mlp.dense_h_to_4h.weight"] = \
            sd[f"{p}.mlp.gate_up_proj.weight"]
        out[f"{b}.mlp.dense_4h_to_h.weight"] = \
            sd[f"{p}.mlp.down_proj.weight"]
        out[f"{b}.input_layernorm.weight"] = \
            sd[f"{p}.input_layernorm.weight"]
        out[f"{b}.post_attention_layernorm.weight"] = \
            sd[f"{p}.post_attention_layernorm.weight"]
    cfg = llama_config_from_hf({
        "model_type": "chatglm", "vocab_size": 144, "hidden_size": 64,
        "ffn_hidden_size": 128, "num_layers": 2,
        "num_attention_heads": 4, "multi_query_attention": True,
        "multi_query_group_num": 2, "kv_channels": 16,
        "add_qkv_bias": True, "layernorm_epsilon": 1e-5,
        "seq_length": 256, "rope_ratio": 1.0})
    assert (cfg.rope_interleaved and cfg.partial_rotary_factor == 0.5
            and cfg.qkv_bias and cfg.num_key_value_heads == 2)
    params = llama_params_from_hf(out, cfg, dtype=jnp.float32)
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_minicpm_scales_match_absorbed_oracle(rng):
    """MiniCPM's three scalar scalings (scale_emb on embeds, depth-scaled
    residual branches, dim_model_base/d on logits) applied as runtime
    knobs must equal the mathematically-absorbed plain-llama forward
    (embeds*se, o/down*sr, head*ls) — the scalings' defining property
    (sglang srt/models/minicpm.py:208-320)."""
    from aurora_tpu.models.llama import init_llama_params
    cfg_plain = LlamaConfig.tiny(vocab_size=128)
    params = init_llama_params(jax.random.PRNGKey(7), cfg_plain,
                               dtype=jnp.float32)
    cfg = llama_config_from_hf({
        "model_type": "minicpm", "vocab_size": 128, "hidden_size": 64,
        "intermediate_size": 128, "num_hidden_layers": 3,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "max_position_embeddings": 512, "rms_norm_eps": 1e-5,
        "scale_emb": 12.0, "scale_depth": 1.4, "dim_model_base": 16})
    assert cfg.embed_scale == 12.0 and abs(
        cfg.residual_scale - 1.4 / 3 ** 0.5) < 1e-9
    assert abs(cfg.logit_scale - 16 / 64) < 1e-9
    absorbed = jax.tree.map(lambda x: x, params)
    absorbed = {**absorbed, "embed_tokens":
                params["embed_tokens"] * 12.0,
                "lm_head": params["lm_head"] * (16 / 64),
                "layers": {**params["layers"],
                           "o": params["layers"]["o"] * cfg.residual_scale,
                           "down": params["layers"]["down"]
                           * cfg.residual_scale}}
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 9)))
    got, _ = llama_apply(params, cfg, input_ids=ids)
    want, _ = llama_apply(absorbed, cfg_plain, input_ids=ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def _deepseek_v1_hybrid_oracle():
    """Torch oracle for DeepSeek (v1): an HF llama whose MoE-tail layers
    get their mlp swapped for the reference DeepseekMoE semantics —
    fp32 softmax over ALL experts → top-k → optional renormalize →
    weighted expert sum + UNGATED always-on shared experts
    (sglang srt/models/deepseek.py:88-175). Attention/norms stay HF."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    from transformers.models.llama.modeling_llama import LlamaMLP

    class _DSMoE(torch.nn.Module):
        def __init__(self, base_cfg, moe_inter, E, k, shared_inter,
                     norm_topk):
            super().__init__()
            import copy
            mcfg = copy.deepcopy(base_cfg)
            mcfg.intermediate_size = moe_inter
            scfg = copy.deepcopy(base_cfg)
            scfg.intermediate_size = shared_inter
            self.gate = torch.nn.Linear(base_cfg.hidden_size, E,
                                        bias=False)
            self.experts = torch.nn.ModuleList(
                [LlamaMLP(mcfg) for _ in range(E)])
            self.shared_experts = LlamaMLP(scfg)
            self.k, self.norm_topk = k, norm_topk

        def forward(self, x):
            w = torch.softmax(self.gate(x).float(), dim=-1)
            topw, topi = torch.topk(w, self.k, dim=-1)
            if self.norm_topk:
                topw = topw / topw.sum(-1, keepdim=True)
            topw = topw.to(x.dtype)
            out = torch.zeros_like(x)
            for j in range(self.k):
                for e, expert in enumerate(self.experts):
                    m = topi[..., j] == e
                    if m.any():
                        out[m] += topw[..., j][m, None] * expert(x[m])
            return out + self.shared_experts(x)

    torch.manual_seed(51)
    hf_cfg = HFLlamaConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rms_norm_eps=1e-6, attn_implementation="eager",
        tie_word_embeddings=False)
    hf = LlamaForCausalLM(hf_cfg).eval()
    for i in (1, 2):  # first_k_dense_replace = 1
        hf.model.layers[i].mlp = _DSMoE(hf_cfg, moe_inter=48, E=4, k=2,
                                        shared_inter=80, norm_topk=True)
    torch.manual_seed(52)
    for i in (1, 2):
        for p in hf.model.layers[i].mlp.parameters():
            torch.nn.init.normal_(p, std=0.05)
    return hf.eval()


def _deepseek_v1_convert(hf):
    sd = state_dict_from_torch_module(hf)
    out = {k: v for k, v in sd.items() if ".mlp." not in k}
    out["model.layers.0.mlp.gate_proj.weight"] = \
        sd["model.layers.0.mlp.gate_proj.weight"]
    out["model.layers.0.mlp.up_proj.weight"] = \
        sd["model.layers.0.mlp.up_proj.weight"]
    out["model.layers.0.mlp.down_proj.weight"] = \
        sd["model.layers.0.mlp.down_proj.weight"]
    for i in (1, 2):
        p = f"model.layers.{i}.mlp"
        out[f"model.layers.{i}.mlp.gate.weight"] = sd[f"{p}.gate.weight"]
        for e in range(4):
            for n in ("gate_proj", "up_proj", "down_proj"):
                out[f"model.layers.{i}.mlp.experts.{e}.{n}.weight"] = \
                    sd[f"{p}.experts.{e}.{n}.weight"]
        for n in ("gate_proj", "up_proj", "down_proj"):
            out[f"model.layers.{i}.mlp.shared_experts.{n}.weight"] = \
                sd[f"{p}.shared_experts.{n}.weight"]
    cfg = llama_config_from_hf({
        "model_type": "deepseek", "vocab_size": 144, "hidden_size": 64,
        "intermediate_size": 128, "moe_intermediate_size": 48,
        "num_hidden_layers": 3, "num_attention_heads": 4,
        "num_key_value_heads": 2, "n_routed_experts": 4,
        "n_shared_experts": 1, "num_experts_per_tok": 2,
        "norm_topk_prob": True, "first_k_dense_replace": 1,
        "moe_layer_freq": 1, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 256})
    params = llama_params_from_hf(out, cfg, dtype=jnp.float32)
    return cfg, params


def test_deepseek_v1_logits_match_hybrid_oracle(rng):
    """DeepSeek (v1): dense prefix + MoE tail with ungated shared
    experts through the heterogeneous llama stack."""
    hf = _deepseek_v1_hybrid_oracle()
    cfg, params = _deepseek_v1_convert(hf)
    assert (cfg.first_k_dense == 1 and cfg.num_experts == 4
            and cfg.moe_router_mode == "softmax_topk"
            and cfg.moe_norm_topk)
    assert len(params["dense_layers"]) == 1
    assert "moe_shared_gate" in params["layers"]
    assert "moe_shared_gate_w" not in params["layers"]
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_deepseek_v1_kv_decode_matches_full(rng):
    """The heterogeneous stack's KV cache (unrolled prefix slices +
    scanned tail) stays consistent between full forward and
    cached decode."""
    hf = _deepseek_v1_hybrid_oracle()
    cfg, params = _deepseek_v1_convert(hf)
    ids = jnp.asarray(rng.integers(0, 144, size=(1, 12)))
    full_logits, _ = llama_apply(params, cfg, input_ids=ids)
    cache = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = llama_apply(params, cfg, input_ids=ids[:, :8],
                                kv_cache=cache, cache_len=0)
    np.testing.assert_allclose(np.asarray(logits[:, -1]),
                               np.asarray(full_logits[:, 7]),
                               rtol=2e-4, atol=2e-4)
    for t in range(8, 12):
        logits, cache = llama_apply(params, cfg,
                                    input_ids=ids[:, t:t + 1],
                                    attention_mask=(
                                        jnp.arange(16)[None, :] <= t),
                                    kv_cache=cache, cache_len=t)
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(full_logits[:, t]),
                                   rtol=2e-4, atol=2e-4)


def test_deepseek_all_moe_generic_branch(rng):
    """first_k_dense_replace=0 skips the dedicated deepseek-v1 path and
    converts through the GENERIC MoE branch — which must pick up
    DeepSeek's PLURAL 'mlp.shared_experts.' weights (regression: the
    probe checked only Qwen2's singular 'mlp.shared_expert.' and
    silently dropped the always-on shared experts)."""
    hf = _deepseek_v1_hybrid_oracle()
    DSMoE = type(hf.model.layers[1].mlp)
    hf.model.layers[0].mlp = DSMoE(hf.config, moe_inter=48, E=4, k=2,
                                   shared_inter=80, norm_topk=True)
    torch.manual_seed(53)
    for p in hf.model.layers[0].mlp.parameters():
        torch.nn.init.normal_(p, std=0.05)
    hf = hf.eval()

    sd = state_dict_from_torch_module(hf)
    out = {k: v for k, v in sd.items() if ".mlp." not in k}
    for i in range(3):
        p = f"model.layers.{i}.mlp"
        out[f"{p}.gate.weight"] = sd[f"{p}.gate.weight"]
        for e in range(4):
            for n in ("gate_proj", "up_proj", "down_proj"):
                out[f"{p}.experts.{e}.{n}.weight"] = \
                    sd[f"{p}.experts.{e}.{n}.weight"]
        for n in ("gate_proj", "up_proj", "down_proj"):
            out[f"{p}.shared_experts.{n}.weight"] = \
                sd[f"{p}.shared_experts.{n}.weight"]
    cfg = llama_config_from_hf({
        "model_type": "deepseek", "vocab_size": 144, "hidden_size": 64,
        "intermediate_size": 128, "moe_intermediate_size": 48,
        "num_hidden_layers": 3, "num_attention_heads": 4,
        "num_key_value_heads": 2, "n_routed_experts": 4,
        "n_shared_experts": 1, "num_experts_per_tok": 2,
        "norm_topk_prob": True, "first_k_dense_replace": 0,
        "moe_layer_freq": 1, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 256})
    assert cfg.first_k_dense == 0
    params = llama_params_from_hf(out, cfg, dtype=jnp.float32)
    assert "moe_shared_gate" in params["layers"]      # plural picked up
    assert "moe_shared_gate_w" not in params["layers"]  # ungated
    ids = rng.integers(0, 144, size=(2, 11))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = llama_apply(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)
