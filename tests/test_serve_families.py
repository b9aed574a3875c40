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
    from utils import drain_engine
    return drain_engine(engine, reqs)


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


def test_internvl_served_matches_offline(rng):
    """InternVL (InternViT + pixel-shuffle projector + qwen2 decoder)
    through the radix engine via InternVLServing placeholders: greedy
    decode == offline generate over the fused embeds. (The modeling
    itself is HF-parity tested in test_internvl.py.)"""
    import torch
    import transformers

    from aurora_tpu.generate import generate
    from aurora_tpu.models.aurora import fuse_multimodal
    from aurora_tpu.models.convert import llama_config_from_hf
    from aurora_tpu.models.internvl import (InternVLConfig,
                                            internvit_config_from_hf,
                                            internvl_image_features,
                                            internvl_params_from_hf)
    from aurora_tpu.serve.multimodal import InternVLServing
    from aurora_tpu.utils.constants import IMAGE_TOKEN_INDEX

    vision = transformers.InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        norm_type="layer_norm", layer_scale_init_value=0.1,
        use_mean_pooling=True)
    text = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False)
    hf_cfg = transformers.InternVLConfig(
        vision_config=vision, text_config=text, image_token_id=250,
        downsample_ratio=0.5, projector_hidden_act="gelu",
        vision_feature_layer=-1, vision_feature_select_strategy="default")
    torch.manual_seed(7)
    hf = transformers.InternVLForConditionalGeneration(hf_cfg).eval()
    cfg = InternVLConfig(
        vision=internvit_config_from_hf(vision.to_dict()),
        text=llama_config_from_hf(text.to_dict()),
        downsample_ratio=0.5)
    params = internvl_params_from_hf(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg,
        dtype=jnp.float32)

    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)

    class _Tok:  # minimal tokenizer: '<image>'-aware id encoder
        def encode(self, text, add_special_tokens=False):
            out = []
            for part in text.split("<image>"):
                out.extend(ord(c) % 200 + 3 for c in part.strip())
                out.append(IMAGE_TOKEN_INDEX)
            return out[:-1]

    mm = InternVLServing(params, cfg, _Tok())
    assert cfg.n_visual_tokens == 4  # 56/14=4 patches/side → 2x2 shuffled
    req = mm.build_request("iv", "<image> describe", px,
                           max_new_tokens=6, eos_ids=(-1,))
    assert len(req.input_ids) == len(mm.embed_fn(req))

    # offline oracle over the SAME fused embeds
    raw = np.asarray(req._raw_ids)[None]
    feats = internvl_image_features(params, cfg,
                                    jnp.asarray(px, jnp.float32))
    fused = fuse_multimodal(params["text"]["embed_tokens"],
                            jnp.asarray(raw), [feats[None]])
    embeds = fused["inputs_embeds"]
    res = generate(params["text"], cfg.text, embeds,
                   jnp.ones((1, embeds.shape[1]), bool),
                   max_new_tokens=6, eos_ids=(-1,))
    want = [int(t) for t in
            np.asarray(res.tokens[0, :int(res.lengths[0])])]

    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    engine = ServeEngine(params["text"], cfg.text, ecfg,
                         embed_fn=mm.embed_fn)
    done = _run_engine(engine, [req])
    assert done["iv"].output_ids == want
    # identical image resubmitted → radix prefix KV reuse kicks in
    req2 = mm.build_request("iv2", "<image> describe", px,
                            max_new_tokens=6, eos_ids=(-1,))
    done2 = _run_engine(engine, [req2])
    assert done2["iv2"].output_ids == want
    assert len(done2["iv2"].prefix_slots) > 0


def _hf_roundtrip_serve(hf, rng, prompt_len=12, new=6):
    """Shared harness: HF greedy == offline generate == engine decode."""
    import torch

    from aurora_tpu.generate import generate
    from aurora_tpu.models.convert import (llama_config_from_hf,
                                           llama_params_from_hf,
                                           state_dict_from_torch_module)
    cfg = llama_config_from_hf(hf.config.to_dict())
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    ids = [int(x) for x in rng.integers(3, 144, size=prompt_len)]
    with torch.no_grad():
        want_hf = hf.generate(torch.tensor([ids]), max_new_tokens=new,
                              do_sample=False).numpy()[0, prompt_len:]
    embeds = jnp.take(params["embed_tokens"], jnp.asarray([ids]), axis=0)
    res = generate(params, cfg, embeds, jnp.ones((1, len(ids)), bool),
                   max_new_tokens=new, eos_ids=(-1,))
    want = [int(t) for t in
            np.asarray(res.tokens[0, :int(res.lengths[0])])]
    assert want == [int(t) for t in want_hf]  # offline == HF greedy

    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    engine = ServeEngine(params, cfg, ecfg)
    done = _run_engine(engine, [Request(rid="r", input_ids=list(ids),
                                        max_new_tokens=new)])
    assert done["r"].output_ids == want
    assert engine.check_memory()["leaked"] == 0


def test_glm4_served_matches_offline(rng):
    """GLM-4 (interleaved partial rotary, fused gate_up, qkv bias)
    through the serving engine (sglang srt/models/chatglm.py parity)."""
    import torch
    import transformers
    torch.manual_seed(55)
    hf = transformers.GlmForCausalLM(transformers.GlmConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, partial_rotary_factor=0.5,
        attention_bias=True, max_position_embeddings=256,
        rms_norm_eps=1e-5, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False)).eval()
    _hf_roundtrip_serve(hf, rng)


def test_starcoder2_served_matches_offline(rng):
    """Starcoder2 (LayerNorm norms, non-gated GELU MLP, biases
    everywhere) through the serving engine."""
    import torch
    import transformers
    torch.manual_seed(56)
    hf = transformers.Starcoder2ForCausalLM(transformers.Starcoder2Config(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, use_bias=True, norm_epsilon=1e-5,
        hidden_act="gelu_pytorch_tanh", sliding_window=None,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False)).eval()
    _hf_roundtrip_serve(hf, rng)


def test_stablelm_served_matches_offline(rng):
    """StableLM (LayerNorm + partial rotary + qkv bias) through the
    serving engine."""
    import torch
    import transformers
    torch.manual_seed(57)
    hf = transformers.StableLmForCausalLM(transformers.StableLmConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, partial_rotary_factor=0.25,
        use_qkv_bias=True, layer_norm_eps=1e-5,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False)).eval()
    _hf_roundtrip_serve(hf, rng)


def test_olmo_served_matches_offline(rng):
    """OLMo (non-parametric LayerNorm + clip_qkv) through the serving
    engine."""
    import torch
    import transformers
    torch.manual_seed(58)
    hf = transformers.OlmoForCausalLM(transformers.OlmoConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, clip_qkv=0.4,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False)).eval()
    _hf_roundtrip_serve(hf, rng)


def test_gemma1_served_matches_offline(rng):
    """Gemma (v1) through the serving engine via the universal config
    (GeGLU + embed scale + (1+w) norms): greedy decode == offline
    generate == HF generate."""
    import torch
    import transformers

    from aurora_tpu.generate import generate
    from aurora_tpu.models.convert import (llama_config_from_hf,
                                           llama_params_from_hf,
                                           state_dict_from_torch_module)

    torch.manual_seed(33)
    hf_cfg = transformers.GemmaConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=24,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        hidden_activation="gelu_pytorch_tanh",
        attn_implementation="eager", tie_word_embeddings=True)
    hf = transformers.GemmaForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)

    ids = [int(x) for x in rng.integers(3, 144, size=12)]
    with torch.no_grad():
        want_hf = hf.generate(torch.tensor([ids]), max_new_tokens=6,
                              do_sample=False).numpy()[0, 12:]
    embeds = jnp.take(params["embed_tokens"], jnp.asarray([ids]), axis=0)
    res = generate(params, cfg, embeds, jnp.ones((1, len(ids)), bool),
                   max_new_tokens=6, eos_ids=(-1,))
    want = [int(t) for t in
            np.asarray(res.tokens[0, :int(res.lengths[0])])]
    assert want == [int(t) for t in want_hf]

    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    engine = ServeEngine(params, cfg, ecfg)
    done = _run_engine(engine, [Request(rid="g1", input_ids=list(ids),
                                        max_new_tokens=6)])
    assert done["g1"].output_ids == want
    assert engine.check_memory()["leaked"] == 0


def test_qwen3_served_matches_offline(rng):
    """Qwen3 (qk-norm, decoupled head_dim) through the serving engine:
    greedy decode == offline generate == HF generate."""
    import torch
    import transformers

    from aurora_tpu.generate import generate
    from aurora_tpu.models.convert import (llama_config_from_hf,
                                           llama_params_from_hf,
                                           state_dict_from_torch_module)

    torch.manual_seed(23)
    hf_cfg = transformers.Qwen3Config(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=24,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False)
    hf = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)

    ids = [int(x) for x in rng.integers(3, 144, size=12)]
    with torch.no_grad():
        want_hf = hf.generate(torch.tensor([ids]), max_new_tokens=6,
                              do_sample=False).numpy()[0, 12:]
    embeds = jnp.take(params["embed_tokens"], jnp.asarray([ids]), axis=0)
    res = generate(params, cfg, embeds, jnp.ones((1, len(ids)), bool),
                   max_new_tokens=6, eos_ids=(-1,))
    want = [int(t) for t in
            np.asarray(res.tokens[0, :int(res.lengths[0])])]
    assert want == [int(t) for t in want_hf]

    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    engine = ServeEngine(params, cfg, ecfg)
    done = _run_engine(engine, [Request(rid="q3", input_ids=list(ids),
                                        max_new_tokens=6)])
    assert done["q3"].output_ids == want
    assert engine.check_memory()["leaked"] == 0


def test_qwen2_moe_served_matches_offline(rng):
    """Qwen2-MoE (softmax-topk routing + sigmoid-gated shared expert)
    through the serving engine: greedy decode == offline
    llama_apply-based generate. Extend runs the grouped ragged_dot MoE,
    decode the dense einsum — both with the qwen2 router semantics."""
    import torch
    import transformers

    from aurora_tpu.generate import generate
    from aurora_tpu.models.convert import (llama_config_from_hf,
                                           llama_params_from_hf,
                                           state_dict_from_torch_module)

    torch.manual_seed(13)
    hf_cfg = transformers.Qwen2MoeConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=256, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False)
    hf = transformers.Qwen2MoeForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)

    ids = [int(x) for x in rng.integers(3, 144, size=12)]
    with torch.no_grad():
        want_hf = hf.generate(torch.tensor([ids]), max_new_tokens=6,
                              do_sample=False).numpy()[0, 12:]
    embeds = jnp.take(params["embed_tokens"], jnp.asarray([ids]), axis=0)
    res = generate(params, cfg, embeds, jnp.ones((1, len(ids)), bool),
                   max_new_tokens=6, eos_ids=(-1,))
    want = [int(t) for t in
            np.asarray(res.tokens[0, :int(res.lengths[0])])]
    assert want == [int(t) for t in want_hf]  # offline == HF greedy

    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    engine = ServeEngine(params, cfg, ecfg)
    done = _run_engine(engine, [Request(rid="qm", input_ids=list(ids),
                                        max_new_tokens=6)])
    assert done["qm"].output_ids == want
    assert engine.check_memory()["leaked"] == 0


def test_commandr_served_matches_offline(rng):
    """Command-R (Cohere: parallel residual block, Cohere LN, qk-norm,
    interleaved rotary, logit_scale) through the serving engine
    (sglang srt/models/commandr.py parity)."""
    import torch
    import transformers
    torch.manual_seed(59)
    hf = transformers.CohereForCausalLM(transformers.CohereConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, use_qk_norm=True, logit_scale=0.5,
        layer_norm_eps=1e-5, max_position_embeddings=256,
        attn_implementation="eager", tie_word_embeddings=True)).eval()
    _hf_roundtrip_serve(hf, rng)


def test_dbrx_served_matches_offline(rng):
    """DBRX (fused Wqkv + clip_qkv, bias-free LayerNorm, fused-expert
    MoE) through the serving engine (sglang srt/models/dbrx.py)."""
    import torch
    import transformers
    from transformers.models.dbrx.configuration_dbrx import (
        DbrxAttentionConfig, DbrxFFNConfig)
    torch.manual_seed(60)
    hf = transformers.DbrxForCausalLM(transformers.DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=256,
        vocab_size=144,
        attn_config=DbrxAttentionConfig(kv_n_heads=2, clip_qkv=6.0),
        ffn_config=DbrxFFNConfig(ffn_hidden_size=48, moe_num_experts=4,
                                 moe_top_k=2,
                                 moe_normalize_expert_weights=1.0),
        attn_implementation="eager")).eval()
    _hf_roundtrip_serve(hf, rng)


def test_gpt_bigcode_served_matches_offline(rng):
    """GPT-BigCode (MQA + learned positions, no rope) through the
    serving engine (sglang srt/models/gpt_bigcode.py)."""
    import torch
    import transformers
    torch.manual_seed(61)
    hf = transformers.GPTBigCodeForCausalLM(transformers.GPTBigCodeConfig(
        vocab_size=144, n_embd=64, n_inner=128, n_layer=2, n_head=4,
        n_positions=256, multi_query=True,
        activation_function="gelu_pytorch_tanh",
        attn_implementation="eager", tie_word_embeddings=True)).eval()
    _hf_roundtrip_serve(hf, rng)


def test_minicpm_served_matches_offline(rng):
    """MiniCPM scalings (embed_scale / residual_scale / logit_scale)
    through the serving engine: greedy decode == offline generate
    (sglang srt/models/minicpm.py parity; the scalings themselves are
    oracle-tested in test_model_parity)."""
    from aurora_tpu.generate import generate
    cfg = dataclasses.replace(LlamaConfig.tiny(vocab_size=128),
                              embed_scale=12.0,
                              residual_scale=1.4 / 3 ** 0.5,
                              logit_scale=0.25)
    params = init_llama_params(jax.random.PRNGKey(9), cfg,
                               dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=14)]
    embeds = jnp.take(params["embed_tokens"], jnp.asarray([ids]), axis=0)
    res = generate(params, cfg, embeds, jnp.ones((1, len(ids)), bool),
                   max_new_tokens=6, eos_ids=(-1,))
    want = [int(t) for t in
            np.asarray(res.tokens[0, :int(res.lengths[0])])]
    done = _run_engine(engine, [Request(rid="mc", input_ids=list(ids),
                                        max_new_tokens=6)])
    assert done["mc"].output_ids == want
    assert engine.check_memory()["leaked"] == 0


def test_deepseek_v1_served_matches_offline(rng):
    """DeepSeek (v1) heterogeneous stack (unrolled dense prefix + MoE
    tail with ungated shared experts) through the serving engine
    (sglang srt/models/deepseek.py parity)."""
    from tests.test_model_parity import (_deepseek_v1_convert,
                                         _deepseek_v1_hybrid_oracle)
    import torch

    from aurora_tpu.generate import generate
    hf = _deepseek_v1_hybrid_oracle()
    cfg, params = _deepseek_v1_convert(hf)
    ids = [int(x) for x in rng.integers(3, 144, size=12)]
    with torch.no_grad():
        want_hf = hf.generate(torch.tensor([ids]), max_new_tokens=6,
                              do_sample=False).numpy()[0, len(ids):]
    embeds = jnp.take(params["embed_tokens"], jnp.asarray([ids]), axis=0)
    res = generate(params, cfg, embeds, jnp.ones((1, len(ids)), bool),
                   max_new_tokens=6, eos_ids=(-1,))
    want = [int(t) for t in
            np.asarray(res.tokens[0, :int(res.lengths[0])])]
    assert want == [int(t) for t in want_hf]
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    engine = ServeEngine(params, cfg, ecfg)
    done = _run_engine(engine, [Request(rid="ds", input_ids=list(ids),
                                        max_new_tokens=6)])
    assert done["ds"].output_ids == want
    assert engine.check_memory()["leaked"] == 0


def test_grok1_served_matches_offline(rng):
    """Grok-1 through the serving engine (sglang srt/models/grok.py
    parity — the last sglang zoo family): four RMSNorms per layer
    (grok.py:214-217), tanh softcap 30.0 on attention scores
    (grok.py:116) AND router logits (grok.py:102), fp32
    softmax-over-all MoE routing WITHOUT top-k renorm
    (renormalize=False, grok.py:91), embedding/output multiplier
    scales (grok.py:277,284), pinned head_dim. transformers ships no
    Grok-1 class — the oracle below implements the reference module's
    equations directly in torch."""
    import torch
    import torch.nn.functional as F

    from aurora_tpu.generate import generate
    from aurora_tpu.models.convert import (llama_config_from_hf,
                                           llama_params_from_hf)

    torch.manual_seed(61)
    V, D, I, L = 144, 64, 96, 2
    Hq, Hkv, hd, E, K = 4, 2, 16, 4, 2
    emb_mult, out_mult = 7.0, 0.5

    def t(*shape):
        return torch.randn(*shape) * 0.1

    sd = {"model.embed_tokens.weight": t(V, D),
          "model.norm.weight": 1.0 + 0.1 * t(D),
          "lm_head.weight": t(V, D)}
    for i in range(L):
        b = f"model.layers.{i}"
        sd[f"{b}.self_attn.q_proj.weight"] = t(Hq * hd, D)
        sd[f"{b}.self_attn.k_proj.weight"] = t(Hkv * hd, D)
        sd[f"{b}.self_attn.v_proj.weight"] = t(Hkv * hd, D)
        sd[f"{b}.self_attn.o_proj.weight"] = t(D, Hq * hd)
        sd[f"{b}.block_sparse_moe.gate.weight"] = t(E, D)
        for e in range(E):
            eb = f"{b}.block_sparse_moe.experts.{e}"
            sd[f"{eb}.w1.weight"] = t(I, D)   # gate
            sd[f"{eb}.w2.weight"] = t(D, I)   # down
            sd[f"{eb}.w3.weight"] = t(I, D)   # up
        for n in ("pre_attn_norm", "post_attn_norm", "pre_moe_norm",
                  "post_moe_norm"):
            sd[f"{b}.{n}.weight"] = 1.0 + 0.1 * t(D)

    def rms(x, w, eps=1e-5):
        xf = x.float()
        return (xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True)
                                 + eps)) * w

    def rope(x, pos, theta=10000.0):
        # neox-style (is_neox_style=True, grok.py:160): rotate halves
        d2 = hd // 2
        inv = 1.0 / theta ** (torch.arange(d2).float() / d2)
        ang = pos[:, None].float() * inv[None]           # [T, d2]
        cos, sin = torch.cos(ang), torch.sin(ang)
        x1, x2 = x[..., :d2], x[..., d2:]
        c, s = cos[:, None], sin[:, None]                # [T, 1, d2]
        return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s], -1)

    @torch.no_grad()
    def oracle_logits(ids):
        T = len(ids)
        x = sd["model.embed_tokens.weight"][ids] * emb_mult
        pos = torch.arange(T)
        for i in range(L):
            b = f"model.layers.{i}"
            h = rms(x, sd[f"{b}.pre_attn_norm.weight"])
            q = (h @ sd[f"{b}.self_attn.q_proj.weight"].T
                 ).view(T, Hq, hd)
            k = (h @ sd[f"{b}.self_attn.k_proj.weight"].T
                 ).view(T, Hkv, hd)
            v = (h @ sd[f"{b}.self_attn.v_proj.weight"].T
                 ).view(T, Hkv, hd)
            q, k = rope(q, pos), rope(k, pos)
            k = k.repeat_interleave(Hq // Hkv, dim=1)
            v = v.repeat_interleave(Hq // Hkv, dim=1)
            s = torch.einsum("thd,shd->hts", q, k) / hd ** 0.5
            s = 30.0 * torch.tanh(s / 30.0)              # grok.py:116
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            s = s.masked_fill(~mask[None], float("-inf"))
            attn = torch.einsum("hts,shd->thd", F.softmax(s, -1), v)
            attn = attn.reshape(T, Hq * hd) \
                @ sd[f"{b}.self_attn.o_proj.weight"].T
            x = x + rms(attn, sd[f"{b}.post_attn_norm.weight"])
            h = rms(x, sd[f"{b}.pre_moe_norm.weight"])
            rl = h @ sd[f"{b}.block_sparse_moe.gate.weight"].T
            rl = 30.0 * torch.tanh(rl / 30.0)            # grok.py:102
            probs = F.softmax(rl.float(), -1)
            topv, topi = torch.topk(probs, K, -1)        # NO renorm
            out = torch.zeros_like(h)
            for ti in range(T):
                for j in range(K):
                    e = int(topi[ti, j])
                    eb = f"{b}.block_sparse_moe.experts.{e}"
                    g = h[ti] @ sd[f"{eb}.w1.weight"].T
                    u = h[ti] @ sd[f"{eb}.w3.weight"].T
                    out[ti] += topv[ti, j] * (
                        (F.silu(g) * u) @ sd[f"{eb}.w2.weight"].T)
            x = x + rms(out, sd[f"{b}.post_moe_norm.weight"])
        x = rms(x, sd["model.norm.weight"]) * out_mult   # grok.py:284
        return x @ sd["lm_head.weight"].T

    hf_cfg = dict(model_type="grok-1", vocab_size=V, hidden_size=D,
                  intermediate_size=I, num_hidden_layers=L,
                  num_attention_heads=Hq, num_key_value_heads=Hkv,
                  head_dim=hd, num_local_experts=E,
                  num_experts_per_tok=K,
                  embedding_multiplier_scale=emb_mult,
                  output_multiplier_scale=out_mult,
                  max_position_embeddings=256, rms_norm_eps=1e-5,
                  rope_theta=10000.0)
    cfg = llama_config_from_hf(hf_cfg)
    assert cfg.attn_logit_softcap == 30.0
    assert cfg.moe_router_logit_softcap == 30.0
    assert cfg.moe_router_mode == "softmax_topk" and not cfg.moe_norm_topk
    params = llama_params_from_hf(
        {k: v.numpy() for k, v in sd.items()}, cfg, dtype=jnp.float32)
    assert "post_attn_out_norm" in params["layers"]

    ids = [int(x) for x in rng.integers(3, V, size=12)]
    new = 6
    want = []
    cur = list(ids)
    for _ in range(new):
        tok = int(torch.argmax(oracle_logits(cur)[-1]))
        want.append(tok)
        cur.append(tok)

    embeds = jnp.take(params["embed_tokens"], jnp.asarray([ids]), axis=0)
    res = generate(params, cfg, embeds, jnp.ones((1, len(ids)), bool),
                   max_new_tokens=new, eos_ids=(-1,))
    got = [int(t) for t in np.asarray(res.tokens[0, :int(res.lengths[0])])]
    assert got == want  # offline == torch oracle greedy

    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    engine = ServeEngine(params, cfg, ecfg)
    done = _run_engine(engine, [Request(rid="g", input_ids=list(ids),
                                        max_new_tokens=new)])
    assert done["g"].output_ids == want
    assert engine.check_memory()["leaked"] == 0
