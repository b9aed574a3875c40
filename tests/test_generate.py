"""Generation engine tests: HF-generate parity and ragged-batch
self-consistency."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aurora_tpu.generate import SamplingParams, generate
from aurora_tpu.generate.sampler import (_apply_top_k, _apply_top_p,
                                         sample_logits)
from aurora_tpu.models.llama import llama_apply

torch = pytest.importorskip("torch")


def _tiny(rope_scaling=None, seed=3):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    from aurora_tpu.models.convert import (llama_config_from_hf,
                                           llama_params_from_hf,
                                           state_dict_from_torch_module)
    torch.manual_seed(seed)
    hf_cfg = HFLlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False,
        eos_token_id=2, pad_token_id=0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    return hf, cfg, params


def _embeds(params, ids):
    return jnp.take(params["embed_tokens"], jnp.asarray(ids), axis=0)


def test_greedy_matches_hf_generate(rng):
    hf, cfg, params = _tiny()
    prompt = rng.integers(3, 128, size=(1, 11))
    with torch.no_grad():
        want = hf.generate(torch.from_numpy(prompt), max_new_tokens=16,
                           do_sample=False).numpy()[0, 11:]
    res = generate(params, cfg, _embeds(params, prompt),
                   jnp.ones((1, 11), bool), max_new_tokens=16)
    n = int(res.lengths[0])
    got = np.asarray(res.tokens[0, :n])
    np.testing.assert_array_equal(got, want[:n])
    # HF stops at EOS too; lengths must agree
    assert n == want.shape[0] or (n < 16 and want[n - 1] == 2)


def test_ragged_batch_matches_single(rng):
    _, cfg, params = _tiny(seed=4)
    p1 = rng.integers(3, 128, size=(1, 13))
    p2 = rng.integers(3, 128, size=(1, 7))

    r1 = generate(params, cfg, _embeds(params, p1), jnp.ones((1, 13), bool),
                  max_new_tokens=10)
    r2 = generate(params, cfg, _embeds(params, p2), jnp.ones((1, 7), bool),
                  max_new_tokens=10)

    # batch them with right padding
    ids = np.zeros((2, 13), np.int64)
    ids[0] = p1[0]
    ids[1, :7] = p2[0]
    mask = np.zeros((2, 13), bool)
    mask[0] = True
    mask[1, :7] = True
    rb = generate(params, cfg, _embeds(params, ids), jnp.asarray(mask),
                  max_new_tokens=10)
    np.testing.assert_array_equal(np.asarray(rb.tokens[0]),
                                  np.asarray(r1.tokens[0]))
    np.testing.assert_array_equal(np.asarray(rb.tokens[1]),
                                  np.asarray(r2.tokens[0]))


def test_sampling_respects_top_k_top_p(rng):
    logits = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    k = 5
    filt = _apply_top_k(logits, k)
    assert int(jnp.sum(jnp.isfinite(filt), axis=-1)[0]) == k
    filt_p = _apply_top_p(logits, 0.9)
    # top-1 always survives
    top1 = jnp.argmax(logits, axis=-1)
    assert bool(jnp.all(jnp.isfinite(
        jnp.take_along_axis(filt_p, top1[:, None], axis=1))))
    # sampled tokens always come from the surviving set
    sp = SamplingParams(temperature=0.7, top_k=k)
    toks = sample_logits(logits, sp, jax.random.PRNGKey(0))
    surv = jnp.take_along_axis(filt, toks[:, None], axis=1)
    assert bool(jnp.all(jnp.isfinite(surv)))


def test_greedy_sampling_param_is_argmax(rng):
    logits = jnp.asarray(rng.standard_normal((3, 32)), jnp.float32)
    toks = sample_logits(logits, SamplingParams(temperature=0.0))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(jnp.argmax(logits, axis=-1)))


def test_logprobs_returned(rng):
    _, cfg, params = _tiny(seed=5)
    p = rng.integers(3, 128, size=(1, 6))
    res = generate(params, cfg, _embeds(params, p), jnp.ones((1, 6), bool),
                   max_new_tokens=5, return_logprobs=True)
    n = int(res.lengths[0])
    lp = np.asarray(res.logprobs[0, :n])
    assert (lp <= 0).all()
    # check the first logprob against a direct forward
    logits, _ = llama_apply(params, cfg, input_ids=jnp.asarray(p))
    want = jax.nn.log_softmax(logits[0, -1])[int(res.tokens[0, 0])]
    np.testing.assert_allclose(lp[0], float(want), rtol=1e-5)


def test_generate_min_new_tokens(rng):
    """min_new_tokens suppresses EOS until the floor is reached (serve
    engine _allowed_mask semantics — the offline path used to silently
    ignore the field)."""
    from aurora_tpu.models.llama import LlamaConfig, init_llama_params
    cfg = LlamaConfig.tiny(vocab_size=128)
    params = init_llama_params(jax.random.PRNGKey(3), cfg,
                               dtype=jnp.float32)
    ids = [int(x) for x in rng.integers(3, 128, size=6)]
    embeds = jnp.take(params["embed_tokens"], jnp.asarray([ids]), axis=0)
    mask = jnp.ones((1, len(ids)), bool)
    # force EOS-prone decoding: make EVERY token an eos id except what
    # greedy would pick... simpler: declare the greedy first token as
    # eos, then require 4 tokens minimum
    first = generate(params, cfg, embeds, mask, max_new_tokens=8,
                     eos_ids=(2,))
    eos_tok = int(jax.device_get(first.tokens[0, 0]))
    res = generate(params, cfg, embeds, mask, max_new_tokens=8,
                   eos_ids=(eos_tok,),
                   sampling=SamplingParams(min_new_tokens=4))
    n = int(jax.device_get(res.lengths[0]))
    toks = [int(t) for t in jax.device_get(res.tokens[0, :n])]
    assert n >= 4
    assert eos_tok not in toks[:4]
