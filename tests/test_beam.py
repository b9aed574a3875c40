"""Beam search parity vs HF generate(num_beams=K)."""

import numpy as np
import pytest
import jax.numpy as jnp

from aurora_tpu.generate.beam import beam_generate

torch = pytest.importorskip("torch")


def _tiny(seed):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM
    from aurora_tpu.models.convert import (llama_config_from_hf,
                                           llama_params_from_hf,
                                           state_dict_from_torch_module)
    torch.manual_seed(seed)
    hf_cfg = HFLlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False, eos_token_id=2, pad_token_id=0,
        bos_token_id=1)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    params = llama_params_from_hf(state_dict_from_torch_module(hf), cfg,
                                  dtype=jnp.float32)
    return hf, cfg, params


@pytest.mark.parametrize("seed,beams,max_new", [(11, 3, 10), (12, 4, 8),
                                                (13, 2, 12),
                                                # seed 29: HF's winner
                                                # ENDS IN EOS mid-search
                                                # — exercises the
                                                # EOS-materialization
                                                # path
                                                (29, 3, 12)])
def test_beam_matches_hf(rng, seed, beams, max_new):
    hf, cfg, params = _tiny(seed)
    prompt = rng.integers(3, 96, size=(1, 7))
    with torch.no_grad():
        want = hf.generate(torch.from_numpy(prompt), num_beams=beams,
                           do_sample=False, max_new_tokens=max_new,
                           length_penalty=1.0,
                           early_stopping=False).numpy()[0, 7:]
    embeds = jnp.take(params["embed_tokens"], jnp.asarray(prompt), axis=0)
    toks, n = beam_generate(params, cfg, embeds, jnp.ones((1, 7), bool),
                            num_beams=beams, max_new_tokens=max_new)
    got = [int(t) for t in np.asarray(toks[: int(n)])]
    # HF pads after EOS; compare the generated region up to our length
    want_list = [int(t) for t in want]
    # strip trailing pads from HF (pad_token_id=0)
    while want_list and want_list[-1] == 0:
        want_list.pop()
    # EOS-finished hypotheses materialize their EOS exactly like HF —
    # regression: the winner used to end in a phantom pad token
    assert got == want_list, (got, want_list)
    if want_list and want_list[-1] == 2:
        assert got[-1] == 2


def test_beam_beats_or_equals_greedy_score(rng):
    """Sanity: the chosen beam's sequence logprob ≥ greedy's."""
    import jax
    from aurora_tpu.generate import generate
    from aurora_tpu.models.llama import llama_apply

    hf, cfg, params = _tiny(21)
    prompt = rng.integers(3, 96, size=(1, 6))
    embeds = jnp.take(params["embed_tokens"], jnp.asarray(prompt), axis=0)
    mask = jnp.ones((1, 6), bool)

    def seq_logprob(tokens):
        ids = jnp.asarray([list(prompt[0]) + tokens])
        logits, _ = llama_apply(params, cfg, input_ids=ids)
        lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), -1)
        total = 0.0
        for i, t in enumerate(tokens):
            total += float(lp[len(prompt[0]) - 1 + i, t])
        return total

    g = generate(params, cfg, embeds, mask, max_new_tokens=6)
    g_toks = [int(t) for t in np.asarray(g.tokens[0, : int(g.lengths[0])])]
    if g_toks and g_toks[-1] == 2:
        g_toks = g_toks[:-1]
    b_toks, n = beam_generate(params, cfg, embeds, mask, num_beams=4,
                              max_new_tokens=6)
    b_toks = [int(t) for t in np.asarray(b_toks[: int(n)])]
    if b_toks and b_toks[-1] == 2:
        b_toks = b_toks[:-1]
    # UNCONDITIONAL: compare per-token-normalized logprobs so differing
    # lengths still assert (a guarded comparison could pass vacuously
    # on exactly the premature-EOS bugs beam tests exist to catch)
    assert g_toks and b_toks
    assert (seq_logprob(b_toks) / len(b_toks)
            >= seq_logprob(g_toks) / len(g_toks) - 1e-4)
