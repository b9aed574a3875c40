"""On-device beam search over the static KV cache.

Parity target: HF `generate(num_beams=K, do_sample=False)` semantics as
exposed by inference.py:38/:94 — vanilla beam search with length_penalty,
early_stopping=False, 2K-candidate EOS handling (finished hypotheses leave
the running set and are ranked by score/len**length_penalty).

Whole search is ONE compiled program: the beam dimension is the batch
dimension of the decode step, beam reordering is a gather on the cache's
batch axis, and the loop is lax.while_loop with a HF-style is_done
condition. The reference gets this from HF's Python loop (one host round
trip per token); here the host never sees intermediate tokens.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from aurora_tpu.models.llama import LlamaConfig, init_kv_cache, llama_apply

_NEG = -1e9


@functools.partial(jax.jit, static_argnames=(
    "cfg", "num_beams", "max_new_tokens", "eos_ids", "pad_id",
    "length_penalty"))
def beam_generate(params, cfg: LlamaConfig, inputs_embeds: jnp.ndarray,
                  attention_mask: jnp.ndarray, *,
                  num_beams: int, max_new_tokens: int,
                  eos_ids: Tuple[int, ...] = (2,), pad_id: int = 0,
                  length_penalty: float = 1.0):
    """inputs_embeds [1, T, D] (beam search is per-prompt, matching the
    reference CLI). Returns (tokens [max_new], length) of the best beam."""
    assert inputs_embeds.shape[0] == 1, "beam search expects batch 1"
    K = num_beams
    _, T, D = inputs_embeds.shape
    S = T + max_new_tokens
    V = cfg.vocab_size
    eos_arr = jnp.asarray(eos_ids, jnp.int32)

    # ---- prefill once, tile the cache across beams
    cache1 = init_kv_cache(cfg, 1, S, dtype=inputs_embeds.dtype)
    prompt_len = jnp.sum(attention_mask.astype(jnp.int32))
    position_ids = jnp.arange(T)[None, :] * attention_mask
    mask1 = jnp.zeros((1, S), bool).at[:, :T].set(attention_mask)
    logits, cache1 = llama_apply(params, cfg, inputs_embeds=inputs_embeds,
                                 attention_mask=mask1,
                                 position_ids=position_ids,
                                 kv_cache=cache1, cache_len=0)
    last = jnp.take_along_axis(logits, (prompt_len - 1)[None, None, None],
                               axis=1)[0, 0]                    # [V]
    cache = jax.tree.map(lambda x: jnp.repeat(x, K, axis=1), cache1)
    kv_mask = jnp.repeat(mask1, K, axis=0)

    lp0 = jax.nn.log_softmax(last.astype(jnp.float32))
    top_scores, top_tok = jax.lax.top_k(lp0, K)

    tokens = jnp.full((K, max_new_tokens), pad_id, jnp.int32)
    tokens = tokens.at[:, 0].set(top_tok)
    beam_scores = top_scores                                    # [K]
    beam_last = top_tok
    # beams whose first token is EOS retire immediately
    first_eos = jnp.isin(top_tok, eos_arr)

    def norm(score, n_generated):
        # HF (4.57 vectorized beam search) normalizes by the GENERATED
        # length: finished beams use cur_len + 1 - decoder_prompt_len
        # (generation/utils.py "_update_finished_beams": topk_log_probs /
        # ((cur_len + 1 - decoder_prompt_len) ** length_penalty)), and the
        # early-stop heuristic uses cur_len - decoder_prompt_len. The
        # prompt length never enters.
        return score / (n_generated.astype(jnp.float32) ** length_penalty)

    fin_scores = jnp.where(first_eos, norm(beam_scores, jnp.asarray(1)),
                           _NEG)
    fin_tokens = jnp.where(first_eos[:, None], tokens, pad_id)
    fin_lens = jnp.where(first_eos, 1, 0)
    beam_scores = jnp.where(first_eos, _NEG, beam_scores)

    def cond(st):
        (step, _, _, beam_scores, _, fin_scores, _, _, _) = st
        running_best = jnp.max(beam_scores)
        worst_fin = jnp.min(fin_scores)
        # HF early_stopping=False: done when even the best running beam,
        # normalized at the CURRENT length, can't beat the worst finished
        done = worst_fin >= norm(running_best, step)
        return (step < max_new_tokens) & ~done

    def body(st):
        (step, cache, kv_mask, beam_scores, beam_last, fin_scores,
         fin_tokens, fin_lens, tokens) = st
        write_at = T + step - 1
        kv_mask = kv_mask.at[:, write_at].set(True)
        pos = jnp.broadcast_to(prompt_len + step - 1, (K,))[:, None]
        embeds = jnp.take(params["embed_tokens"], beam_last[:, None],
                          axis=0)
        logits, cache = llama_apply(params, cfg, inputs_embeds=embeds,
                                    attention_mask=kv_mask,
                                    position_ids=pos, kv_cache=cache,
                                    cache_len=write_at)
        lp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1)
        cand = (beam_scores[:, None] + lp).reshape(-1)          # [K*V]
        c_scores, c_idx = jax.lax.top_k(cand, 2 * K)
        c_beam = c_idx // V
        c_tok = (c_idx % V).astype(jnp.int32)
        c_eos = jnp.isin(c_tok, eos_arr)

        # --- finished pool: merge EOS candidates (normalized)
        cand_fin = jnp.where(c_eos, norm(c_scores, step + 1), _NEG)
        # materialize the EOS at its position: fin_lens counts it
        # (step+1), so leaving it unwritten returned a phantom PAD as
        # the last token (a real token id for pad_id=0 vocabularies);
        # non-EOS candidates get c_tok written too but carry _NEG
        # scores and never surface
        cand_fin_tokens = tokens[c_beam].at[:, step].set(c_tok)
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin])
        all_fin_tokens = jnp.concatenate([fin_tokens, cand_fin_tokens])
        all_fin_lens = jnp.concatenate(
            [fin_lens, jnp.full((2 * K,), step + 1, fin_lens.dtype)])
        keep, keep_idx = jax.lax.top_k(all_fin_scores, K)
        fin_scores = keep
        fin_tokens = all_fin_tokens[keep_idx]
        fin_lens = all_fin_lens[keep_idx]

        # --- running beams: best K non-EOS candidates
        run_scores = jnp.where(c_eos, _NEG, c_scores)
        r_scores, r_pick = jax.lax.top_k(run_scores, K)
        r_beam = c_beam[r_pick]
        r_tok = c_tok[r_pick]
        cache = jax.tree.map(lambda x: x[:, r_beam], cache)
        kv_mask = kv_mask[r_beam]
        tokens = tokens[r_beam].at[:, step].set(r_tok)
        return (step + 1, cache, kv_mask, r_scores, r_tok, fin_scores,
                fin_tokens, fin_lens, tokens)

    st = (jnp.asarray(1), cache, kv_mask, beam_scores, beam_last,
          fin_scores, fin_tokens, fin_lens, tokens)
    st = jax.lax.while_loop(cond, body, st)
    (step, _, _, beam_scores, _, fin_scores, fin_tokens, fin_lens,
     tokens) = st

    # best finished vs best (normalized) running hypothesis
    run_norm = norm(beam_scores, step)
    best_run = jnp.argmax(run_norm)
    use_fin = jnp.max(fin_scores) >= jnp.max(run_norm)
    best_fin = jnp.argmax(fin_scores)
    out = jnp.where(use_fin, fin_tokens[best_fin], tokens[best_run])
    out_len = jnp.where(use_fin, fin_lens[best_fin], step)
    return out, out_len
