"""Single-program generation: jitted prefill + lax.while_loop decode.

Replaces the reference's HF `llm.generate` serial Python loop
(inference.py:89-96) with one compiled program: the KV cache is a static
buffer sized prompt+max_new_tokens, the decode loop is a `lax.while_loop`
that exits early once every sequence hit EOS, and sampling happens on-device
(no host sync per token). Batched generation uses per-sequence done flags.

Right-padded prompts: row b's prompt occupies cache slots [0, len_b); decoded
tokens go at uniform slots [T, T+step) with their TRUE positions fed to RoPE
and the junk gap [len_b, T) permanently masked — correct math, no per-row
dynamic slots, one compiled decode step.

For continuous-batching service-style decode see aurora_tpu.serve (paged KV
pool); this engine is the offline/inference.py-parity path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from aurora_tpu.models.llama import LlamaConfig, init_kv_cache, llama_apply
from aurora_tpu.generate.sampler import SamplingParams, sample_logits


@dataclasses.dataclass
class GenerateResult:
    tokens: jnp.ndarray    # [B, max_new_tokens] int32, padded with pad_id
    lengths: jnp.ndarray   # [B] int32 — generated tokens incl. EOS
    logprobs: Optional[jnp.ndarray] = None  # [B, max_new] when requested


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "sampling", "eos_ids",
                     "pad_id", "return_logprobs", "use_flash"))
def _generate(params, cfg: LlamaConfig, inputs_embeds, attention_mask, rng,
              *, max_new_tokens: int, sampling: SamplingParams,
              eos_ids: Tuple[int, ...], pad_id: int,
              return_logprobs: bool, use_flash):
    B, T, _ = inputs_embeds.shape
    S = T + max_new_tokens
    cache = init_kv_cache(cfg, B, S, dtype=inputs_embeds.dtype)
    prompt_lens = jnp.sum(attention_mask.astype(jnp.int32), axis=1)

    position_ids = jnp.arange(T)[None, :] * attention_mask
    full_mask = jnp.zeros((B, S), bool).at[:, :T].set(attention_mask)
    logits, cache = llama_apply(
        params, cfg, inputs_embeds=inputs_embeds,
        attention_mask=full_mask, position_ids=position_ids,
        kv_cache=cache, cache_len=0, use_flash=use_flash)
    last = jnp.take_along_axis(
        logits, (prompt_lens - 1)[:, None, None], axis=1)[:, 0]

    eos_arr = jnp.asarray(eos_ids, jnp.int32)

    def logprob_of(lg, tok):
        lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        return jnp.take_along_axis(lp, tok[:, None], axis=1)[:, 0]

    def ban_eos_below_min(lg, n_generated):
        """EOS suppressed while fewer than min_new_tokens are out
        (serve engine _allowed_mask semantics). Out-of-range ids —
        notably the repo-wide eos_ids=(-1,) 'never stop' sentinel —
        must not wrap (.at[-1] would ban the LAST vocab token)."""
        if sampling.min_new_tokens <= 0:
            return lg
        V = lg.shape[-1]
        valid = (eos_arr >= 0) & (eos_arr < V)
        eos_cols = jnp.zeros((V,), bool).at[
            jnp.clip(eos_arr, 0, V - 1)].max(valid)
        ban = n_generated < sampling.min_new_tokens
        return jnp.where(ban & eos_cols[None, :], -jnp.inf, lg)

    rng, key = jax.random.split(rng)
    tok0 = sample_logits(ban_eos_below_min(last, jnp.asarray(0)),
                         sampling, key)
    done0 = jnp.isin(tok0, eos_arr)
    out_tokens = jnp.full((B, max_new_tokens), pad_id, jnp.int32)
    out_tokens = out_tokens.at[:, 0].set(tok0)
    out_lp = jnp.zeros((B, max_new_tokens), jnp.float32)
    if return_logprobs:
        out_lp = out_lp.at[:, 0].set(logprob_of(last, tok0))
    lengths0 = jnp.ones((B,), jnp.int32)

    def cond(state):
        step = state[0]
        done = state[3]
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        (step, cache, tok, done, mask, out_tokens, out_lp, lengths,
         rng) = state
        pos = (prompt_lens + step - 1)[:, None]   # true rope positions
        embeds = jnp.take(params["embed_tokens"], tok[:, None], axis=0)
        write_at = T + step - 1
        mask = mask.at[:, write_at].set(True)
        logits, cache = llama_apply(
            params, cfg, inputs_embeds=embeds, attention_mask=mask,
            position_ids=pos, kv_cache=cache, cache_len=write_at,
            use_flash=use_flash)
        lg = logits[:, 0]
        rng, key = jax.random.split(rng)
        nxt = sample_logits(ban_eos_below_min(lg, step), sampling, key)
        emit = jnp.where(done, pad_id, nxt)
        out_tokens = out_tokens.at[:, step].set(emit)
        if return_logprobs:
            out_lp = out_lp.at[:, step].set(
                jnp.where(done, 0.0, logprob_of(lg, nxt)))
        lengths = lengths + (~done).astype(jnp.int32)
        done = done | jnp.isin(nxt, eos_arr)
        return (step + 1, cache, emit, done, mask, out_tokens, out_lp,
                lengths, rng)

    state = (jnp.asarray(1), cache, tok0, done0, full_mask, out_tokens,
             out_lp, lengths0, rng)
    state = jax.lax.while_loop(cond, body, state)
    return state[5], state[7], state[6]


def generate(params, cfg: LlamaConfig, inputs_embeds: jnp.ndarray,
             attention_mask: jnp.ndarray, *,
             max_new_tokens: int,
             sampling: SamplingParams = SamplingParams(),
             eos_ids: Tuple[int, ...] = (2,),
             pad_id: int = 0,
             rng: Optional[jax.Array] = None,
             return_logprobs: bool = False,
             use_flash: Optional[bool] = None) -> GenerateResult:
    """Greedy/sampled decode from fused (multimodal) embeddings.

    inputs_embeds: [B, T, D] right-padded; attention_mask: [B, T] bool.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if (sampling.repetition_penalty != 1.0 or sampling.frequency_penalty
            or sampling.presence_penalty):
        # honored by the SERVING engine's fused sampler only — silently
        # ignoring them here produced repeat-happy outputs with no hint
        import warnings
        warnings.warn(
            "offline generate() applies temperature/top_k/top_p/min_p/"
            "min_new_tokens only; repetition/frequency/presence "
            "penalties are ignored — serve this request through "
            "aurora_tpu.serve for the full sampler surface",
            stacklevel=2)
    tokens, lengths, lp = _generate(
        params, cfg, inputs_embeds, attention_mask.astype(bool), rng,
        max_new_tokens=max_new_tokens, sampling=sampling,
        eos_ids=tuple(eos_ids), pad_id=pad_id,
        return_logprobs=return_logprobs, use_flash=use_flash)
    return GenerateResult(tokens=tokens, lengths=lengths,
                          logprobs=lp if return_logprobs else None)


def decode_tokens(tokenizer, result: GenerateResult,
                  eos_ids: Sequence[int] = (2,), pad_id: int = 0):
    """Host-side detokenize → list[str], trimming pad/EOS."""
    outs = []
    toks = jax.device_get(result.tokens)
    lens = jax.device_get(result.lengths)
    for row, n in zip(toks, lens):
        ids = [int(t) for t in row[:n]]
        while ids and ids[-1] in eos_ids:
            ids.pop()
        outs.append(tokenizer.decode(ids, skip_special_tokens=True))
    return outs
