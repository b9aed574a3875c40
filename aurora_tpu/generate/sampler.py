"""On-device token sampling.

Replaces the reference serving sampler (src/sglang/python/sglang/srt/layers/
sampler.py:1-181: flashinfer/torch top-k/top-p/min-p sampling) and the HF
generate sampling path used by inference.py:89-96. Pure jnp — sampling fuses
into the decode step under jit; no host round-trip per token.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration. The serving engine applies the
    FULL surface on device (srt/layers/sampler.py + srt/sampling/
    penaltylib parity): penalties run over per-row token histograms, and
    min_new_tokens suppresses eos until satisfied."""
    temperature: float = 0.0          # 0 → greedy (HF do_sample=False)
    top_k: int = 0                    # 0 → disabled
    top_p: float = 1.0
    min_p: float = 0.0
    repetition_penalty: float = 1.0   # HF/CTRL style, prompt+output
    frequency_penalty: float = 0.0    # OpenAI style, output histogram
    presence_penalty: float = 0.0     # OpenAI style, output presence
    min_new_tokens: int = 0           # suppress eos below this length

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0


def _apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def _apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering. Keeps the smallest set of tokens whose cumulative
    probability exceeds p (the highest-probability token always survives)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # mask tokens whose preceding cumulative mass already reached p
    cutoff_mask = (cum - probs) > p
    thresh = jnp.min(jnp.where(cutoff_mask, sorted_logits, jnp.inf),
                     axis=-1, keepdims=True)
    return jnp.where(logits < thresh, -jnp.inf, logits)


def _apply_min_p(logits: jnp.ndarray, min_p: float) -> jnp.ndarray:
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs < min_p * top, -jnp.inf, logits)


def sample_logits(logits: jnp.ndarray, params: SamplingParams,
                  rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """logits [B, V] → token ids [B]. Greedy when temperature == 0."""
    if params.is_greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / params.temperature
    if params.top_k > 0:
        logits = _apply_top_k(logits, params.top_k)
    if params.top_p < 1.0:
        logits = _apply_top_p(logits, params.top_p)
    if params.min_p > 0.0:
        logits = _apply_min_p(logits, params.min_p)
    assert rng is not None, "sampling requires a PRNG key"
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def apply_frequency_presence_penalties(
        logits: jnp.ndarray, token_counts: jnp.ndarray,
        frequency_penalty: float, presence_penalty: float) -> jnp.ndarray:
    """OpenAI-style penalties over per-request token histograms
    (parity: sglang srt/sampling/penaltylib). token_counts: [B, V] int."""
    out = logits - frequency_penalty * token_counts
    return out - presence_penalty * (token_counts > 0)


def apply_repetition_penalty(logits: jnp.ndarray, token_counts: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """HF/CTRL repetition penalty: divide positive logits of seen tokens by
    the penalty, multiply negative ones."""
    seen = token_counts > 0
    scaled = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, scaled, logits)
