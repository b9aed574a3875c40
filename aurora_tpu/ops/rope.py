"""Rotary position embeddings, HF-Llama-compatible.

Parity targets: transformers LlamaRotaryEmbedding (default + linear scaling,
the Vicuna-7B-v1.5-16k config uses {"type": "linear", "factor": 4.0}) and the
reference's Triton rotary kernel (src/xtuner/xtuner/model/modules/dispatch/
triton_kernels/rotary.py) — on TPU the elementwise rotate fuses into the
attention projections under XLA, no custom kernel needed.

Layout: HF "half-split" convention — features [0:d/2] and [d/2:d] are the
two rotation lanes (rotate_half(x) = concat(-x[d/2:], x[:d/2])).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _inv_freq(head_dim: int, theta: float) -> Tuple[float, ...]:
    freqs = [theta ** (-(2.0 * i) / head_dim) for i in range(head_dim // 2)]
    return tuple(freqs)


def rope_cos_sin(position_ids: jnp.ndarray, head_dim: int,
                 theta: float = 10000.0,
                 linear_scaling: Optional[float] = None,
                 dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for given positions.

    position_ids: [..., T] int. Returns cos, sin of shape [..., T, head_dim]
    (the d/2 frequencies duplicated, HF convention).
    """
    inv_freq = jnp.asarray(_inv_freq(head_dim, float(theta)),
                           dtype=jnp.float32)
    pos = position_ids.astype(jnp.float32)
    if linear_scaling is not None:
        pos = pos / linear_scaling
    freqs = pos[..., None] * inv_freq  # [..., T, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def rotate_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """GLM pairwise rotation: (x0, x1, x2, x3, …) → (-x1, x0, -x3, x2, …)
    (modeling_glm.rotate_half — adjacent features are the rotation
    lanes instead of the half-split convention)."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray,
               interleaved: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q,k: [B, T, H, D]; cos/sin: [B, T, rd] or [T, rd].

    rd < D applies PARTIAL rotary (StableLM/Phi/GLM
    partial_rotary_factor): the first rd features rotate, the rest pass
    through. interleaved=True uses GLM's adjacent-pair lanes with the
    cos table's first half repeat-interleaved (modeling_glm
    apply_rotary_pos_emb)."""
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos = cos[:, :, None, :]  # broadcast over heads
    sin = sin[:, :, None, :]
    if interleaved:
        half = cos.shape[-1] // 2
        cos = jnp.repeat(cos[..., :half], 2, axis=-1)
        sin = jnp.repeat(sin[..., :half], 2, axis=-1)
        rot = rotate_interleaved
    else:
        rot = rotate_half
    rd = cos.shape[-1]

    def one(x):
        if rd == x.shape[-1]:
            return x * cos + rot(x) * sin
        xr, xp = x[..., :rd], x[..., rd:]
        return jnp.concatenate([xr * cos + rot(xr) * sin, xp], axis=-1)

    return one(q).astype(q.dtype), one(k).astype(k.dtype)
