"""Token Merging (ToMe) — bipartite soft matching, TPU-first.

Behavioral parity target: src/xtuner/xtuner/model/tome.py:18-232 (itself the
Meta ToMe algorithm), as used by AuroraCap's ViT
(src/xtuner/xtuner/model/aurora.py:746-747).

TPU-first design
----------------
The reference builds per-call Python closures over dynamic `r`; under XLA we
instead exploit that AuroraCap's `r` is **statically computable** from
(resolution, token_kept_ratio, num_layers) — see aurora.py:895 — so every
layer's token count is a compile-time constant. `tome_schedule` computes the
static (t_in, r, t_out) sequence; the match/merge here are pure static-shape
jnp: top-k via argsort, merges via batched gather + scatter-add. XLA fuses the
surrounding elementwise work; the O(N²/4) similarity matmul rides the MXU.

Matching semantics (identical to reference):
  * tokens split into sets A = even indices, B = odd indices;
  * cosine similarity scores A@Bᵀ on the merge metric (mean-over-heads K);
  * each A-token proposes its best B partner; the r highest-scoring proposals
    are merged (scatter-add into their B target), the rest stay;
  * with `class_token=True` the CLS token (index 0, an A member) never merges
    and the unmerged-A order is re-sorted ascending so CLS stays first;
  * output layout is [unmerged_A..., B...] — length t - r.

`merge_wavg` threads a per-token `size` so merged tokens are size-weighted
averages and downstream proportional attention can read token multiplicity.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large finite negative: avoids NaN from (-inf) - (-inf)


def tome_r(height: int, width: int, patch_size: int, kept_ratio: float,
           num_layers: int) -> int:
    """Per-layer merge count r.

    Parity: aurora.py:895 —
    ``r = int(H*W/p² * (1 - ratio) / num_layers)`` (constant across layers).
    """
    return int(height * width / (patch_size ** 2) * (1.0 - kept_ratio)
               / num_layers)


class TomeStep(NamedTuple):
    t_in: int   # tokens entering the layer
    r: int      # tokens actually merged this layer (post-clamping)
    t_out: int  # tokens leaving the layer


def tome_schedule(num_tokens: int, r: int, num_layers: int,
                  protected: int = 1) -> List[TomeStep]:
    """Static per-layer token-count schedule.

    Mirrors the reference's runtime clamp ``r = min(r, (t - protected) // 2)``
    (tome.py:45) unrolled over layers, making every layer's shapes
    compile-time constants.
    """
    steps = []
    t = num_tokens
    for _ in range(num_layers):
        r_eff = max(0, min(r, (t - protected) // 2))
        steps.append(TomeStep(t, r_eff, t - r_eff))
        t -= r_eff
    return steps


def _split_even_odd(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return x[:, 0::2, :], x[:, 1::2, :]


@functools.partial(jax.jit, static_argnames=("r", "class_token"))
def compute_merge_indices(metric: jnp.ndarray, r: int,
                          class_token: bool = True):
    """Compute (unm_idx, src_idx, dst_idx) for a bipartite soft matching.

    metric: [B, T, C] merge metric (mean-over-heads keys). Gradients never
    flow through the matching (reference wraps it in no_grad, tome.py:50);
    callers get integer indices so this is naturally non-differentiable.

    Returns int32 arrays:
      unm_idx [B, tA - r] — indices into the A (even) set that stay;
      src_idx [B, r]      — A indices that merge away;
      dst_idx [B, r]      — B (odd) set targets for each src.
    """
    metric = metric.astype(jnp.float32)
    norm = jnp.linalg.norm(metric, axis=-1, keepdims=True)
    metric = metric / jnp.maximum(norm, 1e-12)
    a, b = _split_even_odd(metric)          # [B,tA,C], [B,tB,C]
    scores = jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [B, tA, tB]

    if class_token:
        # CLS (A index 0) never proposes a merge (tome.py:56)
        neg = jnp.full_like(scores[:, :1, :], _NEG_INF)
        scores = jnp.concatenate([neg, scores[:, 1:, :]], axis=1)

    node_max = jnp.max(scores, axis=-1)                      # [B, tA]
    node_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # [B, tA]
    # descending sort, ties broken by lower index (stable) — tome.py:61
    edge_idx = jnp.argsort(-node_max, axis=-1, stable=True).astype(jnp.int32)

    src_idx = edge_idx[:, :r]        # merged A tokens
    unm_idx = edge_idx[:, r:]        # surviving A tokens
    if class_token:
        # keep CLS first among survivors (tome.py:69)
        unm_idx = jnp.sort(unm_idx, axis=-1)
    dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=-1)
    return unm_idx, src_idx, dst_idx


def _gather_tokens(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather of token rows: x [B,T,C], idx [B,K] → [B,K,C]."""
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _scatter_rows(bb, ss, ii, mode: str):
    """Scatter source rows ss into bb at indices ii — the ONE merge-mode
    dispatch shared by apply_merge / kth / random matching (three copies
    had to be edited in lockstep before)."""
    if mode == "sum":
        return bb.at[ii].add(ss)
    if mode == "amax":
        return bb.at[ii].max(ss)
    if mode == "mean":
        cnt = jnp.zeros((bb.shape[0], 1), bb.dtype).at[ii].add(1.0)
        return bb.at[ii].add(ss) / (1.0 + cnt)
    raise ValueError(f"unknown merge mode {mode!r}")


def apply_merge(x: jnp.ndarray, unm_idx: jnp.ndarray, src_idx: jnp.ndarray,
                dst_idx: jnp.ndarray, mode: str = "sum") -> jnp.ndarray:
    """Merge token rows given match indices. x [B,T,C] → [B, T - r, C].

    mode: 'sum' (used by merge_wavg), 'amax' (merge_source), or 'mean'.
    """
    a, b = _split_even_odd(x)
    unm = _gather_tokens(a, unm_idx)
    src = _gather_tokens(a, src_idx)
    dst = jax.vmap(lambda bb, ss, ii: _scatter_rows(bb, ss, ii, mode))(
        b, src.astype(b.dtype), dst_idx)
    return jnp.concatenate([unm, dst], axis=1)


def bipartite_soft_matching(metric: jnp.ndarray, r: int,
                            class_token: bool = True):
    """Reference-shaped API: returns a `merge(x, mode)` callable.

    Unlike the torch original this requires static `r`; pass r from
    `tome_schedule` so shapes stay compile-time constant. If r <= 0 the
    identity is returned (tome.py:47-48).
    """
    t = metric.shape[1]
    protected = 1 if class_token else 0
    r = max(0, min(r, (t - protected) // 2))
    if r <= 0:
        return lambda x, mode="mean": x
    unm_idx, src_idx, dst_idx = compute_merge_indices(
        metric, r, class_token=class_token)

    def merge(x: jnp.ndarray, mode: str = "mean") -> jnp.ndarray:
        return apply_merge(x, unm_idx, src_idx, dst_idx, mode=mode)

    return merge


def merge_wavg(merge, x: jnp.ndarray, size: jnp.ndarray = None):
    """Size-weighted average merge (tome.py:207-219).

    Returns (merged_x, new_size); size [B,T,1] starts at ones.
    """
    if size is None:
        size = jnp.ones_like(x[..., :1])
    x = merge(x * size, mode="sum")
    size = merge(size, mode="sum")
    return x / size, size


def merge_source(merge, x: jnp.ndarray, source: jnp.ndarray = None):
    """Provenance tracking (tome.py:222-232): adjacency between original and
    merged tokens, for visualization."""
    if source is None:
        n, t, _ = x.shape
        source = jnp.broadcast_to(jnp.eye(t, dtype=x.dtype)[None], (n, t, t))
    return merge(source, mode="amax")


def kth_bipartite_soft_matching(metric: jnp.ndarray, k: int):
    """Sets = (every k-th token, the rest); output length T // k.

    Parity: tome.py:101-136 (merge direction only; unmerge is omitted —
    nothing in AuroraCap's pipelines calls it).
    """
    if k <= 1:
        return lambda x, mode="mean": x
    B, T, C = metric.shape
    if T % k != 0:
        raise ValueError(
            f"kth matching needs k | T (T={T}, k={k}); trailing tokens "
            "would silently vanish otherwise")
    t_rnd = (T // k) * k

    def split(x):
        xr = x[:, :t_rnd, :].reshape(x.shape[0], -1, k, x.shape[-1])
        a = xr[:, :, : k - 1, :].reshape(x.shape[0], -1, x.shape[-1])
        b = xr[:, :, k - 1, :]
        return a, b

    m = metric.astype(jnp.float32)
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12)
    a, b = split(m)
    scores = jax.lax.dot_general(a, b, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    dst_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # [B, tA]

    def merge(x: jnp.ndarray, mode: str = "mean") -> jnp.ndarray:
        xa, xb = split(x)

        return jax.vmap(lambda bb, ss, ii:
                        _scatter_rows(bb, ss, ii, mode))(
            xb, xa.astype(xb.dtype), dst_idx)

    return merge


def random_bipartite_soft_matching(metric: jnp.ndarray, r: int,
                                   rng: jax.Array = None):
    """Sets = (r random tokens, rest). Parity: tome.py:155-190 (merge only).

    `rng` is an explicit jax PRNG key (TPU-first: no global RNG state).
    """
    if r <= 0:
        return lambda x, mode="mean": x
    B, N, _ = metric.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rand_idx = jnp.argsort(
        jax.random.uniform(rng, (B, N)), axis=1).astype(jnp.int32)
    a_idx, b_idx = rand_idx[:, :r], rand_idx[:, r:]

    m = metric.astype(jnp.float32)
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12)
    a = _gather_tokens(m, a_idx)
    b = _gather_tokens(m, b_idx)
    scores = jax.lax.dot_general(a, b, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    dst_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)

    def merge(x: jnp.ndarray, mode: str = "mean") -> jnp.ndarray:
        src = _gather_tokens(x, a_idx)
        dst = _gather_tokens(x, b_idx)

        return jax.vmap(lambda bb, ss, ii:
                        _scatter_rows(bb, ss, ii, mode))(
            dst, src.astype(dst.dtype), dst_idx)

    return merge
