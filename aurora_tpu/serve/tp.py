"""Tensor-parallel serving: shard the engine's params + KV rows over a
('tp',) mesh and run the compiled steps under shard_map.

Parity: the reference serves via vLLM-style TP process groups and
parallel layers — QKV/RowParallel linears in
/root/reference/src/sglang/python/sglang/srt/models/llama.py:1-60,
TP group setup in srt/model_executor/model_runner.py:121-163 and the
multi-GPU tp_worker loop (srt/managers/tp_worker.py:917-934).

TPU-native redesign: no process groups, no NCCL — ONE host thread drives
a jitted step whose collectives (2 psums/layer: o-proj and down-proj,
megatron-style) are compiled into the XLA program and ride ICI. Layout:

  * q/k/v/gate/up weights column-sharded on 'tp' (heads / MLP width),
    o/down row-sharded — each device holds Hq/tp heads and F/tp MLP lanes
  * KV rows [L, B, Hkv, S, hd] sharded on the HEAD axis: the ragged
    Pallas kernel runs unchanged on the local head shard (GQA groups
    stay with their KV heads), so attention needs NO collectives
  * embeddings / lm_head / norms replicated: sampling runs identically
    on every device (same RNG key), keeping the engine's host logic
    oblivious to TP
  * radix-cache pool sharded on heads like the rows; prefix load/store
    helpers partition automatically under GSPMD (gathers are on the
    unsharded slot axis)

A 7B that caps out one v5e chip (13.5GB weights + KV) serves across
2-8 chips with batch and context scaled accordingly; requires
tp | num_key_value_heads.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.4.35 exposes shard_map at top level
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from aurora_tpu.models.llama import LlamaConfig

Params = Dict[str, Any]

# column-sharded (output dim on tp) / row-sharded (input dim on tp)
_COL = {"q", "k", "v", "gate", "up"}
_ROW = {"o", "down"}


def make_tp_mesh(tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < tp:
        raise ValueError(f"tp={tp} needs {tp} devices, "
                         f"have {len(devices)}")
    return Mesh(np.asarray(devices[:tp]), ("tp",))


def tp_param_specs(params: Params) -> Params:
    """Serving partition specs (tp axis only; no fsdp — weights are
    read-only at inference and the fsdp all-gather would run every
    step)."""
    def spec_layers(layers):
        out = {}
        for name, w in layers.items():
            base = name[:-len("_scale")] if name.endswith("_scale") \
                else name
            base = base[:-len("_bias")] if base.endswith("_bias") \
                else base
            if base in _COL:
                # weights [L, D, out] / biases + scales [L(, 1), out]
                out[name] = P(*([None] * (w.ndim - 1) + ["tp"]))
            elif base in _ROW:
                if name.endswith(("_scale", "_bias")):
                    # per-out scales [L, 1, D] / output biases [L, D]:
                    # replicated (biases add once, AFTER the psum)
                    out[name] = P(*([None] * w.ndim))
                else:                         # [L, in, D]
                    out[name] = P(None, "tp", None)
            elif base in ("q_norm", "k_norm") and w.ndim == 3:
                # Cohere per-head qk-norm weights [L, H, hd]: the head
                # axis follows the column-sharded q/k heads
                out[name] = P(None, "tp", None)
            elif base in ("moe_gate", "moe_up"):
                # experts megatron-sharded on the MLP-width axis
                # [L, E, D, F] — every shard runs ALL experts on its
                # width slice, the router stays replicated, and the
                # existing down-proj psum sums the partials (without
                # this, replicated experts + psum returned tp× the MLP)
                out[name] = P(None, None, None, "tp")
            elif base == "moe_down":
                # weights [L, E, F, D] row-sharded; their per-output
                # scales [L, E, 1, D] have a size-1 width axis —
                # replicate them (outputs are summed by the psum)
                out[name] = (P(*([None] * w.ndim))
                             if name.endswith("_scale")
                             else P(None, None, "tp", None))
            elif base in ("moe_shared_gate", "moe_shared_up"):
                out[name] = P(None, None, "tp")     # [L, D, Fs]
            elif base == "moe_shared_down":
                out[name] = (P(*([None] * w.ndim))
                             if name.endswith("_scale")
                             else P(None, "tp", None))  # [L, Fs, D]
            else:  # norms, MoE router + scalar shared gate (their
                # outputs are token-scalars identical on every shard,
                # and the sigmoid gate distributes over the psum),
                # anything else: replicated
                out[name] = P(*([None] * w.ndim))
        return out

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = spec_layers(v)
        else:  # embed_tokens / final_norm / lm_head(+scale): replicated
            out[k] = P(*([None] * v.ndim)) if hasattr(v, "ndim") else P()
    return out


def tp_row_specs(rows: Dict[str, Any]) -> Dict[str, Any]:
    """KV rows/scales sharded on the head axis (dim 2)."""
    return {name: P(*((None, None, "tp", None, None)[:arr.ndim]))
            for name, arr in rows.items()}


def tp_pool_specs(pool_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Radix pool [L, slots, Hkv(, hd)] sharded on the head axis."""
    return {name: P(*((None, None, "tp", None)[:arr.ndim]))
            for name, arr in pool_dict.items()}


def shard_tree(tree, specs, mesh: Mesh):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
        if hasattr(x, "shape") else x,
        tree, specs, is_leaf=lambda x: isinstance(x, P))


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*([None] * getattr(x, "ndim", 0)))))
        if hasattr(x, "shape") else x, tree)


def local_cfg(cfg: LlamaConfig, tp: int) -> LlamaConfig:
    """Per-shard view: heads divided, head_dim pinned, hidden unchanged."""
    assert cfg.num_key_value_heads % tp == 0, (
        f"tp={tp} must divide num_key_value_heads="
        f"{cfg.num_key_value_heads}")
    assert cfg.num_attention_heads % tp == 0
    return dataclasses.replace(
        cfg,
        num_attention_heads=cfg.num_attention_heads // tp,
        num_key_value_heads=cfg.num_key_value_heads // tp,
        head_dim_override=cfg.head_dim)


def make_tp_steps(mesh: Mesh, cfg: LlamaConfig, chunk: int,
                  param_specs, row_specs):
    """Build (extend_fn, decode_fn) matching engine._extend_step /
    engine._decode_step signatures, with the transformer forward under
    shard_map and lm_head + fused sampling on replicated activations."""
    from aurora_tpu.serve import engine as eng

    tp = mesh.shape["tp"]
    cfg_l = local_cfg(cfg, tp)
    rep = P()

    def fwd_local(params, rows, embeds, row_ids, q_offsets, kv_lens):
        return eng._forward_rows(params, cfg_l, embeds, rows, row_ids,
                                 q_offsets, kv_lens, chunk,
                                 tp_axis="tp")

    def make_fwd(specs_r):
        return shard_map(
            fwd_local, mesh=mesh,
            in_specs=(param_specs, specs_r, rep, rep, rep, rep),
            out_specs=(rep, specs_r),
            check_vma=False)

    fwd = make_fwd(row_specs)

    @functools.partial(jax.jit, static_argnames=(),
                       donate_argnums=(1,))
    def extend_fn(params, rows, embeds, row_ids, q_offsets, kv_lens):
        x, rows = fwd(params, rows, embeds, row_ids, q_offsets, kv_lens)
        return eng._lm_head(params, cfg, x), rows

    @functools.partial(jax.jit,
                       static_argnames=("all_greedy", "want_logprobs"),
                       donate_argnums=(1, 2, 3))
    def decode_fn(params, rows, counts, seen, tokens, positions, active,
                  samp, allowed, key, all_greedy=False,
                  want_logprobs=True):
        B = tokens.shape[0]
        embeds = jnp.take(params["embed_tokens"], tokens,
                          axis=0)[:, None]
        row_ids = jnp.arange(B, dtype=jnp.int32)
        kv_lens = jnp.where(active, positions + 1, 0)
        x, rows = fwd(params, rows, embeds, row_ids, positions, kv_lens)
        logits = eng._lm_head(params, cfg, x)
        sampled, raw_lp = eng._sample_core(
            logits, counts.astype(jnp.float32), seen, samp, allowed,
            key, all_greedy=all_greedy)
        tok_lp, top_lp, top_ids = eng._logprob_outputs(
            raw_lp, sampled, want_logprobs)
        upd = active.astype(counts.dtype)
        counts = counts.at[row_ids, sampled].add(upd)
        seen = seen.at[row_ids, sampled].max(active)
        return (sampled, tok_lp, top_lp, top_ids, counts, seen, rows)

    @functools.partial(jax.jit,
                       static_argnames=("K", "all_greedy",
                                        "want_logprobs"),
                       donate_argnums=(1, 2, 3))
    def decode_block_fn(params, rows, counts, seen, tokens, positions,
                        active, samp, key, K, all_greedy=True,
                        want_logprobs=False):
        return eng._decode_block_impl(
            fwd, params, cfg, rows, counts, seen, tokens, positions,
            active, samp, key, K, all_greedy, want_logprobs)

    return extend_fn, decode_fn, decode_block_fn
