"""LoRA adapters for the functional models.

Parity: the reference's peft integration — AuroraModel llm_lora /
visual_encoder_lora knobs (src/xtuner/xtuner/model/aurora.py:124-167,
find_all_linear_names target discovery model/utils.py) and the
`xtuner convert merge` LoRA-merge tool (tools/model_converters/merge.py).

Functional design: adapters are a separate pytree mirroring the target
kernels with factors A [in, r] and B [r, out]; training merges
W' = W + (alpha/r)·A@B inside the step (one extra matmul per target weight,
fused by XLA) and differentiates w.r.t. the adapter pytree only — the base
stays frozen and outside the optimizer, which is where LoRA's memory saving
lives. `merge_lora` folds adapters into base weights for export.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 64
    alpha: int = 16
    # path regexes of target kernels; defaults hit every linear in the LLM
    # (find_all_linear_names behavior) — stacked llama layout
    target_patterns: Tuple[str, ...] = (
        r"llm/layers/(q|k|v|o|gate|up|down)$",)

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def _iter_kernels(tree: Any, prefix: str = ""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_kernels(v, f"{prefix}/{k}".lstrip("/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _iter_kernels(v, f"{prefix}/{i}")
    else:
        yield prefix, tree


def lora_target_paths(params: Params, cfg: LoraConfig) -> List[str]:
    out = []
    for path, leaf in _iter_kernels(params):
        if any(re.search(p, path) for p in cfg.target_patterns):
            if hasattr(leaf, "ndim") and leaf.ndim >= 2:
                out.append(path)
    return out


def init_lora_params(rng: jax.Array, params: Params,
                     cfg: LoraConfig) -> Params:
    """Adapters for matching kernels. Stacked [L, in, out] weights get
    stacked factors [L, in, r] / [L, r, out]. A ~ N(0, 0.02), B = 0 (peft
    init: adapter starts as identity)."""
    adapters: Params = {}
    paths = lora_target_paths(params, cfg)
    keys = jax.random.split(rng, max(len(paths), 1))
    flat = dict(_iter_kernels(params))
    for key, path in zip(keys, paths):
        w = flat[path]
        if w.ndim == 3:   # [L, in, out]
            a = jax.random.normal(key, (w.shape[0], w.shape[1], cfg.r),
                                  w.dtype) * 0.02
            b = jnp.zeros((w.shape[0], cfg.r, w.shape[2]), w.dtype)
        else:             # [in, out]
            a = jax.random.normal(key, (w.shape[0], cfg.r), w.dtype) * 0.02
            b = jnp.zeros((cfg.r, w.shape[1]), w.dtype)
        adapters[path] = {"a": a, "b": b}
    return adapters


def merge_lora(params: Params, adapters: Params,
               cfg: LoraConfig) -> Params:
    """W' = W + scale·A@B for every adapted kernel (pure; jit-fusable)."""
    def merge_path(tree, path_parts, ab):
        head = path_parts[0]
        key = int(head) if isinstance(tree, (list, tuple)) else head
        if len(path_parts) == 1:
            delta = jnp.matmul(ab["a"], ab["b"],
                               preferred_element_type=jnp.float32)
            new = (tree[key].astype(jnp.float32)
                   + cfg.scale * delta).astype(tree[key].dtype)
            if isinstance(tree, dict):
                return {**tree, key: new}
            out = list(tree)
            out[key] = new
            return type(tree)(out)
        sub = merge_path(tree[key], path_parts[1:], ab)
        if isinstance(tree, dict):
            return {**tree, key: sub}
        out = list(tree)
        out[key] = sub
        return type(tree)(out)

    out = params
    for path, ab in adapters.items():
        out = merge_path(out, path.split("/"), ab)
    return out


def make_lora_train_step(acfg, tcfg, base_params: Params,
                         lora_cfg: LoraConfig, opt,
                         mesh=None):
    """Train step over the adapter pytree only — the frozen base never
    enters the optimizer. The returned step takes base_params as an
    ARGUMENT (jit must not close over weight pytrees: they would be
    embedded as HLO constants); the bound `step(adapters, opt_state,
    batch)` convenience passes the captured base through untraced-safe
    partial application at call sites that jit it themselves should use
    `step_with_base`."""
    import functools
    import optax
    from aurora_tpu.models.aurora import aurora_forward

    def loss_fn(adapters, base, batch):
        params = merge_lora(base, adapters, lora_cfg)
        # segment_ids + sp_attn exactly like the full trainer
        # (trainer.py loss_fn) — dropping them made packed-varlen
        # (Q)LoRA batches attend ACROSS document boundaries
        from aurora_tpu.train.trainer import _build_sp_attn
        loss, ntok = aurora_forward(
            params, acfg, batch["input_ids"], batch.get("pixel_values"),
            attention_mask=batch.get("attention_mask"),
            labels=batch["labels"], kept_ratio=tcfg.kept_ratio,
            mode="loss", remat=tcfg.remat,
            sp_attn=_build_sp_attn(tcfg, mesh),
            segment_ids=batch.get("segment_ids"))
        return loss, ntok

    def step_with_base(adapters, opt_state, batch, base):
        (loss, ntok), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            adapters, base, batch)
        updates, opt_state = opt.update(grads, opt_state, adapters)
        adapters = optax.apply_updates(adapters, updates)
        return adapters, opt_state, {"loss": loss, "ntokens": ntok,
                                     "grad_norm": optax.global_norm(grads)}

    def step(adapters, opt_state, batch):
        return step_with_base(adapters, opt_state, batch, base_params)

    step.with_base = step_with_base
    return step
