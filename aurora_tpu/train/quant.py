"""Weight-only int8/int4 quantized frozen base for LoRA training — the
QLoRA analog.

Parity: the reference trains AuroraCap with a bitsandbytes-quantized
frozen LLM plus LoRA adapters (src/xtuner/xtuner/model/aurora.py:24
`quantization_config` / llm_int8 + nf4 knobs in the sft configs).

TPU-first design: instead of bnb's CUDA kernels, the frozen base's
stacked layer kernels [L, in, out] are stored as
  * int8 — per-output-channel absmax scales (axis=-2 reduced), or
  * int4 — two nibbles packed per int8 along the input axis, groupwise
    absmax scales (group_size contiguous input rows share one scale),
and dequantized INSIDE the `lax.scan` layer body
(models/llama.py:_layer → dequant_layer_params): only ONE layer's bf16
weights are ever materialized, so peak HBM for the frozen base is
bytes(quantized) + one layer — the same memory story as QLoRA. LoRA
factors ride the same per-layer leaf ({"a","b"} with the alpha/r scale
pre-baked into "a"), so the adapter delta W + s·A@B is also formed
per-layer inside the scan, never as a full merged tree.

Embeddings, lm_head, norms and biases stay in the source dtype
(matching bnb's default `llm_int8_skip_modules` behavior).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# layer-stack leaves that are matmul kernels (everything else — norms,
# biases, routers — stays float; the router is tiny and precision-critical)
_SKIP_SUFFIXES = ("_norm", "_bias", "router")


def _is_kernel(name: str, leaf: Any) -> bool:
    return (hasattr(leaf, "ndim") and leaf.ndim >= 3
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and not any(name.endswith(s) for s in _SKIP_SUFFIXES))


def quantize_leaf_int8(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-output-channel symmetric absmax: scale over the input axis
    (axis=-2). w [..., in, out] → q8 int8 same shape, s [..., 1, out]."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    s = jnp.maximum(s, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return {"q8": q.astype(jnp.int8), "s": s}


def quantize_leaf_int4(w: jnp.ndarray,
                       group_size: int = 64) -> Dict[str, jnp.ndarray]:
    """Groupwise symmetric int4: `group_size` contiguous input rows share
    one absmax scale; two nibbles packed per int8 byte along the input
    axis. w [..., in, out] → q4 [..., in//2, out] int8,
    s [..., in//gs, 1, out] fp32."""
    *lead, n_in, n_out = w.shape
    assert n_in % 2 == 0, f"int4 packing needs even input dim, got {n_in}"
    gs = min(group_size, n_in)
    while n_in % gs:
        gs //= 2
    assert gs % 2 == 0 or gs == 1, (n_in, group_size)
    g = w.astype(jnp.float32).reshape(*lead, n_in // gs, gs, n_out)
    s = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
    s = jnp.maximum(s, 1e-8) / 7.0
    q = jnp.clip(jnp.round(g / s), -8, 7).astype(jnp.int8)
    q = q.reshape(*lead, n_in, n_out)
    lo, hi = q[..., 0::2, :], q[..., 1::2, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return {"q4": packed, "s": s}


def dequant_leaf(leaf: Dict[str, jnp.ndarray], dtype) -> jnp.ndarray:
    """Inverse of quantize_leaf_int{8,4}; adds the LoRA delta when the
    leaf carries injected {"a","b"} factors (scale pre-baked into a)."""
    if "q8" in leaf:
        w = leaf["q8"].astype(jnp.float32) * leaf["s"]
    else:
        p = leaf["q4"]
        # arithmetic shifts on int8 sign-extend the nibbles
        lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
        hi = jnp.right_shift(p, 4)
        q = jnp.stack([lo, hi], axis=-2)  # [..., in/2, 2, out]
        *lead, half, _, n_out = q.shape
        q = q.reshape(*lead, half * 2, n_out)
        s = leaf["s"]
        groups = s.shape[-3]
        g = q.reshape(*lead, groups, (half * 2) // groups, n_out)
        w = (g.astype(jnp.float32) * s).reshape(*lead, half * 2, n_out)
    if "a" in leaf:
        w = w + jnp.matmul(leaf["a"].astype(jnp.float32),
                           leaf["b"].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
    return w.astype(dtype)


def is_quantized_leaf(leaf: Any) -> bool:
    return isinstance(leaf, dict) and ("q8" in leaf or "q4" in leaf)


def dequant_layer_params(lp: Params, dtype) -> Params:
    """Called inside the scan body (models/llama.py:_layer): materialize
    ONE layer's float kernels from the quantized stack slice."""
    if not any(is_quantized_leaf(v) for v in lp.values()):
        return lp
    return {k: dequant_leaf(v, dtype) if is_quantized_leaf(v) else v
            for k, v in lp.items()}


def quantize_layers(layers: Params, bits: int = 8,
                    group_size: int = 64) -> Params:
    """Quantize one stacked-layer dict (llm["layers"])."""
    assert bits in (4, 8), bits
    out = {}
    for name, leaf in layers.items():
        if _is_kernel(name, leaf):
            out[name] = (quantize_leaf_int8(leaf) if bits == 8
                         else quantize_leaf_int4(leaf, group_size))
        else:
            out[name] = leaf
    return out


def quantize_base(params: Params, bits: int = 8,
                  group_size: int = 64) -> Params:
    """Quantize the frozen AuroraCap base for QLoRA training: the LLM
    decoder layer stack only (ViT + projector are small and usually the
    trainable/LoRA'd parts; embeds/lm_head stay float, bnb-default)."""
    out = dict(params)
    if "llm" in out:
        out["llm"] = dict(out["llm"])
        out["llm"]["layers"] = quantize_layers(out["llm"]["layers"],
                                               bits, group_size)
    elif "layers" in out:  # bare llama params
        out["layers"] = quantize_layers(out["layers"], bits, group_size)
    return out


def dequantize_params(params: Params, dtype=jnp.bfloat16) -> Params:
    """Full float tree (export / merge_lora path)."""
    def walk(tree):
        if is_quantized_leaf(tree):
            return dequant_leaf(tree, dtype)
        if isinstance(tree, dict):
            return {k: walk(v) for k, v in tree.items()}
        return tree
    return walk(params)


def tree_nbytes(tree: Any) -> int:
    return sum(x.nbytes for x in jax.tree.leaves(tree)
               if hasattr(x, "nbytes"))


# --- QLoRA training ---------------------------------------------------------

def inject_lora(qparams: Params, adapters: Params, lora_cfg) -> Params:
    """Attach scaled LoRA factors to their quantized leaves so the delta
    is formed per-layer inside the scan. adapters: {path: {"a","b"}}
    with stacked [L, in, r]/[L, r, out] factors (train/lora.py)."""
    def attach(tree, parts, ab):
        key = parts[0]
        if len(parts) == 1:
            leaf = tree[key]
            assert is_quantized_leaf(leaf), (
                f"LoRA target {key!r} is not a quantized leaf — use "
                "merge_lora for float bases")
            new = {**leaf, "a": lora_cfg.scale * ab["a"], "b": ab["b"]}
            return {**tree, key: new}
        return {**tree, key: attach(tree[key], parts[1:], ab)}

    out = qparams
    for path, ab in adapters.items():
        out = attach(out, path.split("/"), ab)
    return out


def make_qlora_train_step(acfg, tcfg, base_q: Params, lora_cfg, opt,
                          mesh=None):
    """make_lora_train_step twin over an int8/int4 frozen base. The
    quantized base never enters the optimizer OR gets fully
    dequantized; gradients flow to the adapter pytree only."""
    import optax
    from aurora_tpu.models.aurora import aurora_forward

    def loss_fn(adapters, base, batch):
        params = inject_lora(base, adapters, lora_cfg)
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
        return step_with_base(adapters, opt_state, batch, base_q)

    step.with_base = step_with_base
    return step
