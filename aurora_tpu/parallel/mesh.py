"""Device mesh + parameter sharding rules.

Replaces the reference's process-group zoo — DeepSpeed ZeRO data-parallel
groups (src/xtuner/xtuner/engine/_strategy/deepspeed.py:63-70), xtuner_lite
device meshes (src/xtuner_lite/_lite/parallel/setup.py:15-70) and sglang/vLLM
TP groups — with ONE `jax.sharding.Mesh` over named axes:

    ('dp', 'fsdp', 'sp', 'tp')

  * dp    — pure data parallel (gradient psum only; rides DCN across slices)
  * fsdp  — ZeRO-3-style parameter/optimizer sharding: params laid out with
            one dim on 'fsdp'; XLA inserts the all-gather before use and the
            reduce-scatter on grads (the DeepSpeed/FSDP machinery compiles
            away)
  * sp    — sequence parallel (Ulysses all_to_all / ring ppermute; see
            aurora_tpu.parallel.ulysses / .ring)
  * tp    — megatron tensor parallel over attention heads / MLP width

Activations: batch on ('dp','fsdp') so the fsdp all-gather amortizes over
the local batch; sequence on 'sp'.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "sp", "tp")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    fsdp: int = 1
    sp: int = 1
    tp: int = 1

    @property
    def num_devices(self) -> int:
        return self.dp * self.fsdp * self.sp * self.tp

    @property
    def batch_axes(self):
        return ("dp", "fsdp")


def create_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < cfg.num_devices:
        raise ValueError(f"need {cfg.num_devices} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[: cfg.num_devices]).reshape(
        cfg.dp, cfg.fsdp, cfg.sp, cfg.tp)
    return Mesh(arr, AXES)


# ---------------------------------------------------------------------------
# Parameter partition specs (path-pattern → PartitionSpec)
# ---------------------------------------------------------------------------

# Llama stacked-layer layout (aurora_tpu.models.llama.init_llama_params):
# leading dim L is never sharded; weight matmul dims carry fsdp × tp.
_LLAMA_RULES = [
    (r"embed_tokens$", P("tp", "fsdp")),
    (r"lm_head$", P("fsdp", "tp")),
    (r"final_norm$", P(None)),
    (r"layers/(input_norm|post_attn_norm)$", P(None, None)),
    (r"layers/(q|k|v|gate|up)$", P(None, "fsdp", "tp")),
    (r"layers/(o|down)$", P(None, "tp", "fsdp")),
    # MoE (Mixtral): experts on 'tp' (≡ EP, TP-sharded experts like the
    # reference's fused-MoE layer)
    (r"layers/moe_router$", P(None, "fsdp", None)),
    (r"layers/moe_(gate|up|down)$", P(None, "tp", "fsdp", None)),
]

# ViT per-layer dict layout (aurora_tpu.models.vit.init_vit_params)
_VIT_RULES = [
    (r"patch_kernel$", P(None, "fsdp")),
    (r"position_embedding$", P(None, None)),
    (r"class_embedding$", P(None)),
    (r"patch_bias$", P(None)),
    (r"(ln1|ln2|pre_layernorm|post_layernorm)/(scale|bias)$", P(None)),
    (r"attn/(q|k|v)/kernel$", P("fsdp", "tp")),
    (r"attn/o/kernel$", P("tp", "fsdp")),
    (r"mlp/fc1/kernel$", P("fsdp", "tp")),
    (r"mlp/fc2/kernel$", P("tp", "fsdp")),
    (r"attn/(q|k|v)/bias$", P("tp")),
    (r"mlp/fc1/bias$", P("tp")),
    (r"(attn/o|mlp/fc2)/bias$", P(None)),
]

_PROJECTOR_RULES = [
    (r"layers/\d+/kernel$", P("fsdp", "tp")),
    (r"layers/\d+/bias$", P("tp")),
]


def _spec_for(path: str, rules) -> P:
    for pat, spec in rules:
        if re.search(pat, path):
            return spec
    return P()  # replicate by default


def _tree_specs(tree: Any, rules, prefix: str = "") -> Any:
    if isinstance(tree, dict):
        return {k: _tree_specs(v, rules, f"{prefix}/{k}".lstrip("/"))
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        out = [_tree_specs(v, rules, f"{prefix}/{i}")
               for i, v in enumerate(tree)]
        return type(tree)(out)
    return _spec_for(prefix, rules)


def llama_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    return _tree_specs(params, _LLAMA_RULES)


def vit_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    return _tree_specs(params, _VIT_RULES)


def projector_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    return _tree_specs(params, _PROJECTOR_RULES)


def aurora_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Specs for the composite {llm, visual_encoder, projector} pytree."""
    out = {}
    if "llm" in params:
        out["llm"] = llama_param_specs(params["llm"])
    if "visual_encoder" in params:
        out["visual_encoder"] = vit_param_specs(params["visual_encoder"])
    if "projector" in params:
        out["projector"] = projector_param_specs(params["projector"])
    return out


def _divisible(shape, spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        axes = (axis,) if isinstance(axis, str) else axis
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if dim % size != 0:
            return False
    return True


def shard_pytree(params: Any, specs: Any, mesh: Mesh) -> Any:
    """Device-put params with their specs; falls back to replication for
    dims not divisible by the mesh axis (tiny test models)."""
    def put(x, spec):
        if not hasattr(x, "shape"):
            return x
        if not _divisible(x.shape, spec, mesh):
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, params, specs,
                        is_leaf=lambda x: isinstance(x, P))


def batch_sharding(mesh: Mesh, *, seq_axis: Optional[str] = None):
    """Sharding for [B, T, ...] activations: batch over (dp, fsdp),
    sequence over sp when seq_axis given."""
    return NamedSharding(mesh, P(("dp", "fsdp"), seq_axis))
