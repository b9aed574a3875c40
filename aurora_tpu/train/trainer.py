"""Training engine: optax + jit/GSPMD train step.

Replaces the reference's mmengine Runner + DeepSpeed ZeRO stack
(src/xtuner/xtuner/tools/train.py:257-339, engine/_strategy/deepspeed.py) and
the xtuner_lite FSDP loop (src/xtuner_lite/llava_train_sp.py:429-1148):

  * ZeRO/FSDP      → params laid out on the 'fsdp' mesh axis
                     (aurora_tpu.parallel.mesh); XLA emits the all-gather /
                     reduce-scatter pair that DeepSpeed does by hand.
  * frozen modules → optax.multi_transform routes frozen subtrees to
                     set_to_zero (reference freeze flags aurora.py:94-102).
  * grad ckpt      → jax.checkpoint inside the model (remat=True).
  * LR schedule    → linear warmup + cosine decay (stage configs
                     auroracap_7b_pretrain_stage.py:96-118).
  * grad clip      → optax.clip_by_global_norm (max_norm=1, cfg :43).
  * grad accum     → optax.MultiSteps when accum > 1 (vision stage uses
                     bs1×accum24, vision_stage.py:49).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from aurora_tpu.models.aurora import AuroraConfig, aurora_forward

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 2e-4
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.999)
    warmup_ratio: float = 0.03
    max_steps: int = 1000
    grad_clip: float = 1.0
    grad_accum: int = 1
    freeze_llm: bool = False
    freeze_visual_encoder: bool = False
    freeze_projector: bool = False
    kept_ratio: float = 1.0
    remat: bool = True
    # optional jax.checkpoint_policies name applied when remat=True
    # (e.g. 'dots_with_no_batch_dims_saveable': keep MXU outputs,
    # recompute elementwise only — selective activation checkpointing,
    # the reference's llava_train_sp.py:836-841); None = full remat
    remat_policy: Optional[str] = None
    # explicit SP attention for the LLM: None | 'ulysses' | 'ring' |
    # 'hybrid' (requires a mesh passed to make_train_step)
    sp_mode: Optional[str] = None
    hybrid_ulysses: int = 1
    # ring options: 'contiguous' | 'zigzag' | 'stripe' causal load
    # balance (apply zigzag_split/stripe_split to batches first);
    # heads_k_stride bounds the llama3 varlen-ring all-gather (0 → all
    # kv heads at once)
    ring_layout: str = "contiguous"
    heads_k_stride: int = 0


@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jnp.ndarray


def lr_schedule(cfg: TrainConfig):
    warmup = max(1, int(cfg.max_steps * cfg.warmup_ratio))
    return optax.join_schedules([
        optax.linear_schedule(cfg.lr / max(warmup, 1), cfg.lr, warmup),
        optax.cosine_decay_schedule(cfg.lr, cfg.max_steps - warmup),
    ], [warmup])


def _freeze_labels(params: Params, cfg: TrainConfig) -> Params:
    frozen = {"llm": cfg.freeze_llm,
              "visual_encoder": cfg.freeze_visual_encoder,
              "projector": cfg.freeze_projector}
    return {k: jax.tree.map(lambda _: "frozen" if frozen.get(k) else "train",
                            v) for k, v in params.items()}


def make_optimizer(params: Params, cfg: TrainConfig):
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(lr_schedule(cfg), b1=cfg.betas[0], b2=cfg.betas[1],
                    weight_decay=cfg.weight_decay),
    )
    if any([cfg.freeze_llm, cfg.freeze_visual_encoder,
            cfg.freeze_projector]):
        opt = optax.multi_transform(
            {"train": opt, "frozen": optax.set_to_zero()},
            _freeze_labels(params, cfg))
    if cfg.grad_accum > 1:
        opt = optax.MultiSteps(opt, cfg.grad_accum)
    return opt


def init_train_state(params: Params, cfg: TrainConfig) -> TrainState:
    opt = make_optimizer(params, cfg)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32))


def _build_sp_attn(tcfg: TrainConfig, mesh):
    """Ulysses/ring/hybrid attention bound to the mesh ('sp' axis manual,
    batch on (dp,fsdp), heads on tp) — the reference's
    @sequence_parallel_wrapper splice (dispatch/attention.py:14-97)."""
    if tcfg.sp_mode is None or mesh is None:
        return None
    import functools
    from aurora_tpu.parallel.hybrid import hybrid_mha
    from aurora_tpu.parallel.ring import ring_mha
    from aurora_tpu.parallel.ulysses import ulysses_mha
    kw = dict(axis_name="sp", causal=True, batch_axes=("dp", "fsdp"),
              head_axis="tp")

    if tcfg.sp_mode == "ulysses":
        def sp_attn(q, k, v, segment_ids=None):
            return ulysses_mha(q, k, v, mesh, q_segment_ids=segment_ids,
                               kv_segment_ids=segment_ids, **kw)
        return sp_attn
    if tcfg.sp_mode in ("ring", "hybrid"):
        from aurora_tpu.parallel.hybrid import hybrid_varlen_mha
        from aurora_tpu.parallel.ring import ring_varlen_mha
        if tcfg.sp_mode == "hybrid":
            fn = functools.partial(hybrid_mha, ulysses=tcfg.hybrid_ulysses,
                                   layout=tcfg.ring_layout)
            vfn = functools.partial(hybrid_varlen_mha,
                                    ulysses=tcfg.hybrid_ulysses,
                                    heads_k_stride=tcfg.heads_k_stride)
        else:
            fn = functools.partial(ring_mha, layout=tcfg.ring_layout)
            vfn = functools.partial(ring_varlen_mha,
                                    heads_k_stride=tcfg.heads_k_stride)

        def sp_attn(q, k, v, segment_ids=None):
            if segment_ids is not None:
                # packed varlen → llama3-style all-gather-KV ring
                # (dispatches/internlm2.py:204-240 parity). The varlen
                # path assumes CONTIGUOUS token order (q_offset =
                # rank*Tl) — a zigzag/stripe-reordered batch would get
                # silently wrong positions and causal masks
                if tcfg.ring_layout not in (None, "", "contiguous"):
                    raise ValueError(
                        "packed varlen batches (segment_ids) require "
                        "ring_layout='contiguous' — "
                        f"{tcfg.ring_layout!r} reorders tokens and the "
                        "all-gather-KV varlen ring would compute wrong "
                        "causal masks")
                return vfn(q, k, v, segment_ids, mesh, **kw)
            return fn(q, k, v, mesh, **kw)
        return sp_attn
    raise ValueError(f"unknown sp_mode {tcfg.sp_mode!r}")


def make_train_step(acfg: AuroraConfig, tcfg: TrainConfig, opt=None,
                    mesh=None):
    """Returns (state, batch) → (state, metrics), jit-ready.

    batch: input_ids [B,T], labels [B,T], attention_mask [B,T],
    pixel_values [B,F,C,H,W] (optional — text-only batches skip the ViT).
    Sharding comes from the input arrays (params via shard_pytree, batch
    via batch_sharding); GSPMD propagates through the step.
    """
    if opt is None:
        _opt_holder = []

        def _get_opt(params):
            if not _opt_holder:
                _opt_holder.append(make_optimizer(params, tcfg))
            return _opt_holder[0]
    else:
        def _get_opt(params):
            return opt

    sp_attn = _build_sp_attn(tcfg, mesh)
    frozen = {"llm": tcfg.freeze_llm,
              "visual_encoder": tcfg.freeze_visual_encoder,
              "projector": tcfg.freeze_projector}
    any_frozen = any(frozen.values())

    def loss_fn(params, batch):
        if any_frozen:
            # stop_gradient on frozen subtrees: their backward is DCE'd
            # (the optimizer's set_to_zero alone still computes it) and
            # grad_norm naturally covers trainable params only
            params = {k: (jax.tree.map(jax.lax.stop_gradient, v)
                          if frozen.get(k) else v)
                      for k, v in params.items()}
        loss, ntok = aurora_forward(
            params, acfg, batch["input_ids"],
            batch.get("pixel_values"),
            attention_mask=batch.get("attention_mask"),
            labels=batch["labels"], kept_ratio=tcfg.kept_ratio,
            mode="loss",
            remat=(tcfg.remat_policy or True) if tcfg.remat else False,
            sp_attn=sp_attn,
            segment_ids=batch.get("segment_ids"))
        return loss, ntok

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        o = _get_opt(state.params)
        (loss, ntok), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = o.update(grads, state.opt_state,
                                      state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        # MultiSteps advances the inner schedule once per accum window
        metrics = {"loss": loss, "ntokens": ntok, "grad_norm": gnorm,
                   "lr": lr_schedule(tcfg)(
                       state.step // max(tcfg.grad_accum, 1))}
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    return step_fn


# pytree registration so TrainState flows through jit
jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(params=c[0], opt_state=c[1], step=c[2]))
