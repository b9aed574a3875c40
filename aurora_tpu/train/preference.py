"""Preference-optimization objectives: DPO, ORPO, reward modeling.

Parity targets (capability surface, SURVEY §2.1 "other xtuner models"):
  * DPO        — src/xtuner/xtuner/model/dpo.py (sigmoid preference loss
                 over policy/reference logratios, beta, label smoothing)
  * ORPO       — src/xtuner/xtuner/model/orpo.py (SFT NLL + odds-ratio
                 penalty, reference-free)
  * RewardModel— src/xtuner/xtuner/model/reward.py (Bradley-Terry pairwise
                 ranking over scalar value head)

Functional formulation over the shared llama core: each objective is a pure
loss over (params, batch) suitable for the standard train step. Batches
carry chosen/rejected pairs: ids [B, T], labels with IGNORE on prompt
tokens.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from aurora_tpu.models.llama import LlamaConfig, llama_apply
from aurora_tpu.utils.constants import IGNORE_INDEX

Params = Dict[str, Any]


def sequence_logprob(params: Params, cfg: LlamaConfig, input_ids,
                     labels, attention_mask=None) -> jnp.ndarray:
    """Σ log p(labels≠IGNORE) per sequence → [B]."""
    logits, _ = llama_apply(params, cfg, input_ids=input_ids,
                            attention_mask=attention_mask)
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = labels[:, 1:]
    valid = tgt != IGNORE_INDEX
    safe = jnp.where(valid, tgt, 0)
    tok = jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, tok, 0.0), axis=-1)


def dpo_loss(policy_chosen_lp, policy_rejected_lp, ref_chosen_lp,
             ref_rejected_lp, *, beta: float = 0.1,
             label_smoothing: float = 0.0):
    """Sigmoid DPO (dpo.py loss_type='sigmoid'). Returns (loss [B],
    chosen_rewards, rejected_rewards)."""
    pi_ratio = policy_chosen_lp - policy_rejected_lp
    ref_ratio = ref_chosen_lp - ref_rejected_lp
    h = beta * (pi_ratio - ref_ratio)
    loss = (-jax.nn.log_sigmoid(h) * (1 - label_smoothing)
            - jax.nn.log_sigmoid(-h) * label_smoothing)
    chosen_rewards = beta * (policy_chosen_lp - ref_chosen_lp)
    rejected_rewards = beta * (policy_rejected_lp - ref_rejected_lp)
    return loss, chosen_rewards, rejected_rewards


def make_dpo_step(cfg: LlamaConfig, ref_params: Params, opt, *,
                  beta: float = 0.1, label_smoothing: float = 0.0):
    """batch: chosen_ids/chosen_labels/rejected_ids/rejected_labels.

    The returned step takes ref_params as an ARGUMENT (jit must not
    close over weight pytrees — they would embed as multi-GB HLO
    constants; see CLAUDE.md and make_lora_train_step's with_base);
    the bound `step(params, opt_state, batch)` convenience passes the
    captured reference through for callers that don't jit."""
    import optax

    def loss_fn(params, ref, batch):
        pc = sequence_logprob(params, cfg, batch["chosen_ids"],
                              batch["chosen_labels"])
        pr = sequence_logprob(params, cfg, batch["rejected_ids"],
                              batch["rejected_labels"])
        rc = sequence_logprob(ref, cfg, batch["chosen_ids"],
                              batch["chosen_labels"])
        rr = sequence_logprob(ref, cfg, batch["rejected_ids"],
                              batch["rejected_labels"])
        rc = jax.lax.stop_gradient(rc)
        rr = jax.lax.stop_gradient(rr)
        loss, cr, jr = dpo_loss(pc, pr, rc, rr, beta=beta,
                                label_smoothing=label_smoothing)
        acc = jnp.mean((cr > jr).astype(jnp.float32))
        return jnp.mean(loss), {"reward_acc": acc,
                                "reward_margin": jnp.mean(cr - jr)}

    def step_with_ref(params, opt_state, batch, ref):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, ref, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, **aux}

    def step(params, opt_state, batch):
        return step_with_ref(params, opt_state, batch, ref_params)

    step.with_ref = step_with_ref
    return step


def orpo_loss(params: Params, cfg: LlamaConfig, batch, *,
              beta: float = 0.1):
    """ORPO (orpo.py): SFT NLL on chosen + odds-ratio penalty. Reference-
    free. Log-odds use LENGTH-NORMALIZED sequence logprobs."""
    def mean_lp(ids, labels):
        total = sequence_logprob(params, cfg, ids, labels)
        n = jnp.sum(labels[:, 1:] != IGNORE_INDEX, axis=-1)
        return total / jnp.maximum(n, 1)

    lp_c = mean_lp(batch["chosen_ids"], batch["chosen_labels"])
    lp_r = mean_lp(batch["rejected_ids"], batch["rejected_labels"])
    # log odds(p) = log(p / (1 - p)) with p = exp(mean_lp)
    log_odds = ((lp_c - lp_r)
                - (jnp.log1p(-jnp.exp(jnp.minimum(lp_c, -1e-7)))
                   - jnp.log1p(-jnp.exp(jnp.minimum(lp_r, -1e-7)))))
    ratio = -jax.nn.log_sigmoid(log_odds)
    nll = -lp_c
    return jnp.mean(nll + beta * ratio), {
        "nll": jnp.mean(nll), "or_penalty": jnp.mean(ratio),
        "acc": jnp.mean((lp_c > lp_r).astype(jnp.float32))}


def make_orpo_step(cfg: LlamaConfig, opt, *, beta: float = 0.1):
    import optax

    def step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(
            lambda p, b: orpo_loss(p, cfg, b, beta=beta),
            has_aux=True)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, **aux}

    return step


# ---------------------------------------------------------------------------
# Reward model
# ---------------------------------------------------------------------------

def init_value_head(rng: jax.Array, cfg: LlamaConfig,
                    dtype=jnp.float32) -> jnp.ndarray:
    return jax.random.normal(rng, (cfg.hidden_size, 1), dtype) * 0.02


def trunk_forward(params: Params, cfg: LlamaConfig, input_ids,
                  attention_mask=None) -> jnp.ndarray:
    """Final-norm hidden states [B, T, D] (no lm head) — delegates to
    llama_apply(return_hidden=True): a hand-rolled copy here silently
    skipped dense-prefix families (params['dense_layers']), ignored
    padding-aware positions, and had to track every future family
    change by hand."""
    from aurora_tpu.models.llama import llama_apply
    hidden, _ = llama_apply(params, cfg, input_ids=input_ids,
                            attention_mask=attention_mask,
                            return_hidden=True)
    return hidden


def reward_model_scores(params: Params, value_head, cfg: LlamaConfig,
                        input_ids, attention_mask=None) -> jnp.ndarray:
    h = trunk_forward(params, cfg, input_ids, attention_mask)
    if attention_mask is not None:
        last = jnp.sum(attention_mask.astype(jnp.int32), axis=1) - 1
    else:
        last = jnp.full((input_ids.shape[0],), input_ids.shape[1] - 1)
    h_last = jnp.take_along_axis(
        h, last[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    return jnp.dot(h_last.astype(jnp.float32),
                   value_head.astype(jnp.float32))[:, 0]


def reward_bt_loss(params, value_head, cfg: LlamaConfig, batch):
    """Bradley-Terry pairwise ranking loss (reward.py)."""
    sc = reward_model_scores(params, value_head, cfg,
                             batch["chosen_ids"],
                             batch.get("chosen_mask"))
    sr = reward_model_scores(params, value_head, cfg,
                             batch["rejected_ids"],
                             batch.get("rejected_mask"))
    loss = -jnp.mean(jax.nn.log_sigmoid(sc - sr))
    return loss, {"acc": jnp.mean((sc > sr).astype(jnp.float32)),
                  "margin": jnp.mean(sc - sr)}
