"""Preference-training objectives: DPO math vs hand-calc, DPO/ORPO/reward
training dynamics on tiny models."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aurora_tpu.models.llama import LlamaConfig, init_llama_params
from aurora_tpu.train.preference import (dpo_loss, init_value_head,
                                         make_dpo_step, make_orpo_step,
                                         orpo_loss, reward_bt_loss,
                                         reward_model_scores,
                                         sequence_logprob, trunk_forward)
from aurora_tpu.utils.constants import IGNORE_INDEX


def _pair_batch(rng, vocab=250, B=2, T=12):
    def mk():
        ids = rng.integers(3, vocab, size=(B, T))
        labels = ids.copy()
        labels[:, :4] = IGNORE_INDEX
        return jnp.asarray(ids), jnp.asarray(labels)

    ci, cl = mk()
    ri, rl = mk()
    return {"chosen_ids": ci, "chosen_labels": cl,
            "rejected_ids": ri, "rejected_labels": rl}


def test_dpo_loss_hand_calc():
    pc, pr = jnp.asarray([-10.0]), jnp.asarray([-12.0])
    rc, rr = jnp.asarray([-11.0]), jnp.asarray([-11.5])
    loss, cr, jr = dpo_loss(pc, pr, rc, rr, beta=0.1)
    h = 0.1 * ((pc - pr) - (rc - rr))
    want = -np.log(1.0 / (1.0 + np.exp(-np.asarray(h))))
    np.testing.assert_allclose(np.asarray(loss), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cr), 0.1 * (np.asarray(pc)
                                                      - np.asarray(rc)))


def test_sequence_logprob_matches_manual(rng):
    cfg = LlamaConfig.tiny()
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(3, 250, size=(1, 8)))
    labels = ids.at[:, :3].set(IGNORE_INDEX)
    got = float(sequence_logprob(params, cfg, ids, labels)[0])
    from aurora_tpu.models.llama import llama_apply
    logits, _ = llama_apply(params, cfg, input_ids=ids)
    lp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), -1)
    want = sum(float(lp[t - 1, int(ids[0, t])]) for t in range(3, 8))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dpo_training_improves_preference(rng):
    cfg = LlamaConfig.tiny()
    params = init_llama_params(jax.random.PRNGKey(1), cfg)
    ref = jax.tree.map(lambda x: x, params)
    opt = optax.adam(1e-3)
    # jit the with_ref form: jit must not close over weight
    # pytrees (CLAUDE.md; they embed as HLO constants)
    step_ = jax.jit(make_dpo_step(cfg, ref, opt,
                                  beta=0.5).with_ref)
    step = lambda p_, o_, b_: step_(p_, o_, b_, ref)
    batch = _pair_batch(rng)
    opt_state = opt.init(params)
    accs = []
    for _ in range(12):
        params, opt_state, m = step(params, opt_state, batch)
        accs.append(float(m["reward_acc"]))
    assert accs[-1] == 1.0  # policy learned to prefer chosen
    assert np.isfinite(float(m["loss"]))


def test_orpo_training_improves_preference(rng):
    cfg = LlamaConfig.tiny()
    params = init_llama_params(jax.random.PRNGKey(2), cfg)
    opt = optax.adam(1e-3)
    step = jax.jit(make_orpo_step(cfg, opt, beta=0.5))
    batch = _pair_batch(rng)
    opt_state = opt.init(params)
    for _ in range(12):
        params, opt_state, m = step(params, opt_state, batch)
    assert float(m["acc"]) == 1.0
    # loss pieces finite and positive NLL
    assert float(m["nll"]) > 0 and np.isfinite(float(m["or_penalty"]))


def test_reward_model_ranking_learns(rng):
    cfg = LlamaConfig.tiny()
    params = init_llama_params(jax.random.PRNGKey(3), cfg)
    head = init_value_head(jax.random.PRNGKey(4), cfg)
    batch = _pair_batch(rng)
    batch["chosen_mask"] = jnp.ones(batch["chosen_ids"].shape, bool)
    batch["rejected_mask"] = jnp.ones(batch["rejected_ids"].shape, bool)

    opt = optax.adam(5e-3)
    trainable = {"head": head}
    opt_state = opt.init(trainable)

    @jax.jit
    def step(trainable, opt_state):
        def loss_fn(tr):
            return reward_bt_loss(params, tr["head"], cfg, batch)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable)
        updates, opt_state2 = opt.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state2, \
            {"loss": loss, **aux}

    for _ in range(30):
        trainable, opt_state, m = step(trainable, opt_state)
    assert float(m["acc"]) == 1.0
    sc = reward_model_scores(params, trainable["head"], cfg,
                             batch["chosen_ids"], batch["chosen_mask"])
    assert np.isfinite(np.asarray(sc)).all()


def test_trunk_forward_matches_llama_hidden(rng):
    """trunk_forward == llama_apply minus the lm head."""
    cfg = LlamaConfig.tiny()
    params = init_llama_params(jax.random.PRNGKey(5), cfg)
    ids = jnp.asarray(rng.integers(3, 250, size=(1, 9)))
    h = trunk_forward(params, cfg, ids)
    from aurora_tpu.models.llama import llama_apply
    logits, _ = llama_apply(params, cfg, input_ids=ids)
    want = jnp.dot(h, params["lm_head"],
                   preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(want), np.asarray(logits),
                               rtol=1e-5, atol=1e-5)
