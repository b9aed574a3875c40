"""Trainer tests: loss decreases, freezing works, multichip step runs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.models.aurora import AuroraConfig
from aurora_tpu.models.llama import init_llama_params
from aurora_tpu.models.projector import init_projector_params
from aurora_tpu.models.vit import init_vit_params
from aurora_tpu.train.trainer import (TrainConfig, init_train_state,
                                      make_optimizer, make_train_step)
from aurora_tpu.utils.constants import IMAGE_TOKEN_INDEX


def _setup(tcfg, seed=0):
    cfg = AuroraConfig.tiny()
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = {
        "visual_encoder": init_vit_params(keys[0], cfg.vit),
        "projector": init_projector_params(keys[1], cfg.projector),
        "llm": init_llama_params(keys[2], cfg.llm),
    }
    opt = make_optimizer(params, tcfg)
    state = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt))
    return cfg, state, step


def _batch(rng, B=2, T=12, F=2):
    ids = rng.integers(3, 250, size=(B, T))  # within tiny vocab (256)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    ids[:, 4] = IMAGE_TOKEN_INDEX
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, T), bool),
        "pixel_values": jnp.asarray(
            rng.standard_normal((B, F, 3, 56, 56)), jnp.float32),
    }


def test_loss_decreases_on_repeated_batch(rng):
    tcfg = TrainConfig(lr=5e-3, max_steps=30, kept_ratio=0.5, remat=False,
                       warmup_ratio=0.0)
    _, state, step = _setup(tcfg)
    batch = _batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.5, losses
    assert int(state.step) == 8


def test_frozen_modules_do_not_move(rng):
    tcfg = TrainConfig(lr=1e-2, max_steps=10, kept_ratio=1.0, remat=False,
                       freeze_llm=True, freeze_visual_encoder=True,
                       warmup_ratio=0.0)
    _, state, step = _setup(tcfg)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    batch = _batch(rng)
    state, _ = step(state, batch)
    after = state.params
    # frozen: llm + vit identical
    for key in ("llm", "visual_encoder"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(b), a),
            before[key], after[key])
    # projector must move
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(b) - a).max()),
        before["projector"], after["projector"]))
    assert max(moved) > 0


def test_remat_matches_no_remat(rng):
    """Remat (full AND selective policies) must not change the math —
    jax.checkpoint only changes WHAT is recomputed in the backward."""
    tcfg = TrainConfig(lr=1e-3, max_steps=10, kept_ratio=0.5,
                       warmup_ratio=0.0, remat=False)
    _, s0, step0 = _setup(tcfg)
    batch = _batch(rng)
    _, m0 = step0(s0, batch)
    for policy in (None, "dots_with_no_batch_dims_saveable",
                   "dots_saveable"):
        tcfg_r = dataclasses.replace(tcfg, remat=True,
                                     remat_policy=policy)
        _, s1, step1 = _setup(tcfg_r)
        _, m1 = step1(s1, batch)
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                                   rtol=1e-5, err_msg=str(policy))
        np.testing.assert_allclose(float(m0["grad_norm"]),
                                   float(m1["grad_norm"]), rtol=1e-4,
                                   err_msg=str(policy))


def test_dryrun_multichip_8(devices):
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sp_modes_match_baseline(devices, rng):
    """Explicit ulysses/ring/hybrid SP attention inside the full train
    step reproduces the plain-attention loss on a dp×sp×tp mesh."""
    import dataclasses
    from jax.sharding import NamedSharding, PartitionSpec as P
    from aurora_tpu.parallel.mesh import (MeshConfig, aurora_param_specs,
                                          create_mesh, shard_pytree)

    tcfg0 = TrainConfig(lr=1e-3, max_steps=10, kept_ratio=1.0,
                        remat=False, warmup_ratio=0.0)
    cfg, state0, step0 = _setup(tcfg0)
    # fused length = T - 2 + 2*16 visual tokens = 48, divisible by sp=4
    # (production pads via data.collate.pad_for_sequence_parallel)
    batch = _batch(rng, B=2, T=18)
    _, m0 = step0(state0, batch)
    want = float(m0["loss"])

    mesh = create_mesh(MeshConfig(dp=1, fsdp=1, sp=4, tp=2))
    for mode, extra in (("ulysses", {}), ("ring", {}),
                        ("hybrid", {"hybrid_ulysses": 2})):
        tcfg = dataclasses.replace(tcfg0, sp_mode=mode, **extra)
        cfg2, state, _ = _setup(tcfg)
        params = shard_pytree(state.params,
                              aurora_param_specs(state.params), mesh)
        from aurora_tpu.train.trainer import (init_train_state,
                                              make_optimizer,
                                              make_train_step)
        opt = make_optimizer(params, tcfg)
        state = init_train_state(params, tcfg)
        step = jax.jit(make_train_step(cfg2, tcfg, opt, mesh=mesh))
        sb = {k: jax.device_put(v, NamedSharding(mesh, P()))
              for k, v in batch.items()}
        _, m = step(state, sb)
        np.testing.assert_allclose(float(m["loss"]), want, rtol=1e-4,
                                   err_msg=mode)
