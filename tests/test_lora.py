"""LoRA tests: zero-init identity, adapter-only training moves loss with
frozen base, merge-for-export equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aurora_tpu.models.aurora import AuroraConfig, aurora_forward
from aurora_tpu.models.llama import init_llama_params
from aurora_tpu.models.projector import init_projector_params
from aurora_tpu.models.vit import init_vit_params
from aurora_tpu.train.lora import (LoraConfig, init_lora_params,
                                   lora_target_paths, make_lora_train_step,
                                   merge_lora)
from aurora_tpu.utils.constants import IMAGE_TOKEN_INDEX


def _setup(seed=0):
    cfg = AuroraConfig.tiny()
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = {
        "visual_encoder": init_vit_params(keys[0], cfg.vit),
        "projector": init_projector_params(keys[1], cfg.projector),
        "llm": init_llama_params(keys[2], cfg.llm),
    }
    return cfg, params


def _batch(rng):
    ids = rng.integers(3, 250, size=(1, 10))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    return {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(ids),
            "attention_mask": jnp.ones((1, 10), bool),
            "pixel_values": jnp.asarray(
                rng.standard_normal((1, 1, 3, 56, 56)), jnp.float32)}


def test_lora_targets_found():
    cfg, params = _setup()
    paths = lora_target_paths(params, LoraConfig())
    assert set(p.split("/")[-1] for p in paths) == {
        "q", "k", "v", "o", "gate", "up", "down"}


def test_zero_init_is_identity(rng):
    cfg, params = _setup()
    lcfg = LoraConfig(r=4)
    adapters = init_lora_params(jax.random.PRNGKey(1), params, lcfg)
    merged = merge_lora(params, adapters, lcfg)
    batch = _batch(rng)
    a = aurora_forward(params, cfg, batch["input_ids"],
                       batch["pixel_values"], labels=batch["labels"],
                       kept_ratio=1.0, mode="loss")[0]
    b = aurora_forward(merged, cfg, batch["input_ids"],
                       batch["pixel_values"], labels=batch["labels"],
                       kept_ratio=1.0, mode="loss")[0]
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_lora_training_moves_loss_base_frozen(rng):
    cfg, params = _setup()
    from aurora_tpu.train.trainer import TrainConfig
    tcfg = TrainConfig(lr=1e-2, max_steps=10, kept_ratio=1.0, remat=False)
    lcfg = LoraConfig(r=4, alpha=8)
    adapters = init_lora_params(jax.random.PRNGKey(2), params, lcfg)
    opt = optax.adam(1e-2)
    opt_state = opt.init(adapters)
    step = jax.jit(make_lora_train_step(cfg, tcfg, params, lcfg, opt))
    batch = _batch(rng)
    base_copy = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    losses = []
    for _ in range(6):
        adapters, opt_state, m = step(adapters, opt_state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.2, losses
    # base params untouched
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(b), a), base_copy, params)
    # merged-for-export model == adapter-applied model, exactly: evaluate
    # the SAME final adapters both through the step's merge and through
    # the standalone export merge
    merged = merge_lora(params, adapters, lcfg)
    export_loss = aurora_forward(
        merged, cfg, batch["input_ids"], batch["pixel_values"],
        labels=batch["labels"], kept_ratio=1.0, mode="loss")[0]
    adapters2, _, m2 = step(adapters, opt_state, batch)
    np.testing.assert_allclose(float(export_loss), float(m2["loss"]),
                               rtol=1e-5)


def test_vit_lora_targets():
    cfg, params = _setup()
    lcfg = LoraConfig(target_patterns=(
        r"visual_encoder/layers/\d+/attn/(q|k|v|o)/kernel$",))
    paths = lora_target_paths(params, lcfg)
    assert len(paths) == cfg.vit.num_hidden_layers * 4
    adapters = init_lora_params(jax.random.PRNGKey(0), params, lcfg)
    merged = merge_lora(params, adapters, lcfg)
    # shapes preserved
    assert (merged["visual_encoder"]["layers"][0]["attn"]["q"]["kernel"]
            .shape == params["visual_encoder"]["layers"][0]["attn"]["q"]
            ["kernel"].shape)
