"""QLoRA-analog tests: int8/int4 round-trip, in-scan dequant forward
parity, adapter-only training over a quantized frozen base, export
merge parity, and the 7B memory-footprint claim (via eval_shape, no
allocation).

Parity target: the reference's bitsandbytes 4/8-bit frozen LLM + LoRA
(src/xtuner/xtuner/model/aurora.py:24 quantization_config)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aurora_tpu.models.aurora import AuroraConfig, aurora_forward
from aurora_tpu.models.llama import (LlamaConfig, init_llama_params,
                                     llama_apply)
from aurora_tpu.models.projector import init_projector_params
from aurora_tpu.models.vit import init_vit_params
from aurora_tpu.train.lora import LoraConfig, init_lora_params, merge_lora
from aurora_tpu.train.quant import (dequant_leaf, dequantize_params,
                                    inject_lora, make_qlora_train_step,
                                    quantize_base, quantize_leaf_int4,
                                    quantize_leaf_int8, tree_nbytes)
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


def test_int8_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((3, 32, 48)), jnp.float32) * 0.1
    q = quantize_leaf_int8(w)
    assert q["q8"].dtype == jnp.int8 and q["q8"].shape == w.shape
    back = dequant_leaf(q, jnp.float32)
    # absmax/127 per out-channel bounds the error
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(q["s"])[..., 0, :].max() + 1e-9
    assert err.max() <= bound * 0.51 + 1e-6


def test_int4_roundtrip_and_packing(rng):
    w = jnp.asarray(rng.standard_normal((2, 64, 24)), jnp.float32)
    q = quantize_leaf_int4(w, group_size=16)
    assert q["q4"].shape == (2, 32, 24)          # two nibbles per byte
    assert q["s"].shape == (2, 4, 1, 24)         # 64/16 groups
    back = dequant_leaf(q, jnp.float32)
    assert back.shape == w.shape
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(q["s"]).max()
    assert err.max() <= bound * 0.51 + 1e-6
    # nibble order: a ramp must round-trip exactly when representable
    ramp = jnp.asarray(np.tile(np.arange(-8, 8, dtype=np.float32)
                               [None, :, None], (1, 1, 4)))
    rq = quantize_leaf_int4(ramp * 1.0, group_size=16)
    rb = dequant_leaf(rq, jnp.float32)
    # scale = 8/7 here so values land off-grid with rounding ties; a
    # non-decreasing ramp still detects lo/hi interleave bugs
    d = np.diff(np.asarray(rb)[0, :, 0])
    assert np.all(d >= 0) and d.sum() > 10


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_forward_parity(rng, bits):
    cfg = LlamaConfig.tiny()
    params = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ids = jnp.asarray(rng.integers(3, 250, size=(2, 12)))
    ref, _ = llama_apply(params, cfg, input_ids=ids)
    qp = quantize_base(params, bits=bits)
    assert qp["layers"]["q"]["q8" if bits == 8 else "q4"].dtype == jnp.int8
    got, _ = llama_apply(qp, cfg, input_ids=ids)
    # weight-only quant noise: logits track closely but not exactly
    tol = 0.08 if bits == 8 else 0.8
    assert float(jnp.max(jnp.abs(got - ref))) < tol
    # norms/biases untouched
    np.testing.assert_array_equal(np.asarray(qp["layers"]["input_norm"]),
                                  np.asarray(params["layers"]["input_norm"]))


@pytest.mark.parametrize("bits", [8, 4])
def test_qlora_training_moves_loss_base_frozen(rng, bits):
    cfg, params = _setup()
    from aurora_tpu.train.trainer import TrainConfig
    tcfg = TrainConfig(lr=1e-2, max_steps=10, kept_ratio=1.0, remat=False)
    lcfg = LoraConfig(r=4, alpha=8)
    base_q = quantize_base(params, bits=bits)
    adapters = init_lora_params(jax.random.PRNGKey(2), params, lcfg)
    opt = optax.adam(1e-2)
    opt_state = opt.init(adapters)
    step = jax.jit(make_qlora_train_step(cfg, tcfg, base_q, lcfg, opt))
    batch = _batch(rng)
    base_copy = jax.tree.map(lambda x: np.asarray(x).copy(), base_q)
    losses = []
    for _ in range(6):
        adapters, opt_state, m = step(adapters, opt_state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.2, losses
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(b), a), base_copy, base_q)
    # export: dequantize + standard merge == injected-adapter model
    merged = merge_lora(dequantize_params(base_q, jnp.float32),
                        adapters, lcfg)
    export_loss = aurora_forward(
        merged, cfg, batch["input_ids"], batch["pixel_values"],
        labels=batch["labels"], kept_ratio=1.0, mode="loss")[0]
    _, _, m2 = step(adapters, opt_state, batch)
    np.testing.assert_allclose(float(export_loss), float(m2["loss"]),
                               rtol=1e-4)


def test_zero_init_adapters_match_plain_quantized(rng):
    """B=0 ⇒ injected-LoRA forward == plain quantized forward."""
    cfg, params = _setup()
    lcfg = LoraConfig(r=4)
    base_q = quantize_base(params, bits=8)
    adapters = init_lora_params(jax.random.PRNGKey(1), params, lcfg)
    batch = _batch(rng)
    a = aurora_forward(base_q, cfg, batch["input_ids"],
                       batch["pixel_values"], labels=batch["labels"],
                       kept_ratio=1.0, mode="loss")[0]
    b = aurora_forward(inject_lora(base_q, adapters, lcfg), cfg,
                       batch["input_ids"], batch["pixel_values"],
                       labels=batch["labels"], kept_ratio=1.0,
                       mode="loss")[0]
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_7b_memory_footprint_eval_shape():
    """The QLoRA claim, checked without allocating: a 7B bf16 base does
    not fit a 16GB v5e chip next to activations; the int4 base + LoRA
    does. eval_shape computes exact per-leaf bytes."""
    cfg = LlamaConfig.vicuna_7b_v15_16k()

    def nbytes(tree):
        return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree))

    shapes = jax.eval_shape(
        lambda k: init_llama_params(k, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0))
    full = nbytes(shapes)
    q8 = nbytes(jax.eval_shape(lambda p: quantize_base(p, 8), shapes))
    q4 = nbytes(jax.eval_shape(lambda p: quantize_base(p, 4), shapes))
    assert full > 13e9                       # 7B bf16 ≈ 13.5 GB
    assert q8 < full * 0.60                  # layers → ~half
    assert q4 < full * 0.40
    # int4 base + LoRA r=64 on every llm linear fits under 8GB, leaving
    # >8GB of a 16GB v5e for activations + adapter optimizer state
    lcfg = LoraConfig(r=64, target_patterns=(
        r"layers/(q|k|v|o|gate|up|down)$",))
    ad = jax.eval_shape(
        lambda k: init_lora_params(k, shapes, lcfg), jax.random.PRNGKey(0))
    assert len(ad) == 7
    assert q4 + nbytes(ad) < 8e9
