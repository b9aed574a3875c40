"""Checkpoint round-trips: orbax save/resume, xtuner export→reload parity,
HF-llava export structure."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.models.aurora import AuroraConfig, aurora_forward
from aurora_tpu.models.convert import load_auroracap_dir
from aurora_tpu.models.export import export_hf_llava, export_xtuner_dir
from aurora_tpu.models.llama import init_llama_params
from aurora_tpu.models.projector import init_projector_params
from aurora_tpu.models.vit import init_vit_params
from aurora_tpu.train.checkpoint import (latest_step, restore_checkpoint,
                                         save_checkpoint)
from aurora_tpu.train.trainer import (TrainConfig, init_train_state,
                                      make_optimizer, make_train_step)
from aurora_tpu.utils.constants import IMAGE_TOKEN_INDEX


def _params(cfg, seed=0, dtype=jnp.float32):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {
        "visual_encoder": init_vit_params(keys[0], cfg.vit, dtype),
        "projector": init_projector_params(keys[1], cfg.projector, dtype),
        "llm": init_llama_params(keys[2], cfg.llm, dtype),
    }


def test_orbax_save_resume_roundtrip(tmp_path, rng):
    cfg = AuroraConfig.tiny()
    tcfg = TrainConfig(lr=1e-3, max_steps=10, kept_ratio=1.0, remat=False,
                       warmup_ratio=0.0)
    params = _params(cfg)
    opt = make_optimizer(params, tcfg)
    state = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, opt))

    ids = rng.integers(3, 250, size=(1, 8))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(ids),
             "attention_mask": jnp.ones((1, 8), bool),
             "pixel_values": jnp.asarray(
                 rng.standard_normal((1, 1, 3, 56, 56)), jnp.float32)}
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, step=2)
    assert latest_step(ckpt) == 2

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    restored = restore_checkpoint(ckpt, abstract)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), restored, state)

    # resumed training continues identically
    s1, m1 = step(restored, batch)
    s2, m2 = step(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]))


def test_xtuner_export_roundtrip(tmp_path, rng):
    """export → load_auroracap_dir → identical forward output."""
    cfg = AuroraConfig.tiny()
    params = _params(cfg, seed=5)
    out = str(tmp_path / "export")
    export_xtuner_dir(params, cfg.llm, cfg.vit, cfg.projector, out)
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    assert os.path.exists(os.path.join(out, "visual_encoder",
                                       "model.safetensors"))
    assert os.path.exists(os.path.join(out, "projector",
                                       "model.safetensors"))

    llm, llm_cfg, vit, vit_cfg, pj, pj_cfg = load_auroracap_dir(
        out, llm_dtype=jnp.float32, vit_dtype=jnp.float32)
    re_params = {"llm": llm, "visual_encoder": vit, "projector": pj}
    assert llm_cfg == cfg.llm

    ids = rng.integers(3, 250, size=(1, 8))
    ids[0, 2] = IMAGE_TOKEN_INDEX
    px = jnp.asarray(rng.standard_normal((1, 1, 3, 56, 56)), jnp.float32)
    a = aurora_forward(params, cfg, jnp.asarray(ids), px, kept_ratio=0.5,
                       mode="tensor")
    b = aurora_forward(re_params, cfg, jnp.asarray(ids), px,
                       kept_ratio=0.5, mode="tensor")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_hf_llava_export_loads_in_transformers(tmp_path):
    """The huggingface-format export must key-match
    LlavaForConditionalGeneration (to_huggingface_llava parity)."""
    torch = pytest.importorskip("torch")
    from transformers import LlavaForConditionalGeneration, LlavaConfig

    cfg = AuroraConfig.tiny()
    params = _params(cfg, seed=6)
    out = str(tmp_path / "hf")
    export_hf_llava(params, cfg.llm, cfg.vit, cfg.projector, out)

    model = LlavaForConditionalGeneration.from_pretrained(out)
    # vocab padded to a multiple of 64
    v = model.get_input_embeddings().weight.shape[0]
    assert v % 64 == 0 and v >= cfg.llm.vocab_size
    # spot-check a weight survived the remap
    import safetensors.numpy as st
    sd = st.load_file(os.path.join(out, "model.safetensors"))
    want = sd["language_model.model.layers.0.self_attn.q_proj.weight"]
    got = model.language_model.layers[0].self_attn.q_proj.weight
    np.testing.assert_allclose(got.detach().numpy(), want, rtol=1e-6)


def test_official_llava_export_layout(tmp_path):
    """to_official_llava key layout (aurora.py:504-511 mappings)."""
    import safetensors.numpy as st
    from aurora_tpu.models.export import export_official_llava
    cfg = AuroraConfig.tiny()
    params = _params(cfg, seed=7)
    out = str(tmp_path / "official")
    export_official_llava(params, cfg.llm, cfg.vit, cfg.projector, out)
    sd = st.load_file(os.path.join(out, "model.safetensors"))
    assert "model.embed_tokens.weight" in sd
    assert ("model.vision_tower.vision_tower.vision_model.encoder."
            "layers.0.self_attn.q_proj.weight") in sd
    assert "model.mm_projector.0.weight" in sd
    assert "model.mm_projector.2.bias" in sd
    import json
    with open(os.path.join(out, "config.json")) as f:
        c = json.load(f)
    assert c["model_type"] == "llava"
    assert c["mm_projector_type"] == "mlp2x_gelu"
    assert c["mm_vision_select_layer"] == -2


def test_sharded_export_roundtrip(tmp_path, rng):
    """Above the shard threshold the export writes an HF-style index that
    our loader (and transformers) read back (convert split parity)."""
    import functools
    from aurora_tpu.models import export as ex
    cfg = AuroraConfig.tiny()
    params = _params(cfg, seed=8)
    out = str(tmp_path / "sharded")
    # force sharding with a tiny threshold
    orig = ex._write
    ex_write = functools.partial(orig, max_shard_bytes=64 * 1024)
    try:
        ex._write = ex_write
        export_xtuner_dir(params, cfg.llm, cfg.vit, cfg.projector, out)
    finally:
        ex._write = orig
    assert os.path.exists(os.path.join(out,
                                       "model.safetensors.index.json"))
    llm, llm_cfg, *_ = load_auroracap_dir(out, llm_dtype=jnp.float32,
                                          vit_dtype=jnp.float32)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), llm, params["llm"])
