"""SigLIP vision-tower parity (AuroraSigEncoder path, aurora.py:954-1196):
no CLS token, patch bias, tanh-gelu MLP, ToMe without a protected token."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aurora_tpu.models.convert import (state_dict_from_torch_module,
                                       vit_config_from_hf,
                                       vit_params_from_hf)
from aurora_tpu.models.vit import ViTConfig, vit_encode, vit_tome_r

torch = pytest.importorskip("torch")


def _tiny_siglip():
    from transformers import SiglipVisionConfig, SiglipVisionModel
    torch.manual_seed(0)
    hf_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
        attn_implementation="eager")
    hf = SiglipVisionModel(hf_cfg).eval()
    cfg = vit_config_from_hf(hf_cfg.to_dict()
                             | {"model_type": "siglip_vision_model"})
    params = vit_params_from_hf(state_dict_from_torch_module(hf), cfg)
    return hf, cfg, params


def test_siglip_matches_hf_ratio1(rng):
    hf, cfg, params = _tiny_siglip()
    assert cfg.model_type == "siglip" and not cfg.class_token
    px = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(px),
                  output_hidden_states=True).hidden_states[-2].numpy()
    got = np.asarray(vit_encode(params, jnp.asarray(px), cfg,
                                kept_ratio=1.0, select_layer=-2))
    # token 0 is DROPPED for SigLIP too: AuroraModel.forward slices
    # [:, 1:] unconditionally (aurora.py:253) — the first PATCH plays
    # the CLS role (protected in the merge, removed at selection)
    assert got.shape == want[:, 1:].shape
    np.testing.assert_allclose(got, want[:, 1:], rtol=2e-4, atol=3e-5)


def test_siglip_tome_protects_first_patch(rng):
    """The reference merges with class_token=True for SigLIP too
    (aurora.py:996): token 0 never merges, the schedule clamps with
    protected=1, and the output drops it."""
    from aurora_tpu.ops.tome import tome_schedule
    _, cfg, params = _tiny_siglip()
    px = jnp.asarray(rng.standard_normal((1, 3, 56, 56)), jnp.float32)
    out = vit_encode(params, px, cfg, kept_ratio=0.25, select_layer=-2)
    r = vit_tome_r(cfg, 0.25, 56, 56)
    assert r > 0
    sched = tome_schedule(16, r, cfg.num_hidden_layers, 1)
    want_t = sched[cfg.num_hidden_layers - 1].t_in  # input to last layer
    assert out.shape[1] == want_t - 1               # token 0 dropped
    assert np.isfinite(np.asarray(out)).all()
