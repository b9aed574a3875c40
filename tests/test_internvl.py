"""InternVL family parity vs HF transformers: InternViT encoder (layer
scale, optional qk-norm, BEiT layout), pixel-shuffle projector, and the
full image+text composite (xtuner InternVL_V1_5 capability parity)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from aurora_tpu.models.internvl import (InternVLConfig,
                                        internvit_config_from_hf,
                                        internvl_forward,
                                        internvl_image_features,
                                        internvl_params_from_hf)
from aurora_tpu.models.convert import llama_config_from_hf
from aurora_tpu.utils.constants import IMAGE_TOKEN_INDEX

transformers = pytest.importorskip("transformers")

IMG_TOKEN_ID = 250  # HF image placeholder id for the tiny model


@pytest.fixture(scope="module", params=[False, True],
                ids=["layer_norm", "qk_rms"])
def hf_internvl(request):
    use_qk = request.param
    vision = transformers.InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        use_qk_norm=use_qk, attention_bias=use_qk,
        norm_type="rms_norm" if use_qk else "layer_norm",
        layer_scale_init_value=0.1, use_mean_pooling=True)
    text = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False)
    cfg = transformers.InternVLConfig(
        vision_config=vision, text_config=text, image_token_id=IMG_TOKEN_ID,
        downsample_ratio=0.5, projector_hidden_act="gelu",
        vision_feature_layer=-1, vision_feature_select_strategy="default")
    torch.manual_seed(3 + int(use_qk))
    model = transformers.InternVLForConditionalGeneration(cfg).eval()
    with torch.no_grad():  # non-trivial layer-scale + cls/pos params
        model.model.vision_tower.embeddings.cls_token.uniform_(-0.1, 0.1)
        model.model.vision_tower.embeddings.position_embeddings.uniform_(
            -0.1, 0.1)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    jcfg = InternVLConfig(
        vision=internvit_config_from_hf(vision.to_dict()),
        text=llama_config_from_hf(text.to_dict()),
        downsample_ratio=0.5)
    params = internvl_params_from_hf(sd, jcfg, dtype=jnp.float32)
    return model, jcfg, params


def test_internvl_image_features_match_hf(hf_internvl, rng):
    model, cfg, params = hf_internvl
    px = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        want = model.model.get_image_features(
            torch.from_numpy(px)).float().numpy()
    got = internvl_image_features(params, cfg, jnp.asarray(px))
    assert got.shape[1] == cfg.n_visual_tokens == 4
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                               atol=2e-3)


def test_internvl_composite_logits_match_hf(hf_internvl, rng):
    """Full image+text forward: our single -200 marker expands to
    n_visual_tokens; HF takes the pre-expanded placeholder ids."""
    model, cfg, params = hf_internvl
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    n_vis = cfg.n_visual_tokens
    text_ids = [int(x) for x in rng.integers(3, 240, size=10)]
    hf_ids = text_ids[:4] + [IMG_TOKEN_ID] * n_vis + text_ids[4:]
    our_ids = text_ids[:4] + [IMAGE_TOKEN_INDEX] + text_ids[4:]
    with torch.no_grad():
        want = model(input_ids=torch.tensor([hf_ids]),
                     pixel_values=torch.from_numpy(px)
                     ).logits.float().numpy()
    got = internvl_forward(params, cfg, jnp.asarray([our_ids]),
                           pixel_values=jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3,
                               atol=3e-3)


def test_internvl_text_only(hf_internvl, rng):
    model, cfg, params = hf_internvl
    ids = rng.integers(3, 240, size=(2, 12))
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids)
                     ).logits.float().numpy()
    got = internvl_forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                               atol=2e-3)
