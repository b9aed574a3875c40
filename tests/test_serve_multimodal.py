"""Multimodal serving: engine-vs-offline caption parity, placeholder-id
radix reuse across identical clips, HTTP video endpoint."""

import asyncio
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.cli.infer import caption, load_model
from aurora_tpu.data.preprocess import clip_preprocess
from aurora_tpu.data.text import build_video_prompt
from aurora_tpu.generate.sampler import SamplingParams
from aurora_tpu.serve.engine import EngineConfig, ServeEngine
from aurora_tpu.serve.multimodal import AuroraCapServing, frame_hash_ids
from aurora_tpu.utils.templates import PROMPT_TEMPLATE

from utils import make_tiny_xtuner_dir, random_frames  # noqa: E402


@pytest.fixture(scope="module")
def mm_setup(tmp_path_factory):
    root, *_ = make_tiny_xtuner_dir(tmp_path_factory.mktemp("mm"))
    params, cfg, tokenizer = load_model(root, dtype=jnp.float32)
    mm = AuroraCapServing(params, cfg, tokenizer, kept_ratio=0.5,
                          image_size=56)
    ecfg = EngineConfig(max_batch=2, max_seq_len=128, num_slots=1024,
                        prefill_buckets=(64, 96), kv_dtype=jnp.float32)
    engine = ServeEngine(params["llm"], cfg.llm, ecfg,
                         embed_fn=mm.embed_fn)
    return root, params, cfg, tokenizer, mm, engine


def _drain(engine, reqs):
    from utils import drain_engine
    return drain_engine(engine, reqs)


def test_frame_hash_ids_deterministic(rng):
    px = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    a = frame_hash_ids(px, 5)
    b = frame_hash_ids(px, 5)
    assert a == b
    c = frame_hash_ids(px + 1, 5)
    assert a != c


def test_multimodal_engine_matches_offline_caption(mm_setup, rng):
    root, params, cfg, tokenizer, mm, engine = mm_setup
    frames = random_frames(rng, f=2, size=56)
    px = clip_preprocess(list(frames), size=56, crop=56)
    prompt = "What happens?"

    want = caption(params, cfg, tokenizer, pixel_values=px, prompt=prompt,
                   token_kept_ratio=0.5, max_new_tokens=6, image_size=56)

    prompt_text = build_video_prompt(prompt, px.shape[0],
                                     PROMPT_TEMPLATE.vicuna)
    req = mm.build_request("v1", prompt_text, px,
                           sampling=SamplingParams(temperature=0.0),
                           max_new_tokens=6,
                           eos_ids=(tokenizer.eos_token_id,))
    done = _drain(engine, [req])
    got = tokenizer.decode(
        [t for t in done["v1"].output_ids
         if t != tokenizer.eos_token_id], skip_special_tokens=True)
    assert got == want


def test_identical_clip_hits_radix_cache(mm_setup, rng):
    root, params, cfg, tokenizer, mm, engine = mm_setup
    frames = random_frames(rng, f=2, size=56)
    px = clip_preprocess(list(frames), size=56, crop=56)
    prompt_text = build_video_prompt("Describe.", px.shape[0],
                                     PROMPT_TEMPLATE.vicuna)

    r1 = mm.build_request("a", prompt_text, px, max_new_tokens=4,
                          eos_ids=(tokenizer.eos_token_id,))
    d1 = _drain(engine, [r1])
    r2 = mm.build_request("b", prompt_text, px, max_new_tokens=4,
                          eos_ids=(tokenizer.eos_token_id,))
    d2 = _drain(engine, [r2])
    # same clip + prompt → long placeholder prefix must hit the cache
    assert d2["b"].prefix_slots is not None
    assert len(d2["b"].prefix_slots) >= mm.n_visual_tokens()
    assert d2["b"].output_ids == d1["a"].output_ids
    assert engine.check_memory()["leaked"] == 0


def test_http_video_endpoint(mm_setup, tmp_path, rng):
    from aiohttp.test_utils import TestClient, TestServer
    from aurora_tpu.serve.api import ServingLoop, build_app
    root, params, cfg, tokenizer, mm, _ = mm_setup

    vid = tmp_path / "clip.npy"
    np.save(vid, rng.integers(0, 255, (5, 64, 64, 3)).astype(np.uint8))

    async def run():
        ecfg = EngineConfig(max_batch=2, max_seq_len=128, num_slots=1024,
                            prefill_buckets=(64, 96),
                            kv_dtype=jnp.float32)
        engine = ServeEngine(params["llm"], cfg.llm, ecfg,
                             embed_fn=mm.embed_fn)
        loop_ = ServingLoop(engine, tokenizer, mm=mm)
        await loop_.start()
        app = build_app(loop_, "auroracap-tiny")
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/generate", json={
                "video_path": str(vid), "text": "Describe the video.",
                "num_frames": 2, "image_size": 56,
                "max_new_tokens": 4})
            assert r.status == 200, await r.text()
            body = await r.json()
            assert isinstance(body["text"], str)
            assert body["meta_info"]["completion_tokens"] >= 1
        finally:
            await client.close()
            loop_._task.cancel()

    asyncio.run(run())


def test_per_request_kept_ratio_and_resolution(mm_setup, rng):
    """Round-2 review: placeholder counts must derive from the ACTUAL
    frame resolution and the request's kept_ratio — a per-request
    override used to desync the span from the ViT output and crash."""
    root, params, cfg, tokenizer, mm, engine = mm_setup
    from aurora_tpu.data.text import build_video_prompt
    from aurora_tpu.utils.templates import PROMPT_TEMPLATE

    px28 = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    prompt = build_video_prompt("describe", 2, PROMPT_TEMPLATE.vicuna)
    # smaller resolution AND a different ratio than the server default
    req = mm.build_request("res28", prompt, px28, kept_ratio=1.0,
                           max_new_tokens=3, eos_ids=(2,))
    n28 = mm.n_visual_tokens(28, 28)  # ratio arg path
    # placeholder count derives from the ACTUAL frame resolution (2
    # frames at 28px → 2*n28 placeholder ids in the pseudo-vocab band),
    # not the server default size — an internally-consistent-but-wrong
    # count would still pass embed_fn's span check below
    from aurora_tpu.serve.multimodal import _PLACEHOLDER_BASE
    n_ph = sum(1 for t in req.input_ids if t >= _PLACEHOLDER_BASE)
    assert n_ph == 2 * n28
    # embeds must line up with the placeholder span (the old bug fired
    # an assert inside the engine loop)
    out = mm.embed_fn(req)
    assert out.shape[0] == len(req.input_ids)
    done = _drain(engine, [req])
    assert done["res28"].finished is not None
    assert len(done["res28"].output_ids) >= 1


def test_embed_cache_skips_recompute(mm_setup, rng):
    """Identical clips must not re-run the ViT (the hash-keyed embed
    cache complements the radix KV reuse)."""
    root, params, cfg, tokenizer, mm, engine = mm_setup
    from aurora_tpu.data.text import build_video_prompt
    from aurora_tpu.utils.templates import PROMPT_TEMPLATE
    px = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    prompt = build_video_prompt("what", 2, PROMPT_TEMPLATE.vicuna)
    r1 = mm.build_request("c1", prompt, px, max_new_tokens=2,
                          eos_ids=(2,))
    mm._cache.clear()
    mm.embed_fn(r1)
    assert len(mm._cache) == 1
    calls = {"n": 0}
    import aurora_tpu.serve.multimodal as M
    orig = M.encode_visual
    M.encode_visual = lambda *a, **k: (calls.__setitem__("n",
                                                         calls["n"] + 1)
                                       or orig(*a, **k))
    try:
        mm.embed_fn(r1)  # same clip+ratio → cache hit, no encode
    finally:
        M.encode_visual = orig
    assert calls["n"] == 0


def test_llava_hf_checkpoint_matches_hf_forward(rng, tmp_path):
    """A llava-hf checkpoint dir loads through load_llava_hf_dir and the
    AuroraCap pipeline at token_kept_ratio=1.0 reproduces HF
    LlavaForConditionalGeneration logits exactly — AuroraCap IS the
    LLaVA architecture + ToMe (sglang srt/models/llava.py parity)."""
    import torch
    import transformers

    from aurora_tpu.models.aurora import AuroraConfig, aurora_forward
    from aurora_tpu.models.convert import load_llava_hf_dir
    from aurora_tpu.models.llama import llama_apply
    from aurora_tpu.utils.constants import IMAGE_TOKEN_INDEX

    torch.manual_seed(71)
    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=32)
    tc = transformers.LlamaConfig(
        vocab_size=144, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rms_norm_eps=1e-5,
        attn_implementation="eager")
    hf_cfg = transformers.LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=99,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    hf = transformers.LlavaForConditionalGeneration(hf_cfg).eval()
    hf.save_pretrained(tmp_path / "llava")

    llm, llm_cfg, vit, vit_cfg, pj, pj_cfg = load_llava_hf_dir(
        str(tmp_path / "llava"), llm_dtype=jnp.float32,
        vit_dtype=jnp.float32)
    params = {"llm": llm, "visual_encoder": vit, "projector": pj}
    cfg = AuroraConfig(vit=vit_cfg, llm=llm_cfg, projector=pj_cfg)

    n_patches = (28 // 14) ** 2  # 4
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    text = [3, 7, 11]
    hf_ids = text[:1] + [99] * n_patches + text[1:]
    our_ids = text[:1] + [IMAGE_TOKEN_INDEX] + text[1:]
    with torch.no_grad():
        want = hf(input_ids=torch.tensor([hf_ids]),
                  pixel_values=torch.from_numpy(px)).logits.numpy()
    fused = aurora_forward(params, cfg, jnp.asarray([our_ids]),
                           jnp.asarray(px)[None], kept_ratio=1.0,
                           mode="inference")
    got, _ = llama_apply(params["llm"], cfg.llm,
                         inputs_embeds=fused["inputs_embeds"],
                         attention_mask=fused["attention_mask"])
    assert got.shape[1] == want.shape[1]
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                               atol=5e-4)


def test_yivl_projector_layernorms(rng, tmp_path):
    """Yi-VL's projector LayerNorms (Linear → LN → GELU → Linear → LN,
    sglang srt/models/yivl.py mm_projector mapping) load from a
    llava-format dir and match a torch oracle."""
    import torch

    from aurora_tpu.models.projector import (ProjectorConfig,
                                             apply_projector)

    torch.manual_seed(72)
    lin1 = torch.nn.Linear(32, 64)
    ln1 = torch.nn.LayerNorm(64)
    lin2 = torch.nn.Linear(64, 64)
    ln2 = torch.nn.LayerNorm(64)
    oracle = torch.nn.Sequential(lin1, ln1, torch.nn.GELU(), lin2, ln2)

    from aurora_tpu.models.convert import _j
    pj = {"layers": [
        {"kernel": _j(lin1.weight.detach().numpy().T, jnp.float32),
         "bias": _j(lin1.bias.detach().numpy(), jnp.float32),
         "ln_scale": _j(ln1.weight.detach().numpy(), jnp.float32),
         "ln_bias": _j(ln1.bias.detach().numpy(), jnp.float32)},
        {"kernel": _j(lin2.weight.detach().numpy().T, jnp.float32),
         "bias": _j(lin2.bias.detach().numpy(), jnp.float32),
         "ln_scale": _j(ln2.weight.detach().numpy(), jnp.float32),
         "ln_bias": _j(ln2.bias.detach().numpy(), jnp.float32)},
    ]}
    x = rng.standard_normal((2, 5, 32)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = apply_projector(pj, jnp.asarray(x),
                          ProjectorConfig(visual_hidden_size=32,
                                          llm_hidden_size=64))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                               atol=2e-5)


def test_split_uint8_request_matches_legacy_float(mm_setup, rng):
    """The split CLIP pipeline's serving layout ([F, H, W, 3] uint8 from
    clip_resize_crop, normalize on device) produces the same greedy
    caption as the legacy pre-normalized [F, C, H, W] float layout for
    the same frames — the layouts must be interchangeable because
    serve/api.py now ships uint8 while tests/tools may still hand the
    engine float pixels."""
    from aurora_tpu.data.preprocess import clip_resize_crop
    root, params, cfg, tokenizer, mm, engine = mm_setup
    frames = random_frames(rng, f=2, size=64)  # non-square-source resize
    legacy = clip_preprocess(list(frames), size=56, crop=56)
    split = clip_resize_crop(list(frames), size=56, crop=56)
    assert split.dtype == np.uint8 and split.shape == (2, 56, 56, 3)
    prompt_text = build_video_prompt("Compare.", 2,
                                     PROMPT_TEMPLATE.vicuna)
    outs = {}
    for tag, px in (("legacy", legacy), ("split", split)):
        req = mm.build_request(f"sp_{tag}", prompt_text, px,
                               sampling=SamplingParams(temperature=0.0),
                               max_new_tokens=5, eos_ids=(-1,))
        outs[tag] = _drain(engine, [req])[f"sp_{tag}"].output_ids
    assert outs["split"] == outs["legacy"]
