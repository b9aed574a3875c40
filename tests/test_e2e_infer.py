"""End-to-end inference-slice tests: xtuner-dir load → preprocess → encode →
fuse → greedy decode, with a torch-composed oracle at ratio 1.0
(the BASELINE 'exact-match captions at token_kept_ratio=1.0, T=0' contract).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from aurora_tpu.cli.infer import caption, load_model
from aurora_tpu.data.preprocess import clip_preprocess
from aurora_tpu.data.text import (build_video_prompt,
                                  encode_with_image_tokens, ids_to_array)
from aurora_tpu.utils.constants import IMAGE_TOKEN_INDEX
from aurora_tpu.utils.templates import PROMPT_TEMPLATE

torch = pytest.importorskip("torch")

from utils import make_tiny_xtuner_dir, random_frames  # noqa: E402


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    return make_tiny_xtuner_dir(tmp_path_factory.mktemp("xtuner"))


def torch_oracle_caption(llm, vit, proj, tokenizer, frames_px, prompt,
                         max_new_tokens):
    """Compose the reference pipeline at ratio 1.0 with plain HF modules:
    CLIP hidden_states[-2][:,1:] → projector → splice at -200 → greedy."""
    px = torch.from_numpy(frames_px)
    with torch.no_grad():
        hs = vit(px, output_hidden_states=True).hidden_states[-2][:, 1:]
        vis = proj(hs)  # [F, N, D]
    prompt_text = build_video_prompt(prompt, frames_px.shape[0],
                                     PROMPT_TEMPLATE.vicuna)
    ids = encode_with_image_tokens(prompt_text, tokenizer)
    embed = llm.get_input_embeddings()
    chunks, k = [], 0
    for tok in ids:
        if tok == IMAGE_TOKEN_INDEX:
            chunks.append(vis[k])
            k += 1
        else:
            with torch.no_grad():
                chunks.append(embed(torch.tensor([tok])))
    inputs_embeds = torch.cat(chunks)[None]
    with torch.no_grad():
        out = llm.generate(inputs_embeds=inputs_embeds,
                           max_new_tokens=max_new_tokens, do_sample=False)
    return tokenizer.decode([t for t in out[0].tolist() if t != 2],
                            skip_special_tokens=True)


def test_e2e_greedy_matches_torch_composition(tiny_dir, rng):
    root, llm, vit, proj, _ = tiny_dir
    params, cfg, tokenizer = load_model(root, dtype=jnp.float32)

    frames = random_frames(rng, f=2, size=56)
    px = clip_preprocess(list(frames), size=56, crop=56)
    prompt = "Describe the video in detail."

    got = caption(params, cfg, tokenizer, pixel_values=px, prompt=prompt,
                  token_kept_ratio=1.0, max_new_tokens=12, image_size=56)
    want = torch_oracle_caption(llm, vit, proj, tokenizer, px, prompt, 12)
    assert got == want


def test_e2e_merged_ratio_runs(tiny_dir, rng):
    root, *_ = tiny_dir
    params, cfg, tokenizer = load_model(root, dtype=jnp.float32)
    frames = random_frames(rng, f=3, size=56)
    px = clip_preprocess(list(frames), size=56, crop=56)
    text = caption(params, cfg, tokenizer, pixel_values=px,
                   prompt="What happens?", token_kept_ratio=0.3,
                   max_new_tokens=8, image_size=56)
    assert isinstance(text, str)


def test_caption_deterministic_at_t0(tiny_dir, rng):
    root, *_ = tiny_dir
    params, cfg, tokenizer = load_model(root, dtype=jnp.float32)
    frames = random_frames(rng, f=2, size=56)
    px = clip_preprocess(list(frames), size=56, crop=56)
    a = caption(params, cfg, tokenizer, pixel_values=px, prompt="x",
                token_kept_ratio=0.5, max_new_tokens=6, image_size=56)
    b = caption(params, cfg, tokenizer, pixel_values=px, prompt="x",
                token_kept_ratio=0.5, max_new_tokens=6, image_size=56)
    assert a == b
