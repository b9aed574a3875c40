"""Single-shot captioning CLI — the inference.py parity entry point.

Usage:
  python -m aurora_tpu.cli.infer --model_path <xtuner-format dir> \
      --visual_input video.mp4 --prompt "Describe the video in detail." \
      --num_frm 8 --token_kept_ratio 0.8 --max_new_tokens 2048

Mirrors /root/reference/inference.py:29-98 (flags, prompt construction,
greedy defaults) on the TPU path: one jitted visual-encode+fuse program and
one jitted generate program.
"""

from __future__ import annotations

import argparse
import os.path as osp
import time

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.data.preprocess import clip_preprocess
from aurora_tpu.data.text import (build_video_prompt,
                                  encode_with_image_tokens, ids_to_array)
from aurora_tpu.data.video import read_video
from aurora_tpu.generate import SamplingParams, generate
from aurora_tpu.generate.engine import decode_tokens
from aurora_tpu.models.aurora import AuroraConfig, aurora_forward
from aurora_tpu.models.convert import load_auroracap_dir
from aurora_tpu.utils.constants import DEFAULT_IMAGE_TOKEN
from aurora_tpu.utils.templates import PROMPT_TEMPLATE


def load_model(model_path: str, dtype=jnp.bfloat16):
    """xtuner-format OR llava-hf dir → (params, AuroraConfig,
    tokenizer). llava-hf single-dir checkpoints (model_type "llava")
    are auto-detected — with --token_kept_ratio 1.0 the pipeline is
    exactly LLaVA-1.5 (sglang srt/models/llava.py parity)."""
    import json
    import os

    from transformers import AutoTokenizer
    with open(os.path.join(model_path, "config.json")) as f:
        mt = json.load(f).get("model_type")
    if mt in ("llava", "llava_next"):
        from aurora_tpu.models.convert import load_llava_hf_dir
        llm, llm_cfg, vit, vit_cfg, pj, pj_cfg = load_llava_hf_dir(
            model_path, llm_dtype=dtype, vit_dtype=dtype)
    else:
        llm, llm_cfg, vit, vit_cfg, pj, pj_cfg = load_auroracap_dir(
            model_path, llm_dtype=dtype, vit_dtype=dtype)
    params = {"llm": llm, "visual_encoder": vit, "projector": pj}
    cfg = AuroraConfig(vit=vit_cfg, llm=llm_cfg, projector=pj_cfg)
    tokenizer = AutoTokenizer.from_pretrained(model_path,
                                              padding_side="right")
    return params, cfg, tokenizer


def caption(params, cfg: AuroraConfig, tokenizer, *,
            pixel_values: np.ndarray, prompt: str,
            token_kept_ratio: float = 0.8, temperature: float = 0.0,
            top_p: float = 1.0, num_beams: int = 1,
            max_new_tokens: int = 2048,
            image_size: int = 378) -> str:
    """pixel_values: [F, C, H, W] float32 — already preprocessed frames."""
    f = pixel_values.shape[0]
    if f == 1:
        text_input = DEFAULT_IMAGE_TOKEN + "\n" + prompt
        prompt_text = PROMPT_TEMPLATE.vicuna["INSTRUCTION"].format(
            input=text_input, round=1)
    else:
        prompt_text = build_video_prompt(prompt, f, PROMPT_TEMPLATE.vicuna)
    ids = ids_to_array(encode_with_image_tokens(prompt_text, tokenizer))

    dtype = params["llm"]["embed_tokens"].dtype
    px = jnp.asarray(pixel_values, dtype)[None]  # [1, F, C, H, W]
    fused = aurora_forward(params, cfg, jnp.asarray(ids), px,
                           kept_ratio=token_kept_ratio, mode="inference")
    eos = tuple({tokenizer.eos_token_id} - {None}) or (2,)
    if num_beams > 1:
        from aurora_tpu.generate.beam import beam_generate
        toks, n = beam_generate(
            params["llm"], cfg.llm, fused["inputs_embeds"],
            fused["attention_mask"], num_beams=num_beams,
            max_new_tokens=max_new_tokens, eos_ids=eos)
        ids = [int(t) for t in np.asarray(toks[: int(n)])]
        return tokenizer.decode(ids, skip_special_tokens=True)
    sampling = SamplingParams(temperature=temperature, top_p=top_p)
    result = generate(params["llm"], cfg.llm, fused["inputs_embeds"],
                      fused["attention_mask"],
                      max_new_tokens=max_new_tokens, sampling=sampling,
                      eos_ids=eos,
                      rng=jax.random.PRNGKey(int(time.time())))
    return decode_tokens(tokenizer, result, eos_ids=eos)[0]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", type=str, required=True,
                        help="xtuner-format model dir")
    parser.add_argument("--prompt", type=str,
                        default="Describe the video in detail.")
    parser.add_argument("--visual_input", type=str, required=True,
                        help="video (mp4/webm/mkv/npy/frame-dir) or image")
    parser.add_argument("--num_frm", type=int, default=8)
    parser.add_argument("--token_kept_ratio", type=float, default=0.8)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--top_p", type=float, default=1.0)
    parser.add_argument("--num_beams", type=int, default=1)
    parser.add_argument("--max_new_tokens", type=int, default=2048)
    parser.add_argument("--image_size", type=int, default=378)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    args = parser.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params, cfg, tokenizer = load_model(args.model_path, dtype)

    vi = args.visual_input
    if vi.lower().endswith((".png", ".jpg", ".jpeg")):
        from PIL import Image
        frames = clip_preprocess(Image.open(vi), size=args.image_size,
                                 crop=args.image_size)
    else:
        raw = read_video(vi, args.num_frm)
        frames = clip_preprocess(list(raw), size=args.image_size,
                                 crop=args.image_size)

    text = caption(params, cfg, tokenizer, pixel_values=frames,
                   prompt=args.prompt,
                   token_kept_ratio=args.token_kept_ratio,
                   temperature=args.temperature, top_p=args.top_p,
                   num_beams=args.num_beams,
                   max_new_tokens=args.max_new_tokens,
                   image_size=args.image_size)
    print(text)


if __name__ == "__main__":
    main()
