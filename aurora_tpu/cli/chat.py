"""Interactive chat CLI.

Parity: src/xtuner/xtuner/tools/chat.py (491 LoC interactive loop with
templates, image input, stop words) reduced to its used surface: multi-turn
vicuna-template chat with optional image/video context and stop-word
handling (utils/stop_criteria.py equivalent lives in the engine's eos set).

  python -m aurora_tpu.cli.chat --model_path <dir> [--visual_input x.mp4]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.cli.infer import load_model
from aurora_tpu.data.preprocess import clip_preprocess
from aurora_tpu.data.text import encode_with_image_tokens, ids_to_array
from aurora_tpu.data.video import read_video
from aurora_tpu.generate import SamplingParams, generate
from aurora_tpu.generate.engine import decode_tokens
from aurora_tpu.models.aurora import aurora_forward
from aurora_tpu.utils.constants import DEFAULT_IMAGE_TOKEN
from aurora_tpu.utils.templates import PROMPT_TEMPLATE


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--visual_input", default=None)
    p.add_argument("--num_frm", type=int, default=8)
    p.add_argument("--image_size", type=int, default=378)
    p.add_argument("--token_kept_ratio", type=float, default=0.8)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--max_new_tokens", type=int, default=512)
    p.add_argument("--system", default="")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    args = p.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params, cfg, tokenizer = load_model(args.model_path, dtype)
    tpl = PROMPT_TEMPLATE.vicuna

    px = None
    n_frames = 0
    if args.visual_input:
        if args.visual_input.lower().endswith((".png", ".jpg", ".jpeg")):
            from PIL import Image
            frames = clip_preprocess(Image.open(args.visual_input),
                                     args.image_size, args.image_size)
        else:
            frames = clip_preprocess(
                list(read_video(args.visual_input, args.num_frm)),
                args.image_size, args.image_size)
        n_frames = frames.shape[0]
        px = jnp.asarray(frames, dtype)[None]

    history = tpl["SYSTEM"].format(system=args.system) if args.system \
        else ""
    eos = tuple({tokenizer.eos_token_id} - {None}) or (2,)
    first = True
    vis_groups = None  # ViT output cached across turns
    print("chat ready — empty line or 'exit' quits, 'reset' clears")
    while True:
        try:
            user = input("USER: ").strip()
        except EOFError:
            break
        if not user or user == "exit":
            break
        if user == "reset":
            history = ""
            first = True
            continue
        if first and n_frames:
            image_tokens = " ".join([DEFAULT_IMAGE_TOKEN] * n_frames)
            user = image_tokens + "\n" + user
        history += tpl["INSTRUCTION"].format(input=user, round=1)
        ids = ids_to_array(encode_with_image_tokens(history, tokenizer))
        # visuals fused on EVERY turn: the accumulated history keeps its
        # <image> markers, so turn 2+ must re-splice the visual
        # embeddings (with pixel_values=None the -200 marker ids would
        # embed as clipped vocab rows and the image is silently lost).
        # The ViT runs ONCE — turns reuse the cached encoded groups
        # instead of re-encoding identical pixels each round.
        if px is not None and vis_groups is None:
            from aurora_tpu.models.aurora import encode_visual
            vis_groups = encode_visual(params, px, cfg,
                                       args.token_kept_ratio)
        if vis_groups is not None:
            from aurora_tpu.models.aurora import fuse_multimodal
            fused = fuse_multimodal(params["llm"]["embed_tokens"],
                                    jnp.asarray(ids), [vis_groups])
        else:
            fused = aurora_forward(
                params, cfg, jnp.asarray(ids), None,
                kept_ratio=args.token_kept_ratio, mode="inference")
        result = generate(
            params["llm"], cfg.llm, fused["inputs_embeds"],
            fused["attention_mask"],
            max_new_tokens=args.max_new_tokens,
            sampling=SamplingParams(temperature=args.temperature,
                                    top_p=args.top_p),
            eos_ids=eos, rng=jax.random.PRNGKey(0))
        text = decode_tokens(tokenizer, result, eos_ids=eos)[0]
        print(f"ASSISTANT: {text}")
        history += text + tpl.get("SEP", "\n")
        first = False


if __name__ == "__main__":
    main()
