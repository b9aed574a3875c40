"""Prompt/text → input_ids with image markers.

Parity: inference.py:12-27 `process_text` (tokenize around DEFAULT_IMAGE_TOKEN,
first chunk with special tokens, splice IMAGE_TOKEN_INDEX between chunks) and
the dataset-side encode_fn (src/xtuner/xtuner/dataset/utils.py) semantics.
"""

from __future__ import annotations

from typing import List

import numpy as np

from aurora_tpu.utils.constants import DEFAULT_IMAGE_TOKEN, IMAGE_TOKEN_INDEX


def encode_with_image_tokens(text: str, tokenizer,
                             first_chunk_special: bool = True
                             ) -> List[int]:
    """Tokenize `text`, replacing each '<image>' with IMAGE_TOKEN_INDEX.

    The ONE marker tokenizer for every path (infer/chat/serve/eval via
    the default, training's encode_conversation via
    first_chunk_special=False — it adds BOS itself per turn); keeping a
    second copy in data/dataset.py let train/inference tokenization
    drift apart."""
    ids: List[int] = []
    chunks = text.split(DEFAULT_IMAGE_TOKEN)
    for idx, chunk in enumerate(chunks):
        if idx == 0:
            ids.extend(tokenizer.encode(
                chunk, add_special_tokens=first_chunk_special))
        else:
            ids.append(IMAGE_TOKEN_INDEX)
            ids.extend(tokenizer.encode(chunk, add_special_tokens=False))
    return ids


def build_video_prompt(prompt: str, num_frames: int,
                       template: dict) -> str:
    """inference.py:76-85: one '<image>' per frame, space-joined, newline,
    user prompt, wrapped in the template INSTRUCTION."""
    image_tokens = " ".join([DEFAULT_IMAGE_TOKEN] * num_frames)
    text_input = image_tokens + "\n" + prompt
    return template["INSTRUCTION"].format(input=text_input, round=1)


def ids_to_array(ids: List[int]) -> np.ndarray:
    return np.asarray(ids, dtype=np.int32)[None, :]
