"""Training dataset pipeline: llava-format records → tokenized samples.

Parity targets:
  * aurora_map_fn / aurora_image_only_map_fn —
    src/xtuner/xtuner/dataset/map_fns/dataset_map_fns/aurora_map_fn.py:5-57
    (collapse n '<image>' into a space-joined prefix line; image-only
    variant keeps just the markers for the projector stage)
  * template application + encode_fn — src/xtuner/xtuner/dataset/utils.py:
    36-130 (per-turn bos + prompt(IGNORE) + output(loss) + eos; image
    markers spliced as IMAGE_TOKEN_INDEX), generalized to multiple image
    markers per turn
  * AuroraDataset — src/xtuner/xtuner/dataset/aurora.py:30-158 (json/jsonl
    or pre-tokenized dirs; expand2square / keep-aspect preprocessing;
    zero-tensor fallback for unreadable images; modality-signed lengths)
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from aurora_tpu.data.preprocess import (CLIP_MEAN, clip_preprocess,
                                        keep_aspect_preprocess)
from aurora_tpu.utils.constants import (DEFAULT_IMAGE_TOKEN, IGNORE_INDEX,
                                        IMAGE_TOKEN_INDEX)


# ---------------------------------------------------------------------------
# map fns: raw llava `conversations` → {conversation: [{input, output}]}
# ---------------------------------------------------------------------------

def aurora_map_fn(example: Dict) -> Dict:
    messages = list(example["conversations"])
    while messages and messages[0]["from"] == "gpt":
        messages = messages[1:]
    while messages and messages[-1]["from"] == "human":
        messages = messages[:-1]
    conversation, cur = [], ""
    for msg in messages:
        if msg["from"] == "human":
            value = msg["value"]
            if DEFAULT_IMAGE_TOKEN in value:
                n = value.count(DEFAULT_IMAGE_TOKEN)
                prefix = " ".join([DEFAULT_IMAGE_TOKEN] * n)
                value = (prefix + "\n"
                         + value.replace(DEFAULT_IMAGE_TOKEN, "").strip())
            cur += value.strip()
        elif msg["from"] == "gpt":
            conversation.append({"input": cur, "output": msg["value"]})
            cur = ""
        else:
            raise ValueError(f"unknown speaker {msg['from']!r}")
    return {"conversation": conversation}


def aurora_image_only_map_fn(example: Dict) -> Dict:
    """Projector-stage variant: prompt reduced to the image markers."""
    messages = list(example["conversations"])
    while messages and messages[0]["from"] == "gpt":
        messages = messages[1:]
    while messages and messages[-1]["from"] == "human":
        messages = messages[:-1]
    conversation, cur = [], ""
    for msg in messages:
        if msg["from"] == "human":
            assert DEFAULT_IMAGE_TOKEN in msg["value"]
            cur += DEFAULT_IMAGE_TOKEN
        elif msg["from"] == "gpt":
            conversation.append({"input": cur, "output": msg["value"]})
            cur = ""
    return {"conversation": conversation}


def template_map_fn(example: Dict, template: Dict,
                    system: str = "") -> Dict:
    """Wrap turns in the prompt template (utils/templates.py formats)."""
    out = []
    for i, turn in enumerate(example["conversation"]):
        text = template["INSTRUCTION"].format(input=turn["input"],
                                              round=i + 1)
        if i == 0 and (system or "{system}" not in
                       template.get("SYSTEM", "{system}")):
            text = template["SYSTEM"].format(system=system) + text
        out.append({"input": text, "output": turn["output"]})
    return {"conversation": out}


# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------

def _encode_with_markers(text: str, tokenizer) -> List[int]:
    # shared marker tokenizer (data/text.py) — no special tokens on the
    # first chunk: encode_conversation adds BOS itself per turn
    from aurora_tpu.data.text import encode_with_image_tokens
    return encode_with_image_tokens(text, tokenizer,
                                    first_chunk_special=False)


def encode_conversation(example: Dict, tokenizer, max_length: int,
                        with_image_token: bool = True,
                        input_ids_with_output: bool = True) -> Dict:
    """encode_fn parity (dataset/utils.py:36-130)."""
    bos = [tokenizer.bos_token_id] if tokenizer.bos_token_id is not None \
        else []
    eos = [tokenizer.eos_token_id] if tokenizer.eos_token_id is not None \
        else []
    input_ids: List[int] = []
    labels: List[int] = []
    for turn in example["conversation"]:
        if with_image_token and DEFAULT_IMAGE_TOKEN in turn["input"]:
            enc = _encode_with_markers(turn["input"], tokenizer)
        else:
            enc = tokenizer.encode(turn["input"],
                                   add_special_tokens=False)
        input_ids += bos + enc
        labels += [IGNORE_INDEX] * (len(bos) + len(enc))
        if input_ids_with_output:
            out = tokenizer.encode(turn["output"],
                                   add_special_tokens=False)
            input_ids += out + eos
            labels += list(out) + list(eos)
    return {"input_ids": input_ids[:max_length],
            "labels": labels[:max_length]}


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------

class AuroraDataset:
    """json/jsonl (or pre-tokenized `datasets` dir) multimodal dataset."""

    def __init__(self, data_path: str, tokenizer=None,
                 image_folder: str = "",
                 map_fn: Callable = aurora_map_fn,
                 template: Optional[Dict] = None,
                 max_length: int = 4096,
                 image_size: int = 378,
                 pad_image_to_square: bool = False,
                 keep_aspect_ratio: bool = False,
                 cache_dir: Optional[str] = None):
        self.image_folder = image_folder
        self.image_size = image_size
        self.pad_image_to_square = pad_image_to_square
        self.keep_aspect_ratio = keep_aspect_ratio

        if os.path.isdir(data_path):  # offline pre-tokenized
            import datasets
            self.text_data = list(datasets.load_from_disk(data_path))
            return
        # cached tokenization (xtuner_lite load_datasets cache_dir parity,
        # _lite/datasets/load.py): key = source file identity + every
        # knob that changes the encoding
        cache_file = None
        if cache_dir:
            import hashlib
            st = os.stat(data_path)
            tpl_id = "" if template is None else template.get(
                "INSTRUCTION", "")
            key = hashlib.sha1(":".join([
                os.path.abspath(data_path), str(st.st_mtime_ns),
                str(st.st_size), str(max_length), map_fn.__name__,
                tpl_id, getattr(tokenizer, "name_or_path", "")]
            ).encode()).hexdigest()[:16]
            cache_file = os.path.join(cache_dir, f"tok_{key}.json")
            if os.path.exists(cache_file):
                with open(cache_file) as f:
                    self.text_data = json.load(f)
                return
        records = _read_json_or_jsonl(data_path)
        assert tokenizer is not None
        self.text_data = []
        for rec in records:
            ex = map_fn(rec)
            if template is not None:
                ex = template_map_fn(ex, template)
            enc = encode_conversation(ex, tokenizer, max_length)
            enc["image"] = rec.get("image")
            self.text_data.append(enc)
        if cache_file:
            os.makedirs(cache_dir, exist_ok=True)
            tmp = cache_file + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self.text_data, f)
            os.replace(tmp, cache_file)

    def modality_length(self) -> List[int]:
        """+len for multimodal, −len for text-only
        (dataset/aurora.py:100-107) — feeds LengthGroupedSampler."""
        out = []
        for d in self.text_data:
            n = len(d["input_ids"])
            out.append(n if d.get("image") is not None else -n)
        return out

    def __len__(self) -> int:
        return len(self.text_data)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        d = dict(self.text_data[idx])
        images = d.get("image")
        if images is not None:
            if not isinstance(images, list):
                images = [images]
            frames = []
            for f in images:
                path = f if os.path.exists(f) else os.path.join(
                    self.image_folder, f)
                try:
                    from PIL import Image
                    img = Image.open(path).convert("RGB")
                except Exception:
                    frames.append(np.zeros(
                        (3, self.image_size, self.image_size),
                        np.float32))
                    continue
                if self.keep_aspect_ratio:
                    frames.append(keep_aspect_preprocess(
                        img, self.image_size, self.pad_image_to_square))
                else:
                    if self.pad_image_to_square:
                        from aurora_tpu.data.preprocess import expand2square
                        img = expand2square(
                            img, tuple(int(x * 255) for x in CLIP_MEAN))
                    frames.append(clip_preprocess(
                        img, self.image_size, self.image_size)[0])
            d["pixel_values"] = np.stack(frames)
        else:
            # text-only sample: ZERO frames, not one zero frame. The
            # reference pads a dummy image so DeepSpeed batches stay
            # uniform (dataset zero fallback) — on TPU the collator
            # drops an all-text batch's pixel_values entirely and
            # aurora_forward takes its pixel_values=None fast path, so
            # language-stage steps skip the full ViT on zero images.
            # (LengthGroupedSampler's modality-signed lengths keep
            # batches modality-homogeneous; a mixed batch still pads
            # this to the batch frame count below.)
            d["pixel_values"] = np.zeros(
                (0, 3, self.image_size, self.image_size), np.float32)
        return d


def _read_json_or_jsonl(path: str) -> List[dict]:
    # annotation files may live on remote storage (gs://...) — the
    # xtuner Ceph-fileio analog (utils/fileio.py)
    from aurora_tpu.utils.fileio import read_text
    text = read_text(path)
    if path.endswith(".jsonl"):
        return [json.loads(ln) for ln in text.splitlines() if ln.strip()]
    return json.loads(text)
