"""Multimodal (AuroraCap) serving support.

Parity: sglang's AuroraCapForCausalLM serving model
(src/sglang/python/sglang/srt/models/auroracap.py:69-199) — video requests
enter the engine as text requests whose prompt carries
`num_frames × n_visual_tokens` placeholder ids; at EXTEND time the ViT+ToMe
encoder runs, the projector output is spliced over the placeholder span, and
decode proceeds token-only.

Radix-cache compatibility: placeholder ids are derived from a hash of the
frame bytes (auroracap.py pads input_ids with image-hash ids for exactly
this reason) so identical clips share cached prefix KV.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.data.text import encode_with_image_tokens
from aurora_tpu.models.aurora import (AuroraConfig, encode_visual,
                                      fuse_multimodal, num_visual_tokens)
from aurora_tpu.serve.scheduler import Request
from aurora_tpu.utils.constants import IMAGE_TOKEN_INDEX

# placeholder ids live in a high pseudo-vocab band; they never reach the
# embedding table (the fused embeds replace them), only the radix tree.
_PLACEHOLDER_BASE = 1 << 24


def frame_hash_ids(pixel_values: np.ndarray, n_tokens: int) -> List[int]:
    """Deterministic pseudo-ids for a clip: sha1(frames) → n ids
    (auroracap.py image-hash padding semantics)."""
    digest = hashlib.sha1(
        np.ascontiguousarray(pixel_values).tobytes()).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return [int(x) for x in
            rng.integers(_PLACEHOLDER_BASE, _PLACEHOLDER_BASE + (1 << 20),
                         size=n_tokens)]


class AuroraCapServing:
    """Builds engine requests + the embed_fn hook for AuroraCap."""

    def __init__(self, params: Dict, cfg: AuroraConfig, tokenizer,
                 kept_ratio: float = 0.8, image_size: int = 378):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.kept_ratio = kept_ratio
        self.image_size = image_size
        self._cache: Dict[str, np.ndarray] = {}

    def n_visual_tokens(self) -> int:
        return num_visual_tokens(self.cfg, self.kept_ratio,
                                 self.image_size, self.image_size)

    def build_request(self, rid: str, prompt_text: str,
                      pixel_values: np.ndarray, **req_kwargs) -> Request:
        """prompt_text contains '<image>' markers (one per frame);
        pixel_values [F, C, H, W] preprocessed frames."""
        raw_ids = encode_with_image_tokens(prompt_text, self.tokenizer)
        n_vis = self.n_visual_tokens()
        F = pixel_values.shape[0]
        assert raw_ids.count(IMAGE_TOKEN_INDEX) == F, (
            "one <image> marker per frame required")

        clip_ids = frame_hash_ids(pixel_values, n_vis * F)
        input_ids: List[int] = []
        k = 0
        for tok in raw_ids:
            if tok == IMAGE_TOKEN_INDEX:
                input_ids.extend(clip_ids[k * n_vis:(k + 1) * n_vis])
                k += 1
            else:
                input_ids.append(tok)
        req = Request(rid=rid, input_ids=input_ids, **req_kwargs)
        req.pixel_values = pixel_values
        req.kept_ratio = self.kept_ratio
        # remember the raw marker layout for the fusion at extend time
        req._raw_ids = raw_ids  # type: ignore[attr-defined]
        return req

    def embed_fn(self, req: Request) -> np.ndarray:
        """Engine hook: full fused embedding sequence [T_total, D] for the
        request's prompt (extend slices off the cached prefix)."""
        ids = np.asarray(req._raw_ids)[None]  # with -200 markers
        dtype = self.params["llm"]["embed_tokens"].dtype
        px = jnp.asarray(req.pixel_values, dtype)[None]
        groups = [encode_visual(self.params, px, self.cfg,
                                req.kept_ratio)]
        fused = fuse_multimodal(self.params["llm"]["embed_tokens"],
                                jnp.asarray(ids), groups)
        out = np.asarray(jax.device_get(fused["inputs_embeds"][0]))
        assert out.shape[0] == len(req.input_ids), (
            out.shape, len(req.input_ids))
        return out
