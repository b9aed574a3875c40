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
import threading
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


def _is_split_uint8(px: np.ndarray) -> bool:
    """[F, H, W, 3] uint8 (clip_resize_crop output) vs the legacy
    [F, C, H, W] float layout."""
    return px.dtype == np.uint8 and px.ndim == 4 and px.shape[-1] == 3


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


def expand_placeholders(raw_ids: List[int], counts: List[int],
                        clip_ids: List[int]) -> List[int]:
    """Replace each IMAGE_TOKEN_INDEX marker in raw_ids with the next
    `counts[k]` pseudo-ids from clip_ids (radix-cacheable prompt)."""
    out: List[int] = []
    k = pos = 0
    for tok in raw_ids:
        if tok == IMAGE_TOKEN_INDEX:
            out.extend(clip_ids[pos:pos + counts[k]])
            pos += counts[k]
            k += 1
        else:
            out.append(tok)
    return out


class AuroraCapServing:
    """Builds engine requests + the embed_fn hook for AuroraCap."""

    def __init__(self, params: Dict, cfg: AuroraConfig, tokenizer,
                 kept_ratio: float = 0.8, image_size: int = 378,
                 embed_cache_size: int = 8):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.kept_ratio = kept_ratio
        self.image_size = image_size
        # clip-hash → encoded visual groups: identical clips skip the
        # ViT+projector entirely (complements the radix KV prefix reuse)
        self._cache: Dict[tuple, list] = {}
        self._cache_size = embed_cache_size
        # prewarm() may run from API handler threads while the engine
        # extends — guard the cache (dict ops alone are GIL-atomic, but
        # the encode-then-insert sequence is not)
        self._cache_lock = threading.Lock()

    def _frame_counts(self, F: int, h: int, w: int,
                      kept_ratio: float) -> List[int]:
        """Visual tokens per frame, honoring the slowfast split (frame 0
        un-merged when cfg.slowfast and F > 1 — aurora.py:223-246)."""
        n = num_visual_tokens(self.cfg, kept_ratio, h, w)
        if self.cfg.slowfast and F > 1:
            n_full = num_visual_tokens(self.cfg, 1.0, h, w)
            return [n_full] + [n] * (F - 1)
        return [n] * F

    def n_visual_tokens(self, h: int = None, w: int = None) -> int:
        return num_visual_tokens(self.cfg, self.kept_ratio,
                                 h or self.image_size,
                                 w or self.image_size)

    def build_request(self, rid: str, prompt_text: str,
                      pixel_values: np.ndarray,
                      kept_ratio: float = None, **req_kwargs) -> Request:
        """prompt_text contains '<image>' markers (one per frame);
        pixel_values: either [F, C, H, W] float preprocessed frames
        (legacy fused pipeline) or [F, H, W, 3] uint8 resize/crop-only
        frames (split pipeline, data/preprocess.clip_resize_crop — the
        preferred serving layout: uint8 H2D ships 4x fewer bytes and the
        normalize fuses into the device-side encode). The placeholder
        count derives from the ACTUAL frame resolution and the request's
        kept_ratio (per-request overrides are honored end-to-end)."""
        raw_ids = encode_with_image_tokens(prompt_text, self.tokenizer)
        kept = self.kept_ratio if kept_ratio is None else kept_ratio
        if _is_split_uint8(pixel_values):
            F, H, W, _ = pixel_values.shape
        else:
            F, _, H, W = pixel_values.shape
        counts = self._frame_counts(F, H, W, kept)
        assert raw_ids.count(IMAGE_TOKEN_INDEX) == F, (
            "one <image> marker per frame required")

        clip_ids = frame_hash_ids(pixel_values, sum(counts))
        input_ids = expand_placeholders(raw_ids, counts, clip_ids)
        req = Request(rid=rid, input_ids=input_ids, **req_kwargs)
        req.pixel_values = pixel_values
        req.kept_ratio = kept
        # remember the raw marker layout for the fusion at extend time
        req._raw_ids = raw_ids  # type: ignore[attr-defined]
        return req

    def _visual_groups(self, req: Request):
        """Encoded (projected) visual groups for a request's clip, with a
        small hash-keyed cache — repeated clips skip the ViT."""
        key = (hashlib.sha1(np.ascontiguousarray(
            req.pixel_values).tobytes()).digest(), req.kept_ratio)
        with self._cache_lock:
            groups = self._cache.get(key)
        if groups is None:
            dtype = self.params["llm"]["embed_tokens"].dtype
            if _is_split_uint8(req.pixel_values):
                # split pipeline: uint8 H2D, rescale/normalize/CHW on
                # device (exact clip_preprocess parity — tests/test_data)
                from aurora_tpu.data.preprocess import clip_normalize_device
                px = clip_normalize_device(
                    jnp.asarray(req.pixel_values)).astype(dtype)[None]
            else:
                px = jnp.asarray(req.pixel_values, dtype)[None]
            F = px.shape[1]
            if self.cfg.slowfast and F > 1:
                from aurora_tpu.models.aurora import encode_visual_slowfast
                hi, lo = encode_visual_slowfast(self.params, px, self.cfg,
                                                req.kept_ratio)
                groups = [hi, lo]
            else:
                groups = [encode_visual(self.params, px, self.cfg,
                                        req.kept_ratio)]
            with self._cache_lock:
                if len(self._cache) >= self._cache_size:
                    self._cache.pop(next(iter(self._cache)))
                self._cache[key] = groups
        return groups

    def prewarm(self, req: Request) -> None:
        """Decode-ahead hook: issue the ViT+ToMe encode for a freshly
        admitted request from the API thread. JAX dispatch is async, so
        the encode overlaps the decode wave the engine is already running;
        by EXTEND time embed_fn hits the cache instead of paying the ViT
        on the critical path (closes the round-3 'no decode-ahead' gap —
        the reference encodes at EXTEND time too, auroracap.py:90-199,
        but its GPU isn't a single-stream relay)."""
        self._visual_groups(req)

    def embed_fn(self, req: Request) -> np.ndarray:
        """Engine hook: full fused embedding sequence [T_total, D] for the
        request's prompt (extend slices off the cached prefix)."""
        ids = np.asarray(req._raw_ids)[None]  # with -200 markers
        groups = self._visual_groups(req)
        fused = fuse_multimodal(self.params["llm"]["embed_tokens"],
                                jnp.asarray(ids), groups)
        out = np.asarray(jax.device_get(fused["inputs_embeds"][0]))
        assert out.shape[0] == len(req.input_ids), (
            out.shape, len(req.input_ids))
        return out


class InternVLServing:
    """Engine requests + embed_fn for InternVL (InternViT + pixel-shuffle
    projector + llama/qwen2-family decoder) — turns the InternVL modeling
    (models/internvl.py, xtuner InternVL_V1_5 parity) into a SERVABLE
    family through the radix engine, the role sglang's internvl serving
    model plays in the reference zoo.

    Same placeholder mechanics as AuroraCapServing: each <image> marker
    expands to cfg.n_visual_tokens hash-derived pseudo-ids (radix KV
    reuse for repeated images); at extend time internvl_image_features
    runs per request and fuse_multimodal splices the projected tokens.
    The engine itself serves params['text'] with cfg.text — any
    LlamaConfig family member works unchanged.
    """

    def __init__(self, params: Dict, cfg, tokenizer,
                 embed_cache_size: int = 8):
        self.params = params
        self.cfg = cfg          # InternVLConfig
        self.tokenizer = tokenizer
        self._cache: Dict[bytes, jnp.ndarray] = {}
        self._cache_size = embed_cache_size
        self._cache_lock = threading.Lock()

    @property
    def llm_params(self):
        return self.params["text"]

    @property
    def llm_cfg(self):
        return self.cfg.text

    def n_visual_tokens(self) -> int:
        return self.cfg.n_visual_tokens

    def build_request(self, rid: str, prompt_text: str,
                      pixel_values: np.ndarray, **req_kwargs) -> Request:
        """prompt_text has one '<image>' marker per image tile;
        pixel_values [N_img, C, H, W] preprocessed to cfg.vision
        resolution."""
        raw_ids = encode_with_image_tokens(prompt_text, self.tokenizer)
        F = pixel_values.shape[0]
        assert raw_ids.count(IMAGE_TOKEN_INDEX) == F, (
            "one <image> marker per image required")
        n = self.cfg.n_visual_tokens
        clip_ids = frame_hash_ids(pixel_values, F * n)
        req = Request(rid=rid,
                      input_ids=expand_placeholders(raw_ids, [n] * F,
                                                    clip_ids),
                      **req_kwargs)
        req.pixel_values = pixel_values
        req._raw_ids = raw_ids  # type: ignore[attr-defined]
        return req

    def _features(self, px: np.ndarray) -> jnp.ndarray:
        from aurora_tpu.models.internvl import internvl_image_features
        key = hashlib.sha1(np.ascontiguousarray(px).tobytes()).digest()
        with self._cache_lock:
            feats = self._cache.get(key)
        if feats is None:
            dtype = self.params["text"]["embed_tokens"].dtype
            feats = internvl_image_features(
                self.params, self.cfg, jnp.asarray(px, dtype))
            with self._cache_lock:
                if len(self._cache) >= self._cache_size:
                    self._cache.pop(next(iter(self._cache)))
                self._cache[key] = feats
        return feats                       # [N_img, N_vis, D]

    def prewarm(self, req: Request) -> None:
        """Decode-ahead: issue the InternViT encode off the extend path."""
        self._features(req.pixel_values)

    def embed_fn(self, req: Request) -> np.ndarray:
        from aurora_tpu.models.aurora import fuse_multimodal
        ids = np.asarray(req._raw_ids)[None]
        feats = self._features(req.pixel_values)
        fused = fuse_multimodal(self.params["text"]["embed_tokens"],
                                jnp.asarray(ids), [feats[None]])
        out = np.asarray(jax.device_get(fused["inputs_embeds"][0]))
        assert out.shape[0] == len(req.input_ids), (
            out.shape, len(req.input_ids))
        return out
