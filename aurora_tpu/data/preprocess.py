"""Host-side image preprocessing (CLIPImageProcessor parity).

Replicates the two reference pipelines:
  * inference (inference.py:58-63): CLIPImageProcessor(size=378, crop=378) —
    bicubic shortest-edge resize, center crop, rescale 1/255, normalize with
    OpenAI CLIP mean/std;
  * training (src/xtuner/xtuner/dataset/aurora.py:134-149): optional
    expand2square pad, keep-aspect shortest-edge resize + pad H/W to
    multiples of PATCH_SIZE=14, then normalize only (no crop/resize).

PIL does the resampling (identical kernels to the HF processor); numpy does
the arithmetic. Output layout: [C, H, W] float32 — device transfer and any
dtype cast happen at the batch boundary.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple, Union

import numpy as np
from PIL import Image, ImageOps

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
PATCH_SIZE = 14

ImageLike = Union[Image.Image, np.ndarray]


def _to_pil(img: ImageLike) -> Image.Image:
    if isinstance(img, Image.Image):
        return img.convert("RGB")
    arr = np.asarray(img)
    if np.issubdtype(arr.dtype, np.floating):
        # float frames: [0,1]-normalized decoders are common — a bare
        # astype(uint8) would truncate 0.99 → 0 and feed the ViT
        # near-black images with no error
        if arr.size and float(arr.max()) <= 1.0 + 1e-6:
            arr = arr * 255.0
        arr = np.clip(np.round(arr), 0, 255)
    return Image.fromarray(arr.astype(np.uint8)).convert("RGB")


def _normalize(arr: np.ndarray) -> np.ndarray:
    """HWC uint8 → CHW float32 normalized."""
    x = arr.astype(np.float32) / 255.0
    x = (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(
        CLIP_STD, np.float32)
    return x.transpose(2, 0, 1)


def _resize_shortest_edge(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    if short == size:
        return img
    new_short = size
    new_long = int(size * long / short)
    nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
    return img.resize((nw, nh), Image.Resampling.BICUBIC)


def _center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def clip_preprocess(images: Union[ImageLike, Sequence[ImageLike]],
                    size: int = 378, crop: int = 378) -> np.ndarray:
    """CLIPImageProcessor path → [N, C, crop, crop] float32."""
    if isinstance(images, (Image.Image, np.ndarray)) and (
            isinstance(images, Image.Image) or images.ndim == 3):
        images = [images]
    out = []
    for img in images:
        pil = _to_pil(img)
        pil = _resize_shortest_edge(pil, size)
        pil = _center_crop(pil, crop)
        out.append(_normalize(np.asarray(pil)))
    return np.stack(out)


def clip_resize_crop(images: Union[ImageLike, Sequence[ImageLike]],
                     size: int = 378, crop: int = 378) -> np.ndarray:
    """Host half of the SPLIT CLIP pipeline → [N, crop, crop, 3] uint8.

    Geometry only (bicubic shortest-edge resize + center crop); the
    rescale/normalize/CHW arithmetic runs on device via
    clip_normalize_device. Splitting is the TPU-shaped layout of
    clip_preprocess: H2D ships uint8 (4x fewer bytes than float32) and
    the normalize fuses into the encode's first read under jit, so a
    1-core host feeding a fast chip spends its cycles on decode+resize
    only. clip_preprocess(x) == clip_normalize_device(clip_resize_crop(x))
    exactly (same PIL resampling; the arithmetic is order-identical in
    float32) — parity-tested in tests/test_data.py."""
    if isinstance(images, (Image.Image, np.ndarray)) and (
            isinstance(images, Image.Image) or images.ndim == 3):
        images = [images]
    out = []
    for img in images:
        pil = _center_crop(_resize_shortest_edge(_to_pil(img), size), crop)
        out.append(np.asarray(pil, dtype=np.uint8))
    return np.stack(out)


def clip_resize_crop_device(frames, size: int = 378, crop: int = 378):
    """DEVICE geometry half of the CLIP pipeline: [N, H, W, 3] uint8 →
    [N, crop, crop, 3] uint8-valued float32 (jit-traceable).

    Shortest-edge bicubic resize + center crop, computed on-device so a
    1-core host only decodes: the round-4 driver bench measured the host
    bicubic (~70ms/video) SERIALIZING against JAX dispatch on the single
    host core — overlap cost +186% instead of hiding the decode. Raw
    360p frames ship 1.6x the bytes of cropped ones (5.5MB vs 3.4MB per
    8-frame clip) but drop the host resample entirely — a clear win on a
    1-core host feeding a fast chip (VERDICT r4 next-round #2).

    Resampling parity: PIL BICUBIC is the Keys cubic (a=-0.5) with
    support scaling on downscale — exactly jax.image.resize's 'bicubic'
    with antialias=True. PIL computes in uint8-quantized fixed point and
    clamps out-of-range source taps differently at borders, so outputs
    match within ±2/255 per channel rather than bit-exactly
    (tests/test_data.py asserts the tolerance). The target geometry
    (int() truncation of the long edge) matches _resize_shortest_edge.
    Use where frame shapes are uniform (one jit cache entry per input
    resolution); arbitrary-resolution serving keeps the host path."""
    import jax
    import jax.numpy as jnp
    N, H, W, C = frames.shape
    if min(H, W) == size:
        nh, nw = H, W
        x = frames.astype(jnp.float32)
    else:
        if H <= W:
            nh, nw = size, int(size * W / H)
        else:
            nh, nw = int(size * H / W), size
        x = jax.image.resize(frames.astype(jnp.float32), (N, nh, nw, C),
                             method="bicubic", antialias=True)
    top, left = (nh - crop) // 2, (nw - crop) // 2
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (N, crop, crop, C))
    # PIL rounds to uint8 between resize and normalize; matching that
    # quantization keeps the split pipelines order-identical downstream
    return jnp.clip(jnp.round(x), 0.0, 255.0)


def clip_normalize_device(frames) -> "np.ndarray":
    """Device half of the split pipeline: [N, H, W, 3] uint8 →
    [N, 3, H, W] float32 (jit-traceable; float32 so downstream bf16
    casts round once, matching _normalize's numpy arithmetic)."""
    import jax.numpy as jnp
    x = frames.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(CLIP_MEAN, jnp.float32)) / jnp.asarray(
        CLIP_STD, jnp.float32)
    return jnp.transpose(x, (0, 3, 1, 2))


def expand2square(img: Image.Image,
                  fill: Tuple[int, int, int]) -> Image.Image:
    """Pad to square with `fill` background, content centered
    (parity: src/xtuner/xtuner/dataset/utils.py:245)."""
    w, h = img.size
    if w == h:
        return img
    side = max(w, h)
    canvas = Image.new("RGB", (side, side), fill)
    canvas.paste(img, ((side - w) // 2, (side - h) // 2))
    return canvas


def keep_aspect_preprocess(img: ImageLike, shortest_edge: int = 378,
                           pad_to_square: bool = False) -> np.ndarray:
    """Training-dataset path (dataset/aurora.py:134-149): shortest-edge
    scale, zero-pad H and W up to multiples of PATCH_SIZE, normalize
    only. Returns [C, H', W'] float32 (H', W' vary per image).

    REFERENCE QUIRK, reproduced deliberately: dataset/aurora.py:138 does
    `h, w = image.size` — PIL's .size is (WIDTH, HEIGHT), so their `h`
    is the width — and then `image.resize((new_w, new_h))` where
    new_w = int(HEIGHT*scale), new_h = int(WIDTH*scale). Every
    non-square image is therefore resampled to the TRANSPOSED aspect
    ratio (a 400x300 input becomes 378 wide x 504 tall). The released
    checkpoints were trained on this distribution, so faithfully
    matching it (not 'fixing' it) is what reproduces their behavior."""
    pil = _to_pil(img)
    if pad_to_square:
        pil = expand2square(pil, tuple(int(x * 255) for x in CLIP_MEAN))
    w, h = pil.size                      # PIL: (width, height)
    scale = shortest_edge / min(w, h)
    # sic — swapped on purpose, see the docstring
    new_h, new_w = int(w * scale), int(h * scale)
    pil = pil.resize((new_w, new_h))     # → width=H*s, height=W*s
    pad_h = (PATCH_SIZE - new_h % PATCH_SIZE) % PATCH_SIZE
    pad_w = (PATCH_SIZE - new_w % PATCH_SIZE) % PATCH_SIZE
    pil = ImageOps.expand(pil, (0, 0, pad_w, pad_h), fill=(0, 0, 0))
    return _normalize(np.asarray(pil))
