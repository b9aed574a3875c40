"""Data pipeline tests: map fns, tokenization, dataset, collation, packing
(incl. packed-vs-unpacked loss equivalence through segment-id attention)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.data.collate import (SoftPacker, default_collate_fn,
                                     packed_collate_fn,
                                     pad_for_sequence_parallel)
from aurora_tpu.data.dataset import (AuroraDataset, aurora_image_only_map_fn,
                                     aurora_map_fn, encode_conversation,
                                     template_map_fn)
from aurora_tpu.data.sampler import LengthGroupedSampler, ParallelSampler
from aurora_tpu.utils.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from aurora_tpu.utils.templates import PROMPT_TEMPLATE

from utils import make_tiny_tokenizer  # noqa: E402


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    return make_tiny_tokenizer(str(tmp_path_factory.mktemp("tok")))


def test_aurora_map_fn_collapses_images():
    ex = {"conversations": [
        {"from": "human", "value": "<image><image> what is this?"},
        {"from": "gpt", "value": "a cat"},
        {"from": "human", "value": "sure?"},
        {"from": "gpt", "value": "yes"},
    ]}
    out = aurora_map_fn(ex)
    assert len(out["conversation"]) == 2
    assert out["conversation"][0]["input"].startswith("<image> <image>\n")
    assert "what is this?" in out["conversation"][0]["input"]
    assert out["conversation"][1] == {"input": "sure?", "output": "yes"}


def test_map_fn_skips_leading_gpt_trailing_human():
    ex = {"conversations": [
        {"from": "gpt", "value": "hi"},
        {"from": "human", "value": "<image> q"},
        {"from": "gpt", "value": "a"},
        {"from": "human", "value": "dangling"},
    ]}
    out = aurora_map_fn(ex)
    assert len(out["conversation"]) == 1


def test_image_only_map_fn():
    ex = {"conversations": [
        {"from": "human", "value": "<image> describe"},
        {"from": "gpt", "value": "caption text"},
    ]}
    out = aurora_image_only_map_fn(ex)
    assert out["conversation"][0]["input"] == "<image>"


def test_encode_conversation_loss_mask(tok):
    ex = {"conversation": [
        {"input": "<image>\nwhat?", "output": "cat"}]}
    enc = encode_conversation(ex, tok, max_length=128)
    ids, labels = enc["input_ids"], enc["labels"]
    assert IMAGE_TOKEN_INDEX in ids
    assert ids[0] == tok.bos_token_id
    assert ids[-1] == tok.eos_token_id
    # prompt region is IGNORE, output region carries loss incl. eos
    n_out = len(tok.encode("cat", add_special_tokens=False)) + 1
    assert all(l == IGNORE_INDEX for l in labels[:-n_out])
    assert labels[-n_out:] == ids[-n_out:]


def test_template_map_fn(tok):
    ex = aurora_map_fn({"conversations": [
        {"from": "human", "value": "<image> q"},
        {"from": "gpt", "value": "a"}]})
    out = template_map_fn(ex, PROMPT_TEMPLATE.vicuna)
    assert "USER:" in out["conversation"][0]["input"]
    assert out["conversation"][0]["input"].endswith("ASSISTANT:")


def test_aurora_dataset_end_to_end(tok, tmp_path, rng):
    from PIL import Image
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    Image.fromarray(rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
                    .astype(np.uint8)).save(img_dir / "a.png")
    records = [
        {"image": "a.png", "conversations": [
            {"from": "human", "value": "<image> describe"},
            {"from": "gpt", "value": "stuff"}]},
        {"conversations": [
            {"from": "human", "value": "just text"},
            {"from": "gpt", "value": "reply"}]},
        {"image": "missing.png", "conversations": [
            {"from": "human", "value": "<image> x"},
            {"from": "gpt", "value": "y"}]},
    ]
    path = tmp_path / "data.json"
    with open(path, "w") as f:
        json.dump(records, f)

    ds = AuroraDataset(str(path), tok, image_folder=str(img_dir),
                       template=PROMPT_TEMPLATE.vicuna, image_size=56)
    assert len(ds) == 3
    s0 = ds[0]
    assert s0["pixel_values"].shape == (1, 3, 56, 56)
    # modality-signed lengths: image rows positive, text row negative
    ml = ds.modality_length()
    assert ml[0] > 0 and ml[1] < 0
    # unreadable image → zero tensor, not a crash
    assert np.allclose(ds[2]["pixel_values"], 0)

    batch = default_collate_fn([ds[0], ds[1]], sequence_parallel_size=4)
    assert batch["input_ids"].shape[1] % 4 == 0
    assert batch["pixel_values"].shape[0] == 2


def test_keep_aspect_dataset(tok, tmp_path, rng):
    from PIL import Image
    img = tmp_path / "b.png"
    Image.fromarray(rng.integers(0, 255, (50, 90, 3), dtype=np.uint8)
                    .astype(np.uint8)).save(img)
    records = [{"image": str(img), "conversations": [
        {"from": "human", "value": "<image> q"},
        {"from": "gpt", "value": "a"}]}]
    path = tmp_path / "d.json"
    with open(path, "w") as f:
        json.dump(records, f)
    ds = AuroraDataset(str(path), tok, keep_aspect_ratio=True,
                       image_size=56)
    px = ds[0]["pixel_values"][0]
    assert px.shape[1] % 14 == 0 and px.shape[2] % 14 == 0
    assert min(px.shape[1], px.shape[2]) == 56
    # reference quirk reproduced (dataset/aurora.py:138 swaps PIL's
    # (width, height)): a 90w x 50h input resizes to 56 WIDE x 100 tall
    # (transposed aspect), then pads H to 112 — NOT 112 wide x 56 tall
    assert px.shape == (3, 112, 56), px.shape


def test_pad_for_sequence_parallel():
    x = np.ones((2, 10), np.int32)
    y = pad_for_sequence_parallel(x, 4, 0)
    assert y.shape == (2, 12)
    assert (y[:, 10:] == 0).all()


def test_soft_packer_and_segment_loss_equivalence(rng):
    """Packed loss through segment-id attention == sum of per-sample
    losses — validates the cu_seqlens→segment_ids replacement."""
    from aurora_tpu.models.llama import (LlamaConfig, init_llama_params,
                                         llama_apply, llama_lm_loss)
    cfg = LlamaConfig.tiny()
    params = init_llama_params(jax.random.PRNGKey(0), cfg)

    samples = []
    for n in (10, 7, 5):
        ids = rng.integers(3, 250, size=n).tolist()
        labels = [IGNORE_INDEX] * 2 + ids[2:]
        samples.append({"input_ids": ids, "labels": labels})

    packer = SoftPacker(samples, pack_max_length=32)
    assert len(packer) == 1
    pack = packer[0]
    batch = packed_collate_fn([pack])
    seg = jnp.asarray(batch["segment_ids"])
    logits, _ = llama_apply(params, cfg,
                            input_ids=jnp.asarray(batch["input_ids"]),
                            segment_ids=seg)
    # boundary isolation comes from slicing per document below: each
    # doc's loss is computed on its own token span, so no shifted label
    # can cross into the next document
    labels = np.asarray(batch["labels"]).copy()
    seg_np = np.asarray(batch["segment_ids"])
    packed_loss_sum = 0.0
    packed_n = 0
    # compute per-doc loss from the packed logits
    for d in range(3):
        sel = np.nonzero(seg_np[0] == d)[0]
        lg = logits[0, sel]
        lb = jnp.asarray(labels[0, sel])
        loss, n = llama_lm_loss(lg[None], lb[None])
        packed_loss_sum += float(loss) * int(n)
        packed_n += int(n)

    want_sum, want_n = 0.0, 0
    for s in samples:
        lg, _ = llama_apply(params, cfg,
                            input_ids=jnp.asarray([s["input_ids"]]))
        loss, n = llama_lm_loss(lg, jnp.asarray([s["labels"]]))
        want_sum += float(loss) * int(n)
        want_n += int(n)

    assert packed_n == want_n
    np.testing.assert_allclose(packed_loss_sum, want_sum, rtol=1e-4)


def test_length_grouped_sampler():
    lengths = [5, -7, 30, -2, 18, 9, -40, 11]
    s = LengthGroupedSampler(lengths, batch_size=2, mega_batch_mult=2,
                             dp_rank=0, dp_size=2)
    idx = list(iter(s))
    assert len(idx) == 4
    s2 = LengthGroupedSampler(lengths, batch_size=2, mega_batch_mult=2,
                              dp_rank=1, dp_size=2)
    idx2 = list(iter(s2))
    assert set(idx).isdisjoint(idx2)


def test_parallel_sampler_shards():
    a = list(iter(ParallelSampler(10, 0, 2, shuffle=False)))
    b = list(iter(ParallelSampler(10, 1, 2, shuffle=False)))
    assert sorted(a + b) == list(range(10))


def test_dataset_tokenization_cache(tmp_path, rng):
    """cache_dir reuses tokenization across runs (xtuner_lite
    load_datasets cache parity) and invalidates when the source changes."""
    import json as _json
    import os
    import time
    from utils import make_tiny_tokenizer
    from aurora_tpu.data.dataset import AuroraDataset

    tok = make_tiny_tokenizer(str(tmp_path / "tok"))
    data = [{"conversations": [
        {"from": "human", "value": f"q {i}"},
        {"from": "gpt", "value": f"a {i}"}]} for i in range(3)]
    path = tmp_path / "d.json"
    path.write_text(_json.dumps(data))
    cache = str(tmp_path / "cache")

    ds1 = AuroraDataset(str(path), tokenizer=tok, cache_dir=cache)
    files = os.listdir(cache)
    assert len(files) == 1
    ds2 = AuroraDataset(str(path), tokenizer=tok, cache_dir=cache)
    assert len(ds2) == len(ds1) == 3
    assert ds2.text_data[0]["input_ids"] == ds1.text_data[0]["input_ids"]

    # source change → new cache entry
    time.sleep(0.01)
    data.append({"conversations": [
        {"from": "human", "value": "new"},
        {"from": "gpt", "value": "sample"}]})
    path.write_text(_json.dumps(data))
    ds3 = AuroraDataset(str(path), tokenizer=tok, cache_dir=cache)
    assert len(ds3) == 4
    assert len(os.listdir(cache)) == 2


def test_text_only_batch_skips_pixels(tok, tmp_path):
    """Text-only samples carry ZERO frames and an all-text batch omits
    pixel_values entirely — the trainer's pixel_values=None fast path
    then skips the ViT (the reference runs a full ViT pass on dummy
    zero images for language-stage data)."""
    records = [{"conversations": [
        {"from": "human", "value": f"question {i}"},
        {"from": "gpt", "value": "answer"}]} for i in range(2)]
    path = tmp_path / "text.json"
    with open(path, "w") as f:
        json.dump(records, f)
    ds = AuroraDataset(str(path), tok, image_folder=str(tmp_path),
                       template=PROMPT_TEMPLATE.vicuna, image_size=56)
    s = ds[0]
    assert s["pixel_values"].shape == (0, 3, 56, 56)
    batch = default_collate_fn([ds[0], ds[1]])
    assert "pixel_values" not in batch


def test_split_clip_pipeline_matches_fused(rng):
    """clip_resize_crop (host, uint8) + clip_normalize_device (jit) ==
    clip_preprocess exactly — the split layout ships uint8 over H2D and
    fuses the normalize into the device encode (bench.py host-decode
    stage + multimodal serving rely on this equivalence)."""
    from aurora_tpu.data.preprocess import (clip_normalize_device,
                                            clip_preprocess,
                                            clip_resize_crop)
    frames = [rng.integers(0, 255, size=(240, 424, 3)).astype(np.uint8)
              for _ in range(3)]
    want = clip_preprocess(frames, size=112, crop=112)
    u8 = clip_resize_crop(frames, size=112, crop=112)
    assert u8.dtype == np.uint8 and u8.shape == (3, 112, 112, 3)
    got = np.asarray(jax.jit(clip_normalize_device)(jnp.asarray(u8)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_device_resize_crop_matches_pil():
    """clip_resize_crop_device (jax.image bicubic, on-device) tracks the
    PIL host geometry within quantization tolerance: PIL computes the
    same Keys a=-0.5 cubic in uint8 fixed point with clamped border
    taps, so per-pixel deltas stay within a couple of gray levels on
    natural (smooth) content. Uses a smooth synthetic frame — adversarial
    white-noise pixels can differ more under any two resamplers."""
    from aurora_tpu.data.preprocess import (clip_resize_crop,
                                            clip_resize_crop_device)
    yy, xx = np.mgrid[0:180, 0:320].astype(np.float32)
    frame = np.stack([
        127 + 120 * np.sin(xx / 23.0) * np.cos(yy / 17.0),
        127 + 110 * np.cos(xx / 31.0 + 1.0),
        127 + 100 * np.sin((xx + yy) / 41.0),
    ], axis=-1)
    frames = np.clip(np.round(frame), 0, 255).astype(np.uint8)[None]
    frames = np.repeat(frames, 2, axis=0)
    want = clip_resize_crop(list(frames), size=112, crop=112)
    got = np.asarray(jax.jit(
        lambda f: clip_resize_crop_device(f, size=112, crop=112))(
        jnp.asarray(frames)))
    assert got.shape == (2, 112, 112, 3)
    diff = np.abs(got - want.astype(np.float32))
    assert diff.max() <= 3.0, diff.max()          # gray levels
    assert diff.mean() <= 0.5, diff.mean()
    # already-at-size inputs skip the resample and match the host crop
    sq = frames[:, :112, : , :][:, :, :160, :]    # H=112 shortest edge
    want2 = clip_resize_crop(list(sq), size=112, crop=112)
    got2 = np.asarray(clip_resize_crop_device(jnp.asarray(sq),
                                              size=112, crop=112))
    np.testing.assert_allclose(got2, want2.astype(np.float32), atol=0)
    # host center-SQUARE crop + device resize (the bench's cheap-host
    # split): geometrically identical to resize-shortest-then-crop
    # WHEN the crop offset lands on integer source coordinates — true
    # for the bench's 360x640 -> 378 (147 * 640/672 = exactly 140),
    # NOT for arbitrary sizes (the serving path keeps the full-frame
    # order). Device-vs-device: only the resampler's border clamping
    # may differ, and on an upscale its support is ~2px.
    yy2, xx2 = np.mgrid[0:360, 0:640].astype(np.float32)
    fr2 = np.stack([127 + 120 * np.sin(xx2 / 37.0) * np.cos(yy2 / 29.0),
                    127 + 110 * np.cos(xx2 / 53.0),
                    127 + 100 * np.sin((xx2 + yy2) / 71.0)], axis=-1)
    fr2 = np.clip(np.round(fr2), 0, 255).astype(np.uint8)[None]
    full3 = np.asarray(jax.jit(
        lambda f: clip_resize_crop_device(f, size=378, crop=378))(
        jnp.asarray(fr2)))
    sq3 = fr2[:, :, (640 - 360) // 2:(640 + 360) // 2, :]
    got3 = np.asarray(jax.jit(
        lambda f: clip_resize_crop_device(f, size=378, crop=378))(
        jnp.asarray(sq3)))
    inner = (slice(None), slice(4, -4), slice(4, -4), slice(None))
    diff3 = np.abs(got3[inner] - full3[inner])
    assert diff3.max() <= 1.0, diff3.max()
    assert diff3.mean() <= 0.02, diff3.mean()
