"""Multimodal fusion parity vs a loop-based oracle of the reference
semantics (model/utils.py:138-295: split at -200, interleave, pad, IGNORE
labels under visual spans)."""

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.models.aurora import (AuroraConfig, aurora_forward,
                                      fuse_multimodal, num_visual_tokens)
from aurora_tpu.utils.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX


def oracle_fuse(embed_table, ids, vis_list, mask, labels):
    """Single sample. vis_list: per-marker [N_k, D] arrays in order."""
    ids = ids[mask]
    labels = labels[mask]
    out_e, out_l = [], []
    k = 0
    for i, tok in enumerate(ids):
        if tok == IMAGE_TOKEN_INDEX:
            out_e.append(vis_list[k])
            out_l.append(np.full(vis_list[k].shape[0], IGNORE_INDEX))
            k += 1
        else:
            out_e.append(embed_table[tok][None])
            out_l.append(np.array([labels[i]]))
    return np.concatenate(out_e), np.concatenate(out_l)


def test_fuse_matches_oracle(rng):
    V, D, T, B = 50, 8, 12, 3
    N1, N2 = 5, 3
    table = rng.standard_normal((V, D)).astype(np.float32)
    ids = rng.integers(1, V, size=(B, T))
    # two markers per sample at varying spots; right padding
    lens = [12, 9, 11]
    mask = np.zeros((B, T), bool)
    for b, ln in enumerate(lens):
        mask[b, :ln] = True
        spots = sorted(rng.choice(np.arange(1, ln - 1), 2, replace=False))
        ids[b, spots[0]] = IMAGE_TOKEN_INDEX
        ids[b, spots[1]] = IMAGE_TOKEN_INDEX
        ids[b, ln:] = 0
    labels = rng.integers(1, V, size=(B, T))
    g1 = rng.standard_normal((B, 1, N1, D)).astype(np.float32)
    g2 = rng.standard_normal((B, 1, N2, D)).astype(np.float32)

    got = fuse_multimodal(jnp.asarray(table), jnp.asarray(ids),
                          [jnp.asarray(g1), jnp.asarray(g2)],
                          jnp.asarray(mask), jnp.asarray(labels))
    T_out = T - 2 + N1 + N2
    assert got["inputs_embeds"].shape == (B, T_out, D)

    for b in range(B):
        want_e, want_l = oracle_fuse(table, ids[b], [g1[b, 0], g2[b, 0]],
                                     mask[b], labels[b])
        ln = want_e.shape[0]
        np.testing.assert_allclose(
            np.asarray(got["inputs_embeds"][b, :ln]), want_e, rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(got["labels"][b, :ln]), want_l)
        # pad tail: zero embeds, IGNORE labels, mask off
        np.testing.assert_array_equal(
            np.asarray(got["attention_mask"][b]),
            np.arange(T_out) < ln)
        np.testing.assert_allclose(
            np.asarray(got["inputs_embeds"][b, ln:]), 0.0)
        np.testing.assert_array_equal(
            np.asarray(got["labels"][b, ln:]), IGNORE_INDEX)
        np.testing.assert_array_equal(
            np.asarray(got["position_ids"][b, :ln]), np.arange(ln))


def test_num_visual_tokens_flagship():
    cfg = AuroraConfig.auroracap_7b()
    # ratio 1.0: no merging → 729 patches
    assert num_visual_tokens(cfg, 1.0) == 729
    # ratio 0.1 → r=20/layer, select -2 → after 31 merges: 730-31*20-1
    assert num_visual_tokens(cfg, 0.1) == 730 - 31 * 20 - 1


def test_aurora_forward_modes(rng):
    cfg = AuroraConfig.tiny()
    from aurora_tpu.models.llama import init_llama_params
    from aurora_tpu.models.projector import init_projector_params
    from aurora_tpu.models.vit import init_vit_params
    params = {
        "visual_encoder": init_vit_params(jax.random.PRNGKey(0), cfg.vit),
        "projector": init_projector_params(jax.random.PRNGKey(1),
                                           cfg.projector),
        "llm": init_llama_params(jax.random.PRNGKey(2), cfg.llm),
    }
    F = 2
    T = 10
    ids = rng.integers(1, 100, size=(1, T))
    ids[0, 2] = IMAGE_TOKEN_INDEX
    ids[0, 5] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    px = rng.standard_normal((1, F, 3, 56, 56)).astype(np.float32)

    loss, n = aurora_forward(params, cfg, jnp.asarray(ids),
                             jnp.asarray(px), labels=jnp.asarray(labels),
                             kept_ratio=0.5, mode="loss")
    assert np.isfinite(float(loss)) and int(n) > 0

    fused = aurora_forward(params, cfg, jnp.asarray(ids), jnp.asarray(px),
                           kept_ratio=0.5, mode="inference")
    n_vis = num_visual_tokens(cfg, 0.5, 56, 56)
    assert fused["inputs_embeds"].shape[1] == T - F + F * n_vis


def test_aurora_forward_slowfast(rng):
    cfg = AuroraConfig.tiny()
    cfg = AuroraConfig(vit=cfg.vit, llm=cfg.llm, projector=cfg.projector,
                       slowfast=True)
    import dataclasses
    from aurora_tpu.models.llama import init_llama_params
    from aurora_tpu.models.projector import init_projector_params
    from aurora_tpu.models.vit import init_vit_params
    params = {
        "visual_encoder": init_vit_params(jax.random.PRNGKey(0), cfg.vit),
        "projector": init_projector_params(jax.random.PRNGKey(1),
                                           cfg.projector),
        "llm": init_llama_params(jax.random.PRNGKey(2), cfg.llm),
    }
    F, T = 3, 9
    ids = rng.integers(1, 100, size=(1, T))
    for spot in (1, 3, 5):
        ids[0, spot] = IMAGE_TOKEN_INDEX
    px = rng.standard_normal((1, F, 3, 56, 56)).astype(np.float32)
    fused = aurora_forward(params, cfg, jnp.asarray(ids), jnp.asarray(px),
                           kept_ratio=0.5, mode="inference")
    n_hi = num_visual_tokens(cfg, 1.0, 56, 56)
    n_lo = num_visual_tokens(cfg, 0.5, 56, 56)
    assert fused["inputs_embeds"].shape[1] == T - F + n_hi + (F - 1) * n_lo


def test_multimodal_packing_matches_individual(rng):
    """SoftPackerMM + fused segment expansion: the packed loss (token-
    weighted) equals the samples' individual losses — attention stays
    per-document through the visual splice (SoftPackerForLlava parity)."""
    import jax
    import jax.numpy as jnp
    from aurora_tpu.data.collate import SoftPackerMM, packed_collate_mm
    from aurora_tpu.models.aurora import (AuroraConfig, aurora_forward,
                                          num_visual_tokens)
    from aurora_tpu.models.llama import LlamaConfig, init_llama_params
    from aurora_tpu.models.projector import (ProjectorConfig,
                                             init_projector_params)
    from aurora_tpu.models.vit import ViTConfig, init_vit_params
    from aurora_tpu.utils.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX

    vit = ViTConfig(hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=4,
                    image_size=28, patch_size=14)
    llm = LlamaConfig.tiny(vocab_size=128)
    acfg = AuroraConfig(vit=vit, llm=llm,
                        projector=ProjectorConfig(visual_hidden_size=32,
                                                  llm_hidden_size=64,
                                                  depth=2))
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {"visual_encoder": init_vit_params(keys[0], vit,
                                                jnp.float32),
              "projector": init_projector_params(keys[1], acfg.projector,
                                                 jnp.float32),
              "llm": init_llama_params(keys[2], llm, jnp.float32)}
    n_vis = num_visual_tokens(acfg, 1.0, 28, 28)

    def make_sample(n_text, n_frames):
        ids = [int(x) for x in rng.integers(3, 128, size=n_text)]
        for j in range(n_frames):
            ids[1 + j] = IMAGE_TOKEN_INDEX
        labels = list(ids)
        # prompt region IGNORE (also guards the pack boundary shift)
        for j in range(n_frames + 2):
            labels[j] = IGNORE_INDEX
        px = rng.standard_normal((n_frames, 3, 28, 28)).astype(np.float32)
        return {"input_ids": ids, "labels": labels, "pixel_values": px}

    samples = [make_sample(8, 1), make_sample(10, 2), make_sample(6, 1)]

    # individual losses (token-weighted mean is the packed expectation)
    tot_loss, tot_n = 0.0, 0
    for s in samples:
        loss, n = aurora_forward(
            params, acfg, jnp.asarray([s["input_ids"]]),
            jnp.asarray(s["pixel_values"])[None],
            labels=jnp.asarray([s["labels"]]), kept_ratio=1.0,
            mode="loss")
        tot_loss += float(loss) * int(n)
        tot_n += int(n)
    want = tot_loss / tot_n

    packer = SoftPackerMM(samples, pack_max_length=128,
                          n_visual_tokens=n_vis)
    assert len(packer) == 1  # everything fits one pack
    batch = packed_collate_mm([packer[0]])
    loss, n = aurora_forward(
        params, acfg, jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["pixel_values"]),
        attention_mask=jnp.asarray(batch["attention_mask"]),
        labels=jnp.asarray(batch["labels"]), kept_ratio=1.0,
        mode="loss", segment_ids=jnp.asarray(batch["segment_ids"]))
    assert int(n) == tot_n
    np.testing.assert_allclose(float(loss), want, rtol=2e-4, atol=2e-4)


def test_multimodal_packing_two_packs_with_frame_padding(rng):
    """Packs with different frame counts: the collate pads frames and
    plants balancing markers in the masked tail; loss must stay finite
    and match the token-weighted individual losses."""
    import jax
    import jax.numpy as jnp
    from aurora_tpu.data.collate import SoftPackerMM, packed_collate_mm
    from aurora_tpu.models.aurora import (AuroraConfig, aurora_forward,
                                          num_visual_tokens)
    from aurora_tpu.models.llama import LlamaConfig, init_llama_params
    from aurora_tpu.models.projector import (ProjectorConfig,
                                             init_projector_params)
    from aurora_tpu.models.vit import ViTConfig, init_vit_params
    from aurora_tpu.utils.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX

    vit = ViTConfig(hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=4,
                    image_size=28, patch_size=14)
    llm = LlamaConfig.tiny(vocab_size=128)
    acfg = AuroraConfig(vit=vit, llm=llm,
                        projector=ProjectorConfig(visual_hidden_size=32,
                                                  llm_hidden_size=64,
                                                  depth=2))
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    params = {"visual_encoder": init_vit_params(keys[0], vit,
                                                jnp.float32),
              "projector": init_projector_params(keys[1], acfg.projector,
                                                 jnp.float32),
              "llm": init_llama_params(keys[2], llm, jnp.float32)}
    n_vis = num_visual_tokens(acfg, 1.0, 28, 28)

    def make_sample(n_text, n_frames, seed):
        r = np.random.default_rng(seed)
        ids = [int(x) for x in r.integers(3, 128, size=n_text)]
        for j in range(n_frames):
            ids[1 + j] = IMAGE_TOKEN_INDEX
        labels = list(ids)
        for j in range(n_frames + 2):
            labels[j] = IGNORE_INDEX
        px = r.standard_normal((n_frames, 3, 28, 28)).astype(np.float32)
        return {"input_ids": ids, "labels": labels, "pixel_values": px}

    # force two packs with different frame counts via a tight budget
    s1, s2, s3 = (make_sample(8, 2, 1), make_sample(8, 1, 2),
                  make_sample(8, 1, 3))
    fused = 8 - 2 + 2 * n_vis
    packer = SoftPackerMM([s1, s2, s3], pack_max_length=fused + 8 + 2,
                          n_visual_tokens=n_vis)
    assert len(packer) == 2
    batch = packed_collate_mm([packer[0], packer[1]])
    assert batch["pixel_values"].shape[1] == 2  # padded to max frames

    tot_loss, tot_n = 0.0, 0
    for s in (s1, s2, s3):
        loss, n = aurora_forward(
            params, acfg, jnp.asarray([s["input_ids"]]),
            jnp.asarray(s["pixel_values"])[None],
            labels=jnp.asarray([s["labels"]]), kept_ratio=1.0,
            mode="loss")
        tot_loss += float(loss) * int(n)
        tot_n += int(n)
    loss, n = aurora_forward(
        params, acfg, jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["pixel_values"]),
        attention_mask=jnp.asarray(batch["attention_mask"]),
        labels=jnp.asarray(batch["labels"]), kept_ratio=1.0,
        mode="loss", segment_ids=jnp.asarray(batch["segment_ids"]))
    assert int(n) == tot_n
    np.testing.assert_allclose(float(loss), tot_loss / tot_n,
                               rtol=2e-4, atol=2e-4)
