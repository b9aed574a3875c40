"""Ragged (paged) attention kernel vs XLA oracle.

Covers the serving engine's two modes — batched decode (T=1) and batched
extend (T>1, per-row q_offsets) — plus GQA grouping, indirect row_ids and
zero-length padded lanes. Parity target: the reference's Triton decode /
extend kernels (sglang srt/layers/triton_attention/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.ops.pallas.ragged_attention import (
    ragged_attention, ragged_attention_reference)


def _rows(rng, B, Hkv, S, hd, dtype=jnp.float32):
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, hd)), dtype)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, hd)), dtype)
    return k, v


@pytest.mark.parametrize("G", [1, 4])
def test_decode_matches_reference(G):
    rng = np.random.default_rng(0)
    B, Hkv, S, hd = 4, 2, 256, 128
    Hq = Hkv * G
    k, v = _rows(rng, B, Hkv, S, hd)
    lens = jnp.asarray([5, 130, 256, 1], jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, hd)), jnp.float32)
    offs = lens - 1
    rows = jnp.arange(B, dtype=jnp.int32)
    got = ragged_attention(q, k, v, lens, offs, rows, chunk=128)
    want = ragged_attention_reference(q, k, v, lens, offs, rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_extend_matches_reference_with_offsets():
    rng = np.random.default_rng(1)
    B, Hkv, S, hd, T = 3, 2, 256, 128, 32
    k, v = _rows(rng, B, Hkv, S, hd)
    # per-row cached prefix lengths; new tokens T appended after them
    offs = jnp.asarray([0, 7, 100], jnp.int32)
    lens = offs + T
    q = jnp.asarray(rng.standard_normal((B, T, Hkv, hd)), jnp.float32)
    rows = jnp.arange(B, dtype=jnp.int32)
    got = ragged_attention(q, k, v, lens, offs, rows, chunk=128)
    want = ragged_attention_reference(q, k, v, lens, offs, rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_indirect_rows_and_padded_lanes():
    rng = np.random.default_rng(2)
    B, Hkv, S, hd = 4, 1, 128, 128
    k, v = _rows(rng, B, Hkv, S, hd)
    # lane 0 reads KV row 3, lane 1 reads row 1; lane 2 is padding (len 0)
    rows = jnp.asarray([3, 1, 0], jnp.int32)
    lens = jnp.asarray([60, 128, 0], jnp.int32)
    offs = jnp.maximum(lens - 1, 0)
    q = jnp.asarray(rng.standard_normal((3, 1, Hkv, hd)), jnp.float32)
    got = ragged_attention(q, k, v, lens, offs, rows, chunk=128)
    want = ragged_attention_reference(q, k, v, lens, offs, rows)
    np.testing.assert_allclose(np.asarray(got)[:2], np.asarray(want)[:2],
                               atol=2e-5, rtol=2e-5)
    assert np.all(np.isfinite(np.asarray(got)))  # padded lane: no NaNs


def test_masking_ignores_garbage_beyond_length():
    """Positions >= kv_lens must not affect the output (rows beyond a
    request's length hold stale garbage by design)."""
    rng = np.random.default_rng(3)
    B, Hkv, S, hd = 2, 2, 128, 128
    k, v = _rows(rng, B, Hkv, S, hd)
    lens = jnp.asarray([40, 100], jnp.int32)
    offs = lens - 1
    q = jnp.asarray(rng.standard_normal((B, 1, Hkv, hd)), jnp.float32)
    rows = jnp.arange(B, dtype=jnp.int32)
    base = ragged_attention(q, k, v, lens, offs, rows, chunk=128)
    # poison everything beyond each row's length
    k2 = k.at[0, :, 40:].set(1e4).at[1, :, 100:].set(1e4)
    v2 = v.at[0, :, 40:].set(-1e4).at[1, :, 100:].set(-1e4)
    poisoned = ragged_attention(q, k2, v2, lens, offs, rows, chunk=128)
    np.testing.assert_allclose(np.asarray(base), np.asarray(poisoned),
                               atol=1e-6)


def test_ragged_attention_int8_kv(rng):
    """int8 KV + per-token scales dequantizes in-kernel and tracks the
    fp reference within quantization error."""
    from aurora_tpu.ops.pallas.ragged_attention import (
        ragged_attention, ragged_attention_reference)
    B, Hq, Hkv, S, hd = 3, 4, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, hd)), jnp.float32)
    k = rng.standard_normal((B, Hkv, S, hd)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, hd)).astype(np.float32)
    ks = np.maximum(np.abs(k).max(-1), 1e-8) / 127.0
    vs = np.maximum(np.abs(v).max(-1), 1e-8) / 127.0
    k8 = np.clip(np.round(k / ks[..., None]), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(v / vs[..., None]), -127, 127).astype(np.int8)
    lens = jnp.asarray([S, 100, 1], jnp.int32)
    offs = lens - 1
    rows = jnp.arange(B, dtype=jnp.int32)

    got = ragged_attention(q, jnp.asarray(k8), jnp.asarray(v8), lens,
                           offs, rows, chunk=128,
                           k_scales=jnp.asarray(ks),
                           v_scales=jnp.asarray(vs))
    # oracle on the DEQUANTIZED kv: isolates kernel error from quant
    # error (the kernel applies the scales post-dot in f32 — exact)
    kd = jnp.asarray(k8.astype(np.float32) * ks[..., None])
    vd = jnp.asarray(v8.astype(np.float32) * vs[..., None])
    want = ragged_attention_reference(q, kd, vd, lens, offs, rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    # and against the unquantized truth within int8 error
    truth = ragged_attention_reference(q, jnp.asarray(k), jnp.asarray(v),
                                       lens, offs, rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(truth),
                               rtol=0.1, atol=0.05)


@pytest.mark.parametrize("T,window", [(1, 96), (32, 64), (1, 8)])
def test_sliding_window_matches_reference(T, window):
    """SWA (Mistral sliding_window / Gemma2 local layers): keys outside
    the trailing `window` positions of each query are masked, and chunks
    wholly below the window are skipped."""
    rng = np.random.default_rng(7)
    B, Hkv, S, hd = 3, 2, 256, 128
    k, v = _rows(rng, B, Hkv, S, hd)
    offs = jnp.asarray([0, 100, 220], jnp.int32)
    lens = offs + T
    q = jnp.asarray(rng.standard_normal((B, T, Hkv * 2, hd)), jnp.float32)
    rows = jnp.arange(B, dtype=jnp.int32)
    got = ragged_attention(q, k, v, lens, offs, rows, chunk=64,
                           window=window)
    want = ragged_attention_reference(q, k, v, lens, offs, rows,
                                      window=window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_window_traced_scalar_and_disabled():
    """window=0 (disabled) equals the unwindowed kernel, and a traced
    window works under jit (Gemma2 scans over per-layer windows)."""
    rng = np.random.default_rng(8)
    B, Hkv, S, hd = 2, 1, 128, 128
    k, v = _rows(rng, B, Hkv, S, hd)
    lens = jnp.asarray([90, 128], jnp.int32)
    offs = lens - 1
    q = jnp.asarray(rng.standard_normal((B, 1, Hkv, hd)), jnp.float32)
    rows = jnp.arange(B, dtype=jnp.int32)

    @jax.jit
    def run(w):
        return ragged_attention(q, k, v, lens, offs, rows, chunk=64,
                                window=w)

    base = ragged_attention(q, k, v, lens, offs, rows, chunk=64)
    np.testing.assert_allclose(np.asarray(run(jnp.asarray(0))),
                               np.asarray(base), atol=2e-5, rtol=2e-5)
    want = ragged_attention_reference(q, k, v, lens, offs, rows,
                                      window=32)
    np.testing.assert_allclose(np.asarray(run(jnp.asarray(32))),
                               np.asarray(want), atol=2e-5, rtol=2e-5)
