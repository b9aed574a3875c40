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


def _write_manual(k_rows, v_rows, k_new, v_new, lens, rows):
    """Oracle for the fused write: place each active lane's token at
    lens-1 of its row (numpy)."""
    k_rows = np.array(k_rows)
    v_rows = np.array(v_rows)
    for b in range(len(lens)):
        ln = int(lens[b])
        if ln > 0:
            k_rows[int(rows[b]), :, ln - 1] = np.asarray(k_new)[b]
            v_rows[int(rows[b]), :, ln - 1] = np.asarray(v_new)[b]
    return k_rows, v_rows


@pytest.mark.parametrize("G", [1, 4])
def test_fused_decode_write_and_attend(G):
    """ragged_decode_attention == (manual KV write, then oracle attend),
    and the returned KV buffers contain the written tokens."""
    from aurora_tpu.ops.pallas.ragged_attention import \
        ragged_decode_attention
    rng = np.random.default_rng(11)
    L, B, Hkv, S, hd = 3, 4, 2, 256, 128
    Hq = Hkv * G
    k5 = jnp.asarray(rng.standard_normal((L, B, Hkv, S, hd)), jnp.float32)
    v5 = jnp.asarray(rng.standard_normal((L, B, Hkv, S, hd)), jnp.float32)
    lens = jnp.asarray([5, 130, 256, 0], jnp.int32)   # lane 3 inactive
    rows = jnp.arange(B, dtype=jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, hd)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    lay = 1
    out, k5b, v5b = ragged_decode_attention(
        q, k_new, v_new, k5, v5, lens, rows, layer=lay, chunk=128)
    kw, vw = _write_manual(np.array(k5[lay]), np.array(v5[lay]),
                           k_new, v_new, lens, rows)
    want = ragged_attention_reference(q, jnp.asarray(kw), jnp.asarray(vw),
                                      lens, jnp.maximum(lens - 1, 0),
                                      rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    # written tokens landed in the returned buffer; other layers intact
    np.testing.assert_allclose(np.asarray(k5b[lay]), kw, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v5b[lay]), vw, atol=1e-6)
    np.testing.assert_allclose(np.asarray(k5b[0]), np.asarray(k5[0]),
                               atol=0)
    # inactive lane's row untouched
    np.testing.assert_allclose(np.asarray(k5b[lay][3]),
                               np.asarray(k5[lay][3]), atol=0)


def test_fused_decode_int8_quantizes_in_kernel():
    """Quantized fused decode: token quantized to int8 + scale in-kernel;
    attention output matches a float oracle to int8 tolerance."""
    from aurora_tpu.ops.pallas.ragged_attention import \
        ragged_decode_attention
    rng = np.random.default_rng(12)
    L, B, Hkv, S, hd = 2, 2, 2, 128, 128
    kf = rng.standard_normal((L, B, Hkv, S, hd)).astype(np.float32)
    vf = rng.standard_normal((L, B, Hkv, S, hd)).astype(np.float32)
    ks = np.maximum(np.abs(kf).max(-1), 1e-8) / 127.0
    vs = np.maximum(np.abs(vf).max(-1), 1e-8) / 127.0
    k8 = np.clip(np.round(kf / ks[..., None]), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs[..., None]), -127, 127).astype(np.int8)
    lens = jnp.asarray([60, 128], jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, 1, Hkv, hd)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    out, k8b, v8b, ksb, vsb = ragged_decode_attention(
        q, k_new, v_new, jnp.asarray(k8), jnp.asarray(v8), lens, rows,
        layer=0, chunk=128, k_scales=jnp.asarray(ks),
        v_scales=jnp.asarray(vs))
    # float oracle with the true (unquantized) values
    kw, vw = _write_manual(kf[0], vf[0], k_new, v_new, lens, rows)
    want = ragged_attention_reference(q, jnp.asarray(kw), jnp.asarray(vw),
                                      lens, lens - 1, rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=0.08, rtol=0.08)
    # dequantized written token ≈ the original new token
    for b in range(B):
        pos = int(lens[b]) - 1
        deq = (np.asarray(k8b)[0, b, :, pos].astype(np.float32)
               * np.asarray(ksb)[0, b, :, pos][:, None])
        np.testing.assert_allclose(deq, np.asarray(k_new)[b], atol=0.02,
                                   rtol=0.02)
    # CROSS-PATH recipe parity: the kernel's in-kernel quantization must
    # match engine._kv_quantize (the extend path's XLA recipe) — the two
    # write the SAME buffers, so a drifted epsilon/clip/rounding would
    # mix conventions in one row with no error
    from aurora_tpu.serve.engine import _kv_quantize
    qk, sk = _kv_quantize(k_new)
    qv, sv = _kv_quantize(v_new)
    for b in range(B):
        pos = int(lens[b]) - 1
        np.testing.assert_allclose(np.asarray(k8b)[0, b, :, pos],
                                   np.asarray(qk)[b], atol=1)
        np.testing.assert_allclose(np.asarray(ksb)[0, b, :, pos],
                                   np.asarray(sk)[b], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(v8b)[0, b, :, pos],
                                   np.asarray(qv)[b], atol=1)
        np.testing.assert_allclose(np.asarray(vsb)[0, b, :, pos],
                                   np.asarray(sv)[b], rtol=1e-5)


def test_fused_decode_bf16_production_path():
    """bf16 q selects the bf16-MXU dot path in the FUSED decode kernel
    (the production dtype — the kernel originally ran f32 dots, a
    4-byte VPU convert per streamed KV byte and the whole 546-vs-785
    GB/s gap to the extend kernel); int8 values are exact in bf16, so
    parity with the f32 oracle holds within bf16 rounding."""
    from aurora_tpu.ops.pallas.ragged_attention import \
        ragged_decode_attention
    rng = np.random.default_rng(21)
    L, B, Hkv, S, hd = 2, 2, 2, 128, 128
    kf = rng.standard_normal((L, B, Hkv, S, hd)).astype(np.float32)
    vf = rng.standard_normal((L, B, Hkv, S, hd)).astype(np.float32)
    ks = np.maximum(np.abs(kf).max(-1), 1e-8) / 127.0
    vs = np.maximum(np.abs(vf).max(-1), 1e-8) / 127.0
    k8 = np.clip(np.round(kf / ks[..., None]), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs[..., None]), -127, 127).astype(np.int8)
    lens = jnp.asarray([60, 128], jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)
    q32 = jnp.asarray(rng.standard_normal((B, 1, Hkv, hd)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    got = ragged_decode_attention(
        q32.astype(jnp.bfloat16), k_new.astype(jnp.bfloat16),
        v_new.astype(jnp.bfloat16), jnp.asarray(k8), jnp.asarray(v8),
        lens, rows, layer=0, chunk=128, k_scales=jnp.asarray(ks),
        v_scales=jnp.asarray(vs))[0]
    want = ragged_decode_attention(
        q32, k_new, v_new, jnp.asarray(k8), jnp.asarray(v8), lens, rows,
        layer=0, chunk=128, k_scales=jnp.asarray(ks),
        v_scales=jnp.asarray(vs))[0]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.04, rtol=0.04)


@pytest.mark.parametrize("T,G", [(512, 2), (384, 1)])
def test_extend_long_t_query_blocks(T, G):
    """T > 256 activates the 2D query-block tiling (scoped-vmem fix):
    aligned (512, multi-g) and unaligned (384 → conservative causal
    bound) both must match the reference exactly."""
    rng = np.random.default_rng(9)
    B, Hkv, S, hd = 2, 2, 1024, 128
    k, v = _rows(rng, B, Hkv, S, hd)
    offs = jnp.asarray([0, 203], jnp.int32)
    lens = offs + T
    q = jnp.asarray(rng.standard_normal((B, T, Hkv * G, hd)),
                    jnp.float32)
    rows = jnp.arange(B, dtype=jnp.int32)
    got = ragged_attention(q, k, v, lens, offs, rows, chunk=256)
    want = ragged_attention_reference(q, k, v, lens, offs, rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_extend_long_t_int8_and_window(rng):
    """Long-T tiling composed with int8 KV scales and a sliding
    window."""
    from aurora_tpu.ops.pallas.ragged_attention import (
        ragged_attention_reference)
    B, Hkv, S, hd, T = 2, 2, 1024, 128, 512
    k, v = _rows(rng, B, Hkv, S, hd)
    ks = jnp.asarray(
        np.abs(np.random.default_rng(3).standard_normal((B, Hkv, S)))
        * 0.05 + 0.01, jnp.float32)
    vs = jnp.asarray(
        np.abs(np.random.default_rng(4).standard_normal((B, Hkv, S)))
        * 0.05 + 0.01, jnp.float32)
    k8 = jnp.clip(jnp.round(k / ks[..., None]), -127, 127
                  ).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(v / vs[..., None]), -127, 127
                  ).astype(jnp.int8)
    offs = jnp.asarray([0, 150], jnp.int32)
    lens = offs + T
    q = jnp.asarray(np.random.default_rng(5).standard_normal(
        (B, T, Hkv, hd)), jnp.float32)
    rows = jnp.arange(B, dtype=jnp.int32)
    got = ragged_attention(q, k8, v8, lens, offs, rows, chunk=256,
                           k_scales=ks, v_scales=vs, window=256)
    want = ragged_attention_reference(
        q, (k8.astype(jnp.float32) * ks[..., None]),
        (v8.astype(jnp.float32) * vs[..., None]),
        lens, offs, rows, window=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_extend_bf16_production_path(rng):
    """bf16 q rows select the bf16-MXU dot path (production dtype);
    parity within bf16 tolerance of the f32 reference."""
    B, Hkv, S, hd, T = 2, 2, 512, 128, 512
    k32, v32 = _rows(np.random.default_rng(11), B, Hkv, S, hd)
    k, v = k32.astype(jnp.bfloat16), v32.astype(jnp.bfloat16)
    offs = jnp.asarray([0, 0], jnp.int32)
    lens = offs + T
    q32 = jnp.asarray(np.random.default_rng(12).standard_normal(
        (B, T, Hkv, hd)), jnp.float32)
    rows = jnp.arange(B, dtype=jnp.int32)
    got = ragged_attention(q32.astype(jnp.bfloat16), k, v, lens, offs,
                           rows, chunk=256)
    want = ragged_attention_reference(q32, k32, v32, lens, offs, rows)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=3e-2, rtol=3e-2)


def test_decode_nonaligned_head_count_fits_chunk():
    """Hkv with no 8-aligned divisor (36 — MiniCPM-style MHA) escalates
    to the FULL head block; _fit_chunk must shrink the KV chunk so the
    kernel stays inside scoped VMEM instead of silently compiling an
    oversized grid cell (regression: latent TPU compile failure the
    CPU interpret tests never saw). Numerics must be unchanged."""
    from aurora_tpu.ops.pallas.ragged_attention import (
        _fit_chunk, ragged_decode_attention)
    hb, chunk = _fit_chunk(36, 64, 2, 512, 2048, 8)
    assert hb == 36                      # full block (no aligned divisor)
    per_head = 8 * chunk * 64 * 2 + 32 * chunk + (1 << 14)
    assert 36 * per_head <= (13 << 20)   # fits the budget
    assert 2048 % chunk == 0 and chunk < 512

    rng = np.random.default_rng(5)
    L, B, Hkv, S, hd = 1, 2, 36, 512, 64
    kf = jnp.asarray(rng.standard_normal((L, B, Hkv, S, hd)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((L, B, Hkv, S, hd)), jnp.float32)
    lens = jnp.asarray([60, 500], jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, 1, Hkv, hd)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    out, kb, vb = ragged_decode_attention(q, k_new, v_new, kf, vf, lens,
                                          rows, layer=0, chunk=512)[:3]
    kw, vw = _write_manual(np.asarray(kf)[0], np.asarray(vf)[0],
                           k_new, v_new, lens, rows)
    want = ragged_attention_reference(q, jnp.asarray(kw), jnp.asarray(vw),
                                      lens, lens - 1, rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_int8_decode_subset_rows_alias():
    """int8 decode over a SUBSET of engine rows (Bk != R): the aliased
    scale out_shapes must size from the scale buffers' own row dim
    (regression: q.shape[0] broke the input_output_aliases at trace)."""
    from aurora_tpu.ops.pallas.ragged_attention import \
        ragged_decode_attention
    rng = np.random.default_rng(9)
    L, R, Bk, Hkv, S, hd = 1, 4, 2, 2, 128, 128
    kf = rng.standard_normal((L, R, Hkv, S, hd)).astype(np.float32)
    vf = rng.standard_normal((L, R, Hkv, S, hd)).astype(np.float32)
    ks = np.maximum(np.abs(kf).max(-1), 1e-8) / 127.0
    vs = np.maximum(np.abs(vf).max(-1), 1e-8) / 127.0
    k8 = np.clip(np.round(kf / ks[..., None]), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs[..., None]), -127, 127).astype(np.int8)
    lens = jnp.asarray([50, 90], jnp.int32)      # per decode LANE
    rows = jnp.asarray([3, 1], jnp.int32)        # indirect engine rows
    q = jnp.asarray(rng.standard_normal((Bk, 1, Hkv, hd)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((Bk, Hkv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((Bk, Hkv, hd)), jnp.float32)
    out, k8b, v8b, ksb, vsb = ragged_decode_attention(
        q, k_new, v_new, jnp.asarray(k8), jnp.asarray(v8), lens, rows,
        layer=0, chunk=128, k_scales=jnp.asarray(ks),
        v_scales=jnp.asarray(vs))
    assert k8b.shape == (L, R, Hkv, S, hd)
    assert ksb.shape[:2] == (L, R)
    kw, vw = _write_manual(kf[0], vf[0], k_new, v_new, lens, rows)
    want = ragged_attention_reference(q, jnp.asarray(kw), jnp.asarray(vw),
                                      lens, lens - 1, rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=0.08, rtol=0.08)


def test_fit_chunk_budgets_compute_intermediates():
    """Scoped-VMEM picks for the production 7B serving shape (Hkv=32,
    hd=128, chunk=256, qb=256). Mosaic stack-allocates the kernel's f32
    logits/probs intermediates ([hb, qb, chunk] each) alongside the
    pipeline blocks; a budget that ignored them let the int8 EXTEND
    path pick hb=16 and exceed the 16MB scoped-VMEM limit by 6MB at
    T=1024 — the kernel failed to COMPILE on TPU while every CPU
    interpret test passed (round-4 driver bench: int8-KV serving
    produced zero tokens). Pins the picks so a budget regression trips
    here instead of on hardware."""
    from aurora_tpu.ops.pallas.ragged_attention import _fit_chunk
    Hkv, hd, S, qb = 32, 128, 1280, 256
    extra = qb * hd * 12  # extend's acc scratch + dbl-buffered q/out

    def actual_vmem(hb, chunk, kvb, qb_):
        kv = 2 * 2 * hb * chunk * hd * kvb          # k+v double-buffered
        scales = 2 * 2 * hb * chunk * 4 if kvb == 1 else 0
        qoa = hb * qb_ * hd * 12 if qb_ >= 16 else 0
        inter = 2 * hb * qb_ * chunk * 4            # f32 s + p
        return kv + scales + qoa + inter

    for kvb in (1, 2):
        hb, chunk = _fit_chunk(Hkv, hd, kvb, 256, S, 8,
                               extra_per_head=extra, qb=qb)
        assert actual_vmem(hb, chunk, kvb, qb) <= 15 << 20, (kvb, hb)
    # int8 extend must NOT escalate past bf16's proven hb=8
    hb8, c8 = _fit_chunk(Hkv, hd, 1, 256, S, 8, extra_per_head=extra,
                         qb=qb)
    assert (hb8, c8) == (8, 256)
    hb16, c16 = _fit_chunk(Hkv, hd, 2, 256, S, 8, extra_per_head=extra,
                           qb=qb)
    assert (hb16, c16) == (8, 256)  # bf16 keeps its measured config
    # decode picks unchanged by the intermediates surcharge (qr_pad=8)
    assert _fit_chunk(Hkv, hd, 1, 256, S, 8, qb=8) == (32, 256)
    assert _fit_chunk(Hkv, hd, 2, 256, S, 8, qb=8) == (16, 256)
