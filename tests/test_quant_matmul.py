"""Pallas quantized-matmul kernels (ops/pallas/quant_matmul.py) —
interpret-mode parity on CPU; compiled validation runs on TPU via
tools/bench_wdot.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_w4a16_matches_dequant_reference(rng):
    """w4a16_matmul == h @ dequantize(pack(W)) for the engine's packing
    (even input row in the low nibble, g-grouped scales)."""
    from aurora_tpu.ops.pallas.quant_matmul import w4a16_matmul
    from aurora_tpu.serve.engine import _w4

    B, K, N, g = 5, 256, 512, 64
    w = jnp.asarray(rng.standard_normal((1, K, N)), jnp.float32)
    pk, s = _w4(w, group=g)                    # [1, G, g/2, N], [1, G, 1, N]
    pk, s = pk[0], s[0]
    G = K // g

    # reference dequant: interleave nibble planes back to [K, N]
    p = np.asarray(pk).astype(np.int8)
    lo = np.right_shift(np.left_shift(p, 4), 4)
    hi = np.right_shift(p, 4)
    q = np.zeros((G, g, N), np.float32)
    q[:, 0::2] = lo
    q[:, 1::2] = hi
    wd = (q * np.asarray(s)).reshape(K, N)

    h = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    want = np.asarray(h, np.float32).astype(np.float32) @ wd
    got = w4a16_matmul(h, pk, s, block_n=256, out_dtype=jnp.float32,
                       interpret=True)
    # bf16 activations + bf16 scale products inside the kernel
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05,
                               atol=0.3)


def test_w4a16_block_and_padding_edges(rng):
    """Non-multiple batch (pad to sublane tile) and multi-block N."""
    from aurora_tpu.ops.pallas.quant_matmul import w4a16_matmul
    from aurora_tpu.serve.engine import _w4
    B, K, N, g = 3, 128, 1024, 128
    w = jnp.asarray(rng.standard_normal((1, K, N)), jnp.float32)
    pk, s = _w4(w, group=g)
    out = w4a16_matmul(jnp.asarray(rng.standard_normal((B, K)),
                                   jnp.bfloat16), pk[0], s[0],
                       block_n=256, interpret=True)
    assert out.shape == (B, N)
    assert not np.any(np.isnan(np.asarray(out, np.float32)))


def test_w4a8_matches_engine_w4dot(rng):
    """w4a8_matmul == the engine _w4dot decode path EXACTLY (same
    per-token int8 activation quantization, same grouped int4 weights,
    f32 partial rescale) — the Pallas kernel is a drop-in for the
    decode weight stream, so its numerics must be the XLA path's, not
    merely close."""
    from aurora_tpu.ops.pallas.quant_matmul import w4a8_matmul
    from aurora_tpu.serve.engine import _w4, _w4dot

    B, K, N, g = 5, 512, 768, 128
    w = jnp.asarray(rng.standard_normal((1, K, N)), jnp.float32)
    pk, s = _w4(w, group=g)
    pk, s = pk[0], s[0]
    h = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    want = np.asarray(_w4dot(h, pk, s), np.float32)   # decode branch (B<=64)
    got = w4a8_matmul(h, pk, s, block_n=256, out_dtype=jnp.float32,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                               atol=2e-3)
    # multi-k-tile path (block_k < K/2) accumulates identically
    got2 = w4a8_matmul(h, pk, s, block_n=256, block_k=g // 2,
                       out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                               rtol=0, atol=1e-5)
    # bf16 output + odd group count (G=3) exercises _w4_block_k's
    # divisor walk
    w3 = jnp.asarray(rng.standard_normal((1, 3 * g, 256)), jnp.float32)
    pk3, s3 = _w4(w3, group=g)
    out3 = w4a8_matmul(jnp.asarray(rng.standard_normal((2, 3 * g)),
                                   jnp.bfloat16), pk3[0], s3[0],
                       block_n=256, interpret=True)
    assert out3.shape == (2, 256)
    assert not np.any(np.isnan(np.asarray(out3, np.float32)))


def test_w4_tile_layout_roundtrip_and_kernel_parity(rng):
    """The tile-contiguous decode layout is a pure relayout: untile
    inverts tile exactly, and w4a8_matmul_tiled == w4a8_matmul ==
    _w4dot bit-for-bit intent (same int8/f32 math, different DMA
    geometry)."""
    from aurora_tpu.ops.pallas.quant_matmul import (w4_tile_layout,
                                                    w4_untile_layout,
                                                    w4a8_matmul,
                                                    w4a8_matmul_tiled)
    from aurora_tpu.serve.engine import _w4, _w4dot

    B, K, N, g = 5, 512, 768, 128
    w = jnp.asarray(rng.standard_normal((1, K, N)), jnp.float32)
    pk, s = _w4(w, group=g)
    pk, s = pk[0], s[0]

    pkt, swt = w4_tile_layout(pk, s, block_n=256)
    pk2, s2 = w4_untile_layout(pkt, swt)
    np.testing.assert_array_equal(np.asarray(pk2), np.asarray(pk))
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s, np.float32),
                               rtol=0, atol=0)

    h = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    want = np.asarray(w4a8_matmul(h, pk, s, block_n=256,
                                  out_dtype=jnp.float32, interpret=True))
    got = w4a8_matmul_tiled(h, pkt, swt, out_dtype=jnp.float32,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-5)

    # multi-k-tile geometry (bk < K/2): force via a small budget
    pkt2, swt2 = w4_tile_layout(pk, s, block_n=256, budget=g // 2 * 256)
    assert pkt2.shape[1] > 1                       # >1 k tile
    got2 = w4a8_matmul_tiled(h, pkt2, swt2, out_dtype=jnp.float32,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got2), want, rtol=0, atol=1e-5)

    # _w4dot consumes the tiled layout directly on both paths:
    # decode (<=64 tokens -> tiled kernel) and prefill (untile + bf16
    # dequant dot)
    got3 = _w4dot(h, pkt, swt)
    np.testing.assert_allclose(np.asarray(got3, np.float32), want,
                               rtol=2e-2, atol=2e-2)
    h_many = jnp.asarray(rng.standard_normal((80, K)), jnp.bfloat16)
    flat_many = np.asarray(_w4dot(h_many, pk, s), np.float32)
    tiled_many = np.asarray(_w4dot(h_many, pkt, swt), np.float32)
    np.testing.assert_allclose(tiled_many, flat_many, rtol=1e-2,
                               atol=1e-2)


def test_w4_tile_params_stack_and_eligibility(rng):
    """_w4_tile_params tiles eligible layer stacks (O % 256 == 0) into
    [L, Nb, Kb, bk, bn], skips ineligible names, and is idempotent."""
    from aurora_tpu.serve.engine import _w4, _w4_tile_params

    L, K, N, g = 2, 256, 512, 128
    w = jnp.asarray(rng.standard_normal((L, K, N)), jnp.float32)
    pk, s = _w4(w, group=g)
    w_bad = jnp.asarray(rng.standard_normal((L, K, 192)), jnp.float32)
    pk_b, s_b = _w4(w_bad, group=g)
    params = {"layers": {"q": pk, "q_scale4": s,
                         "odd": pk_b, "odd_scale4": s_b}}
    out = _w4_tile_params(params)
    lay = out["layers"]
    assert lay["q"].ndim == 5 and lay["q_scale4"].ndim == 5
    assert lay["q"].shape[0] == L
    assert lay["q"].nbytes == pk.nbytes            # same bytes
    assert lay["odd"].ndim == 4                    # O=192 stays flat
    again = _w4_tile_params(out)["layers"]
    assert again["q"].shape == lay["q"].shape      # idempotent


def test_w8a8_matches_dequant_reference(rng):
    """w8a8_matmul == dequant(h8) @ dequant(w8) for the engine's W8A8
    conventions (per-token activation scales, per-output-channel weight
    scales) — the kernel previously had no test at all."""
    from aurora_tpu.ops.pallas.quant_matmul import w8a8_matmul

    B, K, N = 5, 256, 512
    w = rng.standard_normal((K, N)).astype(np.float32)
    s_w = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    w8 = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)

    h = rng.standard_normal((B, K)).astype(np.float32)
    s_a = np.maximum(np.abs(h).max(axis=1, keepdims=True), 1e-12) / 127.0
    h8 = np.clip(np.round(h / s_a), -127, 127).astype(np.int8)

    want = (h8.astype(np.float32) * s_a) @ (w8.astype(np.float32) * s_w)
    got = w8a8_matmul(jnp.asarray(h8), jnp.asarray(s_a),
                      jnp.asarray(w8), jnp.asarray(s_w),
                      block_n=256, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                               atol=1e-4)
    # s_w accepted as [1, N] too; auto interpret picks CPU fallback
    got2 = w8a8_matmul(jnp.asarray(h8), jnp.asarray(s_a),
                       jnp.asarray(w8), jnp.asarray(s_w[None]),
                       block_n=256, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got2), want, rtol=1e-4,
                               atol=1e-4)
