"""Nibble-packed int4 KV cache — parity gates.

kv_quant="int4" stores two tokens per byte (PACK_SEG chunk-half
pairing: token seg*256+j low nibble, seg*256+j+128 high — every
in-kernel op stays >=128-lane tile-aligned) with per-token fp32 scales
on the 16-level grid. The NUMERICS are identical to the AURORA_KV_BITS=4
emulation (int8 storage, same grid — tests/test_kv_int4_quality.py
measures the grid's quality cost); these tests pin the PACKING:

  1. pack/unpack round trip;
  2. extend + decode kernel parity: packed buffers vs the int8 kernel
     path on the unpacked grid values (same scales, kv_maxq=7);
  3. in-kernel decode write: nibbles land at the right (row, plane) and
     mate nibbles survive;
  4. full-engine greedy parity packed vs emulation, including repeated
     prompts so the radix pool's pack/unpack boundary
     (_store_prompt/_load_prefix) is exercised.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.models.llama import LlamaConfig, init_llama_params
from aurora_tpu.ops.pallas.ragged_attention import (
    pack_int4_rows, ragged_attention, ragged_decode_attention,
    unpack_int4_rows)
from aurora_tpu.serve.engine import EngineConfig
from tests.test_quant_quality import _divergence, _engine_greedy


def _grid_kv(rng, L, B, Hkv, S, hd):
    kf = rng.standard_normal((L, B, Hkv, S, hd)).astype(np.float32)
    ks = np.maximum(np.abs(kf).max(-1), 1e-8) / 7.0
    k4 = np.clip(np.round(kf / ks[..., None]), -7, 7).astype(np.int8)
    return k4, ks


def test_pack_round_trip():
    rng = np.random.default_rng(0)
    k4 = rng.integers(-7, 8, size=(2, 3, 2, 512, 128)).astype(np.int8)
    pk = pack_int4_rows(jnp.asarray(k4))
    assert pk.shape == (2, 3, 2, 256, 128)
    np.testing.assert_array_equal(np.asarray(unpack_int4_rows(pk)), k4)


def test_packed_extend_parity():
    rng = np.random.default_rng(3)
    L, B, Hkv, S, hd, G, T = 2, 3, 2, 512, 128, 2, 7
    k4, ks = _grid_kv(rng, L, B, Hkv, S, hd)
    v4, vs = _grid_kv(rng, L, B, Hkv, S, hd)
    pk, pv = pack_int4_rows(jnp.asarray(k4)), pack_int4_rows(jnp.asarray(v4))
    q = jnp.asarray(rng.standard_normal((B, T, Hkv * G, hd)), jnp.float32)
    lens = jnp.asarray([300, 512, 9], jnp.int32)
    offs, rows = lens - T, jnp.arange(B, dtype=jnp.int32)
    want = ragged_attention(q, jnp.asarray(k4), jnp.asarray(v4), lens,
                            offs, rows, layer=1, chunk=256,
                            k_scales=jnp.asarray(ks),
                            v_scales=jnp.asarray(vs))
    got = ragged_attention(q, pk, pv, lens, offs, rows, layer=1,
                           chunk=256, k_scales=jnp.asarray(ks),
                           v_scales=jnp.asarray(vs), kv_pack=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_packed_decode_parity_and_write():
    rng = np.random.default_rng(7)
    L, B, Hkv, S, hd, G = 2, 3, 2, 512, 128, 2
    k4, ks = _grid_kv(rng, L, B, Hkv, S, hd)
    v4, vs = _grid_kv(rng, L, B, Hkv, S, hd)
    pk, pv = pack_int4_rows(jnp.asarray(k4)), pack_int4_rows(jnp.asarray(v4))
    lens = jnp.asarray([300, 512, 9], jnp.int32)  # hi-plane, tail, lo
    rows = jnp.arange(B, dtype=jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, 1, Hkv * G, hd)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    want, k8b, v8b, ksb, _ = ragged_decode_attention(
        q, k_new, v_new, jnp.asarray(k4), jnp.asarray(v4), lens, rows,
        layer=1, chunk=256, k_scales=jnp.asarray(ks),
        v_scales=jnp.asarray(vs), kv_maxq=7.0)
    got, pkb, pvb, ksb2, _ = ragged_decode_attention(
        q, k_new, v_new, pk, pv, lens, rows, layer=1, chunk=256,
        k_scales=jnp.asarray(ks), v_scales=jnp.asarray(vs),
        kv_maxq=7.0, kv_pack=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
    # the written nibble pattern matches the unpacked kernel's write,
    # byte-mates and other layers untouched
    np.testing.assert_array_equal(np.asarray(unpack_int4_rows(pkb[1])),
                                  np.asarray(k8b[1]))
    np.testing.assert_array_equal(np.asarray(unpack_int4_rows(pvb[1])),
                                  np.asarray(v8b[1]))
    np.testing.assert_allclose(np.asarray(ksb2), np.asarray(ksb), atol=0)
    np.testing.assert_array_equal(np.asarray(pkb[0]), np.asarray(pk[0]))


N_SEQ, SEQ_LEN, N_NEW = 6, 48, 24


def test_engine_packed_matches_emulation(monkeypatch):
    """Full serving path: kv_quant='int4' (packed rows, pool pack/unpack
    boundary) vs the int4-grid EMULATION (int8 storage, AURORA_KV_BITS=4)
    — same grid, so greedy outputs agree up to the packed kernel's
    half-chunk accumulation order. Prompts repeat so the radix path
    (_store_prompt → _load_prefix) runs through the packed rows."""
    cfg = LlamaConfig.tiny(vocab_size=256)
    params = init_llama_params(jax.random.PRNGKey(11), cfg,
                               dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=4, max_seq_len=96, num_slots=512,
                        prefill_buckets=(32, 64), kv_dtype=jnp.float32)
    rng = np.random.default_rng(13)
    base = rng.integers(3, 256, size=(N_SEQ // 2, SEQ_LEN))
    seqs = np.concatenate([base, base])     # repeats hit the radix cache
    try:
        monkeypatch.setenv("AURORA_KV_BITS", "4")
        jax.clear_caches()
        emu = _engine_greedy(params, cfg,
                             dc.replace(ecfg, kv_quant="int8"),
                             seqs, N_NEW)
        monkeypatch.delenv("AURORA_KV_BITS")
        jax.clear_caches()
        packed = _engine_greedy(params, cfg,
                                dc.replace(ecfg, kv_quant="int4"),
                                seqs, N_NEW)
    finally:
        jax.clear_caches()
    m, d = _divergence(emu, packed)
    # same quantization grid — only dot-order noise separates them
    assert m >= 0.90 and d < 0.01, (m, d)


def test_engine_int4_row_sizing():
    """int4 rows allocate S/2 value rows, full-S scales, and s_row
    rounds to the 256-token packing segment."""
    cfg = LlamaConfig.tiny(vocab_size=256)
    params = init_llama_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.float32)
    from aurora_tpu.serve.engine import ServeEngine
    eng = ServeEngine(params, cfg,
                      EngineConfig(max_batch=2, max_seq_len=96,
                                   num_slots=64, prefill_buckets=(32,),
                                   kv_dtype=jnp.float32,
                                   kv_quant="int4"))
    assert eng.ecfg.s_row == 256
    assert eng.rows["k"].shape[3] == 128
    assert eng.rows["ks"].shape[3] == 256
