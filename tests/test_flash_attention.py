"""Pallas flash attention kernel parity (interpret mode on CPU) —
values and gradients vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.ops.attention import mha_reference
from aurora_tpu.ops.pallas.flash_attention import flash_attention


def _qkv(rng, B=1, T=160, S=None, H=2, Hkv=None, D=128):
    S = S or T
    Hkv = Hkv or H
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t", [128, 160, 300])
def test_flash_forward_matches_reference(rng, causal, t):
    q, k, v = _qkv(rng, T=t)
    want = mha_reference(q, k, v, causal=causal)
    got = flash_attention(q, k, v, causal=causal, block_q=128,
                          block_kv=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_gqa(rng):
    q, k, v = _qkv(rng, T=160, H=4, Hkv=2)
    want = mha_reference(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, block_q=128, block_kv=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_q_offset_decode_extend(rng):
    """Chunked prefill: q is the tail of the sequence (offset into kv)."""
    q, k, v = _qkv(rng, T=256)
    off = 128
    q_tail = q[:, off:]
    want = mha_reference(q_tail, k, v, causal=True, q_offset=off)
    got = flash_attention(q_tail, k, v, causal=True, q_offset=off,
                          block_q=128, block_kv=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_segment_ids_varlen(rng):
    q, k, v = _qkv(rng, T=256)
    seg = np.zeros((1, 256), np.int32)
    seg[0, 100:180] = 1
    seg[0, 180:] = 2
    seg = jnp.asarray(seg)
    want = mha_reference(q, k, v, causal=True, q_segment_ids=seg,
                         kv_segment_ids=seg)
    got = flash_attention(q, k, v, causal=True, q_segment_ids=seg,
                          kv_segment_ids=seg, block_q=128, block_kv=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grads_match_reference(rng, causal):
    q, k, v = _qkv(rng, T=160)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal,
                                       block_q=128, block_kv=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=causal) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name}")


def test_flash_grads_with_segments(rng):
    q, k, v = _qkv(rng, T=160)
    seg = np.zeros((1, 160), np.int32)
    seg[0, 90:] = 1
    seg = jnp.asarray(seg)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
            block_q=128, block_kv=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True,
                                     q_segment_ids=seg,
                                     kv_segment_ids=seg) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
