"""Sequence-parallel attention tests on the virtual 8-device CPU mesh —
distributed coverage the reference never had in CI (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aurora_tpu.ops.attention import mha_reference
from aurora_tpu.parallel.mesh import MeshConfig, create_mesh
from aurora_tpu.parallel.ring import (ring_mha, zigzag_split,
                                      zigzag_unsplit)
from aurora_tpu.parallel.ulysses import ulysses_mha


def _qkv(rng, B=2, T=32, H=8, D=16):
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    return mk(), mk(), mk()


def _sp_mesh(devices, sp):
    return create_mesh(MeshConfig(dp=len(devices) // sp, sp=sp),
                       devices=devices)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_matches_reference(devices, rng, causal):
    mesh = _sp_mesh(devices, 4)
    q, k, v = _qkv(rng)
    want = mha_reference(q, k, v, causal=causal)
    got = ulysses_mha(q, k, v, mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ulysses_inner_sp_head_split(devices, rng):
    """sp=4, heads=2 → insp=2 head-dim-split path
    (reference attention.py:24-93)."""
    mesh = _sp_mesh(devices, 4)
    q, k, v = _qkv(rng, H=2, D=16)
    want = mha_reference(q, k, v, causal=True)
    got = ulysses_mha(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ulysses_segment_ids(devices, rng):
    mesh = _sp_mesh(devices, 4)
    q, k, v = _qkv(rng)
    seg = jnp.asarray(np.repeat([[0, 1, 2, 3]], 8, axis=1).reshape(1, 32))
    seg = jnp.broadcast_to(seg, (2, 32))
    want = mha_reference(q, k, v, causal=True, q_segment_ids=seg,
                         kv_segment_ids=seg)
    got = ulysses_mha(q, k, v, mesh, causal=True, q_segment_ids=seg,
                      kv_segment_ids=seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ulysses_grads_match(devices, rng):
    mesh = _sp_mesh(devices, 4)
    q, k, v = _qkv(rng, T=16)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    def loss_sp(q, k, v):
        return jnp.sum(ulysses_mha(q, k, v, mesh, causal=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_reference(devices, rng, causal):
    mesh = _sp_mesh(devices, 4)
    q, k, v = _qkv(rng)
    want = mha_reference(q, k, v, causal=causal)
    got = ring_mha(q, k, v, mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_zigzag_matches_reference(devices, rng):
    sp = 4
    mesh = _sp_mesh(devices, sp)
    q, k, v = _qkv(rng)
    want = mha_reference(q, k, v, causal=True)
    qz, kz, vz = (zigzag_split(t, sp) for t in (q, k, v))
    got_z = ring_mha(qz, kz, vz, mesh, causal=True, layout="zigzag")
    got = zigzag_unsplit(got_z, sp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_zigzag_split_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 3)), jnp.float32)
    y = zigzag_unsplit(zigzag_split(x, 4), 4)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_ring_grads_match(devices, rng):
    mesh = _sp_mesh(devices, 4)
    q, k, v = _qkv(rng, T=16)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(ring_mha(q, k, v, mesh, causal=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_rg = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_rg, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("ulysses", [2, 4])
@pytest.mark.parametrize("causal", [False, True])
def test_hybrid_ulysses_ring_matches_reference(devices, rng, ulysses,
                                               causal):
    """LongContextAttention parity (yunchang hybrid/attn_layer.py)."""
    from aurora_tpu.parallel.hybrid import hybrid_mha
    mesh = _sp_mesh(devices, 8)
    q, k, v = _qkv(rng, T=32, H=8)
    want = mha_reference(q, k, v, causal=causal)
    got = hybrid_mha(q, k, v, mesh, ulysses=ulysses, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_hybrid_grads_match(devices, rng):
    from aurora_tpu.parallel.hybrid import hybrid_mha
    mesh = _sp_mesh(devices, 8)
    q, k, v = _qkv(rng, T=16, H=8)

    g_ref = jax.grad(lambda q, k, v: jnp.sum(
        mha_reference(q, k, v, causal=True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g_h = jax.grad(lambda q, k, v: jnp.sum(
        hybrid_mha(q, k, v, mesh, ulysses=2, causal=True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_h, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_moe_expert_parallel_sharding(devices, rng):
    """MoE llama forward with experts sharded on 'tp' (EP) matches the
    replicated result."""
    import dataclasses
    from jax.sharding import NamedSharding
    from aurora_tpu.models.llama import (LlamaConfig, init_llama_params,
                                         llama_apply)
    from aurora_tpu.parallel.mesh import llama_param_specs, shard_pytree

    cfg = dataclasses.replace(LlamaConfig.tiny(), num_experts=4,
                              num_experts_per_tok=2)
    params = init_llama_params(jax.random.PRNGKey(11), cfg)
    ids = jnp.asarray(rng.integers(3, 250, size=(4, 12)))
    want, _ = llama_apply(params, cfg, input_ids=ids)

    mesh = create_mesh(MeshConfig(dp=2, fsdp=2, tp=2), devices=devices)
    specs = llama_param_specs(params)
    # experts must actually shard on tp
    assert specs["layers"]["moe_gate"] == P(None, "tp", "fsdp", None)
    sharded = shard_pytree(params, specs, mesh)
    got, _ = llama_apply(sharded, cfg,
                         input_ids=jax.device_put(
                             ids, NamedSharding(mesh, P(("dp", "fsdp")))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Flash-based ring: varlen (llama3 all-gather-KV) + zigzag hybrid
# (round-2: yunchang llama3_flash_attn_varlen + zigzag parity)
# ---------------------------------------------------------------------------

def test_ring_varlen_matches_reference(devices, rng):
    """Packed segments under ring SP (llama3 all-gather-KV layout)."""
    from aurora_tpu.parallel.ring import ring_varlen_mha
    mesh = _sp_mesh(devices, 4)
    q, k, v = _qkv(rng)
    seg = jnp.asarray(np.repeat([0, 1, 2, 3], 8)[None].repeat(2, 0))
    want = mha_reference(q, k, v, causal=True, q_segment_ids=seg,
                         kv_segment_ids=seg)
    got = ring_varlen_mha(q, k, v, seg, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_ring_varlen_heads_k_stride(devices, rng):
    """Bounded all-gather (heads_k_stride < Hkv) must not change results."""
    from aurora_tpu.parallel.ring import ring_varlen_mha
    mesh = _sp_mesh(devices, 4)
    q, k, v = _qkv(rng)
    seg = jnp.asarray(np.repeat([0, 0, 1, 1], 8)[None].repeat(2, 0))
    full = ring_varlen_mha(q, k, v, seg, mesh, causal=True)
    strided = ring_varlen_mha(q, k, v, seg, mesh, causal=True,
                              heads_k_stride=2)
    np.testing.assert_allclose(np.asarray(strided), np.asarray(full),
                               rtol=2e-3, atol=2e-3)


def test_ring_varlen_grads(devices, rng):
    from aurora_tpu.parallel.ring import ring_varlen_mha
    mesh = _sp_mesh(devices, 4)
    q, k, v = _qkv(rng, T=32)
    seg = jnp.asarray(np.repeat([0, 1], 16)[None].repeat(2, 0))

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True,
                                     q_segment_ids=seg,
                                     kv_segment_ids=seg) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(ring_varlen_mha(q, k, v, seg, mesh,
                                       causal=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_rg = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_rg, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_hybrid_zigzag_matches_reference(devices, rng):
    """Zigzag causal load balance inside the hybrid ring (round-1 verdict:
    hybrid was contiguous-only)."""
    from aurora_tpu.parallel.hybrid import hybrid_mha
    mesh = _sp_mesh(devices, 8)
    q, k, v = _qkv(rng, T=64)
    want = mha_reference(q, k, v, causal=True)
    r = 4  # ring degree = sp / ulysses
    qz, kz, vz = (zigzag_split(t, r) for t in (q, k, v))
    got_z = hybrid_mha(qz, kz, vz, mesh, ulysses=2, causal=True,
                       layout="zigzag")
    got = zigzag_unsplit(got_z, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_hybrid_varlen_matches_reference(devices, rng):
    from aurora_tpu.parallel.hybrid import hybrid_varlen_mha
    mesh = _sp_mesh(devices, 8)
    q, k, v = _qkv(rng, T=64)
    seg = jnp.asarray(np.repeat([0, 1, 2, 3], 16)[None].repeat(2, 0))
    want = mha_reference(q, k, v, causal=True, q_segment_ids=seg,
                         kv_segment_ids=seg)
    got = hybrid_varlen_mha(q, k, v, seg, mesh, ulysses=2, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_ring_gqa_kv_heads(devices, rng):
    """The ring rotates COMPACT kv heads (no pre-repeat) — GQA parity."""
    mesh = _sp_mesh(devices, 4)
    B, T, H, Hkv, D = 2, 32, 8, 2, 16
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    kr = jnp.repeat(k, H // Hkv, axis=2)
    vr = jnp.repeat(v, H // Hkv, axis=2)
    want = mha_reference(q, kr, vr, causal=True)
    got = ring_mha(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_ring_stripe_matches_reference(devices, rng):
    """Stripe causal load balance (yunchang stripe_flash_attn.py parity):
    token g on device g mod sp; causal collapses to two flash cases."""
    from aurora_tpu.parallel.ring import stripe_split, stripe_unsplit
    mesh = _sp_mesh(devices, 4)
    q, k, v = _qkv(rng)
    want = mha_reference(q, k, v, causal=True)
    qs, ks, vs = (stripe_split(t, 4) for t in (q, k, v))
    got_s = ring_mha(qs, ks, vs, mesh, causal=True, layout="stripe")
    got = stripe_unsplit(got_s, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_stripe_split_roundtrip(rng):
    from aurora_tpu.parallel.ring import stripe_split, stripe_unsplit
    x = jnp.asarray(rng.standard_normal((2, 24, 3)))
    np.testing.assert_array_equal(
        np.asarray(stripe_unsplit(stripe_split(x, 4), 4)), np.asarray(x))
