"""Fused W4 MLP Pallas kernel (ops/pallas/quant_matmul.py fused_mlp_w4):
gateup + silu·mul + down in ONE kernel — interpret-mode parity on CPU.

The gate/up half must match the engine's _w4dot decode recipe EXACTLY
(same per-token A8 activations, same grouped int4 weights, f32 partial
rescale); the down projection runs W4A16 (bf16 act × in-VMEM dequant),
so the end-to-end check is tolerance-based against an exact-dequant
reference of the same recipe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _mk(rng, D=256, I=512, g=128):
    """Random gateup/down W4 trees in the engine's flat layout."""
    from aurora_tpu.serve.engine import _w4
    wgu = jnp.asarray(rng.standard_normal((1, D, 2 * I)) * 0.05,
                      jnp.float32)
    wdn = jnp.asarray(rng.standard_normal((1, I, D)) * 0.05, jnp.float32)
    gu_pk, gu_s = _w4(wgu, group=g)
    dn_pk, dn_s = _w4(wdn, group=g)
    return (gu_pk[0], gu_s[0], dn_pk[0], dn_s[0])


def _dequant(pk, s):
    """Exact grouped dequantization (engine _w4dot prefill recipe)."""
    p = np.asarray(pk).astype(np.int8)
    lo = np.right_shift(np.left_shift(p, 4), 4)
    hi = np.right_shift(p, 4)
    G, gh, O = p.shape
    q = np.zeros((G, 2 * gh, O), np.float32)
    q[:, 0::2] = lo
    q[:, 1::2] = hi
    return (q * np.asarray(s)).reshape(G * 2 * gh, O)


def test_mlp_tile_layout_roundtrip(rng):
    """untile(tile(x)) == x byte-for-byte, incl. a stacked layer dim."""
    from aurora_tpu.ops.pallas.quant_matmul import (w4_mlp_tile_layout,
                                                    w4_mlp_untile_layout)
    gu_pk, gu_s, dn_pk, dn_s = _mk(rng)
    stk = lambda a: jnp.stack([a, a + (1 if a.dtype == jnp.int8 else 0.5)])
    mgu, mgs, mdw, mds = w4_mlp_tile_layout(
        stk(gu_pk), stk(gu_s), stk(dn_pk), stk(dn_s), ti=256)
    assert mgu.shape[0] == 2 and mdw.shape[0] == 2
    for l in range(2):
        b_gu, b_gs, b_dn, b_ds = w4_mlp_untile_layout(
            mgu[l], mgs[l], mdw[l], mds[l])
        want = (stk(gu_pk)[l], stk(gu_s)[l], stk(dn_pk)[l], stk(dn_s)[l])
        for got, ref in zip((b_gu, b_gs, b_dn, b_ds), want):
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(ref))


def test_fused_mlp_matches_reference_recipe(rng):
    """fused_mlp_w4 == silu(A8-gateup) · up @ dequant(down) within bf16
    tolerance; gate/up numerics are the _w4dot decode branch's."""
    from aurora_tpu.ops.pallas.quant_matmul import (fused_mlp_w4,
                                                    w4_mlp_tile_layout)
    from aurora_tpu.serve.engine import _w4dot

    D, I, B = 256, 512, 5
    gu_pk, gu_s, dn_pk, dn_s = _mk(rng, D=D, I=I)
    h = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    gu = np.asarray(_w4dot(h, gu_pk, gu_s), np.float32)   # exact A8 ref
    gate, up = gu[:, :I], gu[:, I:]
    act = (gate / (1.0 + np.exp(-gate))) * up
    act = np.asarray(jnp.asarray(act, jnp.bfloat16), np.float32)
    want = act @ _dequant(dn_pk, dn_s)

    tiles = w4_mlp_tile_layout(gu_pk, gu_s, dn_pk, dn_s, ti=256)
    got = fused_mlp_w4(h, *tiles, out_dtype=jnp.float32, interpret=True)
    assert got.shape == (B, D)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05,
                               atol=0.05)


def test_fused_mlp_multi_tile_and_bf16_out(rng):
    """Ib > 1 accumulation across grid steps + bf16 output dtype + a
    batch that is not a sublane multiple."""
    from aurora_tpu.ops.pallas.quant_matmul import (fused_mlp_w4,
                                                    w4_mlp_tile_layout)
    D, I, B = 256, 1024, 3                      # Ib = 4 at ti=256
    gu_pk, gu_s, dn_pk, dn_s = _mk(rng, D=D, I=I)
    h = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
    tiles = w4_mlp_tile_layout(gu_pk, gu_s, dn_pk, dn_s, ti=256)
    got = fused_mlp_w4(h, *tiles, interpret=True)
    assert got.shape == (B, D) and got.dtype == jnp.bfloat16
    assert not np.any(np.isnan(np.asarray(got, np.float32)))
