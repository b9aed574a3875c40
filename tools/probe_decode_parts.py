"""Decode-block additive decomposition on real TPU.

block(17.69 ms/step measured) =? weights(9.5, probed) + attention(?)
+ sampling/lm_head/norms(?). Measures, at the exact b8/ctx1k decode
shapes (s_row 1280, chunk 256, int8 KV + scales):

  A  attention-only: 32-layer scan of ragged_decode_attention with the
     fused write (aliased donation, like the engine)
  B  lm_head+sample-only: greedy argmax over [8, 32000] int8 W8A8 head
  C  norms+rope+residual-only scan (no weights, no attention)

Usage: python tools/probe_decode_parts.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(tag, fn, iters=8):
    r = fn()
    jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"[parts] {tag}: {ms:.2f} ms/step", file=sys.stderr)
    return ms


def main():
    from aurora_tpu.ops.pallas.ragged_attention import (
        ragged_decode_attention)

    L, B, Hq, Hkv, hd, S = 32, 8, 32, 32, 128, 1280
    D, V = 4096, 32000
    rng = np.random.default_rng(0)

    rows = {
        "k": jnp.zeros((L, B, Hkv, S, hd), jnp.int8),
        "v": jnp.zeros((L, B, Hkv, S, hd), jnp.int8),
        "ks": jnp.ones((L, B, Hkv, S), jnp.float32),
        "vs": jnp.ones((L, B, Hkv, S), jnp.float32),
    }
    kv_lens = jnp.asarray([1030] * B, jnp.int32)
    row_ids = jnp.arange(B, dtype=jnp.int32)

    # A: attention-only scan (fused write+attend per layer, aliased
    # rows) — chunk sweep: _fit_chunk pairs hb 32/16/8/8 with chunk
    # 256/512/1024/1280 (fatter chunks = bigger DMA bursts, fewer
    # cells; more heads/block = fewer grid cells)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, hd)) * 0.1,
                    jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((B, Hkv, hd)) * 0.1,
                     jnp.bfloat16)
    v1 = jnp.asarray(rng.standard_normal((B, Hkv, hd)) * 0.1,
                     jnp.bfloat16)

    for ck in (256, 512, 1024, 1280):
        if S % ck:
            continue

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("ck",))
        def attn_scan(rows, q, k1, v1, ck):
            def body(r, l):
                res = ragged_decode_attention(
                    q, k1, v1, r["k"], r["v"], kv_lens, row_ids,
                    layer=l, chunk=ck, k_scales=r["ks"],
                    v_scales=r["vs"])
                attn, r["k"], r["v"] = res[0], res[1], res[2]
                r["ks"], r["vs"] = res[3], res[4]
                return r, attn[..., 0, 0]
            r, outs = jax.lax.scan(body, rows, jnp.arange(L))
            return r, outs

        def run_a():
            nonlocal rows
            rows, outs = attn_scan(rows, q, k1, v1, ck=ck)
            return outs
        timed(f"A_attention_32L_chunk{ck}", run_a)

    # B: lm_head (int8) + greedy sample
    head = jnp.asarray(rng.integers(-127, 128, size=(D, V)), jnp.int8)
    hs = jnp.ones((V,), jnp.float32) * 0.01
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)

    @jax.jit
    def head_sample(x, head, hs):
        xf = x.astype(jnp.float32)
        s_a = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1,
                                  keepdims=True) / 127.0, 1e-12)
        x8 = jnp.clip(jnp.round(xf / s_a), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8, head, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        logits = acc.astype(jnp.float32) * s_a * hs
        lp = jax.nn.log_softmax(logits, axis=-1)
        g = jnp.argmax(logits, axis=-1)
        return g, jnp.take_along_axis(lp, g[:, None], axis=-1)
    timed("B_lmhead_sample", lambda: head_sample(x, head, hs))

    # C: norms + rope + residual scan, no weights/attention
    from aurora_tpu.ops.norms import rms_norm
    from aurora_tpu.ops.rope import apply_rope, rope_cos_sin
    w = jnp.ones((L, D), jnp.bfloat16)
    pos = jnp.asarray([[1030]] * B, jnp.int32)

    @jax.jit
    def vpu_scan(x, w, pos):
        cos, sin = rope_cos_sin(pos, hd, 10000.0, None,
                                dtype=jnp.float32)

        def body(h, wl):
            a = rms_norm(h, wl, 1e-5)
            qh = a.reshape(B, 1, Hq, hd)
            qr, _ = apply_rope(qh, qh[:, :, :Hkv], cos, sin)
            h = h + qr.reshape(B, 1, -1)[:, 0] * 1e-3
            a2 = rms_norm(h, wl, 1e-5)
            return (h + a2 * 1e-3).astype(h.dtype), None
        h, _ = jax.lax.scan(body, x, w)
        return h
    timed("C_norms_rope_32L", lambda: vpu_scan(x, w, pos))

    print("PARTS DONE", file=sys.stderr)


if __name__ == "__main__":
    main()
