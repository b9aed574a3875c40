"""W8 matmul-variant shootout on TPU: why is the decode weight stream
2x off speed-of-light?

Times a 32-layer scan of the 7B's 7 matmuls at decode batch (B=8) for:
  w8a8     : current engine path — dynamic int8 activations, int8xint8
             MXU dot, fp32 rescale (serve/engine.py:_wdot)
  w8_deq   : int8 weights dequantized IN the dot (h_bf16 @ (w_i8 * s))
             — XLA fuses convert+scale into the HBM read if it can
  w8_mixed : bf16 h x int8 w via dot_general with f32 accumulation
  bf16     : plain bf16 weights (2x the bytes — the baseline stream)

Usage: python tools/bench_wdot.py [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--block_n", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aurora_tpu.models.llama import LlamaConfig, init_llama_params
    from aurora_tpu.serve.engine import quantize_weights_int8, _wdot

    cfg = LlamaConfig.vicuna_7b_v15_16k()
    B = args.batch
    out = {"B": B}

    NAMES = ("q", "k", "v", "o", "gate", "up", "down")

    def body_with(dot):
        def body(h, lp):
            s = (dot(h, lp, "q") + dot(h, lp, "k") + dot(h, lp, "v")
                 + dot(h, lp, "o"))
            g = dot(h, lp, "gate")
            u = dot(h, lp, "up")
            h = (h + s + dot(jax.nn.silu(g) * u, lp, "down")
                 ).astype(h.dtype)
            return h, None
        return body

    def timed(tag, fn, *a):
        f = jax.jit(fn)
        r = f(*a)
        jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(*a)
        jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        out[tag + "_ms"] = round(ms, 2)
        print(f"[wdot] {tag}: {ms:.2f} ms", file=sys.stderr)

    x = jnp.zeros((B, cfg.hidden_size), jnp.bfloat16)

    # --- bf16 baseline (13.5GB stream) ----------------------------------
    params = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    def dot_bf16(h, lp, name):
        return jnp.dot(h, lp[name],
                       preferred_element_type=jnp.float32).astype(h.dtype)

    timed("bf16", lambda p, x: jax.lax.scan(
        body_with(dot_bf16), x, p["layers"])[0], params, x)

    # --- int8 variants (6.75GB stream) ----------------------------------
    qparams = quantize_weights_int8(params, free_source=True)
    del params

    timed("w8a8", lambda p, x: jax.lax.scan(
        body_with(_wdot), x, p["layers"])[0], qparams, x)

    def dot_deq(h, lp, name):
        w = (lp[name].astype(h.dtype)
             * lp[name + "_scale"].astype(h.dtype))
        return jnp.dot(h, w,
                       preferred_element_type=jnp.float32).astype(h.dtype)

    timed("w8_deq", lambda p, x: jax.lax.scan(
        body_with(dot_deq), x, p["layers"])[0], qparams, x)

    def dot_mixed(h, lp, name):
        acc = jax.lax.dot_general(
            h.astype(jnp.bfloat16), lp[name],
            (((h.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (acc * lp[name + "_scale"]).astype(h.dtype)

    timed("w8_mixed", lambda p, x: jax.lax.scan(
        body_with(dot_mixed), x, p["layers"])[0], qparams, x)

    # --- fused qkv + gateup streams (4 matmuls/layer instead of 7) ----
    from aurora_tpu.serve.engine import fuse_serving_weights
    fparams = fuse_serving_weights(qparams)

    def fused_body(h, lp):
        qkv = _wdot(h, lp, "qkv")
        d = cfg.hidden_size
        s = (qkv[..., :d] + qkv[..., d:2 * d] + qkv[..., 2 * d:]
             + _wdot(h, lp, "o"))
        gu = _wdot(h, lp, "gateup")
        inter = gu.shape[-1] // 2
        h = (h + s + _wdot(jax.nn.silu(gu[..., :inter])
                           * gu[..., inter:], lp, "down")).astype(h.dtype)
        return h, None

    timed("w8a8_fused", lambda p, x: jax.lax.scan(
        fused_body, x, p["layers"])[0], fparams, x)

    # --- Pallas streaming W8A8 kernel (ops/pallas/quant_matmul.py) ----
    from aurora_tpu.ops.pallas.quant_matmul import (w8a8_matmul,
                                                    quantize_activations)

    def pdot(h, lp, name):
        h8, s_a = quantize_activations(h)
        return w8a8_matmul(h8, s_a, lp[name], lp[name + "_scale"],
                           block_n=args.block_n)

    def pallas_body(h, lp):
        qkv = pdot(h, lp, "qkv")
        d = cfg.hidden_size
        s = (qkv[..., :d] + qkv[..., d:2 * d] + qkv[..., 2 * d:]
             + pdot(h, lp, "o"))
        gu = pdot(h, lp, "gateup")
        inter = gu.shape[-1] // 2
        h = (h + s + pdot(jax.nn.silu(gu[..., :inter])
                          * gu[..., inter:], lp, "down")).astype(h.dtype)
        return h, None

    timed("w8a8_pallas", lambda p, x: jax.lax.scan(
        pallas_body, x, p["layers"])[0], fparams, x)

    # --- int4 weight-only variants (3.24GB packed stream) -------------
    # jnp.int4 arrays cannot cross a jit boundary on the axon backend
    # (device_put recursion), so production uses NIBBLE-PACKED int8
    # (serve/engine.py quantize_weights_int4). Two consumers:
    #   w4_xla    — engine _w4dot decode path (G-batched int8 dot; XLA
    #               materializes the unpacked planes through HBM)
    #   w4_pallas — ops/pallas/quant_matmul.w4a16_matmul (unpack+dequant
    #               in VMEM; HBM reads the packed bytes only)
    bytes_w8 = sum(v.nbytes for k, v in qparams["layers"].items()
                   if k in NAMES)
    del qparams
    from aurora_tpu.serve.engine import _w4, _w4dot
    from aurora_tpu.ops.pallas.quant_matmul import w4a16_matmul

    w4layers = {}
    for k in list(fparams["layers"].keys()):
        v = fparams["layers"][k]
        if v is not None and v.dtype == jnp.int8:
            # int8 values quantize layer-by-layer inside _w4 (timing
            # only — a full fp32 dequant next to the resident int8
            # stream would OOM the chip)
            w4layers[k], w4layers[k + "_scale4"] = _w4(v)
            fparams["layers"][k] = None
    w4params = {"layers": w4layers}
    del fparams

    d = cfg.hidden_size

    def body4_with(dot):
        def body(h, lp):
            qkv = dot(h, lp["qkv"], lp["qkv_scale4"])
            s = (qkv[..., :d] + qkv[..., d:2 * d] + qkv[..., 2 * d:]
                 + dot(h, lp["o"], lp["o_scale4"]))
            gu = dot(h, lp["gateup"], lp["gateup_scale4"])
            inter = gu.shape[-1] // 2
            h = (h + s + dot(jax.nn.silu(gu[..., :inter])
                             * gu[..., inter:], lp["down"],
                             lp["down_scale4"])).astype(h.dtype)
            return h, None
        return body

    try:
        timed("w4_xla", lambda p, x: jax.lax.scan(
            body4_with(_w4dot), x, p["layers"])[0], w4params, x)
    except Exception as e:  # noqa: BLE001
        out["w4_xla_error"] = str(e)[:160]

    def dot_pl(h, pk, s):
        return w4a16_matmul(h, pk, s, block_n=args.block_n)

    try:
        timed("w4_pallas", lambda p, x: jax.lax.scan(
            body4_with(dot_pl), x, p["layers"])[0], w4params, x)
    except Exception as e:  # noqa: BLE001
        out["w4_pallas_error"] = str(e)[:160]

    # w4a8 grouped streaming kernel (the decode-path candidate): in-VMEM
    # unpack via <<4, per-group int8 MXU dots, f32 partial rescale
    from aurora_tpu.ops.pallas.quant_matmul import w4a8_matmul
    for bn in (256, 512, 1024):
        def dot_a8(h, pk, s, bn=bn):
            return w4a8_matmul(h, pk, s, block_n=bn)
        try:
            timed(f"w4a8_pallas_bn{bn}", lambda p, x: jax.lax.scan(
                body4_with(dot_a8), x, p["layers"])[0], w4params, x)
        except Exception as e:  # noqa: BLE001
            out[f"w4a8_pallas_bn{bn}_error"] = str(e)[:160]

    bytes_w4 = sum(v.nbytes for k, v in w4params["layers"].items()
                   if not k.endswith("_scale4"))
    out["w4_stream_gb"] = round(bytes_w4 / 1e9, 2)
    out["w4_sol_ms_at_820gbps"] = round(bytes_w4 / 820e9 * 1e3, 2)

    # theoretical bounds for context
    out["w8_stream_gb"] = round(bytes_w8 / 1e9, 2)
    out["sol_ms_at_820gbps"] = round(bytes_w8 / 820e9 * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
