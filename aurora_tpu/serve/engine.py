"""Continuous-batching serving engine (the sglang-SRT equivalent).

Replaces the reference's ModelRunner + RadixAttention + CUDA-graph decode
(src/sglang/python/sglang/srt/model_executor/model_runner.py:486-584,
srt/layers/radix_attention.py:31-218, cuda_graph_runner.py) with compiled
XLA programs over ROW-CONTIGUOUS per-request KV:

  * Each running request owns one row of a [L, B, Hkv, S, hd] KV buffer.
    Attention (both EXTEND and DECODE) runs through the Pallas ragged
    paged-attention kernel (ops/pallas/ragged_attention.py), which streams
    each row's contiguous KV stripe at HBM bandwidth and clamps reads to
    the row's live length — the TPU-native answer to paged attention
    (the reference gets this from FlashInfer/Triton,
    srt/layers/triton_attention/decode_attention.py:1-649).
  * EXTEND is BATCHED: all admitted requests in a wave run through ONE
    kernel call (lanes indexed by row_ids / q_offsets), tp_worker.py
    get_new_prefill_batch/forward_prefill_batch parity (:411-570); only
    oversize prompts fall back to per-request chunked prefill.
  * DECODE is one compiled program for the whole batch with sampling FUSED
    in: per-row temperature/top-k/top-p/min-p, frequency/presence/
    repetition penalties over on-device token histograms, and per-token
    logprobs — the full sampler surface (srt/layers/sampler.py:1-181 +
    srt/sampling/penaltylib parity) with zero extra device round-trips.
  * The radix prefix cache keeps its own flat slot pool ([L, slots, Hkv,
    hd]); prompt KV is copied row→pool at release (best-effort insert) and
    pool→row at admit on a prefix hit. Decode tokens never touch the pool,
    so decoding allocates nothing.

Static [max_batch, S_row] shapes → ONE compiled decode program replayed
every step (the role CUDA graphs play in the reference, free under XLA).
KV buffers are threaded functionally through the steps with donated
arguments, so updates are in-place on device.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.models.llama import LlamaConfig
from aurora_tpu.ops.pallas.ragged_attention import (
    ragged_attention, ragged_decode_attention)
from aurora_tpu.ops.rope import apply_rope, rope_cos_sin
from aurora_tpu.serve.kv_pool import KVPool, SlotAllocator
from aurora_tpu.serve.radix_cache import RadixCache
from aurora_tpu.serve.scheduler import (FinishReason, Request, Scheduler,
                                        SchedulePolicy)

Params = Dict[str, Any]

_TOPK_LOGPROBS = 5  # top-alternatives returned per sampled token
_MAX_TOPK = 256     # sampling candidate bound (see _sample_core)


def _is_system_error(e: BaseException) -> bool:
    """Failures of the DEPLOYMENT (kernel compile errors, device OOM,
    deleted buffers) as opposed to a malformed REQUEST. System errors
    are deterministic for every request, so per-request isolation just
    repeats the failure N times — e.g. a failed Pallas kernel compile
    costs ~20s per attempt through the remote-compile relay while each
    request aborts silently. These must surface to the step() caller."""
    name = type(e).__name__
    if "XlaRuntimeError" in name or "JaxRuntimeError" in name:
        return True
    try:
        return isinstance(e, jax.errors.JaxRuntimeError)
    except AttributeError:  # older jax without the public alias
        return False


def _make_radix(free_slots):
    """Prefer the C++ radix tree (aurora_tpu/native) unless disabled via
    AURORA_NATIVE_RADIX=0; fall back to the pure-Python twin."""
    import os
    if os.environ.get("AURORA_NATIVE_RADIX", "1") != "0":
        try:
            from aurora_tpu.native import NativeRadixCache
            return NativeRadixCache(free_slots=free_slots)
        except Exception:
            pass
    return RadixCache(free_slots=free_slots)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    max_batch: int = 8
    max_seq_len: int = 2048          # per-request KV row capacity
    num_slots: int = 8192            # radix-cache pool (prefix KV only)
    prefill_buckets: Tuple[int, ...] = (32, 128, 512, 2048)
    policy: SchedulePolicy = SchedulePolicy.LPM
    kv_dtype: Any = jnp.bfloat16
    # ragged-kernel KV chunk width: larger chunks amortize grid overhead
    # (measured on v5e at b8/ctx2048: 512→62%, 1024→81%, 2048→90% of HBM
    # speed-of-light) but round short rows' reads UP to a chunk — 1024 is
    # the best compromise for mixed-length serving
    kv_chunk: int = 1024
    # decode steps per host sync: the sampled-token feedback stays on
    # device for K steps, hiding dispatch/transfer latency (sglang
    # --num-continuous-decode-steps analog; valuable when the host↔TPU
    # link has latency). Finish checks lag by <K steps (the extra compute
    # is discarded); constrained requests force K=1.
    decode_steps: int = 1
    # "int8" stores KV as int8 + per-token fp32 scales: half the KV HBM
    # bytes → ~2x batch×context per chip AND ~20% faster per call than
    # bf16 KV (0.44 vs 0.55 ms at b8/ctx1k on v5e; scales apply post-dot
    # along the lane axis so dequant costs nothing).
    # "int4" nibble-packs two tokens per byte (PACK_SEG pairing,
    # ops/pallas/ragged_attention.py) on the 16-level per-token grid —
    # half of int8's KV bytes again. At the benched b20 decode shape the
    # KV read (~8GB/step int8) dwarfs the packed-W4 weight stream, so
    # this is the largest decode-bandwidth lever; measured quality cost
    # sits between int8 KV and W4 weights (tests/test_kv_int4_quality).
    kv_quant: str = "none"
    # "int8" quantizes the LLM weight matrices to int8 + per-output-
    # channel scales at engine init. Decode is weight-bandwidth-bound
    # (the whole model streams from HBM every step), so halving the
    # weight bytes is worth up to ~2x decode throughput; XLA fuses the
    # int8→bf16 convert into the matmul's HBM read. W8 is lossy
    # (per-channel absmax) — outputs may differ at the last bit.
    # "int4" nibble-packs weights with g=128 grouped scales (AWQ/GPTQ
    # analog): ~3.4GB for a 7B, half of W8 — the step runs ~20% slower
    # than W8 (the unpack doesn't fuse into the MXU read) but the freed
    # HBM buys ~1.5x more KV rows, which is the binding constraint on
    # batch (and batch is nearly free in step time). More lossy than W8.
    weight_quant: str = "none"
    # >1 shards params (heads/MLP width) + KV rows (head axis) over a
    # ('tp',) mesh; the compiled steps run under shard_map with two
    # psums/layer (serve/tp.py). Requires tp | num_key_value_heads.
    tp: int = 1
    # True disables prefix caching entirely (sglang --disable-radix-cache
    # → ChunkCache passthrough, chunk_cache.py:1-83): every request
    # prefills from scratch and finished prompts are never copied into
    # the slot pool. Useful when prompts never share prefixes (the
    # radix insert costs one device copy of the prompt KV per request).
    disable_radix_cache: bool = False
    # Extend waves are split into sub-waves of at most this many lanes.
    # Bounds the extend step's activation footprint ([Bk, T, D] embeds +
    # MLP intermediates scale with the LANE bucket, not the row count)
    # and keeps the program inside what the TPU AOT compiler will
    # accept: at Bk=32/T=1408/7B the total program demand exceeded one
    # v5e's HBM and the remote compile helper hard-crashed (exit 1, no
    # diagnostic) instead of reporting the overflow — round-4 driver
    # bench at b22/b19. Two 16-lane waves cost one extra dispatch and
    # compile to exactly the same executables as any other 16-lane wave.
    max_extend_lanes: int = 16

    @property
    def s_row(self) -> int:
        """KV row width: max_seq_len rounded up to a chunk multiple
        (to the 256-token packing segment for int4 KV)."""
        c = min(self.kv_chunk, self.max_seq_len)
        if self.kv_quant == "int4":
            c = max(-(-c // 256) * 256, 256)
        return -(-self.max_seq_len // c) * c


# ---------------------------------------------------------------------------
# HBM profiling + auto-sizing
# (sglang model_runner.py:317-360 profile_max_num_token analog)
# ---------------------------------------------------------------------------

def free_hbm_bytes(device=None) -> Optional[int]:
    """Free accelerator memory right now, or None when the backend does
    not report stats (CPU). Call AFTER weights are resident so the model
    is already accounted in bytes_in_use."""
    if device is None:
        device = jax.devices()[0]
    try:
        stats = device.memory_stats()
        return int(stats["bytes_limit"]) - int(stats["bytes_in_use"])
    except Exception:  # noqa: BLE001 — cpu backend has no stats
        return None


def kv_bytes_per_token_layer(cfg, kv_quant: str, kv_dtype) -> int:
    """K+V bytes for ONE token in ONE layer (incl. int8 scale rows).
    MLA configs cache a single latent vector (no V plane)."""
    hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    planes = 1 if getattr(cfg, "mla_kv_lora_rank", None) else 2
    if kv_quant == "int8":
        return planes * hkv * (hd + 4)            # values + fp32 scales
    if kv_quant == "int4":
        return planes * hkv * (hd // 2 + 4)       # nibble-packed values
    return planes * hkv * hd * jnp.dtype(kv_dtype).itemsize


def row_buffer_bytes(cfg, ecfg: "EngineConfig") -> int:
    """HBM for the per-request contiguous KV rows + sampler histograms."""
    per_tok = kv_bytes_per_token_layer(cfg, ecfg.kv_quant, ecfg.kv_dtype)
    rows = cfg.num_hidden_layers * ecfg.max_batch * ecfg.s_row * per_tok
    hist = ecfg.max_batch * cfg.vocab_size * 5     # counts i32 + seen b8
    return rows + hist


def auto_engine_config(cfg, base: "EngineConfig", *,
                       budget_bytes: Optional[int] = None,
                       mem_fraction: float = 0.85,
                       device=None) -> "EngineConfig":
    """Fill in max_batch (if <=0) and num_slots (if <=0) from profiled
    free HBM. Weights must already be on device (they are subtracted by
    the memory_stats probe itself); falls back to a conservative 4GB
    budget when the backend reports no stats."""
    if budget_bytes is None:
        free = free_hbm_bytes(device)
        budget_bytes = int((free if free is not None else 4.7e9)
                           * mem_fraction)
    out = base
    if out.max_batch <= 0:
        b = 1
        while b < 256:
            probe = dataclasses.replace(out, max_batch=b * 2,
                                        num_slots=1)
            # keep ≥12% of budget for the radix pool + workspace
            if row_buffer_bytes(cfg, probe) > budget_bytes * 0.88:
                break
            b *= 2
        out = dataclasses.replace(out, max_batch=b)
    if out.num_slots <= 0:
        left = budget_bytes - row_buffer_bytes(cfg, out)
        per_slot = (cfg.num_hidden_layers
                    * kv_bytes_per_token_layer(cfg, out.kv_quant,
                                               out.kv_dtype))
        out = dataclasses.replace(
            out, num_slots=int(max(out.max_batch * out.s_row + 1,
                                   left // per_slot)))
    return out


# ---------------------------------------------------------------------------
# Row-KV llama forward
# ---------------------------------------------------------------------------

# Above this many tokens _w4dot switches from the G-batched int8 dot
# (whose [G, N, O] int32 accumulator scales with token count) to
# per-layer bf16 dequantization (prefill is compute-bound anyway).
_W4_GROUPED_MAX_TOKENS = 64


def _w4dot(h, pk, s):
    """h[..., D] @ W4: nibble-packed int4 weights (two input rows per
    int8 byte — even row in the low nibble, odd in the high) with
    per-(input-group, output-channel) scales, g=128 rows/group
    (AWQ/GPTQ-style grouped symmetric quantization; the bitsandbytes-
    4bit / sglang AWQ serving analog).

    pk: [G, g/2, O] int8 packed nibbles; s: [G, 1, O] fp32 scales.
    Decode (few tokens): the contraction runs as a G-batched int8 MXU
    dot (low + high nibble halves, each over the even/odd input rows),
    then the fp32 group scales apply to the per-group partial sums
    before the G-reduction — exact grouped dequantization without
    materializing a dequantized weight copy in HBM. XLA does
    materialize the UNPACKED int8 nibble planes per layer (~100MB
    transient — the shift/mask does not fuse into the matmul read;
    measured), so W4 costs ~20% more step time than W8 while halving
    weight HBM: its value is capacity (batch), not stream speed.

    Prefill/extend (many tokens): the grouped accumulator [G, N, O]
    would be enormous (b24 × ctx1664 × gateup O → ~140GB), and prefill
    is MXU-compute-bound, not weight-stream-bound — so the weights
    dequantize to bf16 per layer (transient ≤ a few hundred MB, freed
    before the next layer) and the dot runs plain bf16. Exact same
    grouped dequant values; no activation quantization on this path.

    pk.ndim == 4 is the TILE-CONTIGUOUS layout (_w4_tile_params /
    ops/pallas/quant_matmul.py w4_tile_layout): decode reads it via the
    tiled Pallas kernel (every weight block one contiguous HBM stripe);
    prefill reconstructs the flat view with a transpose expression
    (noise next to the bf16 dequant transient it already pays)."""
    lead, D = h.shape[:-1], h.shape[-1]
    n_tok = 1
    for dim in lead:
        n_tok *= dim
    if pk.ndim == 4:                       # tiled [Nb, Kb, bk, bn]
        from aurora_tpu.ops.pallas.quant_matmul import (
            w4_untile_layout, w4a8_matmul_tiled)
        if (n_tok <= _W4_GROUPED_MAX_TOKENS
                and os.environ.get("AURORA_W4_PALLAS", "1") != "0"):
            out = w4a8_matmul_tiled(h.reshape(-1, D), pk, s,
                                    out_dtype=h.dtype)
            return out.reshape(*lead, pk.shape[0] * pk.shape[3])
        pk, s = w4_untile_layout(pk, s)
    G, gh, O = pk.shape
    if (n_tok <= _W4_GROUPED_MAX_TOKENS and O % 256 == 0
            and jax.default_backend() == "tpu"
            and os.environ.get("AURORA_W4_PALLAS", "1") != "0"):
        # decode path on real TPU: the grouped streaming Pallas kernel
        # (ops/pallas/quant_matmul.py w4a8_matmul — EXACT same numerics
        # as the int8 branch below, parity-tested) unpacks nibbles in
        # VMEM and applies group scales to int32 partials there, so the
        # unpacked planes never round-trip HBM. TPU-measured on the
        # fused 7B decode stream: 9.2ms vs 13.9ms for the XLA branch
        # (341 vs 233 GB/s); AURORA_W4_PALLAS=0 restores XLA.
        from aurora_tpu.ops.pallas.quant_matmul import w4a8_matmul
        bn = 512 if O % 512 == 0 else 256
        out = w4a8_matmul(h.reshape(-1, D), pk, s, block_n=bn,
                          out_dtype=h.dtype)
        return out.reshape(*lead, O)
    four = jnp.int8(4)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(pk, four), four)
    hi = jax.lax.shift_right_arithmetic(pk, four)
    if n_tok > _W4_GROUPED_MAX_TOKENS:
        q = jnp.stack([lo, hi], axis=2).reshape(G, 2 * gh, O)
        if os.environ.get("AURORA_W4_PREFILL", "bf16") == "a8":
            # int8-MXU prefill (W4A8): the extend wave is pure MXU
            # compute (r5b: 390 TFLOP in 4.84s = 40.7% of the 197-TFLOP
            # bf16 peak) while v5e's int8 pipe peaks at 394 TOPs — so
            # requantize the grouped-W4 weights to PER-OUTPUT-CHANNEL
            # int8 per layer (cs = 8*max_g s / 127 covers the full
            # dequant range; the requant error is <= cs/2 ~ 6% of the
            # W4 grid step itself) and run the dot on the int8 MXU pipe
            # with per-token int8 activations — the SAME numerics
            # family as the shipped W4A8 decode kernel (_W4_GROUPED
            # branch / ops/pallas/quant_matmul.py), which passed the
            # quality gates. XLA fuses the unpack+requant elementwise
            # chain into one producer of the int8 [D, O] transient
            # (~half the bf16 path's dequant transient).
            cs = jnp.max(s, axis=0, keepdims=True) * (8.0 / 127.0)
            m = (s / cs).astype(jnp.float32)                # [G, 1, O]
            w8 = jnp.clip(jnp.round(q.astype(jnp.float32) * m), -127,
                          127).astype(jnp.int8).reshape(D, O)
            hf = h.astype(jnp.float32).reshape(-1, D)
            s_a = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1,
                                      keepdims=True) / 127.0, 1e-12)
            h8 = jnp.clip(jnp.round(hf / s_a), -127,
                          127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                h8, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * s_a * cs.reshape(1, O)
            return out.astype(h.dtype).reshape(*lead, O)
        w = (q.astype(jnp.float32) * s).astype(h.dtype).reshape(D, O)
        return jnp.dot(h, w,
                       preferred_element_type=jnp.float32).astype(h.dtype)
    hf = h.astype(jnp.float32).reshape(-1, D)
    s_a = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
                      / 127.0, 1e-12)
    h8 = jnp.clip(jnp.round(hf / s_a), -127, 127).astype(jnp.int8)
    hg = h8.reshape(-1, G, 2 * gh).transpose(1, 0, 2)      # [G, N, g]
    dn = (((2,), (1,)), ((0,), (0,)))
    acc = (jax.lax.dot_general(hg[..., 0::2], lo, dn,
                               preferred_element_type=jnp.int32)
           + jax.lax.dot_general(hg[..., 1::2], hi, dn,
                                 preferred_element_type=jnp.int32))
    out = jnp.sum(acc.astype(jnp.float32) * s, axis=0) * s_a  # [N, O]
    return out.astype(h.dtype).reshape(*lead, O)


def _wdot(h, lp, name):
    """h @ W with optional int8 weights (W stored int8 + per-output-
    channel scale under '<name>_scale') or nibble-packed int4 weights
    (grouped scales under '<name>_scale4' — see _w4dot).

    int8 path is W8A8: activations quantize dynamically (per-token absmax)
    and the dot runs int8×int8 → int32 on the MXU's native int8 pipe —
    the weight stream stays int8 all the way from HBM (a bf16 upconvert
    before the dot would materialize a full converted copy per step and
    TRIPLE the traffic; measured, not hypothetical)."""
    if name + "_scale4" in lp:
        return _w4dot(h, lp[name], lp[name + "_scale4"])
    w = lp[name]
    if w.dtype == jnp.int8:
        hf = h.astype(jnp.float32)
        s_a = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
                          / 127.0, 1e-12)
        h8 = jnp.clip(jnp.round(hf / s_a), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            h8, w, (((h8.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * s_a * lp[name + "_scale"]
        return out.astype(h.dtype)
    return jnp.dot(h, w, preferred_element_type=jnp.float32).astype(
        h.dtype)


def _qkv(cfg: LlamaConfig, lp, h):
    B, T, _ = h.shape
    if "qkv" in lp:  # fused stream (fuse_serving_weights)
        fused = _wdot(h, lp, "qkv")
        if "qkv_bias" in lp:
            fused = fused + lp["qkv_bias"]
        nq = cfg.num_attention_heads * cfg.head_dim
        nkv = cfg.num_key_value_heads * cfg.head_dim
        q = fused[..., :nq]
        k = fused[..., nq:nq + nkv]
        v = fused[..., nq + nkv:]
    else:
        q = _wdot(h, lp, "q")
        k = _wdot(h, lp, "k")
        v = _wdot(h, lp, "v")
        if "q_bias" in lp:  # Qwen2 family
            q, k, v = q + lp["q_bias"], k + lp["k_bias"], v + lp["v_bias"]
    if cfg.clip_qkv:  # OLMo activation clamp
        q = jnp.clip(q, -cfg.clip_qkv, cfg.clip_qkv)
        k = jnp.clip(k, -cfg.clip_qkv, cfg.clip_qkv)
        v = jnp.clip(v, -cfg.clip_qkv, cfg.clip_qkv)
    q = q.reshape(B, T, cfg.num_attention_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.num_key_value_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.num_key_value_heads, cfg.head_dim)
    if "q_norm" in lp:  # Qwen3 per-head RMSNorm on q/k, pre-rope
        q = _norm(cfg, q, lp["q_norm"])
        k = _norm(cfg, k, lp["k_norm"])
    return q, k, v


# one source of truth with the offline modeling (ops/norms.py): a norm
# or activation variant added for a new family lands in BOTH paths
from aurora_tpu.ops.norms import family_act as _act  # noqa: E402
from aurora_tpu.ops.norms import family_norm as _norm  # noqa: E402


def _mlp(cfg: LlamaConfig, lp, x, tp_axis=None, h=None):
    """Family-aware MLP block: SiLU (llama) / GeGLU (gemma2) / sparse MoE
    (mixtral), with Gemma2's post-feedforward norm when present.
    `h` overrides the normed input (Cohere parallel block: the MLP reads
    the shared input-norm output, no post_attn_norm param exists)."""
    if h is None:
        h = _norm(cfg, x, lp["post_attn_norm"],
                  lp.get("post_attn_norm_bias"))
    if "moe_router" in lp:  # Mixtral/Qwen2-MoE sparse MLP (fused_moe
        from aurora_tpu.ops.moe import (moe_mlp,  # parity)
                                        moe_mlp_grouped,
                                        shared_expert_mlp)

        def _deq(name):
            # int8 experts (quantize_weights_int8/int4): dequantize at
            # the dot — XLA fuses the multiply into the weight load, so
            # the HBM stream stays int8-sized
            w, sc = lp[name], lp.get(name + "_scale")
            if sc is None:
                return w
            return (w.astype(h.dtype) * sc.astype(h.dtype))

        if "moe_shared_gate_scale" in lp:
            lp = {**lp,
                  "moe_shared_gate": _deq("moe_shared_gate"),
                  "moe_shared_up": _deq("moe_shared_up"),
                  "moe_shared_down": _deq("moe_shared_down")}
        moe_params = {"router": lp["moe_router"], "gate": _deq("moe_gate"),
                      "up": _deq("moe_up"), "down": _deq("moe_down")}
        mode = ("softmax_topk" if cfg.moe_router_mode == "softmax_topk"
                else "mixtral")
        # prefill/extend (many tokens, unsharded experts): grouped-matmul
        # dropless path — O(N·k) expert rows. decode (T==1) and TP-sharded
        # experts: dense einsum (weight stream dominates / GSPMD layout).
        if tp_axis is None and h.shape[1] > 1:
            out = moe_mlp_grouped(
                moe_params, h, cfg.num_experts_per_tok, router_mode=mode,
                norm_topk=cfg.moe_norm_topk,
                router_logit_softcap=cfg.moe_router_logit_softcap)
        else:
            out = moe_mlp(
                moe_params, h, cfg.num_experts_per_tok, router_mode=mode,
                norm_topk=cfg.moe_norm_topk,
                router_logit_softcap=cfg.moe_router_logit_softcap)
        if "moe_shared_gate" in lp:  # Qwen2-MoE shared expert
            out = out + shared_expert_mlp(lp, h)
        out = out.astype(x.dtype)
    elif "mlp_gu" in lp:  # fused-MLP W4 tile layout (_w4_mlp_fuse_params)
        from aurora_tpu.ops.pallas.quant_matmul import (
            fused_mlp_w4, w4_mlp_untile_layout)
        lead = h.shape[:-1]
        n_tok = 1
        for d in lead:
            n_tok *= d
        if (n_tok <= _W4_GROUPED_MAX_TOKENS
                and os.environ.get("AURORA_W4_PALLAS", "1") != "0"):
            # decode: gateup + silu·mul + down in ONE Pallas call
            out = fused_mlp_w4(h.reshape(-1, h.shape[-1]),
                               lp["mlp_gu"], lp["mlp_gs"],
                               lp["mlp_dw"], lp["mlp_ds"],
                               out_dtype=h.dtype)
            out = out.reshape(*lead, -1)
        else:  # prefill: flat views (transpose expr) through _w4dot
            gu_pk, gu_s, dn_pk, dn_s = w4_mlp_untile_layout(
                lp["mlp_gu"], lp["mlp_gs"], lp["mlp_dw"], lp["mlp_ds"])
            fused = _w4dot(h, gu_pk, gu_s)
            inter = fused.shape[-1] // 2
            gate, up = fused[..., :inter], fused[..., inter:]
            out = _w4dot(_act(cfg, gate) * up, dn_pk, dn_s)
    elif "gateup" in lp:  # fused stream (fuse_serving_weights)
        fused = _wdot(h, lp, "gateup")
        inter = fused.shape[-1] // 2
        gate, up = fused[..., :inter], fused[..., inter:]
        out = _wdot(_act(cfg, gate) * up, lp, "down")
    elif "gate" in lp:
        gate = _wdot(h, lp, "gate")
        up = _wdot(h, lp, "up")
        out = _wdot(_act(cfg, gate) * up, lp, "down")
    else:  # non-gated MLP (Starcoder2 c_fc → act → c_proj)
        up = _wdot(h, lp, "up")
        if "up_bias" in lp:  # column-parallel bias: adds per shard
            up = up + lp["up_bias"]
        out = _wdot(_act(cfg, up), lp, "down")
    if tp_axis is not None:  # row-parallel down-proj partial sum
        out = jax.lax.psum(out, tp_axis)
    if "down_bias" in lp:  # after the psum: the bias adds exactly once
        out = out + lp["down_bias"]
    if "post_ffw_norm" in lp:  # Gemma2: norm the ffw output pre-residual
        out = _norm(cfg, out, lp["post_ffw_norm"])
    if cfg.residual_scale is not None:  # MiniCPM depth scaling
        out = out * cfg.residual_scale
    return x + out


@jax.jit
def _w8(w):
    """One weight stack → (int8, per-output-channel scale). jit keeps the
    fp32 intermediate fused (never materialized in HBM)."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
                    / 127.0, 1e-12)
    return jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8), s


def quantize_weights_int8(params: Params,
                          free_source: bool = False) -> Params:
    """LLM weight matrices → int8 + per-output-channel fp32 scales
    (per-layer for the stacked [L, in, out] tensors). Embeddings stay in
    the original dtype (gather path + tied-head transpose).
    free_source=True drops each source tensor from `params` as it is
    quantized — peak HBM stays ~1x the model instead of 1.5x (needed to
    quantize a 7B next to 16GB of HBM). The input pytree is MUTATED."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("q", "k", "v", "o", "gate", "up", "down",
                 "qkv", "gateup"):  # incl. pre-fused trees —
        # skipping them would silently serve mostly-bf16 weights
        # while reporting weight_quant
        if name not in layers:
            continue
        layers[name], layers[name + "_scale"] = _w8(layers[name])
        if free_source:
            params["layers"][name] = None
    # MoE expert stacks hold the bulk of an MoE model's parameters —
    # skipping them would make weight_quant a near-no-op for Mixtral/
    # Qwen-MoE/DeepSeek families. int8 per-output-channel scales (_w8
    # reduces over the input axis, so [L,E,D,F] → scales [L,E,1,F]);
    # _mlp dequantizes in-dot. The router (+scalar shared gate) stays
    # fp: it is tiny and routing precision decides expert selection.
    for name in ("moe_gate", "moe_up", "moe_down", "moe_shared_gate",
                 "moe_shared_up", "moe_shared_down"):
        if name not in layers:
            continue
        layers[name], layers[name + "_scale"] = _w8(layers[name])
        if free_source:
            params["layers"][name] = None
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"], out["lm_head_scale"] = _w8(params["lm_head"])
        if free_source:
            params["lm_head"] = None
    return out


def _w4(w, group: int = 128):
    """One [L, D, O] weight stack → (nibble-packed int8 [L, G, g/2, O],
    fp32 group scales [L, G, 1, O]). Symmetric absmax per (layer, input
    group, output channel); even input rows pack into the low nibble.

    Quantizes LAYER BY LAYER: the fp32 intermediate for a whole 7B
    stack (~6GB) next to the resident bf16 params OOMs a 16GB chip,
    while one layer's is ≤200MB."""
    L, D, O = w.shape
    group = min(group, D)
    assert D % group == 0, (D, group)
    G = D // group

    @jax.jit
    def q1(w2):
        # [G, g/2, 2, O]: consecutive input rows pair up (even, odd)
        wf = w2.astype(jnp.float32).reshape(G, group // 2, 2, O)
        s = jnp.maximum(jnp.max(jnp.abs(wf), axis=(1, 2), keepdims=True)
                        / 7.0, 1e-12)
        qv = jnp.clip(jnp.round(wf / s), -8, 7).astype(jnp.int8)
        four = jnp.int8(4)
        packed = jnp.bitwise_or(
            jnp.bitwise_and(qv[:, :, 0, :], jnp.int8(0x0F)),
            jax.lax.shift_left(qv[:, :, 1, :], four))
        return packed, s[:, :, 0, :]
    outs = [q1(w[l]) for l in range(L)]
    return (jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]))


def quantize_weights_int4(params: Params, free_source: bool = False,
                          group: int = 128) -> Params:
    """LLM weight matrices → nibble-packed int4 + grouped fp32 scales
    ('<name>_scale4'); lm_head stays int8 (logit quality) and embeddings
    stay in the original dtype. Halves weight HBM vs W8 (3.4GB for a
    7B) — decode is weight-HBM-capacity-bound at real contexts, so the
    freed memory buys KV rows (batch) that are nearly free in step time.
    The sglang AWQ/GPTQ + bitsandbytes-4bit serving analog
    (srt/model_executor/model_runner.py quant_config path).
    free_source contract matches quantize_weights_int8."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("q", "k", "v", "o", "gate", "up", "down",
                 "qkv", "gateup"):  # incl. pre-fused trees —
        # skipping them would silently serve mostly-bf16 weights
        # while reporting weight_quant
        if name not in layers:
            continue
        layers[name], layers[name + "_scale4"] = _w4(layers[name], group)
        if free_source:
            params["layers"][name] = None
    # MoE expert stacks hold the bulk of an MoE model's parameters —
    # skipping them would make weight_quant a near-no-op for Mixtral/
    # Qwen-MoE/DeepSeek families. int8 per-output-channel scales (_w8
    # reduces over the input axis, so [L,E,D,F] → scales [L,E,1,F]);
    # _mlp dequantizes in-dot. The router (+scalar shared gate) stays
    # fp: it is tiny and routing precision decides expert selection.
    for name in ("moe_gate", "moe_up", "moe_down", "moe_shared_gate",
                 "moe_shared_up", "moe_shared_down"):
        if name not in layers:
            continue
        layers[name], layers[name + "_scale"] = _w8(layers[name])
        if free_source:
            params["layers"][name] = None
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"], out["lm_head_scale"] = _w8(params["lm_head"])
        if free_source:
            params["lm_head"] = None
    return out


def _w4_tile_params(params: Params) -> Params:
    """Re-lay out every eligible W4 stack ([L, G, g/2, O] packed int4 +
    '<name>_scale4') into the tile-contiguous decode layout
    (ops/pallas/quant_matmul.py w4_tile_layout — [L, Nb, Kb, bk, bn]):
    one transpose per stack at engine init so every decode-step weight
    block is a single contiguous HBM read instead of a strided train of
    bn-byte bursts. Same bytes, same numerics (_w4dot reconstructs the
    flat view for prefill); idempotent; names whose output dim the
    kernel cannot tile (O % 256 != 0) stay flat. AURORA_W4_TILED=0
    keeps the flat layout (the pre-round-5 behavior)."""
    from aurora_tpu.ops.pallas.quant_matmul import (_w4_block_k,
                                                    w4_tile_layout)
    out = dict(params)
    layers = dict(params.get("layers", {}))
    for name in list(layers):
        if not name.endswith("_scale4"):
            continue
        base = name[:-len("_scale4")]
        pk = layers.get(base)
        if pk is None or pk.ndim != 4:     # absent or already tiled
            continue
        L, G, gh, O = pk.shape
        if O % 256 != 0:
            continue
        bn = 512 if O % 512 == 0 else 256
        if _w4_block_k(G, gh, bn) % 8:     # Mosaic sublane alignment
            continue
        layers[base], layers[name] = w4_tile_layout(pk, layers[name],
                                                    block_n=bn)
    out["layers"] = layers
    return out


def _w4_mlp_fuse_params(params: Params) -> Params:
    """gateup/down W4 stacks → the fused-MLP tile layout (mlp_gu/mlp_gs/
    mlp_dw/mlp_ds — ops/pallas/quant_matmul.py w4_mlp_tile_layout) so a
    decode step runs the whole MLP as ONE Pallas call (fused_mlp_w4):
    grouped W4A8 gate/up dots, silu·mul in VMEM, W4A16 down-proj
    partials into a VMEM accumulator. One kernel boundary instead of
    two per layer (the r5 decode-block bisection measured the step
    SUPERADDITIVE: ~4ms/step of pipeline drain across the 5 custom-call
    boundaries per layer) and the [B, I] MLP intermediate never exists
    in HBM. Prefill reconstructs the flat views with a transpose
    expression (w4_mlp_untile_layout) and runs the unchanged _w4dot
    path. SiLU families with a fused gateup stream only; ineligible
    shapes stay untouched; idempotent."""
    from aurora_tpu.ops.pallas.quant_matmul import w4_mlp_tile_layout
    layers = dict(params.get("layers", {}))
    gu_pk, gu_s = layers.get("gateup"), layers.get("gateup_scale4")
    dn_pk, dn_s = layers.get("down"), layers.get("down_scale4")
    if (gu_pk is None or dn_pk is None or gu_pk.ndim != 4
            or dn_pk.ndim != 4 or "gateup_bias" in layers
            or "down_bias" in layers):
        return params
    L, G, gh, I2 = gu_pk.shape
    I = I2 // 2
    Gd, ghd, D = dn_pk.shape[1:]
    if D != G * gh * 2 or Gd * ghd != I // 2:
        return params
    gd = I // Gd                              # down-proj group size
    ti = next((t for t in (256, 128)
               if I % t == 0 and t % gd == 0 and t <= I), None)
    if ti is None:
        return params
    mgu, mgs, mdw, mds = w4_mlp_tile_layout(gu_pk, gu_s, dn_pk, dn_s,
                                            ti=ti)
    for k in ("gateup", "gateup_scale4", "down", "down_scale4"):
        del layers[k]
    layers["mlp_gu"], layers["mlp_gs"] = mgu, mgs
    layers["mlp_dw"], layers["mlp_ds"] = mdw, mds
    out = dict(params)
    out["layers"] = layers
    return out


def w4_decode_layout_params(params: Params, cfg, tp: int = 1) -> Params:
    """Every W4 decode-layout transform the engine applies at init, in
    order — callers that pre-lower the engine's exact program (the
    bench AOT fit oracle) must apply the same transforms. Fused MLP
    first (it consumes the flat gateup/down stacks), then the
    tile-contiguous relayout for the remaining per-projection stacks.
    AURORA_W4_FUSED_MLP=1 opts in; AURORA_W4_TILED=0 opts out."""
    if tp != 1 or not any(k.endswith("_scale4")
                          for k in params.get("layers", {})):
        return params
    if (os.environ.get("AURORA_W4_FUSED_MLP", "0") != "0"
            and getattr(cfg, "hidden_act", "silu")
            not in ("gelu", "gelu_tanh")):
        params = _w4_mlp_fuse_params(params)
    if os.environ.get("AURORA_W4_TILED", "1") != "0":
        params = _w4_tile_params(params)
    return params


def fuse_serving_weights(params: Params,
                         free_source: bool = False) -> Params:
    """Merge q/k/v → qkv and gate/up → gateup along the output axis —
    the QKVParallelLinear / MergedColumnParallelLinear fusion
    (sglang srt/models/llama.py:1-60): 4 instead of 7 weight streams
    per decode step measurably improves HBM utilization at small batch
    (each [4096,4096] int8 stream is only ~20us of DMA; fewer, larger
    transfers amortize the per-matmul overhead). Output-axis concat is
    exact for the per-output-channel W8 scales and biases. Applied
    single-device only — TP shards heads per-name (serve/tp.py).

    free_source=True drops the source tensors from the INPUT pytree as
    they are fused (quantize_weights_int8 contract) so peak HBM stays
    ~1x the model — required for 7B-scale deployments; leave False when
    the caller reuses the unfused tree (tests, embeddings endpoints)."""
    out = dict(params)
    layers = dict(params["layers"])

    def take(name):
        leaf = layers.pop(name)
        if free_source:
            params["layers"][name] = None
        return leaf

    if all(k in layers for k in ("q", "k", "v")):
        layers["qkv"] = jnp.concatenate(
            [take("q"), take("k"), take("v")], axis=-1)
        for suf in ("_scale", "_bias", "_scale4"):
            if "q" + suf in layers:
                layers["qkv" + suf] = jnp.concatenate(
                    [take("q" + suf), take("k" + suf),
                     take("v" + suf)], axis=-1)
    if "gate" in layers and "up" in layers:
        layers["gateup"] = jnp.concatenate(
            [take("gate"), take("up")], axis=-1)
        for suf in ("_scale", "_scale4"):
            if "gate" + suf in layers:
                layers["gateup" + suf] = jnp.concatenate(
                    [take("gate" + suf), take("up" + suf)], axis=-1)
    out["layers"] = layers
    return out


def _kv_maxq() -> float:
    """Quantization grid max for the int8-stored KV cache: 127 (int8,
    default) or 7 when AURORA_KV_BITS=4 — an int4-GRID EMULATION that
    keeps int8 storage (same HBM) but rounds every cached K/V to the
    16-level per-token grid a nibble-packed cache would hold. Used to
    measure the int4 quality cost end-to-end (tests/
    test_kv_int4_quality.py) before/without paying the packed-layout
    complexity; read at trace time."""
    return 7.0 if os.environ.get("AURORA_KV_BITS", "8") == "4" else 127.0


def _kv_quantize(x, maxq: float = 127.0):
    """[..., hd] → (int8 values, per-token fp32 scales [...])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / maxq
    q = jnp.clip(jnp.round(xf / s[..., None]), -maxq, maxq)
    return q.astype(jnp.int8), s


def _write_kv_window_packed(r, l, k4, v4, scales, row_ids, q_offsets,
                            kv_lens):
    """_write_kv_window for nibble-packed int4 rows: blend each new
    token's NIBBLE into the byte window covering its positions, keeping
    mate nibbles (tokens outside the write window sharing a byte)
    intact. k4/v4 are int4-GRID int8 values ([-7,7], _kv_quantize maxq
    7); scale planes stay token-space and reuse the unpacked blend."""
    from aurora_tpu.ops.pallas.ragged_attention import PACK_SEG
    Bk, T, Hkv, hd = k4.shape
    S2 = r["k"].shape[3]
    S = 2 * S2
    half = PACK_SEG // 2
    W = min(T, S)
    # byte window: W tokens span at most ceil(W/256)+1 segments
    Wb = min((-(-W // PACK_SEG) + 1) * half, S2)
    kn = k4.transpose(0, 2, 1, 3)                 # [Bk, Hkv, T, hd]
    vn = v4.transpose(0, 2, 1, 3)
    ksn = scales[0].transpose(0, 2, 1)            # [Bk, Hkv, T]
    vsn = scales[1].transpose(0, 2, 1)

    def lane(i, r):
        row = row_ids[i]
        # --- packed value planes ---
        start = jnp.clip(q_offsets[i], 0, S - W)
        start_b = jnp.clip((start // PACK_SEG) * half, 0, S2 - Wb)
        pr = start_b + jnp.arange(Wb)             # byte rows
        t_lo = (pr // half) * PACK_SEG + pr % half
        t_hi = t_lo + half

        def nib(new, t):
            valid = (t >= q_offsets[i]) & (t < kv_lens[i]) \
                & (t >= start) & (t < start + W)
            idx = jnp.clip(t - q_offsets[i], 0, T - 1)
            nv = jnp.take(new[i], idx, axis=1).astype(jnp.int32)
            return valid[None, :, None], jnp.bitwise_and(nv, 0xF)

        def blend(buf, new):
            idx = (l, row, 0, start_b, 0)
            cur = jax.lax.dynamic_slice(
                buf, idx, (1, 1, Hkv, Wb, hd))[0, 0].astype(jnp.int32)
            v_lo, n_lo = nib(new, t_lo)
            v_hi, n_hi = nib(new, t_hi)
            blo = jnp.where(v_lo, n_lo, jnp.bitwise_and(cur, 0xF))
            bhi = jnp.where(v_hi, n_hi,
                            jnp.bitwise_and(
                                jax.lax.shift_right_logical(cur, 4),
                                0xF))
            byte = jnp.bitwise_or(blo, jax.lax.shift_left(bhi, 4))
            return jax.lax.dynamic_update_slice(
                buf, byte.astype(buf.dtype)[None, None], idx)

        r["k"] = blend(r["k"], kn)
        r["v"] = blend(r["v"], vn)
        # --- token-space scale planes (unpacked blend, as before) ---
        startt = jnp.clip(q_offsets[i], 0, S - W)
        shift = q_offsets[i] - startt
        pos = startt + jnp.arange(W)
        valid = (pos >= q_offsets[i]) & (pos < kv_lens[i])

        def sblend(buf, new):
            idx = (l, row, 0, startt)
            cur = jax.lax.dynamic_slice(buf, idx, (1, 1, Hkv, W))
            rolled = jnp.roll(new[i], shift, axis=1)[:, :W]
            upd = jnp.where(valid[None, :], rolled.astype(buf.dtype),
                            cur[0, 0])
            return jax.lax.dynamic_update_slice(buf, upd[None, None],
                                                idx)

        r["ks"] = sblend(r["ks"], ksn)
        r["vs"] = sblend(r["vs"], vsn)
        return r

    return jax.lax.fori_loop(0, Bk, lane, r)


def _write_kv_window(r, l, k, v, scales, row_ids, q_offsets, kv_lens):
    """Write T new tokens per lane into layer l of the row buffers at
    positions [q_offset, q_offset+T) ∩ [0, kv_len), via per-lane dynamic
    windows (dynamic_slice → blend → dynamic_update_slice).

    Replaces the advanced-index scatter `rows.at[l, ridx, :, wpos].set()`:
    mixed advanced indices around the head slice move to the front, so
    XLA materialized the scatter through a [L, B, S, Hkv, hd]-ordered
    relayout — two full-KV transpose copies (2×5.2GB temps at the 7B
    bench shape, b≥16) per extend wave. That was the round-4 bench OOM
    (live 12.3GB + 4.8GB temps) and the poisoned-device cascade. The
    windowed write keeps the buffers' native layout: XLA updates the
    donated carry in place, traffic is O(lanes × T) instead of O(B × S),
    and the scatter's mode="drop" semantics are preserved by blending
    the current contents wherever the target position is invalid
    (query padding past kv_len, and [start, q_offset) when the window
    is clamped at the row's tail — those positions hold live prefix
    tokens and must not be disturbed).
    """
    Bk, T, Hkv, hd = k.shape
    S = r["k"].shape[3]
    W = min(T, S)    # bucket may exceed the row (tokens past S drop)
    kn = k.transpose(0, 2, 1, 3)                  # [Bk, Hkv, T, hd]
    vn = v.transpose(0, 2, 1, 3)
    if scales is not None:
        ksn = scales[0].transpose(0, 2, 1)        # [Bk, Hkv, T]
        vsn = scales[1].transpose(0, 2, 1)

    def lane(i, r):
        row = row_ids[i]
        start = jnp.clip(q_offsets[i], 0, S - W)
        shift = q_offsets[i] - start          # ≥ 0; > 0 only at row tail
        pos = start + jnp.arange(W)           # [W] window positions
        valid = (pos >= q_offsets[i]) & (pos < kv_lens[i])

        def blend(buf, new, vec):
            sizes = (1, 1, Hkv, W) if vec else (1, 1, Hkv, W, hd)
            idx = ((l, row, 0, start) if vec
                   else (l, row, 0, start, 0))
            cur = jax.lax.dynamic_slice(buf, idx, sizes)
            rolled = jnp.roll(new[i], shift, axis=1)[:, :W]
            m = valid[None, :] if vec else valid[None, :, None]
            upd = jnp.where(m, rolled.astype(buf.dtype), cur[0, 0])
            return jax.lax.dynamic_update_slice(buf, upd[None, None],
                                                idx)

        r["k"] = blend(r["k"], kn, False)
        r["v"] = blend(r["v"], vn, False)
        if scales is not None:
            r["ks"] = blend(r["ks"], ksn, True)
            r["vs"] = blend(r["vs"], vsn, True)
        return r

    return jax.lax.fori_loop(0, Bk, lane, r)


def _forward_rows(params: Params, cfg: LlamaConfig, embeds, rows,
                  row_ids, q_offsets, kv_lens, chunk, tp_axis=None):
    """Shared EXTEND/DECODE forward over row-contiguous KV.

    embeds    [Bk, T, D] — new-token embeddings per lane
    rows      {"k","v": [L, B, Hkv, S_row, hd]} (+"ks","vs" per-token
              fp32 scales [L, B, Hkv, S_row] when KV is int8-quantized)
    row_ids   [Bk] — KV row per lane
    q_offsets [Bk] — global position of embeds[:, 0]
    kv_lens   [Bk] — row length AFTER the new tokens (0 = padded lane)
    tp_axis   — set inside shard_map (serve/tp.py): cfg must then be the
              TP-LOCAL view (heads divided, head_dim pinned); o-proj and
              down-proj partial sums are psum'd megatron-style
    Returns (last hidden [Bk, D], rows). Write positions past a lane's
    valid length (query padding) go out of bounds and are dropped.
    """
    if cfg.mla_kv_lora_rank:  # DeepSeek-V2: latent rows, absorbed attn
        from aurora_tpu.serve.mla import forward_rows_mla
        return forward_rows_mla(params, cfg, embeds, rows, row_ids,
                                q_offsets, kv_lens, chunk,
                                tp_axis=tp_axis)
    x = embeds
    if cfg.scale_embeddings:  # Gemma2: normalizer cast to model dtype
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
    if cfg.embed_scale is not None:  # MiniCPM scale_emb
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    Bk, T, _ = x.shape
    L = rows["k"].shape[0]
    quant = "ks" in rows
    # nibble-packed int4 rows carry S/2 value rows next to full-S scale
    # planes — the shape asymmetry IS the packing flag (no config
    # threading through the jitted step signatures)
    kv_pack = quant and rows["k"].shape[3] * 2 == rows["ks"].shape[3]
    maxq = 7.0 if kv_pack else _kv_maxq()
    positions = q_offsets[:, None] + jnp.arange(T)[None, :]       # [Bk, T]
    if cfg.learned_pos:  # GPT-BigCode wpe; rope disabled
        safe = jnp.clip(positions, 0, params["wpe"].shape[0] - 1)
        x = x + jnp.take(params["wpe"], safe, axis=0).astype(x.dtype)
        cos = sin = jnp.zeros((1, T, 0), jnp.float32)
    else:
        cos, sin = rope_cos_sin(positions, cfg.rotary_dim,
                                cfg.rope_theta, cfg.rope_linear_scaling,
                                dtype=jnp.float32)

    # rows ride the scan as CARRY, updated at layer index l and read by
    # the kernel through a scalar-prefetch layer select. Threading them
    # as scan xs→ys (round-2 design) broke XLA's donation aliasing: two
    # full-size AllocateBuffer temps appeared and every decode step
    # copied the entire KV buffer (the int8-KV "engine regression" was
    # this copy, not the kernel). DECODE (T == 1) additionally fuses the
    # KV write (and int8 quantization) INTO the attention kernel with
    # aliased outputs: the XLA write paths — advanced-index scatter and
    # per-lane DUS chains alike — measured 0.3-0.7 ms/layer regardless
    # of payload, dominating the 32-layer decode step.
    # per-layer sliding window: Gemma2 alternates (even layers slide,
    # odd are global); Mistral is uniform; the kernel takes a traced
    # width (<=0 disables) so one compiled scan body serves all layers
    def _window(l):
        if cfg.swa_every_other:
            return jnp.where(l % 2 == 0, cfg.sliding_window or 0, 0)
        return cfg.sliding_window

    def layer(carry, xs):
        x, r = carry
        lp, l = xs
        h = _norm(cfg, x, lp["input_norm"],
                  lp.get("input_norm_bias"))
        q, k, v = _qkv(cfg, lp, h)
        if not cfg.learned_pos:
            q, k = apply_rope(q, k, cos, sin,
                              interleaved=cfg.rope_interleaved)
        if T == 1:  # decode: fused write+attend, in-place via aliasing
            res = ragged_decode_attention(
                q, k[:, 0], v[:, 0], r["k"], r["v"], kv_lens, row_ids,
                layer=l, chunk=chunk, k_scales=r.get("ks"),
                v_scales=r.get("vs"), window=_window(l),
                scale=cfg.attn_scale,
                logit_cap=cfg.attn_logit_softcap,
                kv_maxq=maxq, kv_pack=kv_pack)
            attn, r["k"], r["v"] = res[0], res[1], res[2]
            if quant:
                r["ks"], r["vs"] = res[3], res[4]
        else:       # extend: per-lane windowed write (see _write_kv_window)
            scales = None
            if quant:
                k, ksc = _kv_quantize(k, maxq)
                v, vsc = _kv_quantize(v, maxq)
                scales = (ksc, vsc)
            if kv_pack:
                r = _write_kv_window_packed(r, l, k, v, scales,
                                            row_ids, q_offsets, kv_lens)
            else:
                r = _write_kv_window(r, l, k, v, scales, row_ids,
                                     q_offsets, kv_lens)
            attn = ragged_attention(q, r["k"], r["v"], kv_lens,
                                    q_offsets, row_ids, chunk=chunk,
                                    layer=l, k_scales=r.get("ks"),
                                    v_scales=r.get("vs"),
                                    window=_window(l),
                                    scale=cfg.attn_scale,
                                    logit_cap=cfg.attn_logit_softcap,
                                    kv_pack=kv_pack)
        attn = _wdot(attn.reshape(Bk, T, -1).astype(x.dtype), lp, "o")
        if tp_axis is not None:  # row-parallel o-proj partial sum
            attn = jax.lax.psum(attn, tp_axis)
        if "o_bias" in lp:  # after the psum: the bias adds exactly once
            attn = attn + lp["o_bias"]
        if "post_attn_out_norm" in lp:  # Gemma2: norm the attn output
            attn = _norm(cfg, attn, lp["post_attn_out_norm"])
        if cfg.residual_scale is not None:  # MiniCPM depth scaling
            attn = attn * cfg.residual_scale
        if cfg.parallel_block:  # Cohere: x + attn + mlp(shared h)
            return (_mlp(cfg, lp, x + attn, tp_axis, h=h), r), None
        x = x + attn
        return (_mlp(cfg, lp, x, tp_axis), r), None

    first_k = len(params.get("dense_layers", ()))
    if first_k:  # DeepSeek-v1 heterogeneous stack (see serve/mla.py):
        # unrolled dense prefix, then ONE scan over the MoE tail
        assert tp_axis is None, \
            "dense-prefix (first_k_dense) serving is single-device"
        for i in range(first_k):
            (x, rows), _ = layer((x, rows),
                                 (params["dense_layers"][i], i))
        (x, rows), _ = jax.lax.scan(
            layer, (x, rows), (params["layers"],
                               jnp.arange(first_k, L)))
    else:
        (x, rows), _ = jax.lax.scan(
            layer, (x, rows), (params["layers"], jnp.arange(L)))
    x = _norm(cfg, x, params["final_norm"],
              params.get("final_norm_bias"))
    # last valid token per lane (lanes may be partially padded)
    last = jnp.clip(kv_lens - q_offsets - 1, 0, T - 1)
    x = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    return x, rows


def _lm_head(params, cfg, x):
    if cfg.tie_word_embeddings:
        logits = jnp.dot(x, params["embed_tokens"].T,
                         preferred_element_type=jnp.float32)
    else:
        head = params["lm_head"]
        if head.dtype == jnp.int8:  # W8A8, see _wdot
            xf = x.astype(jnp.float32)
            s_a = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1,
                                      keepdims=True) / 127.0, 1e-12)
            x8 = jnp.clip(jnp.round(xf / s_a), -127,
                          127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x8, head, (((x8.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            logits = (acc.astype(jnp.float32) * s_a
                      * params["lm_head_scale"])
        else:
            logits = jnp.dot(x, head, preferred_element_type=jnp.float32)
    if cfg.final_logit_softcap > 0.0:  # Gemma2
        logits = cfg.final_logit_softcap * jnp.tanh(
            logits / cfg.final_logit_softcap)
    if cfg.logit_scale is not None:  # Cohere / MiniCPM scaling
        logits = logits * cfg.logit_scale
    return logits


# ---------------------------------------------------------------------------
# Sampling core (full surface, fused on device)
# ---------------------------------------------------------------------------

def _sample_core(logits, counts, seen, samp, allowed, key,
                 all_greedy=False):
    """logits [N, V] fp32 → (sampled [N], tok_logprob [N], top-k ids/lps).

    Applies, per row: repetition penalty (prompt+output presence `seen`),
    frequency/presence penalties (output histogram `counts`), constraint
    mask, temperature, top-k, top-p, min-p — srt/layers/sampler.py:1-181 +
    srt/sampling/penaltylib parity. Logprobs are reported from the RAW
    model distribution (pre-penalty), as the reference's logits processor
    does. all_greedy (static) skips the vocab sort — the full [N, V] sort
    costs several ms/step on TPU and greedy never needs it.
    """
    N, V = logits.shape
    raw_lp = jax.nn.log_softmax(logits, axis=-1)

    rep = samp["rep"][:, None]
    logits = jnp.where(seen,
                       jnp.where(logits > 0, logits / rep, logits * rep),
                       logits)
    logits = logits - samp["freq"][:, None] * counts
    logits = logits - samp["pres"][:, None] * (counts > 0)
    if allowed is not None:
        logits = jnp.where(allowed, logits, -jnp.inf)

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if all_greedy:
        return greedy, raw_lp
    # Bounded-candidate sampling: lax.top_k over _MAX_TOPK candidates
    # replaces two full-[N, V] vocab sorts (several ms/step on TPU —
    # round-2 VERDICT item). top-p/min-p operate within the candidate
    # set; the excluded tail carries negligible mass at practical
    # temperatures (and the reference's own flashinfer path also
    # truncates, srt/layers/sampler.py:1-181). User top_k is clamped to
    # the candidate bound.
    kc = min(V, _MAX_TOPK)
    lt = logits / jnp.maximum(samp["temp"][:, None], 1e-6)
    cand, cand_ids = jax.lax.top_k(lt, kc)          # [N, kc] descending
    ks = samp["top_k"]
    rank = jnp.arange(kc)[None, :]
    cand = jnp.where((ks[:, None] > 0) & (rank >= ks[:, None]),
                     -jnp.inf, cand)
    # top-p over the (top-k filtered) descending candidates
    probs = jax.nn.softmax(cand, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cand = jnp.where((cum - probs) > samp["top_p"][:, None],
                     -jnp.inf, cand)
    # min-p: drop candidates below min_p × max-prob — computed on ONE
    # distribution (the post-top-p renormalized candidates; the head of
    # the descending list survives the masks, so [:, :1] is its max).
    # Mixing a pre-top-p pmax with post-top-p candidate probs made the
    # filter up to 1/top_p too lenient (HF MinPLogitsWarper semantics:
    # both sides from the current distribution).
    lp_c = jax.nn.log_softmax(cand, axis=-1)
    p_c = jnp.exp(lp_c)
    cand = jnp.where(
        (samp["min_p"][:, None] > 0)
        & (p_c < samp["min_p"][:, None] * p_c[:, :1]),
        -jnp.inf, cand)

    choice = jax.random.categorical(key, cand, axis=-1)
    sampled = jnp.take_along_axis(cand_ids, choice[:, None],
                                  axis=-1)[:, 0].astype(jnp.int32)
    sampled = jnp.where(samp["temp"] <= 0.0, greedy, sampled)
    return sampled, raw_lp


def _samp_arrays(reqs, n, rows=None):
    """Stack per-request SamplingParams into device-ready [n] arrays.
    rows: optional row index per request (dense lanes when None)."""
    out = {"temp": np.zeros(n, np.float32),
           "top_k": np.zeros(n, np.int32),
           "top_p": np.ones(n, np.float32),
           "min_p": np.zeros(n, np.float32),
           "freq": np.zeros(n, np.float32),
           "pres": np.zeros(n, np.float32),
           "rep": np.ones(n, np.float32)}
    for i, r in enumerate(reqs):
        j = i if rows is None else rows[i]
        s = r.sampling
        out["temp"][j] = s.temperature
        out["top_k"][j] = s.top_k
        out["top_p"][j] = s.top_p
        out["min_p"][j] = s.min_p
        out["freq"][j] = s.frequency_penalty
        out["pres"][j] = s.presence_penalty
        out["rep"][j] = s.repetition_penalty
    # host (numpy) arrays: jit uploads them on use, and _decode compares
    # them against its device-side operand cache BEFORE uploading
    return out


# ---------------------------------------------------------------------------
# Compiled steps
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("idx", "ncs", "dtype"))
def _assemble_wave_embeds(embed_tokens, ids, lanes, idx, ncs, dtype):
    """One-dispatch wave embed assembly: the [Bk, T] text-id gather plus
    every multimodal lane's (static) cached-prefix slice and splice,
    fused into a single program. `lanes` is a tuple of [T_i, D] device
    embeds; `idx`/`ncs` are static lane positions / n_cached offsets.
    Eagerly these were 2 relay dispatches per lane (slice + DUS) at
    ~10-30ms of relay latency each — pure overhead inside the timed
    extend phase."""
    embeds = jnp.take(embed_tokens, ids, axis=0).astype(dtype)
    for j, i in enumerate(idx):
        e = lanes[j][ncs[j]:].astype(dtype)
        embeds = jax.lax.dynamic_update_slice(embeds, e[None], (i, 0, 0))
    return embeds


@functools.partial(jax.jit, static_argnames=("cfg", "chunk"),
                   donate_argnums=(1,))
def _extend_step(params, rows, embeds, row_ids, q_offsets,
                 kv_lens, cfg, chunk):
    x, rows = _forward_rows(params, cfg, embeds, rows,
                            row_ids, q_offsets, kv_lens, chunk)
    return _lm_head(params, cfg, x), rows


def _logprob_outputs(raw_lp, sampled, want_logprobs):
    """Per-token logprob + top-k alternatives; the top-k (a vocab sort on
    TPU) only runs when a request asked for logprobs."""
    tok_lp = jnp.take_along_axis(raw_lp, sampled[:, None], axis=-1)[:, 0]
    if want_logprobs:
        top_lp, top_ids = jax.lax.top_k(raw_lp, _TOPK_LOGPROBS)
    else:
        N = raw_lp.shape[0]
        top_lp = jnp.zeros((N, _TOPK_LOGPROBS), raw_lp.dtype)
        top_ids = jnp.zeros((N, _TOPK_LOGPROBS), jnp.int32)
    return tok_lp, top_lp, top_ids


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "all_greedy",
                                             "want_logprobs"),
                   donate_argnums=(1, 2, 3))
def _decode_step(params, rows, counts, seen, tokens, positions,
                 active, samp, allowed, key, cfg, chunk,
                 all_greedy=False, want_logprobs=True):
    """One token for every active row, sampling fused in.
    tokens [B] last sampled ids; positions [B] their write positions;
    active [B] bool. Returns sampled ids + logprobs + updated buffers."""
    B = tokens.shape[0]
    embeds = jnp.take(params["embed_tokens"], tokens, axis=0)[:, None]
    row_ids = jnp.arange(B, dtype=jnp.int32)
    kv_lens = jnp.where(active, positions + 1, 0)
    x, rows = _forward_rows(params, cfg, embeds, rows,
                            row_ids, positions, kv_lens, chunk)
    logits = _lm_head(params, cfg, x)
    sampled, raw_lp = _sample_core(
        logits, counts.astype(jnp.float32), seen, samp, allowed, key,
        all_greedy=all_greedy)
    tok_lp, top_lp, top_ids = _logprob_outputs(raw_lp, sampled,
                                               want_logprobs)
    upd = active.astype(counts.dtype)
    counts = counts.at[row_ids, sampled].add(upd)
    seen = seen.at[row_ids, sampled].max(active)
    return (sampled, tok_lp, top_lp, top_ids, counts, seen, rows)


def _decode_block_impl(fwd, params, cfg, rows, counts, seen, tokens,
                       positions, active, samp, key, K,
                       all_greedy, want_logprobs):
    """K decode steps in ONE compiled program (lax.scan over steps):
    token feedback, positions, RNG and histogram updates all stay on
    device. The round-2 'multi-step decode' still dispatched one XLA
    program + one positions transfer + one PRNG split per step through
    the relay, which alone doubled the measured step time (engine 39ms
    vs 19ms for the raw step at b8/ctx1k on v5e). Sglang's CUDA-graph +
    --num-continuous-decode-steps analog, done the XLA way."""
    B = tokens.shape[0]
    S_row = (rows["ks"].shape[3] if "ks" in rows
             else rows["k"].shape[3])    # token space (int4 packs k)
    row_ids = jnp.arange(B, dtype=jnp.int32)

    def step(carry, j):
        tokens, counts, seen, rows = carry
        pos_j = jnp.minimum(positions + j, S_row - 1)
        kv_lens = jnp.where(active, pos_j + 1, 0)
        embeds = jnp.take(params["embed_tokens"], tokens, axis=0)[:, None]
        x, rows = fwd(params, rows, embeds, row_ids, pos_j, kv_lens)
        logits = _lm_head(params, cfg, x)
        sampled, raw_lp = _sample_core(
            logits, counts.astype(jnp.float32), seen, samp, None,
            jax.random.fold_in(key, j), all_greedy=all_greedy)
        tok_lp, top_lp, top_ids = _logprob_outputs(raw_lp, sampled,
                                                   want_logprobs)
        upd = active.astype(counts.dtype)
        counts = counts.at[row_ids, sampled].add(upd)
        seen = seen.at[row_ids, sampled].max(active)
        return ((sampled, counts, seen, rows),
                (sampled, tok_lp, top_lp, top_ids))

    (tokens, counts, seen, rows), outs = jax.lax.scan(
        step, (tokens, counts, seen, rows), jnp.arange(K))
    # next-block operands, computed ON DEVICE: the host can re-feed these
    # without any H2D when the batch composition is unchanged (see
    # ServeEngine._decode's operand cache — each small upload through the
    # single-stream relay costs ~10-30ms of latency, and a 256-token
    # caption at K=16 pays it 16x for arrays whose values the device
    # already knows). Inactive lanes pin to 0 so they compare equal to
    # the host's freshly built arrays.
    tok_next = jnp.where(active, tokens, 0)
    pos_next = jnp.where(active, positions + K, 0)
    return outs + (counts, seen, rows, tok_next, pos_next)


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "K",
                                             "all_greedy",
                                             "want_logprobs"),
                   donate_argnums=(1, 2, 3))
def _decode_block(params, rows, counts, seen, tokens, positions, active,
                  samp, key, cfg, chunk, K, all_greedy=True,
                  want_logprobs=False):
    def fwd(params, rows, embeds, row_ids, pos, kv_lens):
        return _forward_rows(params, cfg, embeds, rows, row_ids, pos,
                             kv_lens, chunk)
    return _decode_block_impl(fwd, params, cfg, rows, counts, seen,
                              tokens, positions, active, samp, key, K,
                              all_greedy, want_logprobs)


@functools.partial(jax.jit, donate_argnums=(1, 2),
                   static_argnames=("all_greedy", "want_logprobs"))
def _sample_after_extend(logits, counts, seen, row_ids, samp, allowed,
                         key, all_greedy=False, want_logprobs=True):
    """First token for freshly extended lanes (logits [Bk, V])."""
    sampled, raw_lp = _sample_core(
        logits, counts[row_ids].astype(jnp.float32), seen[row_ids], samp,
        allowed, key, all_greedy=all_greedy)
    tok_lp, top_lp, top_ids = _logprob_outputs(raw_lp, sampled,
                                               want_logprobs)
    counts = counts.at[row_ids, sampled].add(1)
    seen = seen.at[row_ids, sampled].max(True)
    return sampled, tok_lp, top_lp, top_ids, counts, seen


@functools.partial(jax.jit, donate_argnums=(0,))
def _load_prefix(rows, cache, slots, row, start, n_valid):
    """Copy a radix-cached prefix chunk (pool slots) into row positions
    [start, start+n_valid), via a windowed read-blend-write on the row.

    The former advanced-index scatter (`rows.at[:, row, :, pos]`) put
    mixed advanced indices around the head slice, which XLA lowered
    through a full-buffer transpose relayout — a 2×(KV bytes) copy of
    the ENTIRE row pool per cached-prefix chunk (same pathology as the
    extend write, see _write_kv_window). The window keeps the native
    layout so the donated buffers update in place; slot padding
    (i >= n_valid) is dropped by blending back the current contents."""
    from aurora_tpu.ops.pallas.ragged_attention import PACK_SEG
    nb = slots.shape[0]
    packed = "ks" in rows and rows["k"].shape[3] * 2 == rows["ks"].shape[3]
    S = rows["ks"].shape[3] if packed else rows["k"].shape[3]  # tokens
    W = min(nb, S)   # slot chunks are bucket-rounded and may exceed S
    start_c = jnp.clip(start, 0, S - W)
    shift = start - start_c                  # > 0 only at the row tail
    pos = start_c + jnp.arange(W)
    valid = (pos >= start) & (pos < start + n_valid)
    half = PACK_SEG // 2
    for name in rows:
        buf = rows[name]
        c = jnp.take(cache[name], slots, axis=1)  # [L, nb, Hkv, (hd)]
        vec = c.ndim == 3                          # scale planes
        c = c.transpose((0, 2, 1) if vec else (0, 2, 1, 3))
        if packed and not vec:
            # pool slots hold unpacked int4-grid values — blend each
            # token's NIBBLE into the packed byte window, preserving
            # mate nibbles (same scheme as _write_kv_window_packed)
            L_, Hkv, hd = buf.shape[0], buf.shape[2], buf.shape[4]
            S2 = buf.shape[3]
            Wb = min((-(-W // PACK_SEG) + 1) * half, S2)
            start_b = jnp.clip((start // PACK_SEG) * half, 0, S2 - Wb)
            pr = start_b + jnp.arange(Wb)
            t_lo = (pr // half) * PACK_SEG + pr % half
            t_hi = t_lo + half

            def nib(t):
                v = (t >= start) & (t < start + n_valid)
                idx = jnp.clip(t - start, 0, nb - 1)
                nv = jnp.take(c, idx, axis=2).astype(jnp.int32)
                return v[None, None, :, None], jnp.bitwise_and(nv, 0xF)

            idx5 = (0, row, 0, start_b, 0)
            cur = jax.lax.dynamic_slice(
                buf, idx5, (L_, 1, Hkv, Wb, hd))[:, 0].astype(jnp.int32)
            v_lo, n_lo = nib(t_lo)
            v_hi, n_hi = nib(t_hi)
            blo = jnp.where(v_lo, n_lo, jnp.bitwise_and(cur, 0xF))
            bhi = jnp.where(v_hi, n_hi, jnp.bitwise_and(
                jax.lax.shift_right_logical(cur, 4), 0xF))
            byte = jnp.bitwise_or(blo, jax.lax.shift_left(bhi, 4))
            rows[name] = jax.lax.dynamic_update_slice(
                buf, byte.astype(buf.dtype)[:, None], idx5)
            continue
        c = jnp.roll(c, shift, axis=2)             # [L, Hkv, nb(, hd)]
        c = c[:, :, :W]
        if vec:
            sizes = (buf.shape[0], 1, buf.shape[2], W)
            idx = (0, row, 0, start_c)
            m = valid[None, None, :]
        else:
            sizes = (buf.shape[0], 1, buf.shape[2], W, buf.shape[4])
            idx = (0, row, 0, start_c, 0)
            m = valid[None, None, :, None]
        cur = jax.lax.dynamic_slice(buf, idx, sizes)
        upd = jnp.where(m, c.astype(buf.dtype), cur[:, 0])
        rows[name] = jax.lax.dynamic_update_slice(buf, upd[:, None],
                                                  idx)
    return rows


@functools.partial(jax.jit, donate_argnums=(0,))
def _store_prompt(cache, rows, row, start, slots):
    """Copy row KV positions [start, start+nb) into pool slots (release-
    time radix insert). slots entries == num_slots are dropped (padding).
    Packed int4 rows unpack at this boundary (the pool is token-granular
    while the packing is positional — pool slots hold the grid values in
    an int8 container)."""
    from aurora_tpu.ops.pallas.ragged_attention import PACK_SEG
    packed = "ks" in rows and rows["k"].shape[3] * 2 == rows["ks"].shape[3]
    S_row = rows["ks"].shape[3] if packed else rows["k"].shape[3]
    half = PACK_SEG // 2
    nb = slots.shape[0]
    pos = jnp.clip(start + jnp.arange(nb), 0, S_row - 1)
    pr = (pos // PACK_SEG) * half + (pos % PACK_SEG) % half
    is_hi = (pos % PACK_SEG) >= half
    for name in rows:
        r = rows[name][:, row]
        if packed and r.ndim == 4:
            b = r[:, :, pr].astype(jnp.int32)    # [L, Hkv, nb, hd] bytes
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(jnp.bitwise_and(b, 0xFF), 28), 28)
            hi = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(jnp.bitwise_and(b, 0xFF), 24), 28)
            x = jnp.where(is_hi[None, None, :, None], hi,
                          lo).astype(jnp.int8).transpose(0, 2, 1, 3)
        else:
            x = (r[:, :, pos].transpose(0, 2, 1, 3) if r.ndim == 4
                 else r[:, :, pos].transpose(0, 2, 1))  # [L,nb,Hkv,(hd)]
        cache[name] = cache[name].at[:, slots].set(
            x.astype(cache[name].dtype), mode="drop")
    return cache


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _reset_row_stats(counts, seen, row, prompt_seen):
    counts = counts.at[row].set(0)
    seen = seen.at[row].set(prompt_seen)
    return counts, seen


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _count_tokens(counts, seen, row, token_ids):
    """Fold a token run into a row's penalty histograms (jump-forward
    writes tokens without sampling; ids == -1 are padding)."""
    valid = token_ids >= 0
    safe = jnp.where(valid, token_ids, 0)
    counts = counts.at[row, safe].add(valid.astype(counts.dtype))
    seen = seen.at[row, safe].max(valid)
    return counts, seen


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

class ServeEngine:
    """Single-host engine: schedule → batched extend / decode → stream."""

    def __init__(self, params: Params, cfg: LlamaConfig,
                 ecfg: EngineConfig = EngineConfig(),
                 embed_fn=None, tokenizer=None, devices=None):
        self.params = params
        self.cfg = cfg
        self.ecfg = ecfg
        self.tokenizer = tokenizer  # needed only for stop_strs matching
        if cfg.mla_kv_lora_rank:
            # MLA (DeepSeek-V2): latent rows, absorbed attention
            # (serve/mla.py). Already 14x smaller KV — quant/TP are
            # follow-ups, not silent no-ops.
            assert ecfg.kv_quant == "none" and \
                ecfg.weight_quant == "none" and ecfg.tp == 1, \
                "MLA serving supports bf16 latents on one device only"
        if ecfg.weight_quant == "int8" and \
                "o_scale" not in params.get("layers", {}):
            # skip when the caller pre-quantized (cli/serve.py path —
            # re-quantizing int8 values would corrupt the scales)
            self.params = params = quantize_weights_int8(params)
        elif ecfg.weight_quant == "int4":
            assert ecfg.tp == 1, \
                "W4 packed layout is single-device (use W8 with tp>1)"
            if "o_scale4" not in params.get("layers", {}):
                self.params = params = quantize_weights_int4(params)
        # qkv/gateup stream fusion is an EXPLICIT pre-processing step
        # (fuse_serving_weights with free_source=True — cli/serve.py,
        # bench.py): fusing here without freeing would double the layer
        # weights (OOM for a bf16 7B), and freeing here would mutate
        # trees callers may reuse. The forward transparently supports
        # both fused and per-name layouts.
        # W4 decode layouts: optional fused-MLP tiles (one Pallas call
        # for the whole MLP) then tile-contiguous relayout for the rest
        # (one transpose per stack, same bytes)
        self.params = params = w4_decode_layout_params(params, cfg,
                                                       tp=ecfg.tp)
        quant = ecfg.kv_quant in ("int8", "int4")
        if ecfg.kv_quant == "int4":
            assert ecfg.tp == 1, "packed int4 KV is single-device"
            assert cfg.head_dim % 2 == 0
        # the radix POOL stores unpacked grid values (int8 container)
        # either way: slots are token-granular while the packing is
        # positional — rows pack/unpack at the pool boundary
        self.pool = KVPool(cfg, ecfg.num_slots, ecfg.kv_dtype,
                           quant=quant)
        self.alloc = SlotAllocator(ecfg.num_slots)
        if ecfg.disable_radix_cache:
            from aurora_tpu.serve.radix_cache import NullPrefixCache
            self.radix = NullPrefixCache()
        else:
            self.radix = _make_radix(self.alloc.free)
        self.sched = Scheduler(ecfg.max_batch,
                               ecfg.max_batch * ecfg.max_seq_len,
                               ecfg.policy, self.radix)
        self.embed_fn = embed_fn  # multimodal hook: req → [T, D] embeds
        B, S = ecfg.max_batch, ecfg.s_row
        L, Hkv, hd = (cfg.num_hidden_layers, cfg.num_key_value_heads,
                      cfg.head_dim)
        self._alloc_row_buffers()
        self.chunk = min(ecfg.kv_chunk, S)
        self.row_reqs: List[Optional[Request]] = [None] * B
        self.prefilling: List[Request] = []   # interleaved chunked
        self._rng = jax.random.PRNGKey(0)
        self._steps = 0
        self.t_extend_s = 0.0   # cumulative prefill/extend wall (step())
        self.t_decode_s = 0.0   # cumulative decode wall (step())
        self.mesh = None
        if ecfg.tp > 1:
            self._init_tp(devices)
        else:
            self._extend_fn = functools.partial(
                _extend_step, cfg=self.cfg, chunk=self.chunk)
            self._decode_fn = functools.partial(
                _decode_step, cfg=self.cfg, chunk=self.chunk)
            self._decode_block_fn = functools.partial(
                _decode_block, cfg=self.cfg, chunk=self.chunk)

    def _init_tp(self, devices) -> None:
        """Shard params + KV + pool over a ('tp',) mesh and swap in the
        shard_map-compiled steps (serve/tp.py; sglang TP-worker parity,
        tp_worker.py:917-934)."""
        from aurora_tpu.serve.tp import (make_tp_mesh, make_tp_steps,
                                         replicate, shard_tree,
                                         tp_param_specs, tp_pool_specs,
                                         tp_row_specs)
        tp = self.ecfg.tp
        if self.cfg.num_key_value_heads % tp or \
                self.cfg.num_attention_heads % tp:
            raise ValueError(
                f"tp={tp} must divide num_key_value_heads="
                f"{self.cfg.num_key_value_heads} and "
                f"num_attention_heads={self.cfg.num_attention_heads}")
        fused = {"qkv", "gateup"} & set(self.params.get("layers", {}))
        if fused:
            # tp_param_specs would replicate unknown names, and the
            # local head-slice math would silently compute first-shard
            # heads on every device — refuse loudly instead
            raise ValueError(
                f"tp={tp} requires the per-name weight layout; fuse "
                f"AFTER deciding tp (found fused {sorted(fused)} — "
                "fuse_serving_weights is single-device only)")
        self.mesh = make_tp_mesh(self.ecfg.tp, devices)
        pspecs = tp_param_specs(self.params)
        self.params = shard_tree(self.params, pspecs, self.mesh)
        rspecs = tp_row_specs(self.rows)
        self.rows = shard_tree(self.rows, rspecs, self.mesh)
        self.pool.set_dict(shard_tree(
            self.pool.as_dict(), tp_pool_specs(self.pool.as_dict()),
            self.mesh))
        self.counts = replicate(self.counts, self.mesh)
        self.seen = replicate(self.seen, self.mesh)
        (self._extend_fn, self._decode_fn,
         self._decode_block_fn) = make_tp_steps(
            self.mesh, self.cfg, self.chunk, pspecs, rspecs)

    # -- public API ----------------------------------------------------------

    def add_request(self, req: Request) -> None:
        if not req.input_ids:
            # an empty prompt would underflow the full-hit back-off in
            # _prepare (n_cached=-1) and poison its whole admission wave
            req.finished = FinishReason.ABORT
            req.error = "empty prompt (input_ids must be non-empty)"
            self._done_buffer = getattr(self, "_done_buffer", []) + [req]
            return
        if req.max_new_tokens <= 0:
            # OpenAI max_tokens=0 semantics: zero generated tokens —
            # without this the extend step always samples one token
            req.finished = FinishReason.LENGTH
            self._done_buffer = getattr(self, "_done_buffer", []) + [req]
            return
        self.sched.add(req)

    def abort(self, rid: str) -> bool:
        return self.sched.abort(rid)

    def fail_running(self) -> List[Request]:
        """Tear down the in-flight batch after an unrecoverable step error
        (rows cleared, radix locks dropped); the waiting queue is
        untouched. Returns the failed requests."""
        failed = []
        self.prefilling = []
        for req in list(self.sched.running):
            self.sched.running.remove(req)
            req.finished = FinishReason.ABORT
            req.prefill_active = False
            req.prefill_embeds = None
            if 0 <= req.batch_row < len(self.row_reqs) and \
                    self.row_reqs[req.batch_row] is req:
                self.row_reqs[req.batch_row] = None
            if req.prefix_locked:
                self.radix.lock(req.prefix_node, -1)
                req.prefix_locked = False
            req.prefix_node = None
            failed.append(req)
        # a RUNTIME failure inside a compiled step can invalidate the
        # DONATED inputs (rows/counts/seen) before the call completes —
        # self.rows is only reassigned on success, so it may now point
        # at deleted device buffers and every later step would raise
        # 'Array has been deleted'. Rebuild zeroed buffers (the batch is
        # torn down anyway; cached prefixes live in the pool, untouched).
        def _dead(x):
            try:
                return x.is_deleted()
            except AttributeError:
                return False
        if any(_dead(x) for x in jax.tree.leaves(
                (self.rows, self.counts, self.seen))):
            self._alloc_row_buffers()
            if self.mesh is not None:
                from aurora_tpu.serve.tp import shard_tree, tp_row_specs
                self.rows = shard_tree(self.rows,
                                       tp_row_specs(self.rows), self.mesh)
                from aurora_tpu.serve.tp import replicate
                self.counts = replicate(self.counts, self.mesh)
                self.seen = replicate(self.seen, self.mesh)
        if any(_dead(x) for x in jax.tree.leaves(self.pool.as_dict())):
            # the pool backs the radix cache: rebuilding it as zeros
            # orphans every cached prefix, so drop the tree too
            self.pool = KVPool(self.cfg, self.ecfg.num_slots,
                               self.ecfg.kv_dtype,
                               quant=self.ecfg.kv_quant in ("int8",
                                                            "int4"))
            if self.mesh is not None:
                from aurora_tpu.serve.tp import shard_tree, tp_pool_specs
                self.pool.set_dict(shard_tree(
                    self.pool.as_dict(), tp_pool_specs(self.pool.as_dict()),
                    self.mesh))
            self.flush_cache()
        return failed

    def _alloc_row_buffers(self) -> None:
        """(Re)allocate the per-row KV buffers + sampler histograms —
        used at init and for post-failure recovery of donated buffers."""
        cfg, ecfg = self.cfg, self.ecfg
        quant = ecfg.kv_quant in ("int8", "int4")
        B, S = ecfg.max_batch, ecfg.s_row
        L, Hkv, hd = (cfg.num_hidden_layers, cfg.num_key_value_heads,
                      cfg.head_dim)
        store_dt = jnp.int8 if quant else ecfg.kv_dtype
        # int4: the value buffers hold S/2 nibble-packed rows (PACK_SEG
        # pairing); the per-token scale planes stay full-S — the kernels
        # detect the packing from this shape asymmetry
        Sv = S // 2 if ecfg.kv_quant == "int4" else S
        if cfg.mla_kv_lora_rank:
            # one latent vector per token (Hkv=1, hd=rank+rope); no "v"
            self.rows = {"k": jnp.zeros((L, B, 1, S, hd), store_dt)}
        else:
            self.rows = {"k": jnp.zeros((L, B, Hkv, Sv, hd), store_dt),
                         "v": jnp.zeros((L, B, Hkv, Sv, hd), store_dt)}
        if quant:
            self.rows["ks"] = jnp.zeros((L, B, Hkv, S), jnp.float32)
            self.rows["vs"] = jnp.zeros((L, B, Hkv, S), jnp.float32)
        self.counts = jnp.zeros((B, cfg.vocab_size), jnp.int32)
        self.seen = jnp.zeros((B, cfg.vocab_size), bool)

    def has_work(self) -> bool:
        return bool(self.sched.waiting or self.sched.running
                    or getattr(self, "_done_buffer", None))

    def flush_cache(self) -> int:
        """Drop all unlocked radix-cached prefixes (sglang /flush_cache).
        Returns the number of cached tokens remaining (locked paths)."""
        self.radix.evict(self.ecfg.num_slots)
        return self.radix.total_cached_tokens()

    def update_weights(self, new_params: Params) -> Tuple[bool, str]:
        """Live weight reload with rollback (model_runner.py:230-316
        parity): the new pytree must match the current structure and
        shapes exactly; on any mismatch the old weights stay. The radix
        cache is flushed (its KV was computed by the old weights).
        Refuses while requests are running — their KV would silently mix
        two models."""
        if self.sched.running:
            return False, "requests in flight; retry when idle"
        new_layers = new_params.get("layers", {})
        if self.ecfg.weight_quant == "int8" and \
                "q_scale" not in new_layers and \
                "qkv_scale" not in new_layers:
            # match the live tree: quantize the incoming bf16 weights the
            # same way engine init did
            new_params = quantize_weights_int8(dict(new_params))
        elif self.ecfg.weight_quant == "int4" and \
                "q_scale4" not in new_layers and \
                "qkv_scale4" not in new_layers:
            new_params = quantize_weights_int4(dict(new_params))
        if "qkv" in self.params.get("layers", {}) and \
                "qkv" not in new_params.get("layers", {}):
            new_params = fuse_serving_weights(new_params)
        live = self.params.get("layers", {})
        if "mlp_gu" in live and \
                "mlp_gu" not in new_params.get("layers", {}):
            # live tree holds the fused-MLP layout — match it BEFORE
            # tiling (the tiler would otherwise consume gateup/down)
            new_params = _w4_mlp_fuse_params(new_params)
        if any(k.endswith("_scale4") and live[k[:-7]].ndim == 5
               for k in live if k[:-7] in live):
            # live tree holds the tiled W4 layout — match it
            new_params = _w4_tile_params(new_params)
        old = self.params
        try:
            paths_old = jax.tree_util.tree_leaves_with_path(old)
            paths_new = jax.tree_util.tree_leaves_with_path(new_params)
            if (jax.tree_util.tree_structure(old)
                    != jax.tree_util.tree_structure(new_params)):
                raise ValueError("parameter tree structure mismatch")
            for (kp, a), (_, b) in zip(paths_old, paths_new):
                if a.shape != b.shape:
                    raise ValueError(
                        f"shape mismatch at {jax.tree_util.keystr(kp)}: "
                        f"{a.shape} vs {b.shape}")
            self.params = jax.tree.map(
                lambda a, b: jax.device_put(jnp.asarray(b, a.dtype),
                                            a.sharding),
                old, new_params)
            self.flush_cache()
            return True, "weights updated"
        except Exception as e:  # rollback
            self.params = old
            return False, str(e)

    def step(self) -> List[Request]:
        """One engine iteration → requests finished this step.

        Accumulates per-phase wall time (t_extend_s / t_decode_s): both
        phases end in a host-visible fetch (`jax.device_get` of the
        sampled tokens — the only call that syncs the relay), so the
        wall split IS the device split plus each phase's own host
        bookkeeping. Surfaced via decode_stats() and the bench's
        e2e_extend_s/e2e_decode_s decomposition (throughput_hook.py:
        133-142-style accounting for serving)."""
        t0 = time.perf_counter()
        self._admit()
        self._prefill_tick()
        self._jump_forwards()
        t1 = time.perf_counter()
        self._decode()
        self._jump_forwards()
        self.t_extend_s += t1 - t0
        self.t_decode_s += time.perf_counter() - t1
        # requests finished at add time (empty prompt / max_new=0)
        done = list(getattr(self, "_done_buffer", ()))
        if done:
            self._done_buffer = []
        for req in self.sched.retire_finished():
            self._release(req)
            done.append(req)
        return done

    # -- internals -----------------------------------------------------------

    def _free_row(self) -> int:
        for i, r in enumerate(self.row_reqs):
            if r is None:
                return i
        return -1

    def _bucket(self, n: int) -> int:
        for b in self.ecfg.prefill_buckets:
            if n <= b:
                return b
        return max(self.ecfg.prefill_buckets)  # chunked prefill

    @staticmethod
    def _lane_bucket(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    def _wave_bucket(self, n: int) -> int:
        """Lane bucket for EXTEND waves: capped by max_extend_lanes
        (callers pre-chunk waves to ≤ cap; the min() keeps a non-power-
        of-two cap from rounding back up past itself)."""
        return min(self._lane_bucket(n), self.ecfg.max_extend_lanes)

    def _admit(self) -> None:
        free_rows = sum(r is None for r in self.row_reqs)
        admitted = self.sched.get_prefill_batch(
            free_rows * self.ecfg.max_seq_len)
        wave: List[Request] = []
        max_bucket = max(self.ecfg.prefill_buckets)
        for req in admitted:
            row = self._free_row()
            if row < 0:
                self.sched.waiting.insert(0, req)
                continue
            try:
                n_cached = self._prepare(req, row)
            except Exception as e:  # isolate the poison request
                self._abort_admission(req, row, e)
                continue
            if req.extend_len_pending > max_bucket:
                # oversize prompt: INTERLEAVED chunked prefill — one
                # chunk per engine step alongside the running batch's
                # decode (tp_worker.py:411-570 parity; round-2 ran the
                # whole prompt inside _admit, stalling decode for its
                # entire duration)
                try:
                    req.prefill_embeds = self._embeds_for(req, n_cached)
                except Exception as e:
                    self._abort_admission(req, row, e)
                    continue
                req.prefill_done = 0
                req.prefill_active = True
                self.prefilling.append(req)
                self.sched.running.append(req)
            else:
                wave.append(req)
        if wave:
            self._run_wave_chunks(wave)

    def _run_wave_chunks(self, wave: List["Request"]) -> None:
        """Run an admission wave as sub-waves of ≤ max_extend_lanes (see
        EngineConfig.max_extend_lanes), with per-request isolation.

        A system error (compile failure / device OOM) raised by an early
        sub-wave aborts THAT sub-wave inside _run_wave and re-raises —
        but the remaining sub-waves' requests already claimed KV rows and
        radix prefix locks in _prepare and are in neither sched.running
        nor sched.aborted, so fail_running() could never reclaim them
        (permanent row/lock leak, clients hung forever). Abort them here
        before propagating."""
        cap = max(1, self.ecfg.max_extend_lanes)
        for at in range(0, len(wave), cap):
            try:
                self._run_wave(wave[at:at + cap])
            except Exception as e:
                for req in wave[at + cap:]:
                    self._abort_admission(req, req.batch_row, e)
                raise

    def _run_wave(self, wave: List["Request"]) -> None:
        try:
            self._extend_wave(wave)
        except Exception as e:
            if _is_system_error(e):
                # a kernel COMPILE failure or device OOM is a
                # property of the deployment, not of any request:
                # deterministic, so per-request re-runs would pay N
                # more failed compiles (~20s each through the
                # remote-compile relay) and silently abort every
                # request (the round-4 int8-extend signature:
                # "144 ms/tok" that was pure compile thrash with
                # zero tokens produced). Mark the wave failed and
                # surface the error to the step() caller — the
                # serving loop turns it into fail_running + client
                # error events, and direct engine users see it.
                for req in wave:
                    self._abort_admission(req, req.batch_row, e)
                raise
            if len(wave) == 1:
                self._abort_admission(wave[0], wave[0].batch_row, e)
                return
            # per-REQUEST isolation, not per-wave: re-run each
            # request as its own wave so only the poison one aborts
            # (a batched failure used to take every co-admitted
            # request down with it)
            for req in wave:
                req.output_ids = []  # drop any partial batched emit
                try:
                    self._extend_wave([req])
                except Exception as e1:  # noqa: BLE001
                    self._abort_admission(req, req.batch_row, e1)
                    continue
                self.sched.running.append(req)
            return
        self.sched.running.extend(wave)

    def _abort_admission(self, req: Request, row: int, e: Exception):
        req.finished = FinishReason.ABORT
        req.error = str(e)
        if 0 <= row < len(self.row_reqs) and self.row_reqs[row] is req:
            self.row_reqs[row] = None
        # the LPM scheduler pre-matches prefix_node WITHOUT locking —
        # only drop a lock _prepare actually took
        if req.prefix_locked:
            self.radix.lock(req.prefix_node, -1)
            req.prefix_locked = False
        req.prefix_node = None
        self.sched.aborted.append(req)

    def _prepare(self, req: Request, row: int) -> int:
        """Claim a row: lock + load the radix prefix, reset sampling stats.
        Returns n_cached. Raises on invalid requests (isolated upstream)."""
        ids = req.input_ids
        if len(ids) + req.max_new_tokens > self.ecfg.max_seq_len:
            raise ValueError(
                f"request {req.rid}: prompt ({len(ids)}) + max_new_tokens "
                f"({req.max_new_tokens}) exceeds max_seq_len "
                f"{self.ecfg.max_seq_len}")
        # Always re-match immediately before locking: prefix_slots cached
        # during LPM scheduling are NOT locked, so an earlier request's
        # evictions may have freed them (sglang inc_lock_ref-at-match
        # pattern). req.prefix_node is only set once the lock is held so
        # the _admit error path knows whether to unlock.
        prefix_slots, prefix_node = self.radix.match_prefix(ids)
        self.radix.lock(prefix_node, +1)
        req.prefix_slots, req.prefix_node = prefix_slots, prefix_node
        req.prefix_locked = True
        n_cached = len(prefix_slots)
        if n_cached == len(ids):  # full hit: re-extend the last token
            n_cached -= 1
        req.batch_row = row
        req.n_cached = n_cached
        req.extend_len_pending = len(ids) - n_cached
        self.row_reqs[row] = req

        max_bucket = max(self.ecfg.prefill_buckets)
        for start in range(0, n_cached, max_bucket):
            n = min(max_bucket, n_cached - start)
            nb = self._bucket(n)
            slots = np.zeros((nb,), np.int32)
            slots[:n] = req.prefix_slots[start:start + n]
            self.rows = _load_prefix(
                self.rows, self.pool.as_dict(), jnp.asarray(slots),
                jnp.asarray(row, np.int32), jnp.asarray(start, np.int32),
                jnp.asarray(n, np.int32))
        prompt_seen = np.zeros((self.cfg.vocab_size,), bool)
        valid = np.asarray([t for t in ids if 0 <= t < self.cfg.vocab_size],
                           np.int64)
        prompt_seen[valid] = True
        self.counts, self.seen = _reset_row_stats(
            self.counts, self.seen, row, jnp.asarray(prompt_seen))
        return n_cached

    def _embeds_for(self, req: Request, n_cached: int):
        """DEVICE [n_new, D] embeds. Keeping this on device matters:
        the round-3 prefill profile showed the old host assembly
        (device_get the embedding rows, then re-upload a [Bk,T,D] fp32
        array) moving ~200MB over the host link per 8x1024 wave —
        prefill ran at 1.4k tok/s with the kernels accounting for <10%
        of the time. Token ids go up instead (KBs)."""
        if self.embed_fn is not None and req.pixel_values is not None:
            return jnp.asarray(self.embed_fn(req))[n_cached:]
        ids = np.asarray(req.input_ids[n_cached:], np.int64)
        # placeholder/mm ids are clipped; their embeds are never attended
        # to in text-only deployments
        ids = np.clip(ids, 0, self.cfg.vocab_size - 1)
        return jnp.take(self.params["embed_tokens"], jnp.asarray(ids),
                        axis=0)

    def _assemble_wave(self, ids, mm_lanes):
        """[Bk, T, D] wave embeds. ≥2 multimodal lanes fuse the id
        gather + every lane splice into ONE jitted dispatch — the eager
        per-lane slice+DUS chain costs ~10-30ms of relay latency PER OP
        (the decode operand-cache finding, 185e1b2), so a 16-lane wave
        paid ~0.3-1s of pure dispatch before the extend kernel started.
        Single-lane/text waves keep the eager path (the fused program
        re-traces per lane-shape combo; chat traffic is shape-diverse
        while batch-serving waves repeat one combo)."""
        if len(mm_lanes) >= 2:
            return _assemble_wave_embeds(
                self.params["embed_tokens"], jnp.asarray(ids),
                tuple(jnp.asarray(self.embed_fn(req))
                      for _, req in mm_lanes),
                idx=tuple(i for i, _ in mm_lanes),
                ncs=tuple(req.n_cached for _, req in mm_lanes),
                dtype=self.ecfg.kv_dtype)
        embeds = jnp.take(self.params["embed_tokens"], jnp.asarray(ids),
                          axis=0).astype(self.ecfg.kv_dtype)
        for i, req in mm_lanes:
            e = self._embeds_for(req, req.n_cached).astype(
                self.ecfg.kv_dtype)
            embeds = jax.lax.dynamic_update_slice(embeds, e[None],
                                                  (i, 0, 0))
        return embeds

    def _extend_wave(self, wave: List[Request]) -> None:
        """Batched multi-request prefill: ONE kernel call for all admitted
        requests (tp_worker.py:411-570 forward_prefill_batch parity).
        Embeds assemble ON DEVICE: text lanes via one [Bk, T] id lookup,
        multimodal lanes spliced in (fused single dispatch ≥2 lanes —
        _assemble_wave)."""
        T = self._bucket(max(r.extend_len_pending for r in wave))
        Bk = self._wave_bucket(len(wave))
        ids = np.zeros((Bk, T), np.int64)
        row_ids = np.zeros((Bk,), np.int32)
        offs = np.zeros((Bk,), np.int32)
        lens = np.zeros((Bk,), np.int32)
        mm_lanes = []
        for i, req in enumerate(wave):
            n_new = req.extend_len_pending
            if self.embed_fn is not None and req.pixel_values is not None:
                mm_lanes.append((i, req))
            else:
                ids[i, :n_new] = np.clip(
                    np.asarray(req.input_ids[req.n_cached:], np.int64),
                    0, self.cfg.vocab_size - 1)
            row_ids[i] = req.batch_row
            offs[i] = req.n_cached
            lens[i] = req.n_cached + n_new
        embeds = self._assemble_wave(ids, mm_lanes)
        logits, self.rows = self._extend_fn(
            self.params, self.rows, embeds, jnp.asarray(row_ids),
            jnp.asarray(offs), jnp.asarray(lens))
        self._emit(wave, logits[:len(wave)], row_ids[:len(wave)])

    def _prefill_tick(self) -> None:
        """One chunk for every in-flight chunked prefill, batched into
        extend calls of ≤ max_extend_lanes lanes; requests whose final
        chunk lands this tick sample their first token and join decode."""
        work = [r for r in self.prefilling if r.finished is None]
        self.prefilling = work
        if not work:
            return
        cap = max(1, self.ecfg.max_extend_lanes)
        for at in range(0, len(work), cap):
            self._prefill_chunk(work[at:at + cap])

    def _prefill_chunk(self, work: List["Request"]) -> None:
        bucket = max(self.ecfg.prefill_buckets)
        lanes = []
        for req in work:
            n_total = req.prefill_embeds.shape[0]
            n = min(bucket, n_total - req.prefill_done)
            lanes.append((req, req.prefill_done, n))
        T = self._bucket(max(n for _, _, n in lanes))
        Bk = self._wave_bucket(len(lanes))
        D = self.params["embed_tokens"].shape[1]
        # device-side chunk assembly (prefill_embeds is a device array)
        embeds = jnp.zeros((Bk, T, D), self.ecfg.kv_dtype)
        row_ids = np.zeros((Bk,), np.int32)
        offs = np.zeros((Bk,), np.int32)
        lens = np.zeros((Bk,), np.int32)
        for i, (req, start, n) in enumerate(lanes):
            seg = jax.lax.dynamic_slice_in_dim(
                req.prefill_embeds, start, n, 0).astype(
                    self.ecfg.kv_dtype)
            embeds = jax.lax.dynamic_update_slice(embeds, seg[None],
                                                  (i, 0, 0))
            row_ids[i] = req.batch_row
            offs[i] = req.n_cached + start
            lens[i] = req.n_cached + start + n
        try:
            logits, self.rows = self._extend_fn(
                self.params, self.rows, embeds,
                jnp.asarray(row_ids), jnp.asarray(offs),
                jnp.asarray(lens))
        except Exception as e:  # isolate: fail THIS chunk's requests
            for req, _, _ in lanes:
                req.finished = FinishReason.ABORT
                req.error = str(e)
            self.prefilling = [r for r in self.prefilling
                               if r.finished is None]
            if _is_system_error(e):  # deterministic deployment failure
                raise                # (see _admit) — never retried here
            return
        emit_reqs, emit_idx = [], []
        for i, (req, start, n) in enumerate(lanes):
            req.prefill_done += n
            if req.prefill_done >= req.prefill_embeds.shape[0]:
                req.prefill_active = False
                req.prefill_embeds = None
                self.prefilling.remove(req)
                emit_reqs.append(req)
                emit_idx.append(i)
        if emit_reqs:
            sel = jnp.asarray(emit_idx, np.int32)
            self._emit(emit_reqs, logits[sel], row_ids[emit_idx])

    def _allowed_mask(self, reqs, rows, n) -> Optional[jnp.ndarray]:
        """[n, V] allowed-token mask when any request is constrained or
        below min_new_tokens (eos suppressed)."""
        need = any(r.constraint is not None
                   or len(r.output_ids) < r.sampling.min_new_tokens
                   for r in reqs)
        if not need:
            return None
        mask = np.ones((n, self.cfg.vocab_size), bool)
        for r, j in zip(reqs, rows):
            if r.constraint is not None:
                mask[j] = r.constraint.mask(self.cfg.vocab_size)
            if len(r.output_ids) < r.sampling.min_new_tokens:
                for eos in r.eos_ids:
                    if 0 <= eos < self.cfg.vocab_size:
                        mask[j, eos] = False
        return jnp.asarray(mask)

    def _emit(self, reqs: List[Request], logits, row_ids) -> None:
        """Sample the first token for freshly extended lanes."""
        self._rng, key = jax.random.split(self._rng)
        samp = _samp_arrays(reqs, len(reqs))
        allowed = self._allowed_mask(reqs, range(len(reqs)), len(reqs))
        sampled, tok_lp, top_lp, top_ids, self.counts, self.seen = \
            _sample_after_extend(
                logits, self.counts, self.seen,
                jnp.asarray(row_ids, np.int32), samp, allowed, key,
                all_greedy=all(r.sampling.temperature <= 0.0
                               for r in reqs),
                want_logprobs=any(r.logprobs for r in reqs))
        out = jax.device_get((sampled, tok_lp, top_lp, top_ids))
        for i, req in enumerate(reqs):
            self._accept_token(req, int(out[0][i]), float(out[1][i]),
                               out[2][i], out[3][i])

    def _accept_token(self, req: Request, tok: int, logprob: float,
                      top_lp, top_ids) -> None:
        req.output_ids.append(tok)
        self._gen_total = getattr(self, "_gen_total", 0) + 1
        if req.logprobs:
            req.output_logprobs.append(logprob)
            req.output_top_logprobs.append(
                [(int(i), float(v)) for i, v in zip(top_ids, top_lp)])
        if req.constraint is not None:
            req.constraint.advance(tok)
            if req.constraint.finished:
                req.finished = FinishReason.EOS
        req.check_finished()
        self._check_stop_strs(req)

    def _jump_forwards(self) -> None:
        """Jump-forward decoding (constrained requests,
        srt/constrained/jump_forward.py parity): stretches where the
        constraint permits exactly one token are written through ONE
        extend call instead of one decode step each. Iterates because the
        token sampled after a jump can enter another forced stretch."""
        while True:
            fired = False
            for req in self.row_reqs:
                if (req is None or req.finished is not None
                        or req.constraint is None or req.logprobs
                        or not hasattr(req.constraint, "forced_run")
                        or not req.output_ids):
                    continue
                if self._maybe_jump(req):
                    fired = True
            if not fired:
                return

    def _heal_tokens(self, new_out: List[int]) -> Optional[List[int]]:
        """Re-tokenize the jump-forward output text so the KV matches the
        canonical tokenization (srt/constrained/jump_forward.py:1-80
        parity): forced ids come from single-token FSM steps, and a
        non-canonical token split changes every subsequent logit. Returns
        the healed ids, or None when healing is a no-op/unstable."""
        if self.tokenizer is None:
            return None
        try:
            text = self.tokenizer.decode(
                new_out, skip_special_tokens=False,
                clean_up_tokenization_spaces=False)
            re_ids = list(self.tokenizer.encode(
                text, add_special_tokens=False))
            if re_ids == new_out:
                return None
            # stability guard: only heal when the healed ids decode back
            # to the exact same text (some tokenizers aren't roundtrip-
            # stable around byte fallbacks)
            if self.tokenizer.decode(
                    re_ids, skip_special_tokens=False,
                    clean_up_tokenization_spaces=False) != text:
                return None
            return re_ids
        except Exception:  # noqa: BLE001 — healing is best-effort
            return None

    def _maybe_jump(self, req: Request) -> bool:
        budget = min(req.max_new_tokens - len(req.output_ids) - 1,
                     max(self.ecfg.prefill_buckets) - 1)
        if budget <= 0:
            return False
        forced = req.constraint.forced_run(budget)
        if not forced:
            return False
        row = req.batch_row
        P = len(req.input_ids)
        old_out = list(req.output_ids)
        new_out = old_out + forced
        healed = self._heal_tokens(new_out)
        if healed is None:
            final = new_out
            d = len(old_out)             # append-only, no rewind
        else:
            final = healed[:req.max_new_tokens]
            # rewind to the first divergence from the row's written
            # tokens; the DFA state is text-derived, so it stays valid
            # across the re-tokenization
            d = 0
            for a, b in zip(final, old_out):
                if a != b:
                    break
                d += 1
        # forced tokens count toward the decode-throughput counter too
        # (they bypass _accept_token; a mostly-constrained workload
        # would otherwise report a fraction of its real gen rate)
        self._gen_total = (getattr(self, "_gen_total", 0)
                           + max(0, len(final) - len(req.output_ids)))
        req.output_ids = list(final)
        if healed is None:
            # forced tokens must still feed the penalty histograms (they
            # were never sampled, so _decode_step's on-device update
            # missed them)
            nb = self._lane_bucket(len(forced))
            padded = np.full((nb,), -1, np.int64)
            padded[:len(forced)] = forced
            self.counts, self.seen = _count_tokens(
                self.counts, self.seen, jnp.asarray(row, np.int32),
                jnp.asarray(padded))
        else:
            # token multiset changed: rebuild the row's histograms
            prompt_seen = np.zeros((self.cfg.vocab_size,), bool)
            valid = np.asarray(
                [t for t in req.input_ids
                 if 0 <= t < self.cfg.vocab_size], np.int64)
            prompt_seen[valid] = True
            self.counts, self.seen = _reset_row_stats(
                self.counts, self.seen, row, jnp.asarray(prompt_seen))
            nb = self._lane_bucket(max(len(final), 1))
            padded = np.full((nb,), -1, np.int64)
            padded[:len(final)] = final
            self.counts, self.seen = _count_tokens(
                self.counts, self.seen, jnp.asarray(row, np.int32),
                jnp.asarray(padded))
        if req.constraint.finished:
            req.finished = FinishReason.EOS
        req.check_finished()
        self._check_stop_strs(req)
        if req.finished is not None:
            return True  # jump ended the request: KV no longer needed
        # feed tokens from the divergence point (d == 0 → re-extend from
        # the prompt's last token); positions ≥ d-1 are overwritten
        if d == 0:
            toks = [req.input_ids[-1]] + list(final)
            off = P - 1
        else:
            toks = list(final[d - 1:])
            off = P + d - 1
        bucket = max(self.ecfg.prefill_buckets)
        logits = None
        for start in range(0, len(toks), bucket):
            part = toks[start:start + bucket]
            T = self._bucket(len(part))
            ids = np.zeros((T,), np.int64)
            ids[:len(part)] = part
            embeds = jnp.take(
                self.params["embed_tokens"],
                jnp.asarray(np.clip(ids, 0, self.cfg.vocab_size - 1)),
                axis=0)[None].astype(self.ecfg.kv_dtype)
            logits, self.rows = self._extend_fn(
                self.params, self.rows, embeds,
                jnp.asarray([row], np.int32),
                jnp.asarray([off + start], np.int32),
                jnp.asarray([off + start + len(part)], np.int32))
        self._emit([req], logits, np.asarray([row], np.int32))
        return True

    def _decode(self) -> None:
        active = [r for r in self.row_reqs if r is not None
                  and r.finished is None and r.output_ids]
        if not active:
            return
        B = self.ecfg.max_batch
        tokens = np.zeros((B,), np.int32)
        positions = np.zeros((B,), np.int32)
        act = np.zeros((B,), bool)
        rows = []
        for req in active:
            b = req.batch_row
            pos = req.seq_len - 1          # position of the new token
            if pos >= self.ecfg.s_row:
                req.finished = FinishReason.LENGTH
                continue
            tokens[b] = req.output_ids[-1]
            positions[b] = pos
            act[b] = True
            rows.append(req)
        if not rows:
            return

        samp_np = _samp_arrays(rows, B, [r.batch_row for r in rows])
        allowed = self._allowed_mask(rows, [r.batch_row for r in rows], B)
        all_greedy = all(r.sampling.temperature <= 0.0 for r in rows)
        want_lp = any(r.logprobs for r in rows)
        K = self.ecfg.decode_steps
        if allowed is not None:
            K = 1  # per-step masks can't lag
        # never decode past the tightest remaining budget
        K = max(1, min(K, min(r.max_new_tokens - len(r.output_ids)
                              for r in rows)))
        # operand cache: a decode block's outputs fully determine the next
        # block's inputs, so when the freshly built host arrays equal what
        # the previous block left ON DEVICE (batch composition unchanged —
        # no admission/finish/jump/abort in between), reuse those device
        # arrays and skip ~10 small H2D uploads whose relay latency
        # (~10-30ms each) dominated long decodes. The equality check
        # self-validates against ANY host-side mutation (jump-forward,
        # retokenization healing, row release) with no invalidation hooks.
        cache = getattr(self, "_dec_cache", None)
        if (cache is not None
                and np.array_equal(cache["pred_tok"], tokens)
                and np.array_equal(cache["pred_pos"], positions)
                and np.array_equal(cache["pred_act"], act)
                and all(np.array_equal(cache["samp_np"][k], samp_np[k])
                        for k in samp_np)):
            tok_dev, pos_dev = cache["tok"], cache["pos"]
            act_dev, samp = cache["act"], cache["samp"]
            self._dec_cache_hits = getattr(self, "_dec_cache_hits", 0) + 1
        else:
            tok_dev, pos_dev = jnp.asarray(tokens), jnp.asarray(positions)
            act_dev = jnp.asarray(act)
            samp = {k: jnp.asarray(v) for k, v in samp_np.items()}
        self._dec_cache = None
        if K > 1 and allowed is None:
            # K steps in ONE compiled program: one dispatch + one fetch
            # per block (see _decode_block_impl)
            self._rng, key = jax.random.split(self._rng)
            (sampled, tok_lp, top_lp, top_ids, self.counts, self.seen,
             self.rows, tok_next, pos_next) = self._decode_block_fn(
                self.params, self.rows, self.counts, self.seen,
                tok_dev, pos_dev, act_dev, samp, key,
                K=K, all_greedy=all_greedy, want_logprobs=want_lp)
            fetched = jax.device_get((sampled, tok_lp, top_lp, top_ids))
            steps = [tuple(x[j] for x in fetched) for j in range(K)]
            self._dec_cache = {
                "tok": tok_next, "pos": pos_next, "act": act_dev,
                "samp": samp, "samp_np": samp_np,
                "pred_tok": np.where(act, fetched[0][K - 1],
                                     0).astype(np.int32),
                "pred_pos": np.where(act, positions + K,
                                     0).astype(np.int32),
                "pred_act": act.copy(),
            }
        else:
            outs = []
            for j in range(K):
                self._rng, key = jax.random.split(self._rng)
                pos_j = jnp.asarray(np.minimum(positions + j,
                                               self.ecfg.s_row - 1))
                (sampled, tok_lp, top_lp, top_ids, self.counts,
                 self.seen, self.rows) = self._decode_fn(
                    self.params, self.rows, self.counts,
                    self.seen, tok_dev, pos_j, act_dev, samp, allowed,
                    key, all_greedy=all_greedy, want_logprobs=want_lp)
                tok_dev = sampled  # feedback stays on device
                outs.append((sampled, tok_lp, top_lp, top_ids))
            steps = jax.device_get(outs)
        for s, tlp, toplp, topids in steps:
            for req in rows:
                if req.finished is not None:
                    continue  # finish lagged inside the block; discard
                b = req.batch_row
                self._accept_token(req, int(s[b]), float(tlp[b]),
                                   toplp[b], topids[b])
        self._steps += K

    def _check_stop_strs(self, req: Request) -> None:
        """Stop-string finish (StopWordStoppingCriteria / OpenAI `stop`
        parity). Requires a tokenizer on the engine. Only a bounded TAIL
        of the output is re-decoded per token (sglang matches against a
        fixed window too) — full-output decoding is O(n²) over a long
        generation."""
        if (req.finished is not None or not req.stop_strs
                or self.tokenizer is None):
            return
        # a stop string of C chars spans ≤ C non-special tokens; pad the
        # window generously for multi-char tokens around the boundary
        window = 2 * max(len(stop) for stop in req.stop_strs) + 16
        tail = req.output_ids[-window:]
        text = self.tokenizer.decode(tail, skip_special_tokens=True)
        for stop in req.stop_strs:
            idx = text.find(stop)
            if idx >= 0:
                req.finished = FinishReason.EOS
                req.stop_trim = stop  # API layer trims at the stop string
                return

    def _release(self, req: Request) -> None:
        """Finished request → cache its prompt KV (best-effort), free the
        row. Decode-token KV lives only in the row and needs no freeing.
        The prefix lock is held THROUGH the evict/insert (sglang
        cache-then-dec_lock_ref order): eviction under memory pressure
        must not reclaim the very prefix slots we are about to re-insert."""
        row = req.batch_row
        if 0 <= row < len(self.row_reqs) and self.row_reqs[row] is req:
            self.row_reqs[row] = None

        def unlock():
            if req.prefix_locked:
                self.radix.lock(req.prefix_node, -1)
                req.prefix_locked = False
            req.prefix_node = None

        if req.prefill_active:
            # aborted mid-chunked-prefill: the row holds a PARTIAL prompt
            # — caching it would poison the radix tree
            if req in self.prefilling:
                self.prefilling.remove(req)
            req.prefill_active = False
            req.prefill_embeds = None
            unlock()
            return
        if getattr(self.radix, "disable", False):
            # --disable-radix-cache: no prompt-KV copy into the pool, no
            # insert (ChunkCache passthrough parity, chunk_cache.py:1-83)
            unlock()
            return
        if row < 0 or not req.prefix_locked:
            # aborted from the waiting queue / failed admission: nothing
            # was extended, nothing to cache
            unlock()
            return
        n_cached = req.n_cached
        prompt_ids = req.input_ids
        n_new = len(prompt_ids) - n_cached
        if n_new <= 0:
            unlock()
            return
        if self.alloc.available() < n_new:
            self.radix.evict(n_new - self.alloc.available())
        slots = self.alloc.alloc(n_new)
        if slots is None:
            unlock()
            return  # pool full of locked prefixes: skip caching
        max_bucket = max(self.ecfg.prefill_buckets)
        for start in range(0, n_new, max_bucket):
            n = min(max_bucket, n_new - start)
            nb = self._bucket(n)
            padded = np.full((nb,), self.ecfg.num_slots, np.int32)  # drop
            padded[:n] = slots[start:start + n]
            self.pool.set_dict(_store_prompt(
                self.pool.as_dict(), self.rows,
                jnp.asarray(row, np.int32),
                jnp.asarray(n_cached + start, np.int32),
                jnp.asarray(padded)))
        full = np.concatenate([
            np.asarray(req.prefix_slots[:n_cached], np.int32), slots])
        dup = self.radix.insert(prompt_ids, full)
        if dup > n_cached:  # prefix grew under us: free duplicate slots
            self.alloc.free(slots[:dup - n_cached])
        unlock()

    # -- memory introspection (check_memory parity, tp_worker.py:301-321) ----

    def check_memory(self) -> Dict[str, int]:
        cached = self.radix.total_cached_tokens()
        in_flight = sum(r.seq_len for r in self.row_reqs if r is not None)
        free = self.alloc.available()
        leaked = self.ecfg.num_slots - free - cached
        return {"free": free, "cached": cached, "in_flight": in_flight,
                "leaked": leaked}

    def decode_stats(self) -> Dict[str, float]:
        """Operational snapshot (print_decode_stats parity,
        tp_worker.py:285-300): running/queued request counts, KV slot
        utilization, and the decode token throughput since the last
        call (0.0 on the first)."""
        now = time.perf_counter()
        # cumulative accepted-token counter — NOT a sum over running
        # requests (finished requests would vanish between polls and
        # clamp a busy server's rate to 0)
        toks = getattr(self, "_gen_total", 0)
        last_t, last_n = getattr(self, "_stats_mark", (now, toks))
        self._stats_mark = (now, toks)
        used = self.ecfg.num_slots - self.alloc.available()
        return {"running": len(self.sched.running),
                "queued": len(self.sched.waiting),
                "slot_usage": round(used / max(self.ecfg.num_slots, 1),
                                    4),
                "gen_tokens_per_s": round(
                    max(toks - last_n, 0) / max(now - last_t, 1e-9), 1),
                "extend_s": round(self.t_extend_s, 3),
                "decode_s": round(self.t_decode_s, 3)}
