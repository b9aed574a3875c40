"""Token-granular KV pool for continuous-batching service.

Replaces sglang's ReqToTokenPool + MHATokenToKVPool
(src/sglang/python/sglang/srt/mem_cache/memory_pool.py:27-251): one flat
device buffer of KV slots per layer plus a host-side free-list allocator.
Requests map positions → slots through an int32 slot table; the radix cache
shares prefix slots between requests (slot refcounts live in the radix tree,
as in the reference's lock_ref).

Device layout: k/v [L, num_slots, Hkv, D] — a slot is one token's KV for all
layers. Slot gathers/scatters are XLA take/scatter on the slot axis; the
decode path reads via the per-request slot table (see serve/engine.py).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.models.llama import LlamaConfig


class SlotAllocator:
    """Host free-list over KV slots (memory_pool.py BaseTokenToKVPool
    equivalent, without torch)."""

    def __init__(self, num_slots: int):
        self.num_slots = num_slots
        self._free = list(range(num_slots - 1, -1, -1))

    def available(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[np.ndarray]:
        if n > len(self._free):
            return None
        out = np.asarray([self._free.pop() for _ in range(n)], np.int32)
        return out

    def free(self, slots) -> None:
        self._free.extend(int(s) for s in np.asarray(slots).reshape(-1))
        assert len(self._free) <= self.num_slots, "double free detected"


class KVPool:
    """Device KV buffers + slot write/gather helpers. quant=True stores
    int8 values with per-token fp32 scales (ks/vs)."""

    def __init__(self, cfg: LlamaConfig, num_slots: int,
                 dtype=jnp.bfloat16, quant: bool = False):
        self.cfg = cfg
        self.num_slots = num_slots
        self.quant = quant
        # MLA (mla_kv_lora_rank set): one latent vector per token — no
        # "v" plane (sglang MLATokenToKVPool parity, memory_pool.py:180)
        self.mla = bool(getattr(cfg, "mla_kv_lora_rank", None))
        heads = 1 if self.mla else cfg.num_key_value_heads
        shape = (cfg.num_hidden_layers, num_slots, heads, cfg.head_dim)
        store = jnp.int8 if quant else dtype
        self.k = jnp.zeros(shape, store)
        self.v = None if self.mla else jnp.zeros(shape, store)
        self.ks = jnp.zeros(shape[:3], jnp.float32) if quant else None
        self.vs = jnp.zeros(shape[:3], jnp.float32) if quant else None

    def as_dict(self):
        d = {"k": self.k} if self.mla else {"k": self.k, "v": self.v}
        if self.quant:
            d["ks"], d["vs"] = self.ks, self.vs
        return d

    def set_dict(self, d) -> None:
        self.k = d["k"]
        if not self.mla:
            self.v = d["v"]
        if self.quant:
            self.ks, self.vs = d["ks"], d["vs"]

    # NOTE: the engine writes the pool exclusively through its compiled
    # _store_prompt path (scales + MLA layouts handled there); a naive
    # write(slots, k, v) helper was removed — it dereferenced self.v
    # (None for MLA) and skipped the quant scale planes.

    def hbm_bytes(self) -> int:
        """Actual pool residency incl. quant scale planes (the live
        sizing math is engine.kv_bytes_per_token_layer — keep them in
        sync via that helper, not a local re-derivation)."""
        total = int(np.prod(self.k.shape)) * self.k.dtype.itemsize
        if not self.mla:
            total *= 2
        if self.quant:
            total += sum(int(np.prod(a.shape)) * a.dtype.itemsize
                         for a in (self.ks, self.vs))
        return total
