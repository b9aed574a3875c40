"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; these accelerate the host-side serving
control plane (the role the reference fills with Rust/C++ in comparable
systems). Everything degrades gracefully to the pure-Python twins when the
shared library is absent; `ensure_built()` compiles it on demand with the
toolchain baked into the image.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libradix_tree.so")
_lib = None


def ensure_built(force: bool = False) -> bool:
    global _lib
    if _lib is not None and not force:
        return True
    def _build() -> bool:
        try:
            subprocess.run(["sh", os.path.join(_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False

    if (force or not os.path.exists(_LIB_PATH)) and not _build():
        return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # present but unloadable (foreign arch/ABI — e.g. a committed
        # .so built elsewhere): rebuild once for THIS machine
        if not _build():
            return False
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return False
    lib.rt_new.restype = ctypes.c_void_p
    lib.rt_delete.argtypes = [ctypes.c_void_p]
    lib.rt_match.restype = ctypes.c_int64
    lib.rt_match.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.c_int64, ctypes.c_void_p,
                             ctypes.c_int64,
                             ctypes.POINTER(ctypes.c_void_p)]
    lib.rt_insert.restype = ctypes.c_int64
    lib.rt_insert.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_void_p, ctypes.c_int64]
    lib.rt_lock.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                            ctypes.c_int64]
    lib.rt_evict.restype = ctypes.c_int64
    lib.rt_evict.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                             ctypes.c_void_p, ctypes.c_int64]
    lib.rt_total_cached.restype = ctypes.c_int64
    lib.rt_total_cached.argtypes = [ctypes.c_void_p]
    lib.rt_evictable.restype = ctypes.c_int64
    lib.rt_evictable.argtypes = [ctypes.c_void_p]
    _lib = lib
    return True


class NativeRadixCache:
    """Drop-in for aurora_tpu.serve.radix_cache.RadixCache backed by the
    C++ tree. Node handles are opaque pointers (ints on the Python side)."""

    def __init__(self, free_slots=None):
        if not ensure_built():
            raise RuntimeError("native radix tree unavailable")
        self._h = _lib.rt_new()
        self._free_slots = free_slots or (lambda s: None)
        self.root = None  # opaque; lock(None, d) is a no-op like py root

    def __del__(self):
        if getattr(self, "_h", None):
            _lib.rt_delete(self._h)
            self._h = None

    @property
    def evictable_size(self) -> int:
        return int(_lib.rt_evictable(self._h))

    def match_prefix(self, token_ids) -> Tuple[np.ndarray, int]:
        toks = np.ascontiguousarray(token_ids, np.int64)
        out = np.empty(max(len(toks), 1), np.int32)
        node = ctypes.c_void_p()
        n = _lib.rt_match(self._h, toks.ctypes.data, len(toks),
                          out.ctypes.data, len(out), ctypes.byref(node))
        return out[:n].copy(), node.value

    def insert(self, token_ids, slots) -> int:
        toks = np.ascontiguousarray(token_ids, np.int64)
        sl = np.ascontiguousarray(slots, np.int32)
        assert len(toks) == len(sl)
        return int(_lib.rt_insert(self._h, toks.ctypes.data,
                                  sl.ctypes.data, len(toks)))

    def lock(self, node, delta: int) -> None:
        if node:
            _lib.rt_lock(self._h, ctypes.c_void_p(node), delta)

    def evict(self, num_tokens: int) -> int:
        # headroom: eviction stops at node boundaries, which may overshoot
        out = np.empty(num_tokens + 65536, np.int32)
        n = _lib.rt_evict(self._h, num_tokens, out.ctypes.data, len(out))
        if n:
            self._free_slots(out[:n].copy())
        return int(n)

    def total_cached_tokens(self) -> int:
        return int(_lib.rt_total_cached(self._h))
