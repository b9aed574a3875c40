"""Native (C++) radix tree: behavior parity with the Python twin and
engine integration."""

import numpy as np
import pytest

from aurora_tpu.native import NativeRadixCache, ensure_built
from aurora_tpu.serve.radix_cache import RadixCache

pytestmark = pytest.mark.skipif(not ensure_built(),
                                reason="native toolchain unavailable")


def test_native_match_insert_split():
    freed = []
    rc = NativeRadixCache(free_slots=lambda s: freed.extend(map(int, s)))
    assert rc.insert([1, 2, 3, 4], np.arange(4, dtype=np.int32)) == 0
    slots, node = rc.match_prefix([1, 2, 3, 4, 5])
    np.testing.assert_array_equal(slots, [0, 1, 2, 3])
    assert node is not None
    dup = rc.insert([1, 2, 9, 9], np.asarray([10, 11, 12, 13], np.int32))
    assert dup == 2
    slots, _ = rc.match_prefix([1, 2, 9, 9])
    np.testing.assert_array_equal(slots, [0, 1, 12, 13])
    assert rc.total_cached_tokens() == 6


def test_native_lock_and_evict():
    freed = []
    rc = NativeRadixCache(free_slots=lambda s: freed.extend(map(int, s)))
    rc.insert([1, 2], np.asarray([0, 1], np.int32))
    rc.insert([5, 6], np.asarray([2, 3], np.int32))
    _, node = rc.match_prefix([1, 2])
    rc.lock(node, +1)
    rc.evict(10)
    assert rc.total_cached_tokens() == 2
    assert sorted(freed) == [2, 3]
    rc.lock(node, -1)
    rc.evict(10)
    assert rc.total_cached_tokens() == 0
    assert sorted(freed) == [0, 1, 2, 3]


def test_native_vs_python_randomized(rng):
    """Drive both implementations with the same random op sequence."""
    freed_n, freed_p = [], []
    nat = NativeRadixCache(free_slots=lambda s: freed_n.extend(map(int, s)))
    py = RadixCache(free_slots=lambda s: freed_p.extend(map(int, s)))
    next_slot = [0]

    def new_slots(n):
        out = np.arange(next_slot[0], next_slot[0] + n, dtype=np.int32)
        next_slot[0] += n
        return out

    seqs = [list(rng.integers(0, 5, size=rng.integers(1, 12)))
            for _ in range(40)]
    for i, seq in enumerate(seqs):
        sl = new_slots(len(seq))
        dn = nat.insert(seq, sl)
        dp = py.insert(seq, sl)
        assert dn == dp, (i, seq)
        mn, _ = nat.match_prefix(seq)
        mp, _ = py.match_prefix(seq)
        assert len(mn) == len(mp) == len(seq)
        np.testing.assert_array_equal(mn, mp)
        assert nat.total_cached_tokens() == py.total_cached_tokens()
    # interleaved partial lookups
    for seq in seqs[:10]:
        probe = seq[: max(1, len(seq) // 2)] + [99]
        mn, _ = nat.match_prefix(probe)
        mp, _ = py.match_prefix(probe)
        np.testing.assert_array_equal(mn, mp)
    # full eviction frees the same multiset of slots
    n_ev = nat.evict(10 ** 6)
    p_ev = py.evict(10 ** 6)
    assert n_ev == p_ev
    assert sorted(freed_n) == sorted(freed_p)
    assert nat.total_cached_tokens() == 0


def test_engine_uses_native_and_matches(rng, monkeypatch):
    """Engine greedy output identical under native vs python radix."""
    import jax
    import jax.numpy as jnp
    from aurora_tpu.models.llama import LlamaConfig, init_llama_params
    from aurora_tpu.serve.engine import EngineConfig, ServeEngine
    from aurora_tpu.serve.scheduler import Request

    cfg = LlamaConfig.tiny(vocab_size=128)
    params = init_llama_params(jax.random.PRNGKey(7), cfg,
                               dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=512,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32)
    ids = [int(x) for x in rng.integers(3, 128, size=11)]

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("AURORA_NATIVE_RADIX", flag)
        engine = ServeEngine(params, cfg, ecfg)
        if flag == "1":
            assert isinstance(engine.radix, NativeRadixCache)
        engine.add_request(Request(rid="r", input_ids=list(ids),
                                   max_new_tokens=6))
        done = []
        for _ in range(100):
            done += engine.step()
            if not engine.has_work():
                break
        outs[flag] = done[0].output_ids
        assert engine.check_memory()["leaked"] == 0
    assert outs["1"] == outs["0"]
