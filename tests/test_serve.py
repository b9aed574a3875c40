"""Serving engine tests: radix cache semantics, scheduler, engine-vs-offline
greedy parity, prefix reuse, memory accounting (check_memory parity with
sglang tp_worker.py:301-321 leak detection)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aurora_tpu.generate import SamplingParams, generate
from aurora_tpu.models.llama import LlamaConfig, init_llama_params
from aurora_tpu.serve.engine import EngineConfig, ServeEngine
from aurora_tpu.serve.kv_pool import SlotAllocator
from aurora_tpu.serve.radix_cache import RadixCache
from aurora_tpu.serve.scheduler import Request, Scheduler, SchedulePolicy


# ---------------------------------------------------------------------------
# RadixCache unit tests
# ---------------------------------------------------------------------------

def test_radix_match_insert_split():
    freed = []
    rc = RadixCache(free_slots=lambda s: freed.extend(map(int, s)))
    rc.insert([1, 2, 3, 4], np.arange(4, dtype=np.int32))
    slots, node = rc.match_prefix([1, 2, 3, 4, 5])
    np.testing.assert_array_equal(slots, [0, 1, 2, 3])
    # diverging suffix splits the node
    dup = rc.insert([1, 2, 9, 9], np.asarray([10, 11, 12, 13], np.int32))
    assert dup == 2  # [1, 2] already cached
    slots, _ = rc.match_prefix([1, 2, 9, 9])
    np.testing.assert_array_equal(slots, [0, 1, 12, 13])
    assert rc.total_cached_tokens() == 6


def test_radix_eviction_respects_locks():
    freed = []
    rc = RadixCache(free_slots=lambda s: freed.extend(map(int, s)))
    rc.insert([1, 2], np.asarray([0, 1], np.int32))
    rc.insert([5, 6], np.asarray([2, 3], np.int32))
    _, node = rc.match_prefix([1, 2])
    rc.lock(node, +1)
    rc.evict(10)
    assert rc.total_cached_tokens() == 2      # locked path survives
    assert sorted(freed) == [2, 3]
    rc.lock(node, -1)
    rc.evict(10)
    assert rc.total_cached_tokens() == 0
    assert sorted(freed) == [0, 1, 2, 3]


def test_slot_allocator_roundtrip():
    a = SlotAllocator(8)
    s1 = a.alloc(5)
    assert a.available() == 3
    assert a.alloc(4) is None
    a.free(s1[:2])
    assert a.available() == 5


# ---------------------------------------------------------------------------
# Scheduler
# ---------------------------------------------------------------------------

def test_scheduler_budget_and_policy():
    sched = Scheduler(max_batch=2, max_total_tokens=100,
                      policy=SchedulePolicy.FCFS)
    for i, n in enumerate([10, 10, 10]):
        sched.add(Request(rid=str(i), input_ids=list(range(n)),
                          max_new_tokens=20))
    batch = sched.get_prefill_batch(free_slots=100)
    assert [r.rid for r in batch] == ["0", "1"]  # max_batch cap
    sched.running.extend(batch)
    assert sched.get_prefill_batch(100) == []    # batch full


# ---------------------------------------------------------------------------
# Engine end-to-end (tiny model, CPU)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_engine():
    cfg = LlamaConfig.tiny(vocab_size=128)
    params = init_llama_params(jax.random.PRNGKey(7), cfg,
                               dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=4, max_seq_len=64, num_slots=512,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32)
    return params, cfg, ecfg


def _offline_greedy(params, cfg, ids, max_new):
    embeds = jnp.take(params["embed_tokens"], jnp.asarray([ids]), axis=0)
    res = generate(params, cfg, embeds, jnp.ones((1, len(ids)), bool),
                   max_new_tokens=max_new, eos_ids=(2,))
    return [int(t) for t in np.asarray(res.tokens[0, :int(res.lengths[0])])]


def _run_engine(engine, reqs):
    from utils import drain_engine
    return drain_engine(engine, reqs)


def test_engine_greedy_matches_offline(tiny_engine, rng):
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=12)]
    want = _offline_greedy(params, cfg, ids, 8)
    done = _run_engine(engine, [Request(rid="a", input_ids=list(ids),
                                        max_new_tokens=8)])
    assert done["a"].output_ids == want
    mem = engine.check_memory()
    assert mem["leaked"] == 0, mem


def test_engine_concurrent_and_prefix_reuse(tiny_engine, rng):
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    base = [int(x) for x in rng.integers(3, 128, size=10)]
    p1 = base + [int(x) for x in rng.integers(3, 128, size=3)]
    p2 = base + [int(x) for x in rng.integers(3, 128, size=5)]
    w1 = _offline_greedy(params, cfg, p1, 6)
    w2 = _offline_greedy(params, cfg, p2, 6)

    done = _run_engine(engine, [
        Request(rid="1", input_ids=list(p1), max_new_tokens=6),
        Request(rid="2", input_ids=list(p2), max_new_tokens=6)])
    assert done["1"].output_ids == w1
    assert done["2"].output_ids == w2

    # second wave over the same prefix must hit the radix cache
    done2 = _run_engine(engine, [
        Request(rid="3", input_ids=list(p1), max_new_tokens=6)])
    assert done2["3"].prefix_slots is not None
    assert len(done2["3"].prefix_slots) >= len(base)
    assert done2["3"].output_ids == w1
    assert engine.check_memory()["leaked"] == 0


def test_engine_sampling_respects_temperature_zero(tiny_engine, rng):
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=9)]
    done = _run_engine(engine, [
        Request(rid="g", input_ids=list(ids), max_new_tokens=5,
                sampling=SamplingParams(temperature=0.0)),
        Request(rid="s", input_ids=list(ids), max_new_tokens=5,
                sampling=SamplingParams(temperature=1.0, top_p=0.9))])
    assert done["g"].output_ids == _offline_greedy(params, cfg, ids, 5)
    assert len(done["s"].output_ids) >= 1


def test_engine_many_requests_rolling(tiny_engine, rng):
    """More requests than batch rows → continuous batching must roll."""
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    reqs, want = [], {}
    for i in range(7):
        ids = [int(x) for x in rng.integers(3, 128, size=6 + i)]
        want[str(i)] = _offline_greedy(params, cfg, ids, 4)
        reqs.append(Request(rid=str(i), input_ids=ids, max_new_tokens=4))
    done = _run_engine(engine, reqs)
    assert len(done) == 7
    for i in range(7):
        assert done[str(i)].output_ids == want[str(i)], i
    assert engine.check_memory()["leaked"] == 0


def test_chunked_prefill_matches_offline(tiny_engine, rng):
    """Prompts longer than the largest bucket run chunked and still match
    the offline engine (tp_worker chunked-prefill parity)."""
    params, cfg, ecfg = tiny_engine  # buckets (16, 32)
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=50)]  # > 32
    want = _offline_greedy(params, cfg, ids, 6)
    done = _run_engine(engine, [Request(rid="long", input_ids=list(ids),
                                        max_new_tokens=6)])
    assert done["long"].output_ids == want
    assert engine.check_memory()["leaked"] == 0


def test_stop_strings_finish_requests(tiny_engine, tmp_path, rng):
    """OpenAI `stop` / template STOP_WORDS semantics."""
    from utils import make_tiny_tokenizer
    params, cfg, ecfg = tiny_engine
    tok = make_tiny_tokenizer(str(tmp_path / "tok"))
    engine = ServeEngine(params, cfg, ecfg, tokenizer=tok)
    ids = [int(x) for x in rng.integers(3, 128, size=10)]
    # run once without stops to learn what it generates
    base = _run_engine(engine, [Request(rid="b", input_ids=list(ids),
                                        max_new_tokens=8, eos_ids=(-1,))])
    text = tok.decode(base["b"].output_ids, skip_special_tokens=True)
    assert len(text) >= 2
    stop = text[1]  # some character it definitely emits
    done = _run_engine(engine, [Request(
        rid="s", input_ids=list(ids), max_new_tokens=8, eos_ids=(-1,),
        stop_strs=(stop,))])
    assert done["s"].finished.value == "stop"
    assert done["s"].stop_trim == stop
    assert len(done["s"].output_ids) <= len(base["b"].output_ids)


def test_choice_constrained_decoding(tiny_engine, tmp_path, rng):
    """Output restricted to one of the given token sequences
    (sglang constrained-decode surface)."""
    from aurora_tpu.serve.constrained import ChoiceConstraint
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=9)]
    choices = [[7, 8, 9], [7, 20], [50]]
    done = _run_engine(engine, [Request(
        rid="c", input_ids=list(ids), max_new_tokens=8, eos_ids=(-1,),
        constraint=ChoiceConstraint(choices))])
    out = done["c"].output_ids
    assert out in choices
    assert done["c"].finished.value == "stop"
    assert engine.check_memory()["leaked"] == 0


def test_choice_constraint_trie():
    from aurora_tpu.serve.constrained import ChoiceConstraint
    c = ChoiceConstraint([[1, 2, 3], [1, 5]])
    assert c.allowed_tokens() == [1]
    c.advance(1)
    assert c.allowed_tokens() == [2, 5]
    c.advance(5)
    assert c.finished


# ---------------------------------------------------------------------------
# Full sampling surface (srt/layers/sampler.py + penaltylib parity)
# ---------------------------------------------------------------------------

def test_engine_batched_prefill_matches_individual(tiny_engine, rng):
    """A wave of requests admitted together (ONE batched extend call) must
    produce exactly what each request produces alone."""
    params, cfg, ecfg = tiny_engine
    want = {}
    prompts = {}
    for i in range(4):
        ids = [int(x) for x in rng.integers(3, 128, size=5 + 2 * i)]
        prompts[str(i)] = ids
        want[str(i)] = _offline_greedy(params, cfg, ids, 5)
    engine = ServeEngine(params, cfg, ecfg)
    reqs = [Request(rid=r, input_ids=list(p), max_new_tokens=5)
            for r, p in prompts.items()]
    # submit all up front: the scheduler admits them as one wave
    done = _run_engine(engine, reqs)
    for r in prompts:
        assert done[r].output_ids == want[r], r
    assert engine.check_memory()["leaked"] == 0


def test_extend_wave_splits_at_lane_cap(tiny_engine, rng):
    """max_extend_lanes must split an oversize admission wave into
    sub-waves (engine.py _run_wave_chunks) without changing any output —
    the cap exists because a 32-lane extend program at 7B shapes exceeds
    one chip's HBM and hard-crashes the TPU AOT compiler (round-4)."""
    import dataclasses
    params, cfg, ecfg = tiny_engine
    prompts, want = {}, {}
    for i in range(5):
        ids = [int(x) for x in rng.integers(3, 128, size=5 + i)]
        prompts[str(i)] = ids
        want[str(i)] = _offline_greedy(params, cfg, ids, 5)
    engine = ServeEngine(
        params, cfg, dataclasses.replace(ecfg, max_batch=5,
                                         max_extend_lanes=2))
    reqs = [Request(rid=r, input_ids=list(p), max_new_tokens=5)
            for r, p in prompts.items()]
    done = _run_engine(engine, reqs)
    for r in prompts:
        assert done[r].output_ids == want[r], r
    assert engine.check_memory()["leaked"] == 0


def test_engine_presence_penalty_changes_output(tiny_engine, rng):
    """A large presence penalty must forbid repeating any emitted token;
    without it the tiny random model usually loops."""
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=8)]
    done = _run_engine(engine, [
        Request(rid="plain", input_ids=list(ids), max_new_tokens=12,
                eos_ids=(-1,)),
        Request(rid="pen", input_ids=list(ids), max_new_tokens=12,
                eos_ids=(-1,),
                sampling=SamplingParams(temperature=0.0,
                                        presence_penalty=100.0))])
    out = done["pen"].output_ids
    assert len(set(out)) == len(out), "presence penalty must stop repeats"
    assert done["plain"].output_ids != out


def test_engine_repetition_penalty_discourages_prompt_tokens(tiny_engine,
                                                             rng):
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=8)]
    base = _run_engine(engine, [Request(
        rid="b", input_ids=list(ids), max_new_tokens=6, eos_ids=(-1,))])
    done = _run_engine(engine, [Request(
        rid="r", input_ids=list(ids), max_new_tokens=6, eos_ids=(-1,),
        sampling=SamplingParams(temperature=0.0,
                                repetition_penalty=1e6))])
    seen = set(ids)
    # with an absurd penalty no prompt token can be greedily re-emitted
    # (unless every logit of unseen tokens is masked, impossible here)
    assert all(t not in seen for t in done["r"].output_ids)
    assert isinstance(base["b"].output_ids, list)


def test_engine_top_k_one_is_greedy(tiny_engine, rng):
    """top_k=1 at high temperature must reduce to greedy decoding."""
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=10)]
    want = _offline_greedy(params, cfg, ids, 6)
    done = _run_engine(engine, [Request(
        rid="k", input_ids=list(ids), max_new_tokens=6,
        sampling=SamplingParams(temperature=5.0, top_k=1))])
    assert done["k"].output_ids == want


def test_engine_min_new_tokens_suppresses_eos(tiny_engine, rng):
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=9)]
    # learn what the model greedily emits first, make THAT the eos
    probe = _run_engine(engine, [Request(
        rid="p", input_ids=list(ids), max_new_tokens=1, eos_ids=(-1,))])
    eos = probe["p"].output_ids[0]
    done = _run_engine(engine, [
        Request(rid="short", input_ids=list(ids), max_new_tokens=8,
                eos_ids=(eos,)),
        Request(rid="long", input_ids=list(ids), max_new_tokens=8,
                eos_ids=(eos,),
                sampling=SamplingParams(min_new_tokens=5))])
    assert len(done["short"].output_ids) == 1
    assert len(done["long"].output_ids) >= 5
    assert done["long"].output_ids[0] != eos  # eos was suppressed


def test_engine_logprobs_returned(tiny_engine, rng):
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=7)]
    done = _run_engine(engine, [Request(
        rid="lp", input_ids=list(ids), max_new_tokens=5, logprobs=True)])
    r = done["lp"]
    assert len(r.output_logprobs) == len(r.output_ids)
    assert all(lp <= 0.0 for lp in r.output_logprobs)
    # greedy: the sampled token must be the top-1 alternative
    for tok, top in zip(r.output_ids, r.output_top_logprobs):
        assert top[0][0] == tok
        assert len(top) == 5


def test_engine_multi_step_decode_matches_single(tiny_engine, rng):
    """decode_steps>1 (on-device token feedback, host sync every K steps)
    must be output-identical to single-step decode, including mid-block
    eos finishes."""
    import dataclasses as dc
    params, cfg, ecfg = tiny_engine
    reqs = []
    for i in range(3):
        ids = [int(x) for x in rng.integers(3, 128, size=6 + i)]
        reqs.append((ids, 9))
    single = ServeEngine(params, cfg, ecfg)
    got1 = _run_engine(single, [Request(rid=str(i), input_ids=list(p),
                                        max_new_tokens=n)
                                for i, (p, n) in enumerate(reqs)])
    multi = ServeEngine(params, cfg, dc.replace(ecfg, decode_steps=4))
    got4 = _run_engine(multi, [Request(rid=str(i), input_ids=list(p),
                                       max_new_tokens=n)
                               for i, (p, n) in enumerate(reqs)])
    for i in range(3):
        assert got4[str(i)].output_ids == got1[str(i)].output_ids, i
    assert multi.check_memory()["leaked"] == 0


def test_decode_operand_cache_hits_and_invalidates(tiny_engine, rng):
    """The decode operand cache (engine.py _decode) must HIT between
    consecutive blocks of an unchanged batch (skipping the ~10 small H2D
    uploads whose relay latency dominated long decodes) and REBUILD when
    the composition changes mid-stream — here a second request admitted
    between blocks. Outputs must match isolated single-engine greedy."""
    import dataclasses as dc
    params, cfg, ecfg = tiny_engine
    ids_a = [int(x) for x in rng.integers(3, 128, size=6)]
    ids_b = [int(x) for x in rng.integers(3, 128, size=9)]
    want_a = _offline_greedy(params, cfg, ids_a, 12)

    engine = ServeEngine(params, cfg, dc.replace(ecfg, decode_steps=4))
    engine.add_request(Request(rid="a", input_ids=list(ids_a),
                               max_new_tokens=12, eos_ids=(-1,)))
    done = {}
    for _ in range(2):  # prefill+block, then a cache-hit block
        for r in engine.step():
            done[r.rid] = r
    assert getattr(engine, "_dec_cache_hits", 0) >= 1
    # admission between blocks changes the composition: the freshly
    # built host arrays no longer match the device-side prediction
    engine.add_request(Request(rid="b", input_ids=list(ids_b),
                               max_new_tokens=5))  # default eos=(2,)
                                                   # like the oracle
    for _ in range(200):
        for r in engine.step():
            done[r.rid] = r
        if not engine.has_work():
            break
    assert done["a"].output_ids == want_a
    assert done["b"].output_ids == _offline_greedy(params, cfg, ids_b, 5)
    assert engine.check_memory()["leaked"] == 0


def test_multi_replica_controller(tiny_engine, rng):
    """DP serving over multiple devices (ControllerMulti parity):
    dispatch spreads requests, outputs match single-engine greedy, and
    every replica's memory accounting stays clean."""
    import jax
    from aurora_tpu.serve.controller import MultiReplicaController
    params, cfg, ecfg = tiny_engine
    devs = jax.devices()[:2] if len(jax.devices()) >= 2 \
        else [jax.devices()[0]] * 2
    ctl = MultiReplicaController(params, cfg, ecfg, devices=devs,
                                 dispatch="shortest_queue")
    reqs, want = [], {}
    for i in range(6):
        ids = [int(x) for x in rng.integers(3, 128, size=5 + i)]
        want[str(i)] = _offline_greedy(params, cfg, ids, 4)
        reqs.append(Request(rid=str(i), input_ids=ids, max_new_tokens=4))
    for r in reqs:
        ctl.add_request(r)
    # both replicas must have received work
    assert all(e.has_work() for e in ctl.engines)
    done = {}
    for _ in range(200):
        for r in ctl.step():
            done[r.rid] = r
        if not ctl.has_work():
            break
    assert len(done) == 6
    for i in range(6):
        assert done[str(i)].output_ids == want[str(i)], i
    mem = ctl.check_memory()
    assert mem["leaked"] == 0
    assert ctl.flush_cache() == 0


def test_distributed_init_noop_single_host():
    from aurora_tpu.parallel.distributed import init_distributed
    assert init_distributed() is False


def test_engine_int8_kv_quant_matches_greedy(tiny_engine, rng):
    """kv_quant='int8' (int8 KV + per-token scales, half the decode HBM
    traffic) must reproduce the fp greedy outputs on the tiny model,
    including radix-cached prefix reuse through the quantized pool."""
    import dataclasses as dc
    params, cfg, ecfg = tiny_engine
    qcfg = dc.replace(ecfg, kv_quant="int8")
    base = [int(x) for x in rng.integers(3, 128, size=10)]
    p1 = base + [int(x) for x in rng.integers(3, 128, size=4)]
    want = _offline_greedy(params, cfg, p1, 6)
    engine = ServeEngine(params, cfg, qcfg)
    done = _run_engine(engine, [Request(rid="q", input_ids=list(p1),
                                        max_new_tokens=6)])
    assert done["q"].output_ids == want
    # prefix reuse through the int8 cache pool
    done2 = _run_engine(engine, [Request(rid="q2", input_ids=list(p1),
                                         max_new_tokens=6)])
    assert done2["q2"].prefix_slots is not None
    assert len(done2["q2"].prefix_slots) >= len(base)
    assert done2["q2"].output_ids == want
    assert engine.check_memory()["leaked"] == 0


def test_runtime_in_process(tiny_engine, tmp_path, rng):
    """sglang Runtime parity: in-process batch generation, order-
    preserving, with stop strings and regex constraints available."""
    from utils import make_tiny_tokenizer
    from aurora_tpu.serve.runtime import Runtime
    params, cfg, ecfg = tiny_engine
    tok = make_tiny_tokenizer(str(tmp_path / "tok"))
    rt = Runtime(params, cfg, tok, engine_config=ecfg)
    out = rt.generate(["ab cd", "xy z w", "hello"], max_new_tokens=5)
    assert len(out) == 3
    assert all(len(o["output_ids"]) >= 1 for o in out)
    assert all(o["finish_reason"] in ("stop", "length") for o in out)
    # order matches offline greedy (the tiny tokenizer's vocab exceeds
    # the tiny model's — clip like the engine's embedding path does)
    ids = [min(t, cfg.vocab_size - 1) for t in tok.encode("ab cd")]
    want = _offline_greedy(params, cfg, ids, 5)
    assert out[0]["output_ids"] == want
    assert rt.flush_cache() == 0


def test_abort_waiting_request_with_cached_prefix(tiny_engine, rng):
    """Round-2 review: under LPM the scheduler pre-matches prefix_node
    WITHOUT locking; aborting a queued request must not drop a never-
    taken lock or cache KV from batch_row=-1."""
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    base = [int(x) for x in rng.integers(3, 128, size=10)]
    # populate the radix cache
    _run_engine(engine, [Request(rid="seed", input_ids=list(base),
                                 max_new_tokens=3)])
    cached_before = engine.check_memory()["cached"]
    assert cached_before > 0
    # queue a request sharing the prefix, let LPM pre-match it, abort it
    req = Request(rid="doomed", input_ids=list(base) + [5, 6],
                  max_new_tokens=3)
    engine.add_request(req)
    engine.sched._sort_waiting()     # LPM pre-match (no lock taken)
    assert req.prefix_node is not None and not req.prefix_locked
    assert engine.abort("doomed")
    done = engine.step()             # must not raise / corrupt
    assert any(r.rid == "doomed" for r in done)
    mem = engine.check_memory()
    assert mem["leaked"] == 0
    # the cache survives intact and still serves correctly
    out = _run_engine(engine, [Request(rid="again", input_ids=list(base),
                                       max_new_tokens=3)])
    want = _offline_greedy(params, cfg, base, 3)
    assert out["again"].output_ids == want


def test_admission_failure_after_lpm_prematch(tiny_engine, rng):
    """A request failing validation in _prepare (prompt+max_new too big)
    after the LPM pre-match must be isolated without touching locks."""
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    base = [int(x) for x in rng.integers(3, 128, size=10)]
    _run_engine(engine, [Request(rid="seed", input_ids=list(base),
                                 max_new_tokens=3)])
    bad = Request(rid="big", input_ids=list(base) * 5,
                  max_new_tokens=ecfg.max_seq_len)  # over max_seq_len
    good = Request(rid="ok", input_ids=list(base), max_new_tokens=3)
    done = _run_engine(engine, [bad, good])
    assert done["big"].finished.value == "abort"
    assert done["big"].error is not None
    assert done["ok"].output_ids == _offline_greedy(params, cfg, base, 3)
    assert engine.check_memory()["leaked"] == 0


def test_release_under_memory_pressure_keeps_cache_sound(tiny_engine,
                                                         rng):
    """Review finding: _release must insert BEFORE unlocking so its own
    eviction can't reclaim the prefix slots being re-inserted. Tiny pool
    forces eviction on every release."""
    import dataclasses as dc
    params, cfg, ecfg = tiny_engine
    small = dc.replace(ecfg, num_slots=40)  # pool ≈ 2 prompts
    engine = ServeEngine(params, cfg, small)
    prompts = {}
    for i in range(6):
        ids = [int(x) for x in rng.integers(3, 128, size=14)]
        prompts[str(i)] = ids
    done = _run_engine(engine, [
        Request(rid=r, input_ids=list(p), max_new_tokens=3)
        for r, p in prompts.items()])
    assert len(done) == 6
    mem = engine.check_memory()
    assert mem["leaked"] == 0, mem
    # replay one prompt: whatever is cached must still decode correctly
    rid, ids = next(iter(prompts.items()))
    out = _run_engine(engine, [Request(rid="re", input_ids=list(ids),
                                       max_new_tokens=3)])
    assert out["re"].output_ids == _offline_greedy(params, cfg, ids, 3)
    assert engine.check_memory()["leaked"] == 0


def test_engine_int8_weights(tiny_engine, rng):
    """weight_quant='int8' (per-output-channel W8, the decode weight-
    bandwidth lever): logits stay close to fp and generation is sound.
    W8 is lossy, so compare the first-step distribution, not token ids."""
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    from aurora_tpu.serve.engine import quantize_weights_int8
    params, cfg, ecfg = tiny_engine
    qp = quantize_weights_int8(params)
    assert qp["layers"]["q"].dtype == jnp.int8
    assert qp["lm_head"].dtype == jnp.int8

    ids = [int(x) for x in rng.integers(3, 128, size=10)]
    from aurora_tpu.models.llama import llama_apply
    ref, _ = llama_apply(params, cfg, input_ids=jnp.asarray([ids]))
    wq = dc.replace(ecfg, weight_quant="int8")
    engine = ServeEngine(params, cfg, wq)
    done = _run_engine(engine, [Request(rid="w8", input_ids=list(ids),
                                        max_new_tokens=5, eos_ids=(-1,))])
    assert len(done["w8"].output_ids) == 5
    assert engine.check_memory()["leaked"] == 0
    # per-channel W8 on a float32 tiny model: first greedy token agrees
    ref_tok = int(jnp.argmax(ref[0, -1]))
    assert done["w8"].output_ids[0] == ref_tok


def test_engine_int4_weights(tiny_engine, rng):
    """weight_quant='int4' (nibble-packed, g=128-grouped scales — the
    AWQ/GPTQ serving analog): packing is exactly invertible, generation
    is sound, and the engine's first greedy token matches llama_apply on
    the explicitly DEQUANTIZED weights (the kernel applies grouped
    dequant exactly; remaining diff is the A8 activation quant only)."""
    import dataclasses as dc
    from aurora_tpu.models.llama import llama_apply
    from aurora_tpu.serve.engine import quantize_weights_int4
    params, cfg, ecfg = tiny_engine
    qp = quantize_weights_int4(params)
    pk = np.asarray(qp["layers"]["q"])
    assert pk.dtype == np.int8 and pk.ndim == 4
    L, G, gh, O = pk.shape
    assert G * 2 * gh == cfg.hidden_size

    def dequant(name):
        p = np.asarray(qp["layers"][name]).astype(np.int8)
        s = np.asarray(qp["layers"][name + "_scale4"])
        ev = np.right_shift(np.left_shift(p, 4), 4)   # low nibble, signed
        od = np.right_shift(p, 4)
        q = np.zeros((p.shape[0], p.shape[1], 2 * p.shape[2],
                      p.shape[3]), np.float32)
        q[:, :, 0::2] = ev
        q[:, :, 1::2] = od
        w = q * s
        return jnp.asarray(w.reshape(p.shape[0], -1, p.shape[3]),
                           params["layers"][name].dtype)

    # exact invertibility of the packing: dequant(quant(w)) within the
    # grouped-absmax grid of the original
    wq = np.asarray(dequant("q"), np.float32)
    w0 = np.asarray(params["layers"]["q"], np.float32)
    s = np.asarray(qp["layers"]["q_scale4"])
    step = np.broadcast_to(s, (L, G, 2 * gh, O)).reshape(w0.shape)
    assert np.all(np.abs(wq - w0) <= step * 0.5 + 1e-7)

    deq = {**params, "layers": dict(params["layers"])}
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        deq["layers"][name] = dequant(name)
    ids = [int(x) for x in rng.integers(3, 128, size=10)]
    ref, _ = llama_apply(deq, cfg, input_ids=jnp.asarray([ids]))

    engine = ServeEngine(params, cfg, dc.replace(ecfg,
                                                 weight_quant="int4"))
    assert "q_scale4" in engine.params["layers"]
    done = _run_engine(engine, [Request(rid="w4", input_ids=list(ids),
                                        max_new_tokens=5, eos_ids=(-1,))])
    assert len(done["w4"].output_ids) == 5
    assert engine.check_memory()["leaked"] == 0
    assert done["w4"].output_ids[0] == int(jnp.argmax(ref[0, -1]))

    # both _w4dot paths (grouped int8 dot for decode, per-layer bf16
    # dequant for prefill — the [G,N,O] accumulator must never scale
    # with prompt tokens) produce the same greedy prefix
    import aurora_tpu.serve.engine as eng_mod
    old = eng_mod._W4_GROUPED_MAX_TOKENS
    try:
        eng_mod._W4_GROUPED_MAX_TOKENS = 0  # force dequant path always
        jax.clear_caches()  # the threshold is baked in at trace time
        e2 = ServeEngine(qp, cfg, dc.replace(ecfg, weight_quant="int4"))
        done2 = _run_engine(e2, [Request(rid="w4b", input_ids=list(ids),
                                         max_new_tokens=5,
                                         eos_ids=(-1,))])
    finally:
        eng_mod._W4_GROUPED_MAX_TOKENS = old
        jax.clear_caches()
    # first token exact (no activation-quant error on the dequant path
    # either vs the dequantized reference)
    assert done2["w4b"].output_ids[0] == int(jnp.argmax(ref[0, -1]))


def test_engine_w4_fused_mlp_layout(rng):
    """AURORA_W4_FUSED_MLP=1: the engine converts the gateup/down W4
    stacks to the fused-MLP tile layout (ONE Pallas call runs the whole
    decode MLP — gate/up W4A8, silu·mul in VMEM, W4A16 down) and serves
    the same greedy tokens as the two-call layout; prefill reconstructs
    the flat views; update_weights matches the live fused tree. The
    down-proj numerics are W4A16 (strictly tighter than the two-call
    path's second activation quantization), so token parity — not
    bitwise logit parity — is the contract."""
    import os

    from aurora_tpu.serve.engine import (fuse_serving_weights,
                                         quantize_weights_int4)

    cfg = LlamaConfig(vocab_size=128, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128)
    params = init_llama_params(jax.random.PRNGKey(3), cfg,
                               dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        weight_quant="int4")
    qp = fuse_serving_weights(quantize_weights_int4(params))
    ids = [int(x) for x in rng.integers(3, 120, size=12)]

    def run(p):
        engine = ServeEngine(p, cfg, ecfg)
        done = _run_engine(engine, [Request(
            rid="t", input_ids=list(ids), max_new_tokens=6,
            eos_ids=(-1,))])
        assert engine.check_memory()["leaked"] == 0
        return engine, done["t"].output_ids

    _, out_twocall = run(dict(qp))          # default: fused MLP off
    os.environ["AURORA_W4_FUSED_MLP"] = "1"
    try:
        jax.clear_caches()
        engine_f, out_fused = run(dict(qp))
        lay = engine_f.params["layers"]
        for k in ("mlp_gu", "mlp_gs", "mlp_dw", "mlp_ds"):
            assert k in lay, k
        assert "gateup" not in lay and "down" not in lay
        assert out_fused == out_twocall
        # live reload: an incoming fp32 tree is quantized, fused, and
        # MLP-tiled to match the live tree
        ok, msg = engine_f.update_weights(fuse_serving_weights(
            init_llama_params(jax.random.PRNGKey(4), cfg,
                              dtype=jnp.float32)))
        assert ok, msg
        assert "mlp_gu" in engine_f.params["layers"]
    finally:
        del os.environ["AURORA_W4_FUSED_MLP"]
        jax.clear_caches()


def test_engine_int4_tiled_layout(rng):
    """The tile-contiguous W4 decode layout (engine init relayouts every
    eligible packed stack; _w4dot reads it via the tiled Pallas kernel
    for decode and reconstructs the flat view for prefill) serves the
    same greedy tokens as the flat layout, and update_weights matches
    the live tiled tree."""
    import dataclasses as dc
    import os

    from aurora_tpu.serve.engine import quantize_weights_int4

    # dims divisible by 256 so every projection tiles (tiny() at 64/128
    # is ineligible and exercises only the skip path)
    cfg = LlamaConfig(vocab_size=128, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128)
    params = init_llama_params(jax.random.PRNGKey(3), cfg,
                               dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        weight_quant="int4")
    qp = quantize_weights_int4(params)
    ids = [int(x) for x in rng.integers(3, 120, size=12)]

    def run(p):
        engine = ServeEngine(p, cfg, ecfg)
        done = _run_engine(engine, [Request(
            rid="t", input_ids=list(ids), max_new_tokens=6,
            eos_ids=(-1,))])
        assert engine.check_memory()["leaked"] == 0
        return engine, done["t"].output_ids

    engine_t, out_tiled = run(dict(qp))
    lay = engine_t.params["layers"]
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        assert lay[name].ndim == 5, name            # [L, Nb, Kb, bk, bn]
        assert lay[name + "_scale4"].ndim == 5, name

    os.environ["AURORA_W4_TILED"] = "0"
    try:
        jax.clear_caches()
        engine_f, out_flat = run(dict(qp))
        assert engine_f.params["layers"]["q"].ndim == 4   # stayed flat
    finally:
        del os.environ["AURORA_W4_TILED"]
        jax.clear_caches()
    assert out_tiled == out_flat

    # live reload: incoming bf16/flat trees are quantized AND tiled to
    # match the live tree (shape validation would reject flat)
    ok, msg = engine_t.update_weights(params)
    assert ok, msg
    assert engine_t.params["layers"]["q"].ndim == 5


def test_engine_sliding_window_matches_offline(rng):
    """Serving a sliding_window config (Mistral SWA) through the engine
    matches llama_apply's windowed semantics — prompts longer than the
    window must NOT attend over the full context
    (sglang srt/models/mistral.py parity)."""
    cfg = LlamaConfig.tiny(vocab_size=128)
    cfg = __import__("dataclasses").replace(cfg, sliding_window=8)
    params = init_llama_params(jax.random.PRNGKey(11), cfg,
                               dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    engine = ServeEngine(params, cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=24)]  # 3x the window
    want = _offline_greedy(params, cfg, ids, 8)
    done = _run_engine(engine, [Request(rid="sw", input_ids=list(ids),
                                        max_new_tokens=8)])
    assert done["sw"].output_ids == want


# ---------------------------------------------------------------------------
# Tensor-parallel serving (serve/tp.py; sglang tp_worker parity)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kv_quant", ["none", "int8"])
def test_engine_tp2_matches_tp1(tiny_engine, rng, kv_quant):
    """A tp=2-sharded engine (params on heads/MLP width, KV rows on the
    head axis, psum'd o/down projections) produces the same greedy tokens
    as the single-device engine — including radix prefix reuse through
    the sharded pool."""
    params, cfg, ecfg = tiny_engine
    import dataclasses as dc
    ecfg = dc.replace(ecfg, kv_quant=kv_quant)
    base = [int(x) for x in rng.integers(3, 128, size=11)]
    p2 = base + [int(x) for x in rng.integers(3, 128, size=4)]

    def run(tp):
        # tp run also uses a multi-step decode block (K=3) so the
        # shard_map'd scan-over-steps path is covered
        eng = ServeEngine(dict(params), cfg,
                          dc.replace(ecfg, tp=tp,
                                     decode_steps=3 if tp > 1 else 1))
        done = _run_engine(eng, [
            Request(rid="a", input_ids=list(base), max_new_tokens=6),
            Request(rid="b", input_ids=list(p2), max_new_tokens=6)])
        mem = eng.check_memory()
        assert mem["leaked"] == 0, mem
        return done["a"].output_ids, done["b"].output_ids

    a1, b1 = run(1)
    a2, b2 = run(2)
    assert a1 == a2
    assert b1 == b2


def test_engine_tp2_biased_layernorm_family(rng):
    """TP sharding with a Starcoder2-shaped config: per-projection
    biases (o/down biases must add exactly once, AFTER the psum —
    replicated specs), LayerNorm norms, non-gated GELU MLP. tp=2 greedy
    == tp=1 greedy."""
    import dataclasses as dc
    cfg = dc.replace(LlamaConfig.tiny(vocab_size=128),
                     norm_type="layernorm", mlp_style="mlp",
                     hidden_act="gelu_tanh", qkv_bias=True)
    rng_j = jax.random.PRNGKey(7)
    params = init_llama_params(rng_j, cfg, dtype=jnp.float32)
    L, D = cfg.num_hidden_layers, cfg.hidden_size
    inter = cfg.intermediate_size
    lay = params["layers"]
    for k in ("gate",):
        del lay[k]
    keys = jax.random.split(jax.random.PRNGKey(8), 8)
    lay["input_norm_bias"] = 0.01 * jax.random.normal(
        keys[0], (L, D), jnp.float32)
    lay["post_attn_norm_bias"] = 0.01 * jax.random.normal(
        keys[1], (L, D), jnp.float32)
    params["final_norm_bias"] = 0.01 * jax.random.normal(
        keys[2], (D,), jnp.float32)
    lay["o_bias"] = 0.05 * jax.random.normal(keys[3], (L, D), jnp.float32)
    lay["up_bias"] = 0.05 * jax.random.normal(
        keys[4], (L, inter), jnp.float32)
    lay["down_bias"] = 0.05 * jax.random.normal(
        keys[5], (L, D), jnp.float32)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16,), kv_dtype=jnp.float32,
                        kv_chunk=16)
    ids = [int(x) for x in np.random.default_rng(9).integers(
        3, 128, size=11)]

    def run(tp):
        eng = ServeEngine(dict(params), cfg, __import__(
            "dataclasses").replace(ecfg, tp=tp))
        done = _run_engine(eng, [Request(rid="s", input_ids=list(ids),
                                         max_new_tokens=6)])
        return done["s"].output_ids

    assert run(2) == run(1)


def test_engine_tp_oversize_prompt_chunked(tiny_engine, rng):
    """Chunked prefill works through the shard_map path (tp=2), and an
    invalid tp (not dividing num_key_value_heads) is rejected."""
    params, cfg, ecfg = tiny_engine
    import dataclasses as dc
    ids = [int(x) for x in rng.integers(3, 128, size=40)]  # > max bucket
    want = _offline_greedy(params, cfg, ids, 6)
    eng = ServeEngine(dict(params), cfg, dc.replace(ecfg, tp=2))
    done = _run_engine(eng, [Request(rid="c", input_ids=list(ids),
                                     max_new_tokens=6)])
    assert done["c"].output_ids == want
    with pytest.raises(Exception):
        ServeEngine(dict(params), cfg, dc.replace(ecfg, tp=4))


def test_chunked_prefill_interleaves_with_decode(tiny_engine, rng):
    """An oversize prompt must NOT stall the running batch: while its
    chunks prefill (one per step), the incumbent request keeps producing
    one token per step (tp_worker.py:411-570 interleaving parity)."""
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)
    short = [int(x) for x in rng.integers(3, 128, size=8)]
    long_ids = [int(x) for x in rng.integers(3, 128, size=48)]  # 3 chunks
    want_a = _offline_greedy(params, cfg, short, 12)
    want_b = _offline_greedy(params, cfg, long_ids, 6)

    a = Request(rid="a", input_ids=list(short), max_new_tokens=12)
    engine.add_request(a)
    engine.step()                       # a admitted + first token
    engine.step()                       # a decoding
    n_before = len(a.output_ids)
    b = Request(rid="b", input_ids=list(long_ids), max_new_tokens=6)
    engine.add_request(b)
    ticks = 0
    while b.prefill_active or not b.output_ids:
        engine.step()
        ticks += 1
        assert ticks < 10
        # incumbent advanced every step despite the ongoing prefill
        assert len(a.output_ids) >= n_before + ticks or \
            a.finished is not None
    assert ticks >= 2                   # prefill really was chunked
                                        # (48 new tokens / 32 bucket)
    _run_engine(engine, [])        # drain to completion
    assert a.output_ids == want_a
    assert b.output_ids == want_b
    assert engine.check_memory()["leaked"] == 0


def test_jump_forward_retokenization_healing(tiny_engine, rng):
    """After a forced jump-forward stretch, the engine re-tokenizes the
    output text and rewinds the row so the KV matches the canonical
    tokenization (srt/constrained/jump_forward.py parity): forced ids
    [5, 6] ('ab'+'cd') must be healed to the canonical [7] ('abcd') and
    the continuation must equal greedy decoding from the healed ids."""
    params, cfg, ecfg = tiny_engine

    surfaces = {5: "ab", 6: "cd", 7: "abcd"}

    class FakeTok:
        def decode(self, ids, **kw):
            return "".join(surfaces.get(int(t), f"<{int(t)}>")
                           for t in ids)

        def encode(self, text, **kw):
            out = []
            i = 0
            toks = sorted(surfaces.items(), key=lambda kv: -len(kv[1]))
            while i < len(text):
                if text[i] == "<":
                    j = text.index(">", i)
                    out.append(int(text[i + 1:j]))
                    i = j + 1
                    continue
                for tid, s in toks:
                    if text.startswith(s, i):
                        out.append(tid)
                        i += len(s)
                        break
                else:
                    raise ValueError(text[i:])
            return out

    class ForceOnce:
        """Forces 'ab','cd' once, then unconstrained."""
        def __init__(self):
            self.fired = False
            self.finished = False

        def mask(self, v):
            return np.ones((v,), bool)

        def advance(self, tok):
            pass

        def forced_run(self, budget):
            if self.fired:
                return []
            self.fired = True
            return [5, 6]

    engine = ServeEngine(params, cfg, ecfg, tokenizer=FakeTok())
    ids = [int(x) for x in rng.integers(8, 128, size=10)]
    req = Request(rid="h", input_ids=list(ids), max_new_tokens=6,
                  constraint=ForceOnce(), eos_ids=(-1,))
    done = _run_engine(engine, [req])
    out = done["h"].output_ids
    t0 = out[0]
    # healed: [t0, 7], NOT [t0, 5, 6]
    assert out[1] == 7 and 5 not in out[:2] and 6 not in out[:2], out
    # continuation equals greedy decoding from prompt + healed ids
    want_cont = _offline_greedy(params, cfg, ids + [t0, 7],
                                6 - len(out[:2]))
    assert out[2:] == want_cont, (out, want_cont)


def test_auto_engine_config_sizing():
    """HBM auto-sizing (sglang model_runner profile analog): batch and
    pool sized from an explicit budget; accounting matches the real
    row-buffer shapes."""
    import dataclasses as dc
    from aurora_tpu.models.llama import LlamaConfig
    from aurora_tpu.serve.engine import (EngineConfig, auto_engine_config,
                                         kv_bytes_per_token_layer,
                                         row_buffer_bytes)
    cfg = LlamaConfig.vicuna_7b_v15_16k()
    base = EngineConfig(max_batch=0, max_seq_len=2048, num_slots=0,
                        kv_quant="int8")
    # ~2.2GB free after a W8 7B on a 16GB chip
    ecfg = auto_engine_config(cfg, base, budget_bytes=int(2.2e9))
    assert ecfg.max_batch >= 2
    assert ecfg.num_slots > ecfg.max_batch * ecfg.s_row  # pool non-trivial
    per_slot = (cfg.num_hidden_layers
                * kv_bytes_per_token_layer(cfg, "int8", None))
    total = row_buffer_bytes(cfg, ecfg) + ecfg.num_slots * per_slot
    assert total <= 2.2e9 * 1.01
    # int8 KV fits ~2x the batch of bf16 at the same budget
    bf16 = auto_engine_config(
        cfg, dc.replace(base, kv_quant="none"), budget_bytes=int(2.2e9))
    assert ecfg.max_batch >= 2 * bf16.max_batch
    # explicit values are left untouched
    fixed = EngineConfig(max_batch=4, max_seq_len=2048, num_slots=999)
    assert auto_engine_config(cfg, fixed,
                              budget_bytes=int(2.2e9)) == fixed
    # no-stats fallback path (budget_bytes=None on CPU) still returns a
    # usable config
    auto = auto_engine_config(cfg, base)
    assert auto.max_batch >= 1 and auto.num_slots >= 1


@pytest.mark.parametrize("wq", ["none", "int8", "int4"])
def test_fused_weight_streams_parity(tiny_engine, rng, wq):
    """Explicit qkv/gateup fusion (fuse_serving_weights — the
    QKVParallelLinear analog, a pre-processing step in cli/serve.py and
    bench.py) must be token-exact vs the per-name layout, bf16 and W8."""
    import dataclasses as dc
    from aurora_tpu.serve.engine import (fuse_serving_weights,
                                         quantize_weights_int8)
    params, cfg, ecfg = tiny_engine
    ecfg = dc.replace(ecfg, weight_quant=wq)
    prompts = [[int(x) for x in rng.integers(3, 128, size=n)]
               for n in (13, 21)]

    def run(p):
        eng = ServeEngine(p, cfg, ecfg)
        done = _run_engine(eng, [
            Request(rid=f"r{i}", input_ids=list(ids), max_new_tokens=6,
                    eos_ids=(-1,)) for i, ids in enumerate(prompts)])
        return [done[f"r{i}"].output_ids for i in range(len(prompts))]

    plain = run({**params, "layers": dict(params["layers"])})
    fused_tree = fuse_serving_weights(
        {**params, "layers": dict(params["layers"])})
    if wq == "int8":
        # pre-quantize + fuse (production order: quantize THEN fuse)
        q = quantize_weights_int8(
            {**params, "layers": dict(params["layers"])})
        fused_tree = fuse_serving_weights(q)
        assert "qkv_scale" in fused_tree["layers"]
    elif wq == "int4":
        from aurora_tpu.serve.engine import quantize_weights_int4
        q = quantize_weights_int4(
            {**params, "layers": dict(params["layers"])})
        fused_tree = fuse_serving_weights(q)
        assert "qkv_scale4" in fused_tree["layers"]
    assert "qkv" in fused_tree["layers"]
    assert "gateup" in fused_tree["layers"]
    fused = run(fused_tree)
    assert fused == plain
    # source tree untouched without free_source
    assert "q" in params["layers"]


@pytest.mark.parametrize("wq", ["int8", "int4"])
def test_update_weights_on_quantized_engine(tiny_engine, rng, wq):
    """update_weights on a weight-quantized engine quantizes the
    incoming bf16/fp32 tree the same way engine init did (int8 AND
    int4 — the production W4 deployment must stay live-reloadable)."""
    import dataclasses as dc
    params, cfg, ecfg = tiny_engine
    eng = ServeEngine({**params, "layers": dict(params["layers"])}, cfg,
                      dc.replace(ecfg, weight_quant=wq))
    ids = [int(x) for x in rng.integers(3, 128, size=9)]
    out1 = _run_engine(eng, [Request(rid="a", input_ids=list(ids),
                                     max_new_tokens=4, eos_ids=(-1,))])
    other = init_llama_params(jax.random.PRNGKey(123), cfg,
                              dtype=jnp.float32)
    ok, msg = eng.update_weights(other)
    assert ok, msg
    out2 = _run_engine(eng, [Request(rid="b", input_ids=list(ids),
                                     max_new_tokens=4, eos_ids=(-1,))])
    assert out1["a"].output_ids != out2["b"].output_ids
    assert eng.check_memory()["leaked"] == 0


def test_engine_tp2_moe_matches_tp1(rng):
    """TP-sharded MoE serving: expert weights are megatron-sharded on
    the MLP-width axis (router replicated), so the down-proj psum sums
    true partials. Regression: replicated experts + psum returned tp×
    the MLP output. Covers routed experts AND the Qwen2-MoE-style
    shared expert (sigmoid scalar gate distributes over the psum)."""
    import dataclasses as dc
    cfg = dc.replace(LlamaConfig.tiny(vocab_size=128),
                     num_experts=4, num_experts_per_tok=2)
    params = init_llama_params(jax.random.PRNGKey(11), cfg,
                               dtype=jnp.float32)
    lay = params["layers"]
    assert "moe_router" in lay
    L, D, Fs = cfg.num_hidden_layers, cfg.hidden_size, 24
    keys = jax.random.split(jax.random.PRNGKey(12), 4)
    sd = 0.2 / np.sqrt(D)
    lay["moe_shared_gate"] = sd * jax.random.normal(
        keys[0], (L, D, Fs), jnp.float32)
    lay["moe_shared_up"] = sd * jax.random.normal(
        keys[1], (L, D, Fs), jnp.float32)
    lay["moe_shared_down"] = sd * jax.random.normal(
        keys[2], (L, Fs, D), jnp.float32)
    lay["moe_shared_gate_w"] = sd * jax.random.normal(
        keys[3], (L, D, 1), jnp.float32)
    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    ids = [int(x) for x in rng.integers(3, 128, size=13)]

    def run(tp):
        eng = ServeEngine({**params, "layers": dict(lay)}, cfg,
                          __import__("dataclasses").replace(ecfg, tp=tp))
        done = _run_engine(eng, [Request(rid="m", input_ids=list(ids),
                                         max_new_tokens=6,
                                         eos_ids=(-1,))])
        assert eng.check_memory()["leaked"] == 0
        return done["m"].output_ids

    t1 = run(1)
    assert run(2) == t1


def test_sample_core_min_p_post_top_p_consistency(rng):
    """min-p filters on the SAME (post-top-p renormalized) distribution
    as its pmax. Regression: pre-top-p pmax vs post-top-p candidate
    probs let sub-threshold tokens survive (up to 1/top_p too lenient)."""
    import jax
    from aurora_tpu.serve.engine import _sample_core

    # raw probs ∝ [0.5, 0.3, 0.2, ...tail]; top_p=0.5 keeps the first
    # two → renormalized [0.625, 0.375]; min_p=0.7 must then drop the
    # second (0.375 < 0.7×0.625). The buggy mix compared 0.375 against
    # 0.7×0.5=0.35 and kept it.
    V = 64
    base = np.full(V, 1e-6)
    base[:3] = [0.5, 0.3, 0.2]
    logits = jnp.asarray([np.log(base / base.sum())], jnp.float32)
    samp = {"temp": jnp.ones(1), "top_p": jnp.asarray([0.5]),
            "top_k": jnp.zeros(1, jnp.int32),
            "min_p": jnp.asarray([0.7]),
            "rep": jnp.ones(1), "freq": jnp.zeros(1),
            "pres": jnp.zeros(1)}
    counts = jnp.zeros((1, V), jnp.float32)
    seen = jnp.zeros((1, V), bool)
    toks = {int(_sample_core(logits, counts, seen, samp, None,
                             jax.random.PRNGKey(k))[0][0])
            for k in range(24)}
    assert toks == {0}, toks


def test_engine_tp_rejects_fused_layout(tiny_engine):
    """tp>1 on a pre-fused qkv/gateup tree must raise, not silently
    compute first-shard heads on every device (tp_param_specs would
    replicate the unknown fused names)."""
    import dataclasses as dc
    from aurora_tpu.serve.engine import fuse_serving_weights
    params, cfg, ecfg = tiny_engine
    fused = fuse_serving_weights({**params,
                                  "layers": dict(params["layers"])})
    with pytest.raises(ValueError, match="fused"):
        ServeEngine(fused, cfg, dc.replace(ecfg, tp=2))


def test_empty_prompt_and_zero_max_new(tiny_engine):
    """Empty prompts and max_new_tokens=0 finish cleanly at add time —
    an empty prompt used to underflow the full-hit back-off and poison
    its whole admission wave; max_new=0 used to emit one token anyway
    (OpenAI max_tokens=0 semantics return zero)."""
    params, cfg, ecfg = tiny_engine
    eng = ServeEngine(dict(params), cfg, ecfg)
    eng.add_request(Request(rid="empty", input_ids=[],
                            max_new_tokens=4))
    eng.add_request(Request(rid="zero", input_ids=[5, 6, 7],
                            max_new_tokens=0))
    eng.add_request(Request(rid="ok", input_ids=[5, 6, 7],
                            max_new_tokens=3, eos_ids=(-1,)))
    done = {}
    for _ in range(50):
        for r in eng.step():
            done[r.rid] = r
        if not eng.has_work():
            break
    assert done["empty"].error and not done["empty"].output_ids
    assert done["zero"].error is None
    assert done["zero"].output_ids == []
    assert len(done["ok"].output_ids) == 3
    assert eng.check_memory()["leaked"] == 0


def test_wave_isolation_single_poison_request(tiny_engine, rng):
    """A request that fails inside the batched extend must abort ALONE:
    the engine retries co-admitted requests one-by-one (regression: the
    whole wave was aborted together)."""
    params, cfg, ecfg = tiny_engine
    eng = ServeEngine(dict(params), cfg, ecfg)
    orig = eng._extend_wave

    def flaky(wave):
        if any(r.rid == "bad" for r in wave):
            raise RuntimeError("poison lane")
        return orig(wave)

    eng._extend_wave = flaky
    reqs = [Request(rid="g1", input_ids=[int(x) for x in
                                         rng.integers(3, 128, size=7)],
                    max_new_tokens=3, eos_ids=(-1,)),
            Request(rid="bad", input_ids=[int(x) for x in
                                          rng.integers(3, 128, size=8)],
                    max_new_tokens=3, eos_ids=(-1,)),
            Request(rid="g2", input_ids=[int(x) for x in
                                         rng.integers(3, 128, size=9)],
                    max_new_tokens=3, eos_ids=(-1,))]
    done = _run_engine(eng, reqs)
    assert done["bad"].error is not None
    assert done["g1"].error is None and len(done["g1"].output_ids) == 3
    assert done["g2"].error is None and len(done["g2"].output_ids) == 3
    assert eng.check_memory()["leaked"] == 0


def test_moe_weights_quantized_int8(rng):
    """weight_quant='int8' quantizes the MoE expert stacks (regression:
    only dense names were quantized — a near-no-op for MoE families) and
    the dequant-in-dot serving output stays sound."""
    import dataclasses as dc
    from aurora_tpu.serve.engine import quantize_weights_int8
    cfg = dc.replace(LlamaConfig.tiny(vocab_size=128),
                     num_experts=4, num_experts_per_tok=2)
    params = init_llama_params(jax.random.PRNGKey(21), cfg,
                               dtype=jnp.float32)
    qp = quantize_weights_int8({**params,
                                "layers": dict(params["layers"])})
    assert qp["layers"]["moe_gate"].dtype == jnp.int8
    assert "moe_gate_scale" in qp["layers"]
    assert qp["layers"]["moe_down"].dtype == jnp.int8
    assert qp["layers"]["moe_router"].dtype != jnp.int8  # routing stays fp

    ecfg = EngineConfig(max_batch=2, max_seq_len=64, num_slots=256,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        kv_chunk=16)
    ids = [int(x) for x in rng.integers(3, 128, size=11)]
    from aurora_tpu.models.llama import llama_apply
    ref, _ = llama_apply(params, cfg, input_ids=jnp.asarray([ids]))
    eng = ServeEngine({**params, "layers": dict(params["layers"])}, cfg,
                      dc.replace(ecfg, weight_quant="int8"))
    done = _run_engine(eng, [Request(rid="m", input_ids=list(ids),
                                     max_new_tokens=4, eos_ids=(-1,))])
    assert len(done["m"].output_ids) == 4
    # per-channel W8 on a tiny fp32 model: first greedy token agrees
    assert done["m"].output_ids[0] == int(jnp.argmax(ref[0, -1]))


def test_fail_running_rebuilds_deleted_buffers(tiny_engine, rng):
    """A runtime failure inside a compiled step can invalidate DONATED
    inputs; fail_running must rebuild dead buffers so the engine keeps
    serving (regression: every later step raised 'Array has been
    deleted' forever)."""
    params, cfg, ecfg = tiny_engine
    eng = ServeEngine(dict(params), cfg, ecfg)
    ids = [int(x) for x in rng.integers(3, 128, size=8)]
    done = _run_engine(eng, [Request(rid="a", input_ids=list(ids),
                                     max_new_tokens=3, eos_ids=(-1,))])
    assert len(done["a"].output_ids) == 3
    # simulate a mid-call donation loss: delete the live KV rows
    for leaf in eng.rows.values():
        leaf.delete()
    eng.fail_running()
    assert not any(x.is_deleted()
                   for x in eng.rows.values())
    done2 = _run_engine(eng, [Request(rid="b", input_ids=list(ids),
                                      max_new_tokens=3, eos_ids=(-1,))])
    assert len(done2["b"].output_ids) == 3
    assert eng.check_memory()["leaked"] == 0


def test_system_error_reraises_not_isolated(tiny_engine, rng):
    """A kernel COMPILE failure / device OOM during an extend wave is a
    deployment property, not a request property: the engine must abort
    the wave AND re-raise to the step() caller, never retry it
    per-request (round-4: a deterministic int8-extend compile failure
    was 'isolated' into N more ~20s failed compiles while every request
    aborted silently — the driver bench timed pure compile thrash as
    serving). Request-level errors keep the per-request isolation."""
    params, cfg, ecfg = tiny_engine
    engine = ServeEngine(params, cfg, ecfg)

    class FakeXlaRuntimeError(RuntimeError):
        pass
    FakeXlaRuntimeError.__name__ = "XlaRuntimeError"

    calls = []
    orig = engine._extend_fn

    def boom(*a, **kw):
        calls.append(1)
        raise FakeXlaRuntimeError(
            "INTERNAL: Scoped allocation ... exceeded scoped vmem limit")

    engine._extend_fn = boom
    reqs = [Request(rid=f"s{i}",
                    input_ids=[int(x) for x in rng.integers(3, 128, 8)],
                    max_new_tokens=4) for i in range(3)]
    for r in reqs:
        engine.add_request(r)
    with pytest.raises(FakeXlaRuntimeError):
        engine.step()
    assert len(calls) == 1          # no per-request compile retries
    for r in reqs:
        assert r.error and "vmem" in r.error
    # engine stays serviceable once the failure is gone (rows were not
    # donated — the failing call never executed)
    engine._extend_fn = orig
    engine.sched.aborted.clear()
    done = _run_engine(engine, [Request(
        rid="ok", input_ids=[int(x) for x in rng.integers(3, 128, 8)],
        max_new_tokens=4)])
    assert len(done["ok"].output_ids) == 4 and not done["ok"].error
    # a request-level error (ValueError) still isolates per-request
    engine2 = ServeEngine(params, cfg, ecfg)
    n_calls = []
    orig2 = engine2._extend_fn

    def flaky(*a, **kw):
        n_calls.append(1)
        if len(n_calls) == 1:
            raise ValueError("poison request in wave")
        return orig2(*a, **kw)

    engine2._extend_fn = flaky
    reqs2 = [Request(rid=f"p{i}",
                     input_ids=[int(x) for x in rng.integers(3, 128, 8)],
                     max_new_tokens=4) for i in range(2)]
    done2 = _run_engine(engine2, reqs2)
    assert len(n_calls) >= 2        # wave failed -> per-request re-runs
    assert all(len(done2[r.rid].output_ids) == 4 for r in reqs2)


def test_disable_radix_cache_passthrough(tiny_engine, rng):
    """disable_radix_cache=True (sglang --disable-radix-cache /
    ChunkCache parity): outputs match the radix engine exactly, nothing
    is ever cached or matched (the repeat prompt re-prefills from
    scratch), no slots are consumed, and no memory leaks."""
    import dataclasses as dc
    params, cfg, ecfg = tiny_engine
    ids = [int(x) for x in rng.integers(3, 128, size=12)]

    eng_r = ServeEngine(params, cfg, ecfg)
    want = {r.rid: r.output_ids for r in _run_engine(
        eng_r, [Request(rid="a", input_ids=list(ids), max_new_tokens=6),
                Request(rid="b", input_ids=list(ids),
                        max_new_tokens=6)]).values()}

    eng = ServeEngine(params, cfg,
                      dc.replace(ecfg, disable_radix_cache=True))
    done = _run_engine(
        eng, [Request(rid="a", input_ids=list(ids), max_new_tokens=6)])
    assert done["a"].output_ids == want["a"]
    assert eng.radix.total_cached_tokens() == 0
    assert eng.alloc.available() == ecfg.num_slots  # no pool copy made
    # the SAME prompt again: no prefix hit, full re-prefill, same output
    done2 = _run_engine(
        eng, [Request(rid="b", input_ids=list(ids), max_new_tokens=6)])
    assert done2["b"].output_ids == want["b"]
    assert done2["b"].n_cached == 0                 # nothing matched
    mem = eng.check_memory()
    assert mem["leaked"] == 0 and mem["cached"] == 0, mem


def test_system_error_aborts_pending_subwaves(rng):
    """A system error in an EARLY sub-wave of _run_wave_chunks must also
    abort the requests queued in the remaining sub-waves (regression:
    they had already claimed KV rows + radix prefix locks in _prepare
    but were in neither sched.running nor sched.aborted, so fail_running
    could never reclaim them — rows and locks leaked permanently and
    those clients hung forever)."""
    cfg = LlamaConfig.tiny(vocab_size=128)
    params = init_llama_params(jax.random.PRNGKey(7), cfg,
                               dtype=jnp.float32)
    ecfg = EngineConfig(max_batch=4, max_seq_len=64, num_slots=512,
                        prefill_buckets=(16, 32), kv_dtype=jnp.float32,
                        max_extend_lanes=1)   # 3 reqs -> 3 sub-waves
    engine = ServeEngine(params, cfg, ecfg)

    class FakeXlaRuntimeError(RuntimeError):
        pass
    FakeXlaRuntimeError.__name__ = "XlaRuntimeError"

    orig = engine._extend_fn

    def boom(*a, **kw):
        raise FakeXlaRuntimeError("RESOURCE_EXHAUSTED: out of memory")

    engine._extend_fn = boom
    reqs = [Request(rid=f"w{i}",
                    input_ids=[int(x) for x in rng.integers(3, 128, 8)],
                    max_new_tokens=4) for i in range(3)]
    for r in reqs:
        engine.add_request(r)
    with pytest.raises(FakeXlaRuntimeError):
        engine.step()
    # EVERY request — including the sub-waves that never ran — is
    # aborted with its row freed and its radix lock dropped
    for r in reqs:
        assert r.finished is not None, r.rid
        assert r.error, r.rid
        assert not r.prefix_locked, r.rid
    assert all(x is None for x in engine.row_reqs)
    assert {r.rid for r in engine.sched.aborted} == {r.rid for r in reqs}
    assert not engine.sched.running and not engine.sched.waiting
    # rows/locks reclaimed -> the engine still has full capacity
    engine._extend_fn = orig
    engine.sched.aborted.clear()
    done = _run_engine(engine, [Request(
        rid="ok", input_ids=[int(x) for x in rng.integers(3, 128, 8)],
        max_new_tokens=4)])
    assert len(done["ok"].output_ids) == 4 and not done["ok"].error
    assert engine.check_memory()["leaked"] == 0


# ---------------------------------------------------------------------------
# Windowed KV writes (engine._write_kv_window / engine._load_prefix)
# ---------------------------------------------------------------------------

def _scatter_oracle(rows, l, k, v, scales, row_ids, offs, lens):
    """NumPy oracle of the REPLACED advanced-index scatter's drop
    semantics: token t of lane i lands at rows[name][l, row, :, off+t]
    iff off+t < kv_len (and < S); everything else is untouched."""
    out = {n: np.array(a) for n, a in rows.items()}
    Bk, T = k.shape[:2]
    S = out["k"].shape[3]
    for i in range(Bk):
        for t in range(T):
            pos = int(offs[i]) + t
            if pos >= int(lens[i]) or pos >= S:
                continue
            out["k"][l, row_ids[i], :, pos] = k[i, t]
            out["v"][l, row_ids[i], :, pos] = v[i, t]
            if scales is not None:
                out["ks"][l, row_ids[i], :, pos] = scales[0][i, t]
                out["vs"][l, row_ids[i], :, pos] = scales[1][i, t]
    return out


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize(
    "case",
    ["interior",      # plain mid-row writes
     "tail_clamp",    # off > S-T: window clamps, shift > 0
     "bucket_gt_row",  # T > S: bucket wider than the row
     "padded_lane"])  # kv_len=0 lanes must not disturb anything
def test_write_kv_window_matches_scatter_semantics(case, quant, rng):
    from aurora_tpu.serve.engine import _write_kv_window
    L, B, Hkv, hd = 3, 4, 2, 8
    S, T = (6, 16) if case == "bucket_gt_row" else (32, 8)
    Bk = 3
    rows = {"k": jnp.asarray(rng.normal(size=(L, B, Hkv, S, hd)),
                             jnp.float32),
            "v": jnp.asarray(rng.normal(size=(L, B, Hkv, S, hd)),
                             jnp.float32)}
    if quant:
        rows["ks"] = jnp.asarray(rng.normal(size=(L, B, Hkv, S)),
                                 jnp.float32)
        rows["vs"] = jnp.asarray(rng.normal(size=(L, B, Hkv, S)),
                                 jnp.float32)
    k = rng.normal(size=(Bk, T, Hkv, hd)).astype(np.float32)
    v = rng.normal(size=(Bk, T, Hkv, hd)).astype(np.float32)
    scales = ((rng.normal(size=(Bk, T, Hkv)).astype(np.float32),
               rng.normal(size=(Bk, T, Hkv)).astype(np.float32))
              if quant else None)
    row_ids = np.asarray([2, 0, 3], np.int32)
    if case == "interior":
        offs = np.asarray([0, 5, 11], np.int32)
        lens = offs + np.asarray([T, T - 2, T], np.int32)
    elif case == "tail_clamp":
        offs = np.asarray([S - 3, S - T, 1], np.int32)   # lane 0 shifts
        lens = np.asarray([S, S, 1 + T], np.int32)
    elif case == "bucket_gt_row":
        offs = np.asarray([0, 2, 1], np.int32)
        lens = np.asarray([S, S, 4], np.int32)
    else:  # padded_lane
        offs = np.asarray([3, 0, 0], np.int32)
        lens = np.asarray([3 + T, 0, 0], np.int32)        # lanes 1,2 pad
        row_ids = np.asarray([1, 0, 0], np.int32)         # pads point at
        # row 0 — identity writes there must not corrupt it
    l = 1
    want = _scatter_oracle(rows, l, k, v, scales, row_ids, offs, lens)
    got = jax.jit(_write_kv_window, donate_argnums=(0,))(
        dict(rows), l,
        jnp.asarray(k), jnp.asarray(v),
        None if scales is None else tuple(jnp.asarray(s) for s in scales),
        jnp.asarray(row_ids), jnp.asarray(offs), jnp.asarray(lens))
    for name in want:
        np.testing.assert_array_equal(np.asarray(got[name]), want[name],
                                      err_msg=f"{case}/{name}")


@pytest.mark.parametrize("case", ["interior", "tail", "bucket_gt_row"])
def test_load_prefix_windowed_matches_semantics(case, rng):
    from aurora_tpu.serve.engine import _load_prefix
    L, B, Hkv, hd = 2, 3, 2, 4
    S = 8 if case == "bucket_gt_row" else 24
    nb = 16
    n_slots = 32
    rows = {"k": jnp.asarray(rng.normal(size=(L, B, Hkv, S, hd)),
                             jnp.float32),
            "ks": jnp.asarray(rng.normal(size=(L, B, Hkv, S)),
                              jnp.float32)}
    cache = {"k": jnp.asarray(rng.normal(size=(L, n_slots, Hkv, hd)),
                              jnp.float32),
             "ks": jnp.asarray(rng.normal(size=(L, n_slots, Hkv)),
                               jnp.float32)}
    slots = np.asarray(rng.choice(n_slots, size=nb, replace=False),
                       np.int32)
    row = 1
    if case == "interior":
        start, n_valid = 3, 10
    elif case == "tail":
        start, n_valid = S - 5, 5      # window clamps back, shift > 0
    else:
        start, n_valid = 2, 6          # nb (16) > S (8)
    want = {n: np.array(a) for n, a in rows.items()}
    for i in range(n_valid):
        pos = start + i
        if pos >= S:
            continue
        want["k"][:, row, :, pos] = np.asarray(cache["k"])[:, slots[i]]
        want["ks"][:, row, :, pos] = np.asarray(cache["ks"])[:, slots[i]]
    got = _load_prefix(dict(rows), cache, jnp.asarray(slots),
                       jnp.asarray(row, np.int32),
                       jnp.asarray(start, np.int32),
                       jnp.asarray(n_valid, np.int32))
    for name in want:
        np.testing.assert_array_equal(np.asarray(got[name]), want[name],
                                      err_msg=f"{case}/{name}")
