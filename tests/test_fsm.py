"""Regex→FSM constrained decoding + jump-forward tests
(srt/constrained/fsm_cache.py + jump_forward.py parity)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.models.llama import LlamaConfig, init_llama_params
from aurora_tpu.serve.engine import EngineConfig, ServeEngine
from aurora_tpu.serve.fsm import (RegexConstraint, RegexDFA, TokenFSM,
                                  get_token_fsm)
from aurora_tpu.serve.scheduler import Request

from utils import make_tiny_tokenizer


@pytest.mark.parametrize("pattern,accept,reject", [
    (r"abc", ["abc"], ["ab", "abcd"]),
    (r"a*b+", ["b", "aab", "abbb"], ["a", ""]),
    (r"(ab|cd){1,2}", ["ab", "abcd", "cdcd"], ["abcdab", "a"]),
    (r"[^x]+", ["abc", "yz"], ["ax", ""]),
    (r"\d+\.\d+", ["3.14", "10.0"], ["3.", ".5", "3"]),
    (r"-?\d{1,3}", ["7", "-42", "123"], ["1234", "-", ""]),
])
def test_regex_dfa_vs_python_re(pattern, accept, reject):
    alphabet = sorted(set(
        "abcdefghijklmnopqrstuvwxyz0123456789.-xyz"))
    dfa = RegexDFA(pattern, alphabet)
    for t in accept:
        assert dfa.accepts[dfa.walk(0, t)], (pattern, t)
        assert re.fullmatch(pattern, t)
    for t in reject:
        assert not dfa.accepts[dfa.walk(0, t)], (pattern, t)
        assert not re.fullmatch(pattern, t)


def test_token_fsm_allowed_sets(tmp_path):
    tok = make_tiny_tokenizer(str(tmp_path / "tok"))
    V = tok.vocab_size
    fsm = TokenFSM(r"[0-9]+", tok, V)
    allowed0 = np.nonzero(fsm.allowed[0])[0]
    assert len(allowed0) > 0
    for tid in allowed0[:20]:
        s = tok.decode([int(tid)])
        assert s and all(c in "0123456789" for c in s), (tid, s)


def test_token_fsm_cache(tmp_path):
    tok = make_tiny_tokenizer(str(tmp_path / "tok"))
    a = get_token_fsm(r"ab+", tok, tok.vocab_size)
    b = get_token_fsm(r"ab+", tok, tok.vocab_size)
    assert a is b


@pytest.fixture(scope="module")
def fsm_engine(tmp_path_factory):
    cfg = LlamaConfig.tiny(vocab_size=512)
    params = init_llama_params(jax.random.PRNGKey(11), cfg,
                               dtype=jnp.float32)
    tok = make_tiny_tokenizer(str(tmp_path_factory.mktemp("tok")))
    ecfg = EngineConfig(max_batch=2, max_seq_len=128, num_slots=512,
                        prefill_buckets=(16, 64), kv_dtype=jnp.float32)
    return params, cfg, tok, ecfg


def _run(engine, reqs):
    from utils import drain_engine
    return drain_engine(engine, reqs)


def test_engine_regex_output_matches_pattern(fsm_engine, rng):
    """JSON-schema-style regex through the live engine → valid output."""
    params, cfg, tok, ecfg = fsm_engine
    engine = ServeEngine(params, cfg, ecfg, tokenizer=tok)
    pattern = r'\{"age": [0-9]{1,3}\}'
    ids = [int(x) for x in rng.integers(3, 500, size=8)]
    c = RegexConstraint(pattern, tok, cfg.vocab_size, eos_ids=(2,))
    done = _run(engine, [Request(rid="j", input_ids=ids,
                                 max_new_tokens=64, eos_ids=(2,),
                                 constraint=c)])
    out = done["j"]
    # the tiny WordLevel tokenizer joins with spaces on batch decode;
    # reassemble from per-token surface strings
    text = "".join(tok.decode([t], skip_special_tokens=True)
                   for t in out.output_ids)
    assert re.fullmatch(pattern, text), text
    assert out.finished.value == "stop"
    assert engine.check_memory()["leaked"] == 0


def test_engine_jump_forward_skips_decode_steps(fsm_engine, rng):
    """The forced JSON scaffolding must be written via extend calls, not
    per-token decode steps: engine._steps stays well below the output
    length."""
    params, cfg, tok, ecfg = fsm_engine
    engine = ServeEngine(params, cfg, ecfg, tokenizer=tok)
    pattern = r'\{"result": "(yes|no)", "confidence": [0-9]\}'
    ids = [int(x) for x in rng.integers(3, 500, size=6)]
    c = RegexConstraint(pattern, tok, cfg.vocab_size, eos_ids=(2,))
    done = _run(engine, [Request(rid="jf", input_ids=ids,
                                 max_new_tokens=80, eos_ids=(2,),
                                 constraint=c)])
    out = done["jf"]
    text = "".join(tok.decode([t], skip_special_tokens=True)
                   for t in out.output_ids)
    assert re.fullmatch(pattern, text), text
    # the scaffolding (~30 chars) is forced; only a handful of positions
    # are free choices — decode steps must be far fewer than tokens
    assert engine._steps < len(out.output_ids) / 2, (
        engine._steps, len(out.output_ids))


def test_regex_constraint_forced_run_semantics(tmp_path):
    tok = make_tiny_tokenizer(str(tmp_path / "tok"))
    c = RegexConstraint(r"abc(x|y)", tok, tok.vocab_size, eos_ids=(2,))
    allowed = c.allowed_tokens()
    assert allowed
    first = allowed[0]
    c.advance(first)
    forced = c.forced_run(32)
    # after consuming the first allowed token the 'abc' stem is forced
    # up to the (x|y) branch
    assert all(isinstance(t, int) for t in forced)
    # the branch point leaves >1 option
    assert len(c.allowed_tokens()) >= 2 or c.finished


# ---------------------------------------------------------------------------
# Round-2 review regression tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pattern,accept,reject", [
    (r"\D+", ["abc", "x y"], ["a1", "5"]),       # negated escapes
    (r"\S+", ["abc"], ["a b", " "]),
    (r"[\D]+", ["ab"], ["a1"]),                  # negated escape in class
    (r"[\d\s]+", ["1 2", "34"], ["a1"]),
    (r"a{0}b", ["b"], ["ab"]),                   # x{0} is epsilon
    (r"ab{0,2}c", ["ac", "abc", "abbc"], ["abbbc"]),
])
def test_regex_dfa_review_fixes(pattern, accept, reject):
    import re
    alphabet = sorted(set("abcxy 12345\n\t"))
    dfa = RegexDFA(pattern, alphabet)
    for t in accept:
        assert dfa.accepts[dfa.walk(0, t)], (pattern, t)
        assert re.fullmatch(pattern, t)
    for t in reject:
        assert not dfa.accepts[dfa.walk(0, t)], (pattern, t)
        assert not re.fullmatch(pattern, t)


def test_regex_dot_excludes_newline():
    import re
    dfa = RegexDFA(r".+", sorted(set("ab\n")))
    assert dfa.accepts[dfa.walk(0, "ab")]
    assert not dfa.accepts[dfa.walk(0, "a\nb")]
    assert not re.fullmatch(r".+", "a\nb")


def test_regex_pattern_validation():
    """Malformed / over-complex patterns raise ValueError (the API maps
    it to 400) instead of IndexError or unbounded expansion."""
    alphabet = list("ab")
    for bad in ("[abc", "a{2", "a{5,2}", "a{99999}", "(a|b"):
        with pytest.raises(ValueError):
            RegexDFA(bad, alphabet)


def test_fsm_cache_respects_special_ids(tmp_path):
    tok = make_tiny_tokenizer(str(tmp_path / "tok"))
    a = get_token_fsm(r"xy+", tok, tok.vocab_size, special_ids=(0, 1))
    b = get_token_fsm(r"xy+", tok, tok.vocab_size, special_ids=())
    assert a is not b
    assert a is get_token_fsm(r"xy+", tok, tok.vocab_size,
                              special_ids=(1, 0))  # order-insensitive


def test_surface_byte_level_tokens():
    """GPT-2 byte-unicode and sentencepiece byte-fallback surfaces."""
    from aurora_tpu.serve.fsm import _surface
    assert _surface("Ġhello") == " hello"
    assert _surface("ĉ") == "\t"          # tab via byte table
    assert _surface("Ċ") == "\n"
    assert _surface("<0x0A>") == "\n"
    assert _surface("▁word") == " word"
