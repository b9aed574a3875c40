"""Eval metric tests (xtuner MMLUMetric/RewardMetric parity surface)."""

import jax.numpy as jnp
import numpy as np

from aurora_tpu.eval.metrics import (anls, exact_match, mmlu_accuracy,
                                     reward_accuracy)

from utils import make_tiny_xtuner_dir  # noqa: E402


def test_exact_match_and_anls():
    assert exact_match(["a", "b "], ["a", "b"]) == 1.0
    assert exact_match(["a", "x"], ["a", "b"]) == 0.5
    assert anls("hello", "hello") == 1.0
    assert anls("hello", "hallo") > 0.5
    assert anls("abc", "xyz") == 0.0


def test_reward_accuracy():
    out = reward_accuracy([1.0, 2.0, 0.1], [0.5, 2.5, 0.0])
    np.testing.assert_allclose(out["accuracy"], 2 / 3)


def test_mmlu_accuracy_with_tiny_model(tmp_path, rng):
    from aurora_tpu.eval.models import AuroraCapEval
    root, *_ = make_tiny_xtuner_dir(tmp_path / "m")
    model = AuroraCapEval(pretrained=root, dtype=jnp.float32)
    docs = [{"prompt": "Question: pick.\nAnswer:", "answer": "A"},
            {"prompt": "Question: pick two.\nAnswer:", "answer": "B"}]
    out = mmlu_accuracy(model, docs, model.tokenizer,
                        choices=("A", "B"))
    assert out["n"] == 2
    assert 0.0 <= out["accuracy"] <= 1.0


def test_cider_d_sanity():
    """CIDEr-D: exact match scores near the 10-point ceiling, unrelated
    captions near zero, partial overlap in between; corpus score is the
    mean of per-sample scores (pycocoevalcap semantics)."""
    from aurora_tpu.eval.metrics import cider_d
    refs = [["a man riding a horse on the beach",
             "a person rides a horse along the shore"],
            ["two dogs playing with a ball in the park",
             "dogs play fetch on the grass"],
            ["a red car parked next to a building",
             "a red vehicle in front of an office"]]
    exact = [r[0] for r in refs]
    corpus, per = cider_d(exact, refs)
    assert corpus > 4.0, corpus           # exact match → high
    assert len(per) == 3
    assert abs(corpus - sum(per) / 3) < 1e-9

    unrelated = ["quantum entanglement spectra",
                 "tax forms due in april",
                 "seventeen purple umbrellas"]
    low, _ = cider_d(unrelated, refs)
    assert low < 0.5, low

    partial = ["a man riding a bicycle on the road",
               "two cats playing with a ball",
               "a blue car parked next to a tree"]
    mid, _ = cider_d(partial, refs)
    assert low < mid < corpus


def test_cider_d_length_penalty():
    """Same n-gram overlap, wildly different length → gaussian penalty
    (idf needs a multi-image corpus: a 1-doc corpus has zero idf)."""
    from aurora_tpu.eval.metrics import cider_d
    refs = [["a cat sits on a mat"],
            ["a dog runs in the yard"],
            ["birds fly over the lake"]]
    exact = ["a cat sits on a mat", "a dog runs in the yard",
             "birds fly over the lake"]
    padded = ["a cat sits on a mat zz yy xx ww vv uu tt ss rr qq",
              "a dog runs in the yard", "birds fly over the lake"]
    hi, per_hi = cider_d(exact, refs)
    lo, per_lo = cider_d(padded, refs)
    assert per_lo[0] < per_hi[0]
    assert lo < hi
