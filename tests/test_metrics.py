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


def test_bleu_exact_match_and_hand_computed():
    from aurora_tpu.eval.metrics import bleu
    # identical candidate/reference → 1.0 at every order
    corpus, per = bleu(["the cat sat on the mat"],
                       [["the cat sat on the mat"]], n=4)
    assert abs(corpus - 1.0) < 1e-9
    assert abs(per[0] - 1.0) < 1e-6
    # hand-computed BLEU-2: cand "the cat the cat" vs ref "the cat sat"
    # p1 = 2/4 (the,cat clipped to 1 each), p2 = 1/3, bp = 1 (4 >= 3)
    import math
    corpus, _ = bleu(["the cat the cat"], [["the cat sat"]], n=2)
    want = math.exp((math.log(0.5) + math.log(1 / 3)) / 2)
    assert abs(corpus - want) < 1e-9
    # zero 4-gram overlap → corpus BLEU-4 is 0 (no smoothing at corpus level)
    corpus, _ = bleu(["the cat the cat"], [["the cat sat"]], n=4)
    assert corpus == 0.0


def test_bleu_brevity_penalty():
    import math
    from aurora_tpu.eval.metrics import bleu
    # cand is a strict 3-token prefix of the 6-token ref: precisions all
    # 1, bp = exp(1 - 6/3)
    corpus, _ = bleu(["the cat sat"], [["the cat sat on the mat"]], n=2)
    assert abs(corpus - math.exp(1 - 6 / 3)) < 1e-9
    # closest-reference length: a 3-token ref is available → bp = 1
    corpus, _ = bleu(["the cat sat"],
                     [["the cat sat on the mat", "the cat sat"]], n=2)
    assert abs(corpus - 1.0) < 1e-9


def test_rouge_l_hand_computed():
    from aurora_tpu.eval.metrics import rouge_l
    corpus, per = rouge_l(["the cat sat"], [["the cat sat"]])
    assert abs(corpus - 1.0) < 1e-9
    # lcs=3, P=3/3, R=3/6, beta=1.2 → F = (1+b^2)PR / (R + b^2 P)
    b2 = 1.2 ** 2
    want = (1 + b2) * 1.0 * 0.5 / (0.5 + b2 * 1.0)
    corpus, _ = rouge_l(["the cat sat"], [["the cat sat on the mat"]])
    assert abs(corpus - want) < 1e-9
    # best-reference semantics: adding a worse ref can't lower the score
    corpus2, _ = rouge_l(["the cat sat"],
                         [["zz yy xx", "the cat sat on the mat"]])
    assert abs(corpus2 - want) < 1e-9
    # disjoint → 0
    corpus, _ = rouge_l(["aa bb"], [["cc dd"]])
    assert corpus == 0.0
