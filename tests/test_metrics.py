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
