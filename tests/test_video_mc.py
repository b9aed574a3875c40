"""Multiple-choice video benchmark tests: extraction/accuracy protocol
parity + generation and loglikelihood variants end-to-end through the
evaluator with the tiny model."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.eval.evaluator import simple_evaluate
from aurora_tpu.eval.tasks import video_mc as vm

from utils import make_tiny_xtuner_dir  # noqa: E402


def test_videomme_letter_extraction():
    # videomme/utils.py:336-356 protocol
    assert vm.extract_characters_regex("The best answer is B.") == "B"
    assert vm.extract_characters_regex(" C") == "C"
    assert vm.extract_characters_regex("(D) because ...") == "D"
    assert vm.extract_characters_regex(
        "it is hard to say what happens in this very long video clip "
        "with many events and no clear answer whatsoever") == ""
    assert vm.extract_characters_regex("") == ""


def test_videomme_prompt_protocol():
    doc = {"question": "What happens?",
           "options": ["A. run", "B. walk", "C. sit", "D. jump"],
           "answer": "A"}
    text = vm.videomme_doc_to_text(doc)
    assert text.startswith(vm.VIDEOMME_OPTION_PROMPT)
    assert text.endswith(vm.VIDEOMME_POST_PROMPT)
    # the stringified options list IS the protocol (utils.py:194)
    assert str(doc["options"]) in text
    out = vm.videomme_process_results(doc, ["The answer is A"])
    assert out["videomme_score"]["pred_answer"] == "A"
    agg = vm.videomme_aggregate([
        {"pred_answer": "A", "answer": "A"},
        {"pred_answer": "B", "answer": "A"}])
    assert agg == 50.0


def test_mvbench_mcq_acc():
    # mvbench/utils.py:105-155 normalization
    assert vm.mcq_acc("A. a cat", "A. a cat") == 1
    assert vm.mcq_acc("A. a cat", "a. A Cat") == 1
    assert vm.mcq_acc("A. a cat", "The answer is (A)") == 1
    assert vm.mcq_acc("A. a cat", "B. a dog") == 0
    assert vm.mcq_acc("a dog", "A Dog!") == 1  # text fallback
    doc = {"question": "q?", "candidates": ["a cat", "a dog"],
           "answer": "a dog"}
    text = vm.mvbench_doc_to_text(doc)
    assert "A. a cat\nB. a dog\n" in text
    assert text.endswith(vm.MVBENCH_POST_PROMPT)
    out = vm.mvbench_process_results(doc, ["B"])
    assert out["mvbench_accuracy"]["score"] == 1
    assert out["mvbench_accuracy"]["gt_letter"] == "B"


def test_parse_multi_choice_response():
    letters = ["A", "B", "C", "D", "E"]
    assert vm.parse_multi_choice_response("(C)", letters) == "C"
    assert vm.parse_multi_choice_response("I pick B ", letters) == "B"
    assert vm.parse_multi_choice_response("D.", letters) == "D"
    assert vm.parse_multi_choice_response(
        "first A then finally (B)", letters) == "B"


def test_ppl_argmax():
    assert vm.ppl_argmax([-5.0, -1.0, -3.0]) == 1


def test_tempcompass_rule_match():
    doc = {"question": "q", "answer": "B. clockwise"}
    assert vm.tempcompass_process_results(
        doc, ["B"])["tempcompass_accuracy"] == 1.0
    assert vm.tempcompass_process_results(
        doc, ["B. clockwise"])["tempcompass_accuracy"] == 1.0
    assert vm.tempcompass_process_results(
        doc, ["clockwise"])["tempcompass_accuracy"] == 1.0
    assert vm.tempcompass_process_results(
        doc, ["A"])["tempcompass_accuracy"] == 0.0


@pytest.fixture(scope="module")
def mc_env(tmp_path_factory):
    rng = np.random.default_rng(0)
    base = tmp_path_factory.mktemp("video_mc")
    vid = rng.integers(0, 255, (2, 56, 56, 3)).astype(np.uint8)
    np.save(base / "v0.npy", vid)
    root, *_ = make_tiny_xtuner_dir(base / "model")
    from aurora_tpu.eval.models import AuroraCapEval
    model = AuroraCapEval(pretrained=root, token_merge_ratio=1.0,
                          num_frames=2, image_size=56,
                          max_new_tokens=4, dtype=jnp.float32)
    return base, model


def test_videomme_and_mvbench_generation_e2e(mc_env):
    base, model = mc_env
    with open(base / "vmme.jsonl", "w") as f:
        f.write(json.dumps({
            "video_name": "v0", "_root": str(base),
            "question": "What happens?",
            "options": ["A. run", "B. walk", "C. sit", "D. jump"],
            "answer": "A", "duration": "short"}) + "\n")
    with open(base / "mvb.jsonl", "w") as f:
        f.write(json.dumps({
            "video_name": "v0", "_root": str(base),
            "question": "What moves?",
            "candidates": ["a cat", "a dog"],
            "answer": "a dog"}) + "\n")
    vm.register_videomme(str(base / "vmme.jsonl"), name="vmme_tiny",
                         max_new_tokens=4)
    vm.register_mvbench(str(base / "mvb.jsonl"), name="mvb_tiny",
                        max_new_tokens=4)
    res = simple_evaluate(model, ["vmme_tiny", "mvb_tiny"])
    assert 0 <= res["results"]["vmme_tiny"]["videomme_score"]["value"] \
        <= 100
    assert 0 <= res["results"]["mvb_tiny"]["mvbench_accuracy"]["value"] \
        <= 100


def test_egoschema_ppl_e2e(mc_env):
    """mc_ppl flow: per-choice multimodal loglikelihood through the
    evaluator (output_type='loglikelihood')."""
    base, model = mc_env
    with open(base / "ego.jsonl", "w") as f:
        for q in range(2):
            f.write(json.dumps({
                "video_name": "v0", "_root": str(base),
                "question": f"what is happening {q}?",
                "option": ["running fast", "sleeping quietly",
                           "eating food", "jumping high",
                           "swimming slowly"],
                "answer": q}) + "\n")
    vm.register_egoschema(str(base / "ego.jsonl"), name="ego_tiny")
    res = simple_evaluate(model, ["ego_tiny_ppl"], log_samples=True)
    out = res["results"]["ego_tiny_ppl"]
    assert out["_n"] == 2
    assert 0.0 <= out["egoschema_accuracy"]["value"] <= 1.0
    # every sample's pred is a 5-entry loglikelihood list of finite floats
    for s in res["samples"]["ego_tiny_ppl"]:
        assert len(s["pred"]) == 5
        assert all(np.isfinite(v) and v <= 0.0 for v in s["pred"])


def test_nextqa_and_perceptiontest_registration(mc_env, tmp_path):
    base, model = mc_env
    with open(base / "nextqa.jsonl", "w") as f:
        f.write(json.dumps({
            "video_name": "v0", "_root": str(base),
            "question": "why?", "a0": "x", "a1": "y", "a2": "z",
            "a3": "w", "a4": "v", "answer": 3}) + "\n")
    gen, ppl = vm.register_nextqa(str(base / "nextqa.jsonl"),
                                  name="nextqa_tiny")
    assert ppl.output_type == "loglikelihood"
    doc = json.loads(open(base / "nextqa.jsonl").read())
    assert "A. x" in vm.nextqa_doc_to_text_mc(doc)
    assert vm.nextqa_doc_to_choice(doc) == ["x", "y", "z", "w", "v"]
    assert vm.nextqa_mc_process_results(
        doc, ["D"])["exact_match"] == 1.0
    assert vm.nextqa_mc_process_results_ppl(
        doc, [[-9, -8, -7, -1, -5]])["exact_match"] == 1.0

    pt_doc = {"video_name": "v0", "question": "q",
              "options": ["p", "q", "r"], "answer_id": 2}
    assert "C. r" in vm.perceptiontest_doc_to_text(pt_doc)
    assert vm.perceptiontest_process_results(
        pt_doc, ["C"])["accuracy"] == 1.0
    assert vm.perceptiontest_process_results_ppl(
        pt_doc, [[-3, -2, -1]])["accuracy"] == 1.0
