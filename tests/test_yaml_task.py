"""lmms-eval task-YAML compatibility (eval/yaml_task.py).

Covers the reference ConfigurableTask surface a custom task dir uses
(task.py:605): include-template merge, !function refs into a sibling
utils.py (which imports lmms_eval internals — satisfied by the compat
shims), lmms_eval_specific_kwargs prompt affixes, metric_list
aggregation declaration + bookkeeping filtering, until→stop mapping —
then the SAME loader against a real reference task YAML (vqav2_val_lite)
when /root/reference is present (skipped otherwise; the hermetic copy
below mirrors its structure byte-for-byte where it matters).
"""

import json
import os

import numpy as np
import pytest

from aurora_tpu.eval.api import get_task
from aurora_tpu.eval.yaml_task import load_task_yaml

REF_VQAV2 = "/root/reference/src/lmms-eval/lmms_eval/tasks/vqav2"


def _write_task_dir(tmp_path):
    d = tmp_path / "mytask"
    d.mkdir()
    (d / "_default_template_yaml").write_text(
        "dataset_path: lmms-lab/NotReachable\n"
        "output_type: generate_until\n"
        "generation_kwargs:\n"
        "  max_new_tokens: 16\n"
        "  until:\n"
        "    - \"\\n\"\n"
        "lmms_eval_specific_kwargs:\n"
        "  default:\n"
        "    pre_prompt: \"\"\n"
        "    post_prompt: \"\\nAnswer briefly.\"\n")
    (d / "yamlvqa.yaml").write_text(
        "task: \"yamlvqa\"\n"
        "include: _default_template_yaml\n"
        "doc_to_visual: !function utils.my_doc_to_visual\n"
        "doc_to_text: !function utils.my_doc_to_text\n"
        "doc_to_target: \"answer\"\n"
        "process_results: !function utils.my_process_results\n"
        "metric_list:\n"
        "  - metric: exact_match\n"
        "    aggregation: mean\n"
        "    higher_is_better: true\n")
    (d / "utils.py").write_text(
        "from loguru import logger\n"
        "import lmms_eval.tasks._task_utils.file_utils as file_utils\n"
        "from lmms_eval.tasks._task_utils.vqa_eval_metric import "
        "EvalAIAnswerProcessor\n"
        "\n"
        "def my_doc_to_visual(doc):\n"
        "    return [doc['image'].convert('RGB')]\n"
        "\n"
        "def my_doc_to_text(doc, lmms_eval_specific_kwargs=None):\n"
        "    kw = lmms_eval_specific_kwargs or {}\n"
        "    return (kw.get('pre_prompt', '') + doc['question']\n"
        "            + kw.get('post_prompt', ''))\n"
        "\n"
        "def my_process_results(doc, result):\n"
        "    p = EvalAIAnswerProcessor()\n"
        "    hit = float(p(result[0]) == p(doc['answer']))\n"
        "    return {'exact_match': hit,\n"
        "            'submission': {'id': doc.get('id')}}\n")
    from PIL import Image
    img = d / "img.png"
    Image.fromarray(np.zeros((24, 24, 3), np.uint8)).save(img)
    data = d / "data.jsonl"
    with open(data, "w") as f:
        for i, (q, a) in enumerate([("what animal?", "a dog"),
                                    ("how many?", "Two")]):
            f.write(json.dumps({"id": i, "question": q, "answer": a,
                                "image": "img.png",
                                "_root": str(d)}) + "\n")
    return d


def test_yaml_task_loads_and_scores(tmp_path):
    d = _write_task_dir(tmp_path)
    cfg = load_task_yaml(str(d / "yamlvqa.yaml"),
                         dataset_path=str(d / "data.jsonl"))
    assert cfg.name == "yamlvqa"
    assert cfg.output_type == "generate"
    assert cfg.generation_kwargs["stop"] == ("\n",)
    assert cfg.generation_kwargs["max_new_tokens"] == 16
    assert cfg.metric_aggregations == {"exact_match": "mean"}

    task = get_task("yamlvqa")
    docs = task.docs()
    assert len(docs) == 2
    # include-template prompt affix renders through the !function
    assert task.doc_to_text(docs[0]) == "what animal?\nAnswer briefly."
    # path → PIL materialization + PIL → array normalization
    vis = task.doc_to_visual(docs[0])
    assert isinstance(vis[0], np.ndarray) and vis[0].shape == (24, 24, 3)
    assert task.doc_to_target(docs[0]) == "a dog"
    # normalization via the shimmed EvalAIAnswerProcessor: "dog" matches
    # "a dog" (article dropped), "2" matches "Two" (number map)
    r = task.process_results(docs[0], ["dog"])
    assert r["exact_match"] == 1.0
    assert "_submission" in r and "submission" not in r
    assert task.process_results(docs[1], ["2"])["exact_match"] == 1.0
    assert task.process_results(docs[1], ["three"])["exact_match"] == 0.0


def test_yaml_task_through_evaluator(tmp_path):
    d = _write_task_dir(tmp_path)
    load_task_yaml(str(d / "yamlvqa.yaml"),
                   dataset_path=str(d / "data.jsonl"), name="yamlvqa2")

    class FakeModel:
        def generate_until(self, doc, task):
            return "dog" if "animal" in task.doc_to_text(doc) else "5"

    from aurora_tpu.eval.evaluator import simple_evaluate
    res = simple_evaluate(FakeModel(), ["yamlvqa2"], log_samples=True)
    agg = res["results"]["yamlvqa2"]
    assert agg["exact_match"]["value"] == 0.5
    # bookkeeping keys survive into samples but not aggregation
    assert "_submission" in res["samples"]["yamlvqa2"][0]["metrics"]


@pytest.mark.skipif(not os.path.isdir(REF_VQAV2),
                    reason="reference checkout not present")
def test_reference_vqav2_yaml_loads_and_runs(tmp_path):
    """The round-3 VERDICT #8 done-criterion: a REAL reference task YAML
    (vqav2_val_lite.yaml, include + !function utils.* + metric_list)
    loads through the compat shims and scores local jsonl docs with the
    official consensus metric."""
    cfg = load_task_yaml(os.path.join(REF_VQAV2, "vqav2_val_lite.yaml"),
                         dataset_path="", name="ref_vqav2_lite")
    assert cfg.metric_aggregations == {"exact_match": "mean"}
    assert cfg.generation_kwargs["max_new_tokens"] == 16
    task = get_task("ref_vqav2_lite")
    from PIL import Image
    img = tmp_path / "i.png"
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img)
    def doc(answers):
        return {"question": "What animal is this?", "question_id": 7,
                "image": "i.png", "_root": str(tmp_path),
                "answers": answers}

    # realistic HF-schema answers carry answer_id, so the reference's
    # dict-equality leave-one-out behaves per-annotator
    real = [{"answer": a, "answer_id": i} for i, a in
            enumerate(["dog"] * 6 + ["cat"] * 4)]
    d0 = doc([dict(a) for a in real])
    assert task.doc_to_text(d0) == (
        "What animal is this?\nAnswer the question using a single word "
        "or phrase.")
    vis = task.doc_to_visual(d0)
    assert isinstance(vis[0], np.ndarray)
    r = task.process_results(d0, ["the dog"])
    assert r["exact_match"] == 1.0     # >=3 annotator matches → capped
    r = task.process_results(doc([dict(a) for a in real]), ["cat"])
    assert r["exact_match"] == 1.0     # 4 matches, min(4/3, 1)
    assert task.process_results(doc([dict(a) for a in real]),
                                ["fish"])["exact_match"] == 0.0
    # id-less answers collapse under the reference's dict-equality
    # leave-one-out (every same-answer dict drops at once) — executed
    # reference truth: "the dog" scores 0.4 on a 6-dog/4-cat split
    bare = doc([{"answer": a} for a in ["dog"] * 6 + ["cat"] * 4])
    assert task.process_results(bare, ["the dog"])["exact_match"] == \
        pytest.approx(0.4)
