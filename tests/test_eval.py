"""Eval harness tests: task registry, evaluator loop with the tiny model,
VDCScore protocol against a scripted fake judge, post_eval aggregation."""

import asyncio
import json
import os
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from aurora_tpu.eval.api import TaskConfig, get_task, register_task
from aurora_tpu.eval.evaluator import simple_evaluate
from aurora_tpu.eval.judge import (JudgeClient, parse_judge_dict,
                                   vdcscore_for_caption)
from aurora_tpu.eval.post_eval import score_captions

from utils import make_tiny_xtuner_dir  # noqa: E402


# ---------------------------------------------------------------------------
# Fake judge: OpenAI-chat server with scripted answers
# ---------------------------------------------------------------------------

class FakeJudge:
    """Answers caption-questions with 'the answer'; scores alternate
    yes/5 and no/1."""

    def __init__(self):
        self.port = None
        self.calls = []
        self._n_scores = 0
        self._started = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        self._started.wait(10)

    def _run(self):
        from aiohttp import web

        async def chat(request):
            body = await request.json()
            user = body["messages"][-1]["content"]
            self.calls.append(user)
            if "Predicted Answer:" in user:
                self._n_scores += 1
                if self._n_scores % 2 == 1:
                    content = "{'pred': 'yes', 'score': 5}"
                else:
                    content = "{'pred': 'no', 'score': 1}"
            else:
                content = "the answer"
            return web.json_response(
                {"choices": [{"message": {"content": content}}]})

        async def start():
            app = web.Application()
            app.router.add_post("/v1/chat/completions", chat)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            self.port = runner.addresses[0][1]
            self._started.set()
            while True:
                await asyncio.sleep(3600)

        asyncio.run(start())

    @property
    def url(self):
        return f"http://127.0.0.1:{self.port}"


@pytest.fixture(scope="module")
def fake_judge():
    return FakeJudge()


def test_parse_judge_dict_variants():
    assert parse_judge_dict("{'pred': 'yes', 'score': 4}") == {
        "pred": "yes", "score": 4}
    assert parse_judge_dict(
        "Sure! {'pred': 'no', 'score': 2} hope that helps") == {
        "pred": "no", "score": 2}
    with pytest.raises(ValueError):
        parse_judge_dict("I cannot evaluate this")


def test_vdcscore_protocol(fake_judge):
    judge = JudgeClient(fake_judge.url)
    qa = [{"question": "q1", "answer": "a1"},
          {"question": "q2", "answer": "a2"}]
    out = vdcscore_for_caption(judge, "a caption", qa)
    # alternating yes/5, no/1 → acc 0.5, score 3.0
    assert out == {"score": 3.0, "acc": 0.5}
    # both judge steps ran for each QA (2 answers + 2 scores)
    assert sum("Predicted Answer:" in c for c in fake_judge.calls) >= 2
    assert sum("detailed description:" in c for c in fake_judge.calls) >= 2


def test_post_eval_scoring(fake_judge):
    judge = JudgeClient(fake_judge.url)
    captions = [{"video_name": "v1", "pred": "cap one"},
                {"video_name": "v2", "pred": "cap two"}]
    gt = [{"video_name": "v1",
           "qa_list": [{"question": "q", "answer": "a"}] * 2},
          {"video_name": "v2",
           "qa_list": [{"question": "q", "answer": "a"}] * 2}]
    out = score_captions(captions, gt, judge)
    assert out["n"] == 2
    assert 0 <= out["acc"] <= 100
    assert 0 <= out["score"] <= 5


def test_evaluator_end_to_end_tiny_model(tmp_path, rng):
    """Full loop: tiny xtuner model + npy videos + vdc-style task."""
    root, *_ = make_tiny_xtuner_dir(tmp_path / "model")
    data_dir = tmp_path / "vdc"
    os.makedirs(data_dir)
    docs = []
    for i in range(2):
        vid = rng.integers(0, 255, (6, 64, 64, 3)).astype(np.uint8)
        np.save(data_dir / f"vid{i}.npy", vid)
        docs.append({"video_name": f"vid{i}", "caption": f"gt {i}",
                     "qa_list": [{"question": "q", "answer": "a"}],
                     "_root": str(data_dir)})
    with open(data_dir / "tiny.jsonl", "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")

    register_task(TaskConfig(
        name="tiny_vdc",
        dataset_path=str(data_dir / "tiny.jsonl"),
        doc_to_visual="aurora_tpu.eval.tasks.vdc:doc_to_visual",
        doc_to_text="aurora_tpu.eval.tasks.vdc:doc_to_text_short",
        doc_to_target="aurora_tpu.eval.tasks.vdc:doc_to_target",
        process_results=(
            "aurora_tpu.eval.tasks.vdc:process_results_generation_only"),
        generation_kwargs={"max_new_tokens": 6, "temperature": 0.0}))

    from aurora_tpu.eval.models import AuroraCapEval
    model = AuroraCapEval(pretrained=root, token_merge_ratio=0.5,
                          num_frames=3, image_size=56,
                          dtype=jnp.float32)
    out_dir = str(tmp_path / "results")
    res = simple_evaluate(model, ["tiny_vdc"], log_samples=True,
                          output_dir=out_dir)
    samples = res["samples"]["tiny_vdc"]
    assert len(samples) == 2
    assert all(isinstance(s["pred"], str) for s in samples)
    assert os.path.exists(os.path.join(out_dir, "results.json"))
    assert os.path.exists(os.path.join(out_dir, "tiny_vdc_samples.jsonl"))


def test_vdc_tasks_registered():
    import aurora_tpu.eval.tasks  # noqa: F401
    from aurora_tpu.eval.api import list_tasks
    names = list_tasks()
    for subset in ("camera", "short", "background", "main_object",
                   "detailed"):
        assert f"vdc_{subset}_test" in names


def test_vdc_prompt_pools_byte_equal_to_reference():
    """The pools ARE the benchmark definition — must match the reference
    constants byte-for-byte (vdc/utils.py:51-152)."""
    ref = "/root/reference/src/lmms-eval/lmms_eval/tasks/vdc/utils.py"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not present")
    import ast
    from aurora_tpu.eval.tasks import vdc_prompts
    tree = ast.parse(open(ref).read())
    ref_pools = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and isinstance(
                node.targets[0], ast.Name):
            name = node.targets[0].id
            if name.endswith("_CAPTION_PROMPTS"):
                ref_pools[name] = ast.literal_eval(node.value)
    assert len(ref_pools) == 5
    for name, pool in ref_pools.items():
        assert getattr(vdc_prompts, name) == pool, name


def test_vdc_prompt_choice_is_deterministic_per_doc():
    from aurora_tpu.eval.tasks.vdc import (_PROMPTS, doc_to_text_camera,
                                           doc_to_text_short)
    d1 = {"video_name": "abc"}
    d2 = {"video_name": "xyz"}
    assert doc_to_text_short(d1) == doc_to_text_short(d1)
    assert doc_to_text_short(d1) in _PROMPTS["short"]
    assert doc_to_text_camera(d1) in _PROMPTS["camera"]
    # different docs draw from the pool (overwhelmingly different picks
    # across a spread of names)
    picks = {doc_to_text_short({"video_name": f"v{i}"}) for i in range(50)}
    assert len(picks) > 3


def test_multimodal_loglikelihood_matches_torch(tmp_path, rng):
    """Continuation scored WITH pixel inputs must match the torch
    composition: ViT(+ToMe) → projector → splice → llama log-softmax
    (reference adapter auroracap.py:232-297)."""
    import torch
    from aurora_tpu.eval.models import AuroraCapEval
    from aurora_tpu.utils.constants import IMAGE_TOKEN_INDEX

    root, llm_t, vit_t, proj_t, tok = make_tiny_xtuner_dir(
        tmp_path / "model")
    model = AuroraCapEval(pretrained=root, token_merge_ratio=1.0,
                          num_frames=2, image_size=56, dtype=jnp.float32)

    px = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    ctx = [1, 5, IMAGE_TOKEN_INDEX, 9, IMAGE_TOKEN_INDEX, 11]
    cont = [17, 23, 31]
    got = model.loglikelihood(ctx, cont, pixel_values=px)

    with torch.no_grad():
        feats = vit_t(torch.from_numpy(px),
                      output_hidden_states=True).hidden_states[-2][:, 1:]
        vis = proj_t(feats)                       # [2, N, D]
        emb = llm_t.get_input_embeddings()
        pieces, k = [], 0
        for t in ctx + cont:
            if t == IMAGE_TOKEN_INDEX:
                pieces.append(vis[k])
                k += 1
            else:
                pieces.append(emb(torch.tensor([t])))
        seq = torch.cat(pieces)[None]
        logits = llm_t(inputs_embeds=seq).logits[0].float()
        lp = torch.log_softmax(logits, -1)
        want = sum(lp[-len(cont) - 1 + i, c].item()
                   for i, c in enumerate(cont))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mmbench_task_end_to_end(tmp_path, rng):
    """MMBench TSV → MC prompting → letter extraction → accuracy +
    CircularEval (xtuner tools/mmbench.py parity)."""
    import base64
    import csv
    import io
    from PIL import Image
    from aurora_tpu.eval.tasks import mmbench

    # fake 4-row TSV (2 circular rotations of one base question)
    rows = []
    for i, (ans, opts) in enumerate([
            ("A", ("cat", "dog", "fish", "bird")),
            ("B", ("dog", "cat", "fish", "bird"))]):
        img = Image.fromarray(
            rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append({
            "index": i * 1_000_000 + 7,
            "image": base64.b64encode(buf.getvalue()).decode(),
            "question": "What animal is shown?", "hint": "",
            "A": opts[0], "B": opts[1], "C": opts[2], "D": opts[3],
            "answer": ans})
    tsv = tmp_path / "dev.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]), delimiter="\t")
        w.writeheader()
        w.writerows(rows)

    docs = mmbench.load_mmbench_tsv(str(tsv))
    assert len(docs) == 2
    text = mmbench.doc_to_text(docs[0])
    assert "A. cat" in text and "Options:" in text
    frames = mmbench.doc_to_visual(docs[0])[0]
    assert frames.shape == (1, 32, 32, 3)

    # letter extraction: direct letter, letter+punct, option text
    assert mmbench.extract_choice("A", docs[0]) == "A"
    assert mmbench.extract_choice(" B.", docs[0]) == "B"
    assert mmbench.extract_choice("it is a fish", docs[0]) == "C"
    assert mmbench.extract_choice("unknown", docs[0]) == ""

    # CircularEval: both rotations right → 1; one wrong → 0
    res = [{"_index": 7, "acc": 1.0},
           {"_index": 1_000_007, "acc": 1.0}]
    assert mmbench.circular_aggregate(res) == 1.0
    res[1]["acc"] = 0.0
    assert mmbench.circular_aggregate(res) == 0.0

    # registry round trip through the generic evaluator loader
    cfg = mmbench.register(str(tsv), name="mmbench_tiny")
    from aurora_tpu.eval.api import get_task
    task = get_task("mmbench_tiny")
    loaded = task.docs()
    assert len(loaded) == 2


def test_eval_registry_includes_mmbench_module():
    import aurora_tpu.eval.tasks  # noqa: F401 — module import side effect
    from aurora_tpu.eval.tasks.mmbench import OPTION_KEYS
    assert OPTION_KEYS == ("A", "B", "C", "D")


def test_mmbench_evaluator_with_tiny_model(tmp_path, rng):
    """MMBench through the full evaluator with the tiny AuroraCap model
    (image task path: pre-decoded frames, B=1 option prompting)."""
    import base64
    import csv
    import io
    from PIL import Image
    from aurora_tpu.eval.models import AuroraCapEval
    from aurora_tpu.eval.tasks import mmbench

    root, *_ = make_tiny_xtuner_dir(tmp_path / "model")
    rows = []
    for i in range(2):
        img = Image.fromarray(
            rng.integers(0, 255, (56, 56, 3)).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append({"index": i, "image":
                     base64.b64encode(buf.getvalue()).decode(),
                     "question": "what is this?", "hint": "",
                     "A": "a", "B": "b", "C": "c", "D": "d",
                     "answer": "A"})
    tsv = tmp_path / "mm.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]), delimiter="\t")
        w.writeheader()
        w.writerows(rows)
    mmbench.register(str(tsv), name="mmbench_tiny_e2e")
    model = AuroraCapEval(pretrained=root, token_merge_ratio=1.0,
                          num_frames=1, image_size=56, max_new_tokens=4,
                          dtype=jnp.float32)
    res = simple_evaluate(model, ["mmbench_tiny_e2e"], log_samples=True)
    assert res["results"]["mmbench_tiny_e2e"]["_n"] == 2
    assert "acc" in res["results"]["mmbench_tiny_e2e"]


def test_caption_task_cider_pipeline(tmp_path, rng):
    """Generic caption benchmark family (coco/flickr/nocaps shape):
    registry → evaluator → corpus CIDEr-D aggregation."""
    from aurora_tpu.eval.tasks.captions import register_caption_task
    data_dir = tmp_path / "cap"
    os.makedirs(data_dir)
    docs = []
    for i in range(3):
        vid = rng.integers(0, 255, (2, 56, 56, 3)).astype(np.uint8)
        np.save(data_dir / f"img{i}.npy", vid)
        docs.append({"video_name": f"img{i}",
                     "captions": [f"caption number {i} about things",
                                  f"another caption {i}"],
                     "_root": str(data_dir)})
    with open(data_dir / "val.jsonl", "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    register_caption_task("cap_tiny", str(data_dir / "val.jsonl"),
                          max_new_tokens=4)

    root, *_ = make_tiny_xtuner_dir(tmp_path / "model")
    from aurora_tpu.eval.models import AuroraCapEval
    model = AuroraCapEval(pretrained=root, token_merge_ratio=1.0,
                          num_frames=2, image_size=56, dtype=jnp.float32)
    res = simple_evaluate(model, ["cap_tiny"])
    assert "cider" in res["results"]["cap_tiny"]
    assert res["results"]["cap_tiny"]["cider"]["value"] >= 0.0


def test_refcoco_scoring():
    """IoU/parse/normalize parity with eval_refcoco.py:110-140."""
    from aurora_tpu.eval.tasks import refcoco
    assert refcoco.parse_bbox("The box is [10, 20, 30, 40].") == \
        [10, 20, 30, 40]
    assert refcoco.parse_bbox("no numbers here") is None
    assert refcoco.compute_iou([0, 0, 9, 9], [0, 0, 9, 9]) == 1.0
    assert refcoco.compute_iou([0, 0, 9, 9], [20, 20, 29, 29]) == 0.0
    assert refcoco.normalize_bbox([50, 100, 150, 200], 400, 200) == \
        [25, 25, 75, 50]
    doc = {"bbox": [50, 100, 150, 200], "height": 400, "width": 200,
           "sentence": "the dog", "image": "x.jpg"}
    hit = refcoco.process_results(doc, ["[25, 25, 75, 50]"])
    assert hit["acc@0.5"] == 1.0
    miss = refcoco.process_results(doc, ["[0, 0, 5, 5]"])
    assert miss["acc@0.5"] == 0.0
    assert "region this sentence describes: the dog" in \
        refcoco.doc_to_text(doc)


def test_vqa_accuracy_official_protocol():
    """Official VQA metric: normalization + 10-annotator consensus."""
    from aurora_tpu.eval.tasks.vqa import normalize_answer, vqa_accuracy
    assert normalize_answer("The Dog!") == "dog"
    assert normalize_answer("Two") == "2"
    assert normalize_answer("dont") == "don't"
    # 10 annotators, 5 say "dog": each leave-one-out subset has 4 or 5
    # matches → min(4/3,1)=1 and min(5/3,1)=1 → acc 1.0
    gts = ["dog"] * 5 + ["cat"] * 5
    assert vqa_accuracy("the dog", gts) == 1.0
    # 2 of 10 say "dog": subsets have 1 or 2 matches → mean of
    # 2*min(1/3,1) + 8*min(2/3,1) / 10
    gts = ["dog"] * 2 + ["cat"] * 8
    want = (2 * (1 / 3) + 8 * (2 / 3)) / 10
    assert abs(vqa_accuracy("dog", gts) - want) < 1e-9
    assert vqa_accuracy("fish", gts) == 0.0
    # single ground truth degrades to exact match
    assert vqa_accuracy("3", ["three"]) == 1.0


def test_videoqa_judge_scoring(fake_judge):
    from aurora_tpu.eval.tasks.videoqa import make_process_results
    scorer = make_process_results(fake_judge.url)
    out = scorer({"question": "what happens?", "answer": "a dog runs"},
                 ["a dog is running"])
    assert set(out) == {"qa_acc", "qa_score"}
    assert 0.0 <= out["qa_acc"] <= 1.0
    assert 0.0 <= out["qa_score"] <= 5.0


def test_vatex_task_pipeline(tmp_path, rng):
    """VATEX captioning (lmms-eval tasks/vatex parity): enCap refs,
    corpus CIDEr/BLEU-4/ROUGE-L through the evaluator + engine."""
    from aurora_tpu.eval.tasks.captions import register_vatex_task
    data_dir = tmp_path / "vatex"
    os.makedirs(data_dir)
    with open(data_dir / "test.jsonl", "w") as f:
        for i in range(3):
            vid = rng.integers(0, 255, (2, 56, 56, 3)).astype(np.uint8)
            np.save(data_dir / f"vid{i}.npy", vid)
            f.write(json.dumps({
                "video_name": f"vid{i}",
                "enCap": [f"a person does thing {i}",
                          f"someone performing action {i}"],
                "_root": str(data_dir)}) + "\n")
    register_vatex_task(str(data_dir / "test.jsonl"),
                        name="vatex_tiny", max_new_tokens=4)

    root, *_ = make_tiny_xtuner_dir(tmp_path / "model")
    from aurora_tpu.eval.models import AuroraCapEval
    model = AuroraCapEval(pretrained=root, token_merge_ratio=1.0,
                          num_frames=2, image_size=56, dtype=jnp.float32)
    res = simple_evaluate(model, ["vatex_tiny"])
    out = res["results"]["vatex_tiny"]
    for metric in ("vatex_CIDEr", "vatex_Bleu_4", "vatex_ROUGE_L"):
        assert metric in out, out.keys()
        assert out[metric]["value"] >= 0.0


def test_videochatgpt_judge_protocol(fake_judge):
    """videochatgpt utils.py:108-426 parity: per-axis judge calls,
    dict-string score parsing, consistency pairing."""
    from aurora_tpu.eval.tasks import videochatgpt as vcg
    assert vcg.parse_score("{'score': 4}") == 4
    assert vcg.parse_score("{'score': 4.8}") == 4
    assert vcg.parse_score("garbage") == 0
    # prompt structure carries all protocol fields
    up = vcg.judge_user_prompt("correctness", "q?", "gt", "pred")
    assert "Question: q?" in up and "Correct Answer: gt" in up \
        and "Predicted Answer: pred" in up

    preds = [{"question": "what?", "answer": "a dog", "pred": "a dog"}]
    gen = vcg.score_generic(preds, judge_url=fake_judge.url)
    for axis in ("correctness", "detailed_orientation", "context"):
        assert 0 <= gen[axis] <= 5
    assert len(gen["per_sample"]) == 1
    tmp = vcg.score_temporal(preds, judge_url=fake_judge.url)
    assert 0 <= tmp["temporal"] <= 5

    rows = [{"video_name": "v1", "question_1": "q1", "question_2":
             "None", "answer": "gt", "pred": "p1"},
            {"video_name": "v1", "question_1": "None", "question_2":
             "q2", "answer": "gt", "pred": "p2"},
            {"video_name": "v2", "question_1": "qA", "question_2":
             "None", "answer": "gt", "pred": "pA"}]  # unpaired → dropped
    paired = vcg.pair_consistency(rows)
    assert len(paired) == 1
    assert paired[0]["pred1"] == "p1" and paired[0]["pred2"] == "p2"
    cons = vcg.score_consistency(rows, judge_url=fake_judge.url)
    assert 0 <= cons["consistency"] <= 5
    assert len(cons["per_sample"]) == 1


def test_videochatgpt_generation_tasks(tmp_path, rng):
    """Generation phase of the two-phase videochatgpt flow through the
    evaluator (judge scoring is the decoupled score_* step)."""
    from aurora_tpu.eval.tasks.videochatgpt import (
        doc_to_text_consistency, register_videochatgpt_tasks)
    base = tmp_path / "vcg"
    os.makedirs(base)
    vid = rng.integers(0, 255, (2, 56, 56, 3)).astype(np.uint8)
    np.save(base / "v0.npy", vid)
    for dim, rows in (
            ("generic", [{"question": "what happens?", "answer": "x"}]),
            ("temporal", [{"question": "what first?", "answer": "y"}]),
            ("consistency", [
                {"question_1": "q1?", "question_2": "None", "answer": "z"},
                {"question_1": "None", "question_2": "q2?", "answer": "z"},
            ])):
        with open(base / f"{dim}.jsonl", "w") as f:
            for r in rows:
                r = dict(r, video_name="v0", _root=str(base))
                f.write(json.dumps(r) + "\n")
    tasks = register_videochatgpt_tasks(str(base), max_new_tokens=4)
    assert [t.name for t in tasks] == [
        "videochatgpt_generic", "videochatgpt_temporal",
        "videochatgpt_consistency"]
    assert doc_to_text_consistency(
        {"question_1": "None", "question_2": "q2?"}) == "q2?"
    assert doc_to_text_consistency(
        {"question_1": "q1?", "question_2": "None"}) == "q1?"

    root, *_ = make_tiny_xtuner_dir(tmp_path / "model")
    from aurora_tpu.eval.models import AuroraCapEval
    model = AuroraCapEval(pretrained=root, token_merge_ratio=1.0,
                          num_frames=2, image_size=56, dtype=jnp.float32)
    res = simple_evaluate(model, ["videochatgpt_generic",
                                  "videochatgpt_consistency"],
                          log_samples=True)
    assert res["results"]["videochatgpt_generic"]["_n"] == 1
    assert res["results"]["videochatgpt_consistency"]["_n"] == 2
    # every sample carries its generated pred for the judge phase
    for s in res["samples"]["videochatgpt_consistency"]:
        assert isinstance(s["pred"], (str, list))


def test_vqa_normalization_full_protocol_parity():
    """Byte-parity of the FULL EvalAI normalization pipeline vs the
    reference processor (vqa_eval_metric.py:12-213). Expected strings
    were generated by EXECUTING the reference implementation on these
    inputs; the cases cover every quirk the official protocol bakes in:
    the reversed somebody'd entry, dead capital-I keys, the misspelled
    PERIOD_STRIP lookbehind (periods survive only before digits), the
    original-text punctuation condition, untouched colons, comma-in-
    number stripping, word_tokenize's early "'s" split, and the full
    contraction/number tables the round-3 condensed version lacked."""
    from aurora_tpu.eval.tasks.vqa import normalize_answer
    cases = {
        "The cat's 2,000 dogs.": "cat 's 2000 dogs",
        "aint it": "ain't it",
        "yall'd've seen": "y'all'd've seen",
        "a man-made lake": "man made lake",
        "1,000,000": "1000000",
        "3.5 dogs.": "3.5 dogs",
        "somebody'd": "somebodyd",
        "he's here; now": "he 's here now",
        "none left": "0 left",
        "a an the answer": "answer",
        "time: 5": "time: 5",
        "it'dve": "it'd've",
        "What?": "what",
        "Who's there": "who 's there",
        "couldnt've done": "couldn't've done",
        "oclock": "o'clock",
        "'ow'sat": "'ow 'sat",
        "twas the night": "'twas night",
        "left-hand side": "left hand side",
        "semi-colon; test": "semi colon test",
        "5.00 dollars": "5.00 dollars",
        "u.s.a.": "usa",
        "don't know": "don't know",
        "10,00 weird": "1000 weird",
        "I'dve": "i'dve",
        "Im happy": "im happy",
        "shouldn'tve": "shouldn't've",
        "  spaced   out  ": "spaced out",
        "tab\there": "tab here",
        "new\nline": "new line",
        "lets go": "lets go",
        "let's go": "let 's go",
        "two + two = four": "2 2 4",
        "(parenthetical)": "parenthetical",
        "50%": "50%",
        "a.m.": "am",
        'he said "hi"': "he said hi",
    }
    bad = {inp: (normalize_answer(inp), want)
           for inp, want in cases.items()
           if normalize_answer(inp) != want}
    assert not bad, bad
    # table sizes match the reference exactly
    from aurora_tpu.eval.tasks import vqa_norm
    assert len(vqa_norm.CONTRACTIONS) == 120
    assert len(vqa_norm.NUMBER_MAP) == 12
    assert len(vqa_norm.PUNCTUATIONS) == 21
