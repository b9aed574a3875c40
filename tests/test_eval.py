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
