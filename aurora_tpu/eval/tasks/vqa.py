"""Open-ended VQA evaluation (VQAv2 / GQA family).

Parity: the lmms-eval vqav2/gqa tasks the reference's token-ratio sweeps
report (figure_in_paper.ipynb: GQA 59.72 / VQAv2 75.85 @ratio 1.0).
Implements the OFFICIAL VQA accuracy protocol: answer normalization
(articles, punctuation, number words, contractions) and the
human-consensus metric acc = min(#matching annotator answers / 3, 1),
averaged over all 10-choose-9 annotator subsets as the official code does
— equivalent closed form used here.

Datasets: local jsonl, one record per question
  {"image": <file> | "video_name": ..., "question": str,
   "answers": [str x10] (VQAv2) | "answer": str (GQA)}
"""

from __future__ import annotations

import os
import re
from typing import List

import numpy as np

from aurora_tpu.eval.api import TaskConfig, register_task

_ARTICLES = {"a", "an", "the"}
_NUMBER_MAP = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10"}
_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't",
    "couldnt": "couldn't", "didnt": "didn't", "doesnt": "doesn't",
    "dont": "don't", "hasnt": "hasn't", "havent": "haven't",
    "isnt": "isn't", "shouldnt": "shouldn't", "thats": "that's",
    "wasnt": "wasn't", "werent": "weren't", "whats": "what's",
    "wont": "won't", "wouldnt": "wouldn't", "youre": "you're"}
_PUNCT = re.compile(r"[;/\[\]\"{}()=+\\_\-><@`,?!.]")


def normalize_answer(ans: str) -> str:
    """Official VQA normalization (vqaEval.py processPunctuation +
    processDigitArticle), condensed."""
    ans = ans.lower().strip()
    ans = _PUNCT.sub("", ans)
    ans = ans.replace(":", "")
    words = []
    for w in ans.split():
        w = _NUMBER_MAP.get(w, w)
        w = _CONTRACTIONS.get(w, w)
        if w not in _ARTICLES:
            words.append(w)
    return " ".join(words)


def vqa_accuracy(pred: str, gt_answers: List[str]) -> float:
    """Human-consensus accuracy. For 10 annotator answers the official
    protocol averages min(matches/3, 1) over every leave-one-out subset;
    closed form: mean over i of min(#matches among the other 9 / 3, 1).
    For a single ground truth it degrades to exact match."""
    p = normalize_answer(pred)
    gts = [normalize_answer(a) for a in gt_answers]
    if len(gts) == 1:
        return float(p == gts[0])
    accs = []
    for i in range(len(gts)):
        others = gts[:i] + gts[i + 1:]
        matches = sum(1 for g in others if g == p)
        accs.append(min(matches / 3.0, 1.0))
    return float(np.mean(accs))


def doc_to_visual(doc):
    base = doc.get("_root", "")
    if "image" in doc:
        return [os.path.join(base, doc["image"])]
    from aurora_tpu.eval.tasks.vdc import doc_to_visual as vdc_visual
    return vdc_visual(doc)


def doc_to_text(doc, **_):
    # lmms-eval vqav2 post-prompt
    return (f"{doc['question']}\nAnswer the question using a single word "
            "or phrase.")


def doc_to_target(doc):
    return doc.get("answers") or [doc.get("answer", "")]


def process_results(doc, result):
    return {"vqa_acc": vqa_accuracy(result[0], doc_to_target(doc))}


def register_vqa_task(name: str, dataset_path: str):
    return register_task(TaskConfig(
        name=name,
        dataset_path=dataset_path,
        doc_to_visual="aurora_tpu.eval.tasks.vqa:doc_to_visual",
        doc_to_text="aurora_tpu.eval.tasks.vqa:doc_to_text",
        doc_to_target="aurora_tpu.eval.tasks.vqa:doc_to_target",
        process_results="aurora_tpu.eval.tasks.vqa:process_results",
        metric_aggregations={"vqa_acc": "mean"},
        generation_kwargs={"max_new_tokens": 16, "temperature": 0.0},
    ))


for _name, _env in (("vqav2", "AURORA_VQAV2"), ("gqa", "AURORA_GQA")):
    _path = os.environ.get(_env, f"data/{_name}/val.jsonl")
    if os.path.exists(_path):
        register_vqa_task(_name, _path)
