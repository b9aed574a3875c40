"""Evaluation metrics.

Parity: xtuner's evaluation/metrics (MMLUMetric, RewardMetric — SURVEY
§2.8) plus the standard caption/VQA aggregations the lmms-eval tasks use.
"""

from __future__ import annotations

from typing import Dict, List, Sequence


def mmlu_accuracy(model, docs: Sequence[dict], tokenizer,
                  choices=("A", "B", "C", "D")) -> Dict[str, float]:
    """Multiple-choice accuracy via per-choice loglikelihood
    (MMLUMetric semantics): pick argmax_c log p(c | prompt)."""
    correct = 0
    for doc in docs:
        ctx = tokenizer.encode(doc["prompt"])
        scores = []
        for c in choices:
            cont = tokenizer.encode(" " + c, add_special_tokens=False)
            scores.append(model.loglikelihood(ctx, cont))
        pred = choices[max(range(len(choices)),
                           key=lambda i: scores[i])]
        correct += int(pred == doc["answer"])
    n = max(len(docs), 1)
    return {"accuracy": correct / n, "n": len(docs)}


def reward_accuracy(chosen_scores: Sequence[float],
                    rejected_scores: Sequence[float]) -> Dict[str, float]:
    """RewardMetric: fraction of pairs where chosen outranks rejected."""
    assert len(chosen_scores) == len(rejected_scores)
    wins = sum(c > r for c, r in zip(chosen_scores, rejected_scores))
    n = max(len(chosen_scores), 1)
    return {"accuracy": wins / n,
            "margin": sum(c - r for c, r in zip(chosen_scores,
                                                rejected_scores)) / n}


def exact_match(preds: Sequence[str], targets: Sequence[str],
                normalize=str.strip) -> float:
    hits = sum(normalize(p) == normalize(t)
               for p, t in zip(preds, targets))
    return hits / max(len(preds), 1)


def anls(pred: str, target: str) -> float:
    """Average normalized Levenshtein similarity (OCR/VQA tasks)."""
    a, b = pred.strip().lower(), target.strip().lower()
    if not a and not b:
        return 1.0
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    dist = dp[n] / max(m, n, 1)
    return 1.0 - dist if dist < 0.5 else 0.0
