"""Model adapters for the evaluator.

Parity: the lmms-eval AuroraCap adapter
(src/lmms-eval/lmms_eval/models/auroracap.py:50-529) — xtuner-dir load,
video frame sampling, vicuna prompt building, reset_tome_r per call,
generate; loglikelihood over answer continuations.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.cli.infer import caption, load_model
from aurora_tpu.data.preprocess import clip_preprocess
from aurora_tpu.data.video import read_video
from aurora_tpu.models.llama import llama_apply


class AuroraCapEval:
    """generate_until / loglikelihood over an xtuner-format checkpoint."""

    def __init__(self, pretrained: str, *, token_merge_ratio: float = 0.8,
                 num_frames: int = 8, image_size: int = 378,
                 max_new_tokens: int = 1024, dtype=jnp.bfloat16):
        self.params, self.cfg, self.tokenizer = load_model(pretrained,
                                                           dtype)
        self.token_merge_ratio = token_merge_ratio
        self.num_frames = num_frames
        self.image_size = image_size
        self.max_new_tokens = max_new_tokens

    def _frames(self, visual_path: str) -> np.ndarray:
        raw = read_video(visual_path, self.num_frames)
        return clip_preprocess(list(raw), size=self.image_size,
                               crop=self.image_size)

    def generate_until(self, doc, task) -> str:
        visual = task.doc_to_visual(doc)[0]
        prompt = task.doc_to_text(doc)
        gk = task.cfg.generation_kwargs
        px = self._frames(visual)
        return caption(
            self.params, self.cfg, self.tokenizer, pixel_values=px,
            prompt=prompt,
            token_kept_ratio=self.token_merge_ratio,
            temperature=float(gk.get("temperature", 0.0)),
            top_p=float(gk.get("top_p", 1.0)),
            max_new_tokens=int(gk.get("max_new_tokens",
                                      self.max_new_tokens)),
            image_size=self.image_size)

    def loglikelihood(self, context_ids, continuation_ids) -> float:
        """Σ log p(continuation | context) — text-only requests
        (auroracap.py:232-297)."""
        ids = jnp.asarray([list(context_ids) + list(continuation_ids)])
        logits, _ = llama_apply(self.params["llm"], self.cfg.llm,
                                input_ids=ids)
        lp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), -1)
        n_ctx = len(context_ids)
        cont = jnp.asarray(list(continuation_ids))
        tok_lp = jnp.take_along_axis(
            lp[n_ctx - 1: n_ctx - 1 + len(continuation_ids)],
            cont[:, None], axis=1)[:, 0]
        return float(jnp.sum(tok_lp))


class HTTPModelEval:
    """Adapter that evaluates a served model over the OpenAI API — lets
    the harness score any aurora_tpu.cli.serve deployment."""

    def __init__(self, base_url: str, max_new_tokens: int = 1024):
        from aurora_tpu.eval.judge import JudgeClient
        self._client = JudgeClient(base_url, max_tokens=max_new_tokens)

    def generate_until(self, doc, task) -> str:
        return self._client.chat("", task.doc_to_text(doc))
