"""Training-time observability hooks.

Parity targets (src/xtuner/xtuner/engine/hooks/):
  * DatasetInfoHook — decode and log the first samples so the prompt
    template / image-token layout is eyeballable before burning steps;
  * EvaluateChatHook (evaluate_chat_hook.py:20-280) — run sample
    generations from fixed eval inputs every N steps to watch the model
    come alive during training.

Plain callables (the mmengine hook machinery is replaced by direct calls
from the training loop).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aurora_tpu.utils.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX


def dataset_info(dataset, tokenizer, n: int = 2,
                 log=print) -> List[str]:
    """Decode the first n samples (image markers rendered as <image>)."""
    out = []
    for i in range(min(n, len(dataset))):
        d = dataset[i]
        ids = [t for t in d["input_ids"]]
        text = "".join(
            "<image>" if t == IMAGE_TOKEN_INDEX
            else tokenizer.decode([t]) for t in ids)
        n_loss = sum(1 for t in d["labels"] if t != IGNORE_INDEX)
        msg = (f"[dataset sample {i}] len={len(ids)} loss_tokens={n_loss} "
               f"text={text[:400]!r}")
        log(msg)
        out.append(msg)
    return out


class EvaluateChatHook:
    """Generate from fixed prompts every `every_n_steps` steps."""

    def __init__(self, tokenizer, acfg, *, prompts: List[str],
                 pixel_values: Optional[np.ndarray] = None,
                 kept_ratio: float = 1.0, max_new_tokens: int = 32,
                 every_n_steps: int = 500, image_size: int = 378,
                 log=print):
        self.tokenizer = tokenizer
        self.acfg = acfg
        self.prompts = prompts
        self.pixel_values = pixel_values  # [F, C, H, W] or None
        self.kept_ratio = kept_ratio
        self.max_new_tokens = max_new_tokens
        self.every = every_n_steps
        self.image_size = image_size
        self.log = log

    def maybe_run(self, step: int, params) -> Optional[List[str]]:
        if step % self.every != 0:
            return None
        return self.run(params, step)

    def run(self, params, step: int = -1) -> List[str]:
        from aurora_tpu.cli.infer import caption
        from aurora_tpu.generate import SamplingParams, generate
        from aurora_tpu.generate.engine import decode_tokens

        outs = []
        for prompt in self.prompts:
            if self.pixel_values is not None:
                text = caption(params, self.acfg, self.tokenizer,
                               pixel_values=self.pixel_values,
                               prompt=prompt,
                               token_kept_ratio=self.kept_ratio,
                               max_new_tokens=self.max_new_tokens,
                               image_size=self.image_size)
            else:
                ids = self.tokenizer.encode(prompt)
                embeds = jnp.take(params["llm"]["embed_tokens"],
                                  jnp.asarray([ids]), axis=0)
                eos = tuple({self.tokenizer.eos_token_id} - {None}) or (2,)
                res = generate(params["llm"], self.acfg.llm, embeds,
                               jnp.ones((1, len(ids)), bool),
                               max_new_tokens=self.max_new_tokens,
                               sampling=SamplingParams(), eos_ids=eos)
                text = decode_tokens(self.tokenizer, res, eos_ids=eos)[0]
            self.log(f"[eval-chat step={step}] {prompt!r} -> {text!r}")
            outs.append(text)
        return outs
