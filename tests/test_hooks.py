"""Training hook tests (DatasetInfoHook / EvaluateChatHook parity)."""

import json
import os

import jax.numpy as jnp
import numpy as np

from aurora_tpu.train.hooks import EvaluateChatHook, dataset_info

from utils import make_tiny_xtuner_dir  # noqa: E402


def test_dataset_info_decodes_samples(tmp_path, rng):
    from aurora_tpu.data.dataset import AuroraDataset
    from aurora_tpu.utils.templates import PROMPT_TEMPLATE
    from utils import make_tiny_tokenizer
    tok = make_tiny_tokenizer(str(tmp_path / "tok"))
    records = [{"conversations": [
        {"from": "human", "value": "<image> describe"},
        {"from": "gpt", "value": "words"}]}]
    path = tmp_path / "d.json"
    with open(path, "w") as f:
        json.dump(records, f)
    ds = AuroraDataset(str(path), tok, template=PROMPT_TEMPLATE.vicuna,
                       image_size=56)
    logs = []
    out = dataset_info(ds, tok, n=1, log=logs.append)
    assert len(out) == 1
    assert "<image>" in out[0] and "loss_tokens=" in out[0]


def test_evaluate_chat_hook_generates(tmp_path, rng):
    root, *_ = make_tiny_xtuner_dir(tmp_path / "m")
    from aurora_tpu.cli.infer import load_model
    params, cfg, tok = load_model(root, dtype=jnp.float32)
    frames = rng.integers(0, 255, (1, 56, 56, 3)).astype(np.uint8)
    from aurora_tpu.data.preprocess import clip_preprocess
    px = clip_preprocess(list(frames), size=56, crop=56)

    logs = []
    hook = EvaluateChatHook(tok, cfg, prompts=["what is this"],
                            pixel_values=px, kept_ratio=0.5,
                            max_new_tokens=4, every_n_steps=2,
                            image_size=56, log=logs.append)
    assert hook.maybe_run(1, params) is None          # off-cadence
    outs = hook.maybe_run(2, params)
    assert outs is not None and isinstance(outs[0], str)
    assert logs and "eval-chat" in logs[0]

    # text-only path
    hook2 = EvaluateChatHook(tok, cfg, prompts=["hello"],
                             max_new_tokens=4, every_n_steps=1,
                             log=logs.append)
    outs2 = hook2.maybe_run(1, params)
    assert isinstance(outs2[0], str)
