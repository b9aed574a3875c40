"""Test fixtures: tiny random torch models saved in the xtuner dir layout
(HF llama at root + visual_encoder/ + projector/, inference.py:42-57)."""

import json
import os

import numpy as np


def make_tiny_tokenizer(save_dir):
    """Byte-level fast tokenizer (no sentencepiece in the image)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i in range(256):
        vocab[f"<{i:02x}>"] = len(vocab)
    # printable chars as single tokens
    for c in (chr(x) for x in range(32, 127)):
        if c not in vocab:
            vocab[c] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="<unk>")
    fast.save_pretrained(save_dir)
    return fast


def make_tiny_xtuner_dir(tmpdir, seed=0):
    """Returns (dir, hf_llm, hf_vit, torch_projector, tokenizer)."""
    import torch
    from transformers import (CLIPVisionConfig, CLIPVisionModel,
                              LlamaConfig, LlamaForCausalLM)

    torch.manual_seed(seed)
    root = str(tmpdir)

    llm_cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=1024, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0)
    llm = LlamaForCausalLM(llm_cfg).eval()
    llm.save_pretrained(root)

    vit_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14)
    vit = CLIPVisionModel(vit_cfg).eval()
    vit.save_pretrained(os.path.join(root, "visual_encoder"))

    proj = torch.nn.Sequential(
        torch.nn.Linear(32, 64), torch.nn.GELU(), torch.nn.Linear(64, 64)
    ).eval()
    pj_dir = os.path.join(root, "projector")
    os.makedirs(pj_dir, exist_ok=True)
    sd = {f"model.{k}": v for k, v in proj.state_dict().items()}
    torch.save(sd, os.path.join(pj_dir, "pytorch_model.bin"))
    with open(os.path.join(pj_dir, "config.json"), "w") as f:
        json.dump({"model_type": "projector", "visual_hidden_size": 32,
                   "llm_hidden_size": 64, "depth": 2,
                   "hidden_act": "gelu", "bias": True}, f)

    tokenizer = make_tiny_tokenizer(root)
    return root, llm, vit, proj, tokenizer


def random_frames(rng, f=2, size=56):
    """uint8 RGB frames [F, H, W, 3]."""
    return rng.integers(0, 255, size=(f, size, size, 3)).astype(np.uint8)


def make_xtuner_dir(tmpdir, seed=0, *, llm_kw=None, vit_kw=None,
                    proj_hidden=None):
    """Parametrized xtuner-layout dir (HF llama at root + visual_encoder/
    + projector/). llm_kw/vit_kw override the tiny default configs —
    used by the full-config parity slice (378px / true hidden sizes)."""
    import json as _json
    import torch
    from transformers import (CLIPVisionConfig, CLIPVisionModel,
                              LlamaConfig, LlamaForCausalLM)

    torch.manual_seed(seed)
    root = str(tmpdir)

    lkw = dict(vocab_size=512, hidden_size=64, intermediate_size=128,
               num_hidden_layers=3, num_attention_heads=4,
               num_key_value_heads=4, max_position_embeddings=1024,
               rms_norm_eps=1e-5, attn_implementation="eager",
               tie_word_embeddings=False, bos_token_id=1,
               eos_token_id=2, pad_token_id=0)
    lkw.update(llm_kw or {})
    llm = LlamaForCausalLM(LlamaConfig(**lkw)).eval()
    llm.save_pretrained(root, safe_serialization=True)

    vkw = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
               num_attention_heads=4, image_size=56, patch_size=14)
    vkw.update(vit_kw or {})
    vit = CLIPVisionModel(CLIPVisionConfig(**vkw)).eval()
    vit.save_pretrained(os.path.join(root, "visual_encoder"))

    vh, lh = (proj_hidden or (vkw["hidden_size"], lkw["hidden_size"]))
    proj = torch.nn.Sequential(
        torch.nn.Linear(vh, lh), torch.nn.GELU(),
        torch.nn.Linear(lh, lh)).eval()
    pj_dir = os.path.join(root, "projector")
    os.makedirs(pj_dir, exist_ok=True)
    sd = {f"model.{k}": v for k, v in proj.state_dict().items()}
    torch.save(sd, os.path.join(pj_dir, "pytorch_model.bin"))
    with open(os.path.join(pj_dir, "config.json"), "w") as f:
        _json.dump({"model_type": "projector", "visual_hidden_size": vh,
                    "llm_hidden_size": lh, "depth": 2,
                    "hidden_act": "gelu", "bias": True}, f)
    tokenizer = make_tiny_tokenizer(root)
    return root, llm, vit, proj, tokenizer


def drain_engine(engine, reqs, max_steps: int = 500):
    """Add `reqs` and step the engine to completion (bounded) — the ONE
    drain helper for every engine test (six copies had drifted caps)."""
    for r in reqs:
        engine.add_request(r)
    done = []
    for _ in range(max_steps):
        done += engine.step()
        if not engine.has_work():
            break
    return {r.rid: r for r in done}
