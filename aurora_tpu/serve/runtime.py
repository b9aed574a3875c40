"""In-process serving runtime — no HTTP, no event loop.

Parity: sglang's `Runtime` wrapper (src/sglang/python/sglang/srt/
server.py:501-640), the offline/batch entry the reference's benchmark and
judge scripts use when a server round-trip is unnecessary. Wraps a
ServeEngine: submit N prompts, step the engine until done, return texts
in order — continuous batching included.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

from aurora_tpu.generate.sampler import SamplingParams
from aurora_tpu.serve.engine import EngineConfig, ServeEngine
from aurora_tpu.serve.scheduler import Request


class Runtime:
    """Synchronous in-process generation over the serving engine."""

    def __init__(self, params=None, cfg=None, tokenizer=None, *,
                 model_path: Optional[str] = None,
                 engine_config: Optional[EngineConfig] = None,
                 dtype=None, embed_fn=None):
        if model_path is not None:
            import jax.numpy as jnp
            from transformers import AutoTokenizer
            from aurora_tpu.models.convert import (_read_config,
                                                   llama_config_from_hf,
                                                   llama_params_from_hf,
                                                   load_torch_state_dict)
            cfg = llama_config_from_hf(_read_config(model_path))
            params = llama_params_from_hf(
                load_torch_state_dict(model_path), cfg,
                dtype or jnp.bfloat16)
            tokenizer = AutoTokenizer.from_pretrained(model_path)
        assert params is not None and cfg is not None
        self.tokenizer = tokenizer
        self.engine = ServeEngine(params, cfg,
                                  engine_config or EngineConfig(),
                                  embed_fn=embed_fn, tokenizer=tokenizer)

    def generate(self, prompts: Union[str, Sequence[str], None] = None,
                 *, input_ids: Optional[Sequence[Sequence[int]]] = None,
                 max_new_tokens: int = 128,
                 sampling: Optional[SamplingParams] = None,
                 stop: Sequence[str] = (),
                 regex: Optional[str] = None,
                 max_steps: int = 100000) -> List[Dict[str, Any]]:
        """Batch generation → [{"text", "output_ids", "finish_reason"}]
        in input order (a single-string prompt returns one dict)."""
        single = isinstance(prompts, str)
        if prompts is not None:
            if single:
                prompts = [prompts]
            assert self.tokenizer is not None
            input_ids = [self.tokenizer.encode(p) for p in prompts]
        assert input_ids is not None
        sampling = sampling or SamplingParams()
        eos = (tuple({self.tokenizer.eos_token_id} - {None})
               if self.tokenizer is not None else ()) or (2,)
        reqs = []
        for i, ids in enumerate(input_ids):
            constraint = None
            if regex is not None:
                from aurora_tpu.serve.fsm import RegexConstraint
                constraint = RegexConstraint(
                    regex, self.tokenizer, self.engine.cfg.vocab_size,
                    eos_ids=eos)
            reqs.append(Request(
                rid=f"rt{i}", input_ids=[int(t) for t in ids],
                sampling=sampling, max_new_tokens=max_new_tokens,
                eos_ids=eos, stop_strs=tuple(stop),
                constraint=constraint))
        for r in reqs:
            self.engine.add_request(r)
        done: Dict[str, Request] = {}
        for _ in range(max_steps):
            for r in self.engine.step():
                done[r.rid] = r
            if not self.engine.has_work():
                break
        missing = [f"rt{i}" for i in range(len(input_ids))
                   if f"rt{i}" not in done]
        if missing:
            raise RuntimeError(
                f"max_steps={max_steps} exhausted with "
                f"{len(missing)} unfinished requests: {missing[:5]}")
        out = []
        for i in range(len(input_ids)):
            r = done[f"rt{i}"]
            text = None
            if self.tokenizer is not None:
                text = self.tokenizer.decode(r.output_ids,
                                             skip_special_tokens=True)
                if r.stop_trim and r.stop_trim in text:
                    text = text[:text.find(r.stop_trim)]
            out.append({"text": text, "output_ids": list(r.output_ids),
                        "finish_reason": (r.finished.value
                                          if r.finished else None)})
        return out[0] if single else out

    def flush_cache(self) -> int:
        return self.engine.flush_cache()

    def shutdown(self) -> None:  # API-compat no-op (no processes to kill)
        pass
