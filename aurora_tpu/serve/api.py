"""HTTP serving front end: /generate + OpenAI-compatible endpoints.

Replaces the reference's FastAPI + ZMQ + multiprocess pipeline
(src/sglang/python/sglang/srt/server.py:282-400, managers/tokenizer_manager
.py, detokenizer_manager.py) with a single-process asyncio design: XLA
dispatch is already async, so the tokenizer → scheduler → model → detokenizer
pipeline is one event loop with a background engine task — no IPC, no ZMQ.

Endpoints (openai_api/adapter.py parity surface):
  POST /generate                 — native API (text or multimodal)
  POST /v1/completions           — OpenAI completions (+streaming)
  POST /v1/chat/completions      — OpenAI chat (+streaming)
  GET  /health, /get_model_info  — ops endpoints
  POST /abort_request            — abort by rid

aiohttp replaces FastAPI (not in the image).
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Any, Dict, Optional

import numpy as np

from aurora_tpu.generate.sampler import SamplingParams
from aurora_tpu.serve.engine import ServeEngine
from aurora_tpu.serve.scheduler import Request
from aurora_tpu.utils.templates import PROMPT_TEMPLATE


class ServingLoop:
    """Bridges the asyncio API front end and the synchronous engine."""

    def __init__(self, engine: ServeEngine, tokenizer, mm=None):
        self.engine = engine
        self.tokenizer = tokenizer
        self.mm = mm  # AuroraCapServing for multimodal deployments
        self._events: Dict[str, asyncio.Queue] = {}
        self._task: Optional[asyncio.Task] = None
        self._wake: Optional[asyncio.Event] = None
        # engine-mutating ops staged by handlers and applied between
        # steps: engine.step runs in a worker thread (asyncio.to_thread)
        # and mutates scheduler lists — a concurrent add_request/abort/
        # flush from the event-loop thread would race the step thread's
        # waiting.sort() (CPython raises 'list modified during sort' and
        # the in-flight batch gets failed)
        import collections
        self._ops = collections.deque()

    async def start(self) -> None:
        self._wake = asyncio.Event()
        self._task = asyncio.create_task(self._run())

    def _drain_ops(self) -> None:
        """Apply staged engine mutations — called ONLY between steps."""
        while self._ops:
            fn, fut = self._ops.popleft()
            try:
                res = fn()
                if fut is not None and not fut.cancelled():
                    fut.set_result(res)
            except Exception as e:  # noqa: BLE001 — deliver to caller
                if fut is not None and not fut.cancelled():
                    fut.set_exception(e)

    async def call(self, fn):
        """Run an engine-mutating callable between steps, await result."""
        fut = asyncio.get_running_loop().create_future()
        self._ops.append((fn, fut))
        if self._wake is not None:
            self._wake.set()
        return await fut

    async def _run(self) -> None:
        while True:
            self._drain_ops()
            if not self.engine.has_work():
                # park until submit() wakes us (no idle polling)
                self._wake.clear()
                if self._ops:  # staged between drain and clear
                    continue
                await self._wake.wait()
                continue
            try:
                stepped = await asyncio.to_thread(self.engine.step)
            except Exception as e:
                # Unexpected engine failure: per-request errors are already
                # isolated inside the engine (aborted + error field), so a
                # step-level exception means the running batch is suspect.
                # Fail only the in-flight batch; the waiting queue survives
                # (sglang tp_worker abort-path parity).
                import logging
                logging.getLogger(__name__).exception("engine step failed")
                for req in self.engine.fail_running():
                    q = self._events.pop(req.rid, None)
                    if q is not None:
                        q.put_nowait(("error", e))
                continue
            for req in stepped:
                q = self._events.pop(req.rid, None)
                if q is not None:
                    if req.error is not None:
                        q.put_nowait(("error", RuntimeError(req.error)))
                    else:
                        q.put_nowait(("done", req))
            # streaming: push partials for running requests
            for req in self.engine.sched.running:
                q = self._events.get(req.rid)
                if q is not None and req.stream:
                    q.put_nowait(("delta", req))

    async def submit(self, req: Request) -> asyncio.Queue:
        q: asyncio.Queue = asyncio.Queue()
        self._events[req.rid] = q
        # staged, not direct: a step may be mutating scheduler lists in
        # its worker thread right now
        self._ops.append((lambda: self.engine.add_request(req), None))
        if self._wake is not None:
            self._wake.set()
        return q

    def detok(self, ids, req=None) -> str:
        text = self.tokenizer.decode([int(t) for t in ids],
                                     skip_special_tokens=True)
        stop = getattr(req, "stop_trim", None) if req is not None else None
        if stop:
            idx = text.find(stop)
            if idx >= 0:
                text = text[:idx]
        return text


class StreamDetok:
    """Incremental detokenization for one streamed request.

    The HF/sglang incremental-decode algorithm (sglang
    srt/managers/tokenizer_manager.py decode_status: prefix_offset /
    read_offset): each delta decodes only the tokens since the last
    emitted boundary instead of the whole output — O(n) over a stream —
    and holds back text while the tail is an incomplete UTF-8 sequence
    ('\\ufffd'). Stop-string trimming matches ServingLoop.detok."""

    def __init__(self, tokenizer, stop=None):
        self.tok = tokenizer
        # one stop string or a tuple of them (Request.stop_strs)
        self.stops = ((stop,) if isinstance(stop, str)
                      else tuple(stop or ()))
        self.prefix = 0      # decode-window start (last clean boundary)
        self.read = 0        # tokens already rendered into `acc`
        self.window = []     # ids[prefix:read] snapshot (rewrite detect)
        self.acc = ""        # full decoded text so far
        self.sent = 0        # chars already returned to the client
        self.done = False    # stop string reached

    def push(self, ids, final: bool = False) -> str:
        """ids: full output_ids so far → newly-stable text delta.
        final=True (the stream's done event) flushes text held back
        behind an incomplete-UTF-8 boundary instead of dropping it."""
        if self.done:
            return ""
        ids = [int(t) for t in ids]
        if ids[self.prefix:self.read] != self.window:
            # output_ids were REWRITTEN, not appended — jump-forward
            # retokenization healing rewinds the list to the canonical
            # tokenization of the same text (engine._maybe_jump). The
            # incremental window is meaningless now: resync from a full
            # decode. Already-sent chars stay monotonic (`sent` never
            # rewinds), so clients see no duplication.
            self.acc = self.tok.decode(ids, skip_special_tokens=True)
            self.read = len(ids)
            self.prefix = max(0, self.read - 4)
        else:
            last = self.tok.decode(ids[self.prefix:self.read],
                                   skip_special_tokens=True)
            new = self.tok.decode(ids[self.prefix:],
                                  skip_special_tokens=True)
            if len(new) > len(last) and (final
                                         or not new.endswith("�")):
                self.acc += new[len(last):]
                self.prefix = self.read
                self.read = len(ids)
        self.window = ids[self.prefix:self.read]
        text = self.acc
        hits = [text.find(s) for s in self.stops if text.find(s) >= 0]
        if hits:
            text = text[:min(hits)]
            self.done = True
        delta = text[self.sent:]
        self.sent = max(self.sent, len(text))
        return delta


def _sampling_from(body: Dict[str, Any]) -> SamplingParams:
    temp = float(body.get("temperature", 0.0))
    if not body.get("do_sample", True):
        temp = 0.0
    return SamplingParams(
        temperature=temp,
        top_p=float(body.get("top_p", 1.0)),
        top_k=int(body.get("top_k", 0)),
        min_p=float(body.get("min_p", 0.0)),
        repetition_penalty=float(body.get("repetition_penalty", 1.0)),
        frequency_penalty=float(body.get("frequency_penalty", 0.0)),
        presence_penalty=float(body.get("presence_penalty", 0.0)),
        min_new_tokens=int(body.get("min_new_tokens", 0)))


def _logprobs_payload(loop_, req, chat: bool = False):
    """OpenAI-format logprobs block for a finished request."""
    if not req.logprobs:
        return None
    toks = [loop_.tokenizer.decode([t]) for t in req.output_ids]
    if chat:
        content = []
        for t, lp, top in zip(toks, req.output_logprobs,
                              req.output_top_logprobs):
            content.append({
                "token": t, "logprob": lp,
                "top_logprobs": [
                    {"token": loop_.tokenizer.decode([i]), "logprob": v}
                    for i, v in top]})
        return {"content": content}
    return {"tokens": toks,
            "token_logprobs": req.output_logprobs,
            "top_logprobs": [
                {loop_.tokenizer.decode([i]): v for i, v in top}
                for top in req.output_top_logprobs]}


def build_app(loop_: ServingLoop, model_name: str = "auroracap"):
    from aiohttp import web
    from concurrent.futures import ThreadPoolExecutor

    eos_default = tuple(
        {loop_.tokenizer.eos_token_id} - {None}) or (2,)
    # multimodal host work (video decode + CLIP preprocess + eager ViT
    # dispatch) runs here, off the event loop — the TokenizerManager's
    # async image-fetch role (tokenizer_manager.py:188,244)
    _mm_pool = ThreadPoolExecutor(max_workers=2,
                                  thread_name_prefix="aurora-mm")

    def make_request(prompt_ids, body, stream=False) -> Request:
        ecfg = loop_.engine.ecfg
        max_new = int(body.get("max_new_tokens", body.get("max_tokens",
                                                          128)))
        if len(prompt_ids) + max_new > ecfg.max_seq_len:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": "prompt+max_tokens exceeds "
                                 f"max_seq_len {ecfg.max_seq_len}"}))
        stop = body.get("stop") or ()
        if isinstance(stop, str):
            stop = (stop,)
        constraint = None
        try:
            if body.get("choices_constraint"):
                from aurora_tpu.serve.constrained import ChoiceConstraint
                constraint = ChoiceConstraint.from_strings(
                    loop_.tokenizer, body["choices_constraint"])
            elif body.get("regex"):
                from aurora_tpu.serve.fsm import RegexConstraint
                constraint = RegexConstraint(
                    body["regex"], loop_.tokenizer,
                    loop_.engine.cfg.vocab_size, eos_ids=eos_default)
        except (ValueError, IndexError) as e:
            # malformed / over-complex user pattern → 400, not a 500
            raise web.HTTPBadRequest(text=json.dumps(
                {"error": f"invalid constraint: {e}"}))
        return Request(
            constraint=constraint,
            rid=body.get("rid", uuid.uuid4().hex),
            input_ids=[int(t) for t in prompt_ids],
            sampling=_sampling_from(body),
            max_new_tokens=int(body.get("max_new_tokens",
                                        body.get("max_tokens", 128))),
            logprobs=bool(body.get("logprobs")),
            eos_ids=eos_default, stop_strs=tuple(stop), stream=stream)

    async def run_request(req: Request):
        q = await loop_.submit(req)
        while True:
            kind, r = await q.get()
            if kind == "error":
                raise web.HTTPInternalServerError(
                    text=json.dumps({"error": str(r)}))
            if kind == "done":
                return r

    async def h_generate(request):
        body = await request.json()
        if loop_.mm is not None and ("video_path" in body
                                     or "frames_b64" in body):
            # host decode + preprocess + eager ViT dispatch run on the
            # mm executor: the event loop stays responsive and several
            # videos decode in parallel while the engine computes
            req = await asyncio.get_event_loop().run_in_executor(
                _mm_pool, _multimodal_request, body)
        elif "input_ids" in body:
            req = make_request(body["input_ids"], body,
                               stream=bool(body.get("stream")))
        else:
            ids = loop_.tokenizer.encode(body["text"])
            req = make_request(ids, body, stream=bool(body.get("stream")))
        if not req.stream:
            done = await run_request(req)
            meta = {"finish_reason": done.finished.value,
                    "prompt_tokens": len(done.input_ids),
                    "completion_tokens": len(done.output_ids)}
            if done.logprobs:
                meta["output_token_logprobs"] = done.output_logprobs
                meta["output_top_logprobs"] = done.output_top_logprobs
            return web.json_response({
                "text": loop_.detok(done.output_ids, done),
                "output_ids": done.output_ids,
                "meta_info": meta})
        return await _stream_response(request, req, openai=None)

    async def _stream_response(request, req, openai):
        from aiohttp import web
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream"})
        await resp.prepare(request)
        q = await loop_.submit(req)
        # the request's stop strings, not stop_trim: stop_trim is only
        # set by the ENGINE at finish time, so passing it here always
        # handed StreamDetok None and streamed responses never trimmed
        detok = StreamDetok(loop_.tokenizer,
                            getattr(req, "stop_strs", None))
        while True:
            kind, r = await q.get()
            if kind == "error":
                await resp.write(
                    f"data: {json.dumps({'error': str(r)})}\n\n".encode())
                break
            delta = detok.push(r.output_ids, final=(kind == "done"))
            if not delta and kind != "done":
                continue  # held back (incomplete UTF-8) or no new tokens
            if openai == "chat":
                payload = {"id": req.rid, "object":
                           "chat.completion.chunk",
                           "choices": [{"index": 0,
                                        "delta": {"content": delta}}]}
            elif openai == "completions":
                payload = {"id": req.rid, "object": "text_completion",
                           "choices": [{"index": 0, "text": delta}]}
            else:
                payload = {"text": delta, "rid": req.rid}
            await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
            if kind == "done":
                break
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def h_completions(request):
        body = await request.json()
        prompt = body.get("prompt", "")
        ids = loop_.tokenizer.encode(prompt)
        req = make_request(ids, body, stream=bool(body.get("stream")))
        if req.stream:
            return await _stream_response(request, req, "completions")
        done = await run_request(req)
        return web.json_response({
            "id": req.rid, "object": "text_completion",
            "created": int(time.time()), "model": model_name,
            "choices": [{"index": 0,
                         "text": loop_.detok(done.output_ids, done),
                         "logprobs": _logprobs_payload(loop_, done),
                         "finish_reason": done.finished.value}],
            "usage": {"prompt_tokens": len(done.input_ids),
                      "completion_tokens": len(done.output_ids),
                      "total_tokens": done.seq_len}})

    async def h_chat(request):
        body = await request.json()
        msgs = body.get("messages", [])
        from aurora_tpu.utils.templates import render_conversation
        tpl = getattr(PROMPT_TEMPLATE, body.get("chat_template", "vicuna"),
                      PROMPT_TEMPLATE.vicuna)
        prompt = render_conversation(tpl, msgs)
        ids = loop_.tokenizer.encode(prompt)
        req = make_request(ids, body, stream=bool(body.get("stream")))
        if req.stream:
            return await _stream_response(request, req, "chat")
        done = await run_request(req)
        return web.json_response({
            "id": req.rid, "object": "chat.completion",
            "created": int(time.time()), "model": model_name,
            "choices": [{"index": 0,
                         "message": {"role": "assistant",
                                     "content":
                                     loop_.detok(done.output_ids, done)},
                         "logprobs": _logprobs_payload(loop_, done,
                                                       chat=True),
                         "finish_reason": done.finished.value}],
            "usage": {"prompt_tokens": len(done.input_ids),
                      "completion_tokens": len(done.output_ids),
                      "total_tokens": done.seq_len}})

    def _multimodal_request(body):
        """AuroraCap video captioning request (launch_server_auroracap
        deployment parity): video loaded host-side, prompt built from the
        reference template, placeholder ids keep the radix cache hot."""
        import base64
        import numpy as np
        from aurora_tpu.data.preprocess import clip_resize_crop
        from aurora_tpu.data.text import build_video_prompt
        from aurora_tpu.data.video import read_video
        from aurora_tpu.utils.templates import PROMPT_TEMPLATE

        if "video_path" in body:
            raw = read_video(body["video_path"],
                             int(body.get("num_frames", 8)))
        else:
            frames = [np.frombuffer(base64.b64decode(b), np.uint8)
                      for b in body["frames_b64"]]
            shape = body["frame_shape"]
            raw = np.stack([f.reshape(shape) for f in frames])
        size = int(body.get("image_size", loop_.mm.image_size))
        # split CLIP pipeline: host does geometry only (uint8), the
        # rescale/normalize/CHW arithmetic fuses into the device encode
        # (exact clip_preprocess parity — data/preprocess.py) and H2D
        # ships 4x fewer bytes off this 1-core host
        px = clip_resize_crop(list(raw), size=size, crop=size)
        prompt_text = build_video_prompt(
            body.get("text", "Describe the video in detail."),
            px.shape[0], PROMPT_TEMPLATE.vicuna)
        kept = body.get("token_kept_ratio")
        req = loop_.mm.build_request(
            body.get("rid", uuid.uuid4().hex), prompt_text, px,
            kept_ratio=float(kept) if kept is not None else None,
            sampling=_sampling_from(body),
            max_new_tokens=int(body.get("max_new_tokens", 1024)),
            eos_ids=eos_default, stream=bool(body.get("stream")))
        # placeholder expansion (frames x visual tokens) can blow past the
        # slot-table width — enforce the same guard make_request applies
        ecfg = loop_.engine.ecfg
        if len(req.input_ids) + req.max_new_tokens > ecfg.max_seq_len:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": "expanded prompt "
                                 f"({len(req.input_ids)}) + max_new_tokens "
                                 f"({req.max_new_tokens}) exceeds "
                                 f"max_seq_len {ecfg.max_seq_len}"}))
        # decode-ahead: dispatch the ViT encode now (async), so the
        # engine's EXTEND for this request hits the embed cache
        if hasattr(loop_.mm, "prewarm"):
            loop_.mm.prewarm(req)
        return req

    _GUI_HTML = """<!doctype html><html><head><title>aurora_tpu</title>
<style>body{font-family:sans-serif;max-width:760px;margin:2em auto}
textarea,input{width:100%;margin:4px 0;box-sizing:border-box}
#out{white-space:pre-wrap;border:1px solid #ccc;padding:1em;min-height:6em}
label{font-size:.9em;color:#444}</style></head><body>
<h2>aurora_tpu — video captioning</h2>
<label>Prompt</label>
<textarea id="prompt" rows="3">Describe the video in detail.</textarea>
<label>Server-side video path (optional — empty for text-only)</label>
<input id="video" placeholder="/path/to/video.mp4">
<label>num frames / kept ratio / max new tokens</label>
<input id="frames" value="8"> <input id="ratio" value="0.8">
<input id="maxnew" value="256">
<button onclick="go()">Generate</button>
<h3>Output</h3><div id="out"></div>
<script>
async function go(){
  const v = document.getElementById('video').value.trim();
  const body = {text: document.getElementById('prompt').value,
                max_new_tokens: +document.getElementById('maxnew').value};
  if (v) { body.video_path = v;
           body.num_frames = +document.getElementById('frames').value;
           body.token_kept_ratio = +document.getElementById('ratio').value; }
  document.getElementById('out').textContent = '…generating';
  const r = await fetch('/generate', {method:'POST',
      headers:{'Content-Type':'application/json'},
      body: JSON.stringify(body)});
  const j = await r.json();
  document.getElementById('out').textContent = j.text || JSON.stringify(j);
}
</script></body></html>"""

    # -- OpenAI files + batches (openai_api/adapter.py parity) -----------
    import os
    import tempfile

    files_dir = os.environ.get("AURORA_FILES_DIR") or tempfile.mkdtemp(
        prefix="aurora_files_")
    batches: Dict[str, Dict[str, Any]] = {}

    def _file_path(fid):
        return os.path.join(files_dir, fid)

    async def h_file_upload(request):
        """POST /v1/files — multipart (`file` field) or raw body with
        ?filename=. Returns an OpenAI file object."""
        fid = "file-" + uuid.uuid4().hex[:24]
        name = request.query.get("filename", "upload.jsonl")
        if request.content_type.startswith("multipart/"):
            reader = await request.multipart()
            data = b""
            async for part in reader:
                if part.name == "file":
                    name = part.filename or name
                    data = await part.read()
        else:
            data = await request.read()
        with open(_file_path(fid), "wb") as f:
            f.write(data)
        return web.json_response({
            "id": fid, "object": "file", "bytes": len(data),
            "created_at": int(time.time()), "filename": name,
            "purpose": request.query.get("purpose", "batch")})

    async def h_file_content(request):
        fid = request.match_info["fid"]
        path = _file_path(fid)
        if not os.path.exists(path):
            return web.json_response({"error": "file not found"},
                                     status=404)
        with open(path, "rb") as f:
            return web.Response(body=f.read(),
                                content_type="application/octet-stream")

    async def _run_batch_job(bid: str):
        """Process a batch file of /v1/chat/completions-style requests
        CONCURRENTLY through the engine's continuous batching."""
        job = batches[bid]
        try:
            with open(_file_path(job["input_file_id"])) as f:
                lines = [json.loads(ln) for ln in f if ln.strip()]

            async def one(rec):
                body = rec.get("body", {})
                msgs = body.get("messages")
                if msgs:
                    from aurora_tpu.utils.templates import (
                        PROMPT_TEMPLATE, render_conversation)
                    prompt = render_conversation(PROMPT_TEMPLATE.vicuna,
                                                 msgs)
                else:
                    prompt = body.get("prompt", "")
                ids = loop_.tokenizer.encode(prompt)
                req = make_request(ids, body)
                done = await run_request(req)
                return {"id": "batch_req_" + uuid.uuid4().hex[:16],
                        "custom_id": rec.get("custom_id"),
                        "response": {"status_code": 200, "body": {
                            "choices": [{"index": 0, "message": {
                                "role": "assistant",
                                "content": loop_.detok(done.output_ids,
                                                       done)}}]}},
                        "error": None}

            results = await asyncio.gather(
                *[one(rec) for rec in lines], return_exceptions=True)
            out_id = "file-" + uuid.uuid4().hex[:24]
            ok = fail = 0
            with open(_file_path(out_id), "w") as f:
                for rec, res in zip(lines, results):
                    if isinstance(res, Exception):
                        fail += 1
                        res = {"custom_id": rec.get("custom_id"),
                               "response": None,
                               "error": {"message": str(res)}}
                    else:
                        ok += 1
                    f.write(json.dumps(res) + "\n")
            job.update(status="completed", output_file_id=out_id,
                       request_counts={"total": len(lines),
                                       "completed": ok, "failed": fail},
                       completed_at=int(time.time()))
        except Exception as e:  # noqa: BLE001
            job.update(status="failed", errors={"message": str(e)})

    async def h_batch_create(request):
        body = await request.json()
        bid = "batch_" + uuid.uuid4().hex[:24]
        batches[bid] = {
            "id": bid, "object": "batch", "status": "in_progress",
            "input_file_id": body["input_file_id"],
            "endpoint": body.get("endpoint", "/v1/chat/completions"),
            "created_at": int(time.time()), "output_file_id": None}
        asyncio.get_event_loop().create_task(_run_batch_job(bid))
        return web.json_response(batches[bid])

    async def h_batch_get(request):
        bid = request.match_info["bid"]
        if bid not in batches:
            return web.json_response({"error": "batch not found"},
                                     status=404)
        return web.json_response(batches[bid])

    async def h_gui(request):
        """Minimal built-in web UI (gradio_gui.py:98-129 parity — the
        environment has no gradio; one static page drives /generate)."""
        return web.Response(text=_GUI_HTML, content_type="text/html")

    async def h_health(request):
        return web.json_response({"status": "ok"})

    async def h_model_info(request):
        return web.json_response({
            "model": model_name,
            "memory": loop_.engine.check_memory()})

    async def h_models(request):
        # OpenAI SDK compatibility: clients list models before first use
        return web.json_response({
            "object": "list",
            "data": [{"id": model_name, "object": "model",
                      "created": 0, "owned_by": "aurora_tpu"}]})

    async def h_decode_stats(request):
        # print_decode_stats parity (tp_worker.py:285-300) as an ops
        # endpoint: running/queued, slot usage, decode tokens/s
        return web.json_response(loop_.engine.decode_stats())

    async def h_abort(request):
        body = await request.json()
        # staged: abort mutates scheduler lists the step thread may hold
        ok = await loop_.call(
            lambda: loop_.engine.abort(body.get("rid", "")))
        return web.json_response({"aborted": ok})

    import functools

    import jax
    import jax.numpy as jnp

    def _offline_fwd_unavailable(params):
        """Why the offline llama_apply path (embeddings/classify) can't
        run on this deployment's params, or None if it can. MLA layouts
        (q_a/kv_a latents) and quantized weights have no llama_apply
        forward — answer a clean 400, never a 500."""
        layers = params.get("layers", {})
        qw = layers.get("q", layers.get("qkv"))
        if qw is None:
            return ("are unavailable on this architecture (no dense "
                    "q/qkv projection — e.g. MLA latent attention)")
        if qw.dtype == jnp.int8:
            # llama_apply has no W8A8/W4 path; silently dotting raw
            # int8/packed matrices would return garbage
            return ("are unavailable on weight-quantized deployments "
                    "(start without --weight-quant)")
        return None

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def _embed_fwd(params, ids, mask, cfg):
        from aurora_tpu.models.llama import llama_apply
        hidden, _ = llama_apply(params, cfg, input_ids=ids,
                                attention_mask=mask, return_hidden=True)
        # last valid token's hidden state (e5-mistral convention, the
        # reference's embedding-model serving path)
        last = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)
        return jnp.take_along_axis(
            hidden, last[:, None, None], axis=1)[:, 0].astype(jnp.float32)

    async def h_embeddings(request):
        """OpenAI /v1/embeddings (srt embedding-request parity): last
        hidden state of the final prompt token, length-bucketed."""
        body = await request.json()
        inputs = body.get("input", [])
        if isinstance(inputs, str):
            inputs = [inputs]
        eng = loop_.engine
        params = (eng.engines[0].params if hasattr(eng, "engines")
                  else eng.params)
        err = _offline_fwd_unavailable(params)
        if err:
            return web.json_response({"error": "embeddings " + err},
                                     status=400)
        data = []
        for i, text in enumerate(inputs):
            ids = loop_.tokenizer.encode(text)
            n = len(ids)
            bucket = max(16, 1 << (n - 1).bit_length())
            import numpy as _np
            pad = _np.zeros((1, bucket), _np.int32)
            pad[0, :n] = ids
            mask = _np.zeros((1, bucket), bool)
            mask[0, :n] = True
            emb = await asyncio.to_thread(
                lambda: jax.device_get(_embed_fwd(
                    params, jnp.asarray(pad), jnp.asarray(mask),
                    eng.cfg))[0])
            data.append({"object": "embedding", "index": i,
                         "embedding": [float(x) for x in emb]})
        return web.json_response({
            "object": "list", "data": data, "model": model_name,
            "usage": {"prompt_tokens": sum(len(loop_.tokenizer.encode(t))
                                           for t in inputs)}})

    async def h_classify(request):
        """Sequence classification / reward scoring over the engine's
        weights (sglang srt/models/llama_classification.py parity):
        class logits = score head over the LAST prompt token's hidden
        state. Requires a checkpoint with a classification head
        (LlamaForSequenceClassification `score.weight` → params
        ["score"]). Body: {"input": str | [str, ...]}."""
        body = await request.json()
        inputs = body.get("input", [])
        if isinstance(inputs, str):
            inputs = [inputs]
        eng = loop_.engine
        params = (eng.engines[0].params if hasattr(eng, "engines")
                  else eng.params)
        if "score" not in params:
            return web.json_response(
                {"error": "this checkpoint has no classification head "
                          "(expected LlamaForSequenceClassification "
                          "score.weight)"}, status=400)
        err = _offline_fwd_unavailable(params)
        if err:
            return web.json_response(
                {"error": "classification logits " + err}, status=400)
        data = []
        for i, text in enumerate(inputs):
            ids = loop_.tokenizer.encode(text)
            n = len(ids)
            bucket = max(16, 1 << (n - 1).bit_length())
            import numpy as _np
            pad = _np.zeros((1, bucket), _np.int32)
            pad[0, :n] = ids
            mask = _np.zeros((1, bucket), bool)
            mask[0, :n] = True

            def _one():
                h = _embed_fwd(params, jnp.asarray(pad),
                               jnp.asarray(mask), eng.cfg)
                return jax.device_get(
                    jnp.dot(h, params["score"].astype(jnp.float32)))[0]
            logits = await asyncio.to_thread(_one)
            data.append({"object": "classification", "index": i,
                         "logits": [float(x) for x in logits]})
        return web.json_response({"object": "list", "data": data,
                                  "model": model_name})

    async def h_flush_cache(request):
        # staged: eviction mutates the radix tree the step thread reads
        remaining = await loop_.call(loop_.engine.flush_cache)
        return web.json_response({"flushed": True,
                                  "cached_tokens": remaining})

    async def h_update_weights(request):
        """Live weight reload with rollback (sglang /update_weights,
        model_runner.py:230-316). Body: {"model_dir": "<HF llama dir>"}.
        Waits briefly for the running batch to drain, then swaps."""
        body = await request.json()
        try:
            from aurora_tpu.models.convert import (llama_params_from_hf,
                                                   load_torch_state_dict)
            sd = load_torch_state_dict(body["model_dir"])
            eng = loop_.engine
            # --dp>1 serves a MultiReplicaController, which holds params
            # per replica engine (same resolution as h_embeddings)
            ref_params = (eng.engines[0].params
                          if hasattr(eng, "engines") else eng.params)
            new_params = llama_params_from_hf(
                sd, eng.cfg, dtype=ref_params["embed_tokens"].dtype)
        except Exception as e:
            return web.json_response(
                {"success": False, "message": f"load failed: {e}"},
                status=400)
        deadline = time.monotonic() + float(body.get("drain_timeout", 10))
        while True:
            ok, msg = await loop_.call(
                lambda: loop_.engine.update_weights(new_params))
            if ok or time.monotonic() > deadline:
                break
            await asyncio.sleep(0.05)
        return web.json_response({"success": ok, "message": msg},
                                 status=200 if ok else 409)

    app = web.Application()
    app.router.add_post("/generate", h_generate)
    app.router.add_post("/v1/completions", h_completions)
    app.router.add_post("/v1/chat/completions", h_chat)
    app.router.add_get("/health", h_health)
    app.router.add_get("/get_model_info", h_model_info)
    app.router.add_get("/v1/models", h_models)
    app.router.add_get("/decode_stats", h_decode_stats)
    app.router.add_post("/abort_request", h_abort)
    app.router.add_post("/flush_cache", h_flush_cache)
    app.router.add_post("/update_weights", h_update_weights)
    app.router.add_post("/v1/embeddings", h_embeddings)
    app.router.add_post("/v1/classify", h_classify)
    app.router.add_post("/v1/files", h_file_upload)
    app.router.add_get("/v1/files/{fid}/content", h_file_content)
    app.router.add_post("/v1/batches", h_batch_create)
    app.router.add_get("/v1/batches/{bid}", h_batch_get)
    app.router.add_get("/", h_gui)
    return app


def launch_server(params, cfg, tokenizer, *, host="0.0.0.0",
                  port=30000, engine_cfg=None, model_name="auroracap",
                  mm=None, dp=1, dispatch="shortest_queue"):
    """Blocking server entry (launch_server parity, srt/server.py:282).
    Pass mm=AuroraCapServing(...) for multimodal deployments; dp>1 runs
    one engine replica per local device (ControllerMulti parity)."""
    from aiohttp import web
    from aurora_tpu.serve.engine import EngineConfig

    if dp > 1:
        import jax
        from aurora_tpu.serve.controller import MultiReplicaController
        ecfg = engine_cfg or EngineConfig()
        engine = MultiReplicaController(
            params, cfg, ecfg,
            devices=jax.local_devices()[:dp * ecfg.tp],
            dispatch=dispatch,
            embed_fn=mm.embed_fn if mm else None, tokenizer=tokenizer)
    else:
        engine = ServeEngine(params, cfg, engine_cfg or EngineConfig(),
                             embed_fn=mm.embed_fn if mm else None,
                             tokenizer=tokenizer)
    loop_ = ServingLoop(engine, tokenizer, mm=mm)
    app = build_app(loop_, model_name)

    async def on_startup(app):
        await loop_.start()

    app.on_startup.append(on_startup)
    web.run_app(app, host=host, port=port)
