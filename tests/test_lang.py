"""Prompt-program DSL tests: the reference's VDC judge programs written in
our lang API run against a live OpenAI-chat endpoint."""

import asyncio
import threading

import pytest

from aurora_tpu.lang import (RuntimeEndpoint, assistant, function, gen,
                             set_default_backend, system, user)

aiohttp = pytest.importorskip("aiohttp")


class EchoServer:
    """Chat endpoint that answers with a digest of what it was sent."""

    def __init__(self):
        self.port = None
        self.requests = []
        self._started = threading.Event()
        threading.Thread(target=self._run, daemon=True).start()
        self._started.wait(10)

    def _run(self):
        from aiohttp import web

        async def chat(request):
            body = await request.json()
            self.requests.append(body)
            n_msgs = len(body["messages"])
            last = body["messages"][-1]["content"]
            return web.json_response({"choices": [{"message": {
                "content": f"reply{n_msgs}:{last[:10]}"}}]})

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


@pytest.fixture(scope="module")
def echo():
    return EchoServer()


def test_reference_style_program(echo):
    """The VDCScore judge program shape (vdc/utils.py:201-217) ported
    1:1 to our API."""

    @function
    def gener_pred_response(s, pred_cap, q):
        s += system("You answer questions from descriptions.")
        s += user(f"description: {pred_cap}, question: {q}")
        s += assistant(gen("answer_1", max_tokens=64))

    set_default_backend(RuntimeEndpoint(f"http://127.0.0.1:{echo.port}"))
    state = gener_pred_response.run(pred_cap="a cat video", q="what?")
    assert state["answer_1"].startswith("reply2:")
    sent = echo.requests[-1]
    assert sent["messages"][0]["role"] == "system"
    assert "a cat video" in sent["messages"][1]["content"]
    assert sent["temperature"] == 0.0


def test_multi_turn_state(echo):
    @function
    def dialog(s):
        s += user("first")
        s += assistant(gen("a", max_tokens=8))
        s += user("second")
        s += assistant(gen("b", max_tokens=8))

    state = dialog.run(RuntimeEndpoint(f"http://127.0.0.1:{echo.port}"))
    # second gen sees 3 prior messages (user, assistant, user)
    assert state["a"].startswith("reply1:")
    assert state["b"].startswith("reply3:")


def test_gen_kwargs_forwarded(echo):
    @function
    def prog(s):
        s += user("pick")
        s += assistant(gen("c", max_tokens=4, temperature=0.7,
                           stop=["\n"], choices=["yes", "no"]))

    prog.run(RuntimeEndpoint(f"http://127.0.0.1:{echo.port}"))
    sent = echo.requests[-1]
    assert sent["max_tokens"] == 4
    assert sent["temperature"] == 0.7
    assert sent["stop"] == ["\n"]
    assert sent["choices_constraint"] == ["yes", "no"]
