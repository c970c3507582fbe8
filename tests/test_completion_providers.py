"""Completion-provider breadth (round-2 verdict missing #6): native
ollama /api/chat vision payloads and anthropic-style /v1/messages, the
two routes the reference reaches through LiteLLM
(core/completion/litellm_completion.py:620-740). A fake HTTP server
asserts the exact wire shapes."""

import asyncio
import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from morphik_core_tpu.completion.models import (
    AnthropicCompletionModel,
    OllamaNativeCompletionModel,
    build_completion_model,
)
from morphik_core_tpu.models.schemas import CompletionRequest

_LOOP = asyncio.new_event_loop()


def run(coro):
    return _LOOP.run_until_complete(coro)


PNG_B64 = base64.b64encode(b"\x89PNG\r\n\x1a\nfakepng").decode()
DATA_URI = f"data:image/png;base64,{PNG_B64}"


@pytest.fixture(scope="module")
def fake_llm():
    state = {"requests": []}

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n))
            state["requests"].append(
                {"path": self.path, "body": body, "headers": dict(self.headers)}
            )
            if self.path == "/api/chat":
                if body.get("stream"):
                    self.send_response(200)
                    self.send_header("Content-Type", "application/x-ndjson")
                    self.end_headers()
                    for tok in ("olla", "ma says hi"):
                        self.wfile.write(
                            json.dumps({"message": {"content": tok}, "done": False}).encode()
                            + b"\n"
                        )
                    self.wfile.write(json.dumps({"done": True}).encode() + b"\n")
                    return
                out = {
                    "model": body["model"],
                    "message": {"role": "assistant", "content": "the answer is 42"},
                    "done_reason": "stop",
                    "prompt_eval_count": 10,
                    "eval_count": 4,
                }
            elif self.path == "/v1/messages":
                if body.get("stream"):
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.end_headers()
                    events = [
                        {"type": "message_start"},
                        {"type": "content_block_delta", "delta": {"type": "text_delta", "text": "claude "}},
                        {"type": "content_block_delta", "delta": {"type": "text_delta", "text": "streams"}},
                        {"type": "message_stop"},
                    ]
                    for e in events:
                        self.wfile.write(f"data: {json.dumps(e)}\n\n".encode())
                    return
                out = {
                    "model": body["model"],
                    "content": [{"type": "text", "text": "anthropic answer"}],
                    "stop_reason": "end_turn",
                    "usage": {"input_tokens": 12, "output_tokens": 3},
                }
            else:
                self.send_response(404)
                self.end_headers()
                return
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


def _req(**kw):
    defaults = dict(
        query="what is the answer?",
        context_chunks=["The answer is 42.", DATA_URI],
        max_tokens=64,
        temperature=0.1,
    )
    defaults.update(kw)
    return CompletionRequest(**defaults)


def test_ollama_native_vision_payload(fake_llm):
    base, state = fake_llm
    m = OllamaNativeCompletionModel(base, "llama3.2-vision")
    resp = run(m.complete(_req()))
    assert resp.completion == "the answer is 42"
    assert resp.usage["total_tokens"] == 14
    body = state["requests"][-1]["body"]
    user = body["messages"][-1]
    # native protocol: RAW base64 images array, no data-URI prefix
    assert user["images"] == [PNG_B64]
    assert "data:image" not in json.dumps(body)
    assert body["options"]["num_predict"] == 64
    assert body["options"]["temperature"] == 0.1


def test_ollama_structured_json_format(fake_llm):
    base, state = fake_llm
    m = OllamaNativeCompletionModel(base, "llama3.2")
    run(m.complete(_req(response_schema={"type": "object", "properties": {"x": {}}})))
    body = state["requests"][-1]["body"]
    assert body["format"] == "json"
    assert "schema" in body["messages"][0]["content"]


def test_ollama_streaming(fake_llm):
    base, _ = fake_llm
    m = OllamaNativeCompletionModel(base, "llama3.2")

    async def collect():
        return [c async for c in m.complete_stream(_req())]

    assert "".join(run(collect())) == "ollama says hi"


def test_anthropic_payload_shape(fake_llm):
    base, state = fake_llm
    m = AnthropicCompletionModel("claude-test-1", api_key="sk-ant-xyz", base_url=base)
    resp = run(m.complete(_req()))
    assert resp.completion == "anthropic answer"
    assert resp.finish_reason == "end_turn"
    last = state["requests"][-1]
    assert last["headers"].get("x-api-key") == "sk-ant-xyz"
    assert last["headers"].get("anthropic-version")
    content = last["body"]["messages"][-1]["content"]
    img = [b for b in content if b["type"] == "image"][0]
    assert img["source"] == {"type": "base64", "media_type": "image/png", "data": PNG_B64}
    assert last["body"]["max_tokens"] == 64


def test_anthropic_streaming(fake_llm):
    base, _ = fake_llm
    m = AnthropicCompletionModel("claude-test-1", base_url=base)

    async def collect():
        return [c async for c in m.complete_stream(_req())]

    assert "".join(run(collect())) == "claude streams"


def test_build_completion_model_routing(fake_llm):
    base, _ = fake_llm
    from morphik_core_tpu.completion.models import OpenAICompatCompletionModel

    reg = {
        # prefix WITHOUT api_base -> native providers at their defaults
        "ollama_vis": {"model_name": "ollama_chat/llama3.2-vision"},
        "claude": {"model_name": "claude-test-1", "api_key": "k"},
        # explicit provider + custom base -> native wire format there
        "explicit_ollama": {"model_name": "custom", "provider": "ollama", "api_base": base},
        "explicit_claude": {"model_name": "claude-x", "provider": "anthropic", "api_base": base},
        # api_base without explicit provider stays OpenAI-compatible even
        # with a provider-looking model_name (pre-existing proxy configs:
        # openrouter/anthropic names, ollama's /v1 shim must NOT re-route)
        "openai": {"model_name": "gpt-x", "api_base": base},
        "proxy_claude": {"model_name": "anthropic/claude-3.5", "api_base": base},
        "ollama_shim": {"model_name": "ollama/llama3", "api_base": base},
    }
    m = build_completion_model(reg, "ollama_vis")
    assert isinstance(m, OllamaNativeCompletionModel)
    assert m.model == "llama3.2-vision" and m.base_url == "http://localhost:11434"
    c = build_completion_model(reg, "claude")
    assert isinstance(c, AnthropicCompletionModel)
    assert c.base_url == "https://api.anthropic.com"
    assert isinstance(build_completion_model(reg, "explicit_ollama"), OllamaNativeCompletionModel)
    assert isinstance(build_completion_model(reg, "explicit_claude"), AnthropicCompletionModel)
    for key in ("openai", "proxy_claude", "ollama_shim"):
        assert isinstance(build_completion_model(reg, key), OpenAICompatCompletionModel), key
    # production still refuses silent stub fallback
    with pytest.raises(RuntimeError):
        build_completion_model(reg, "missing_key", environment="production")

@pytest.fixture(scope="module", autouse=True)
def _loop_lifecycle():
    """Run pending callbacks (async-generator aclose tasks scheduled at
    GC) and CLOSE the module loop — an abandoned loop turns those into
    'Task was destroyed but it is pending!' at interpreter exit."""
    yield
    try:
        _LOOP.run_until_complete(asyncio.sleep(0.05))
    finally:
        _LOOP.close()
