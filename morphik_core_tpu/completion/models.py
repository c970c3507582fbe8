"""Completion layer (the reference's LiteLLM routing,
reference core/completion/litellm_completion.py:285-740).

Providers:
  - OpenAICompatCompletionModel: any OpenAI-compatible /chat/completions
    endpoint (OpenAI, Ollama, vLLM...). Vision chunks (data URIs) are
    passed as image_url blocks; streaming via SSE; structured output via
    JSON-schema instruction + parse (graceful fallback to text, mirroring
    the reference's instructor fallback :680-731).
  - StubCompletionModel: deterministic offline completion that
    extractively answers from the retrieved context — keeps the full
    RAG path runnable in air-gapped dev/test.
"""

from __future__ import annotations

import json
import logging
import re
from abc import ABC, abstractmethod
from typing import Any, AsyncIterator, Dict, List, Optional

from morphik_core_tpu.models.schemas import CompletionRequest, CompletionResponse

logger = logging.getLogger(__name__)

DEFAULT_PROMPT = (
    "You are a helpful assistant. Answer the question using ONLY the provided context.\n"
    "Context:\n{context}\n\nQuestion: {question}"
)


def _is_image_content(chunk: str) -> bool:
    return chunk.startswith("data:image/")


class BaseCompletionModel(ABC):
    @abstractmethod
    async def complete(self, request: CompletionRequest) -> CompletionResponse:
        ...

    async def complete_stream(self, request: CompletionRequest) -> AsyncIterator[str]:
        """Default streaming: yield the non-streaming completion at once."""
        resp = await self.complete(request)
        yield resp.completion if isinstance(resp.completion, str) else json.dumps(resp.completion)

    def _build_messages(self, request: CompletionRequest) -> List[Dict[str, Any]]:
        texts = [c for c in request.context_chunks if not _is_image_content(c)]
        images = [c for c in request.context_chunks if _is_image_content(c)]
        template = request.prompt_template or DEFAULT_PROMPT
        # plain placeholder substitution, NOT str.format: user templates
        # legitimately contain literal braces (JSON examples) that
        # .format would blow up on
        prompt = template.replace("{context}", "\n---\n".join(texts)).replace(
            "{question}", request.query
        )
        messages: List[Dict[str, Any]] = []
        if request.chat_history:
            messages.extend({"role": m.role, "content": m.content} for m in request.chat_history)
        if images:
            content: List[Dict[str, Any]] = [{"type": "text", "text": prompt}]
            content.extend({"type": "image_url", "image_url": {"url": u}} for u in images)
            messages.append({"role": "user", "content": content})
        else:
            messages.append({"role": "user", "content": prompt})
        if request.response_schema:
            messages.insert(
                0,
                {
                    "role": "system",
                    "content": "Respond ONLY with JSON matching this schema:\n"
                    + json.dumps(request.response_schema),
                },
            )
        return messages


class StubCompletionModel(BaseCompletionModel):
    """Extractive offline answerer: returns the most question-relevant
    sentences from the context (word-overlap scored)."""

    def __init__(self, model_name: str = "stub"):
        self.model_name = model_name

    async def complete(self, request: CompletionRequest) -> CompletionResponse:
        texts = [c for c in request.context_chunks if not _is_image_content(c)]
        n_images = len(request.context_chunks) - len(texts)
        q_words = set(re.findall(r"[a-z0-9]+", request.query.lower()))
        sentences: List[tuple] = []
        for t in texts:
            for s in re.split(r"(?<=[.!?])\s+|\n", t):
                words = set(re.findall(r"[a-z0-9]+", s.lower()))
                overlap = len(q_words & words)
                if s.strip():
                    sentences.append((overlap, s.strip()))
        sentences.sort(key=lambda x: -x[0])
        best = [s for _, s in sentences[:3] if _]
        if request.response_schema:
            props = (request.response_schema.get("properties") or {}).keys()
            completion: Any = {p: (best[0] if best else "") for p in props}
        elif best:
            completion = " ".join(best)
        else:
            completion = (
                f"[offline-stub] No matching context found for: {request.query!r} "
                f"({len(texts)} text chunks, {n_images} image chunks retrieved)"
            )
        tokens_in = sum(len(t.split()) for t in texts) + len(request.query.split())
        return CompletionResponse(
            completion=completion,
            usage={"prompt_tokens": tokens_in, "completion_tokens": len(str(completion).split()),
                   "total_tokens": tokens_in + len(str(completion).split())},
            finish_reason="stop",
            metadata={"model": self.model_name},
        )

    async def complete_stream(self, request: CompletionRequest) -> AsyncIterator[str]:
        resp = await self.complete(request)
        text = resp.completion if isinstance(resp.completion, str) else json.dumps(resp.completion)
        for i in range(0, len(text), 24):
            yield text[i : i + 24]


class OpenAICompatCompletionModel(BaseCompletionModel):
    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: Optional[str] = None,
        timeout: float = 120.0,
        extra_params: Optional[Dict[str, Any]] = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.timeout = timeout
        self.extra_params = extra_params or {}

    def _headers(self) -> Dict[str, str]:
        h = {"Content-Type": "application/json"}
        if self.api_key:
            h["Authorization"] = f"Bearer {self.api_key}"
        return h

    def _payload(self, request: CompletionRequest, stream: bool = False) -> Dict[str, Any]:
        payload: Dict[str, Any] = {
            "model": self.model,
            "messages": self._build_messages(request),
            "stream": stream,
            **self.extra_params,
        }
        if request.max_tokens:
            payload["max_tokens"] = request.max_tokens
        if request.temperature is not None:
            payload["temperature"] = request.temperature
        if request.llm_config:
            payload.update({k: v for k, v in request.llm_config.items() if k not in ("model",)})
            if request.llm_config.get("model"):
                payload["model"] = request.llm_config["model"]
        return payload

    async def complete(self, request: CompletionRequest) -> CompletionResponse:
        import httpx

        async with httpx.AsyncClient(timeout=self.timeout) as client:
            r = await client.post(
                f"{self.base_url}/chat/completions", json=self._payload(request), headers=self._headers()
            )
            r.raise_for_status()
            data = r.json()
        text = data["choices"][0]["message"]["content"]
        completion: Any = text
        if request.response_schema:
            try:
                completion = json.loads(re.sub(r"^```(json)?|```$", "", text.strip(), flags=re.M))
            except (json.JSONDecodeError, TypeError):
                logger.warning("structured output parse failed; returning raw text")
        return CompletionResponse(
            completion=completion,
            usage=data.get("usage", {}),
            finish_reason=data["choices"][0].get("finish_reason"),
            metadata={"model": data.get("model", self.model)},
        )

    async def complete_stream(self, request: CompletionRequest) -> AsyncIterator[str]:
        import httpx

        async with httpx.AsyncClient(timeout=self.timeout) as client:
            async with client.stream(
                "POST",
                f"{self.base_url}/chat/completions",
                json=self._payload(request, stream=True),
                headers=self._headers(),
            ) as r:
                r.raise_for_status()
                async for line in r.aiter_lines():
                    if not line.startswith("data: "):
                        continue
                    payload = line[6:]
                    if payload.strip() == "[DONE]":
                        break
                    try:
                        delta = json.loads(payload)["choices"][0]["delta"].get("content")
                    except (json.JSONDecodeError, KeyError, IndexError):
                        continue
                    if delta:
                        yield delta


# media subtypes legitimately carry '+', '-', '.' (image/svg+xml, ...)
_DATA_URI_RE = re.compile(r"^data:(image/[\w.+-]+);base64,(.*)$", re.S)


class OllamaNativeCompletionModel(BaseCompletionModel):
    """Ollama's NATIVE /api/chat protocol (not its OpenAI shim): vision
    context rides as a raw-base64 `images` list on the user message and
    structured output uses `format: "json"` (the reference builds these
    exact payloads for ollama models,
    core/completion/litellm_completion.py:620-740)."""

    def __init__(
        self,
        base_url: str,
        model: str,
        timeout: float = 120.0,
        extra_options: Optional[Dict[str, Any]] = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.timeout = timeout
        self.extra_options = extra_options or {}

    def _payload(self, request: CompletionRequest, stream: bool) -> Dict[str, Any]:
        texts = [c for c in request.context_chunks if not _is_image_content(c)]
        images = [c for c in request.context_chunks if _is_image_content(c)]
        template = request.prompt_template or DEFAULT_PROMPT
        prompt = template.replace("{context}", "\n---\n".join(texts)).replace(
            "{question}", request.query
        )
        messages: List[Dict[str, Any]] = []
        if request.response_schema:
            messages.append(
                {
                    "role": "system",
                    "content": "Respond ONLY with JSON matching this schema:\n"
                    + json.dumps(request.response_schema),
                }
            )
        if request.chat_history:
            messages.extend({"role": m.role, "content": m.content} for m in request.chat_history)
        def raw_b64(u: str) -> str:
            m = _DATA_URI_RE.match(u)
            if m:
                return m.group(2)
            # unknown data: flavor — still strip the header rather than
            # shipping the whole URI as "base64"
            if u.startswith("data:") and "," in u:
                return u.split(",", 1)[1]
            return u

        user: Dict[str, Any] = {"role": "user", "content": prompt}
        if images:
            # ollama native wants RAW base64, no data-URI prefix
            user["images"] = [raw_b64(u) for u in images]
        messages.append(user)
        options: Dict[str, Any] = dict(self.extra_options)
        if request.temperature is not None:
            options["temperature"] = request.temperature
        if request.max_tokens:
            options["num_predict"] = request.max_tokens
        payload: Dict[str, Any] = {
            "model": self.model,
            "messages": messages,
            "stream": stream,
            "options": options,
        }
        if request.response_schema:
            payload["format"] = "json"
        if request.llm_config and request.llm_config.get("model"):
            payload["model"] = request.llm_config["model"]
        return payload

    async def complete(self, request: CompletionRequest) -> CompletionResponse:
        import httpx

        async with httpx.AsyncClient(timeout=self.timeout) as client:
            r = await client.post(f"{self.base_url}/api/chat", json=self._payload(request, False))
            r.raise_for_status()
            data = r.json()
        text = (data.get("message") or {}).get("content", "")
        completion: Any = text
        if request.response_schema:
            try:
                completion = json.loads(re.sub(r"^```(json)?|```$", "", text.strip(), flags=re.M))
            except (json.JSONDecodeError, TypeError):
                logger.warning("ollama structured output parse failed; returning raw text")
        pt, ct = data.get("prompt_eval_count", 0), data.get("eval_count", 0)
        return CompletionResponse(
            completion=completion,
            usage={"prompt_tokens": pt, "completion_tokens": ct, "total_tokens": pt + ct},
            finish_reason=data.get("done_reason", "stop"),
            metadata={"model": data.get("model", self.model)},
        )

    async def complete_stream(self, request: CompletionRequest) -> AsyncIterator[str]:
        import httpx

        async with httpx.AsyncClient(timeout=self.timeout) as client:
            async with client.stream(
                "POST", f"{self.base_url}/api/chat", json=self._payload(request, True)
            ) as r:
                r.raise_for_status()
                async for line in r.aiter_lines():
                    if not line.strip():
                        continue
                    try:
                        obj = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if obj.get("done"):
                        break
                    delta = (obj.get("message") or {}).get("content")
                    if delta:
                        yield delta


class AnthropicCompletionModel(BaseCompletionModel):
    """Anthropic-style /v1/messages payloads: x-api-key auth, system as a
    top-level field, images as base64 source blocks, SSE
    content_block_delta streaming (the reference reaches these models
    through LiteLLM's anthropic route)."""

    API_VERSION = "2023-06-01"

    def __init__(
        self,
        model: str,
        api_key: Optional[str] = None,
        base_url: str = "https://api.anthropic.com",
        timeout: float = 120.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.timeout = timeout

    def _headers(self) -> Dict[str, str]:
        h = {"Content-Type": "application/json", "anthropic-version": self.API_VERSION}
        if self.api_key:
            h["x-api-key"] = self.api_key
        return h

    def _payload(self, request: CompletionRequest, stream: bool) -> Dict[str, Any]:
        texts = [c for c in request.context_chunks if not _is_image_content(c)]
        images = [c for c in request.context_chunks if _is_image_content(c)]
        template = request.prompt_template or DEFAULT_PROMPT
        prompt = template.replace("{context}", "\n---\n".join(texts)).replace(
            "{question}", request.query
        )
        content: List[Dict[str, Any]] = []
        for u in images:
            m = _DATA_URI_RE.match(u)
            if m:
                content.append(
                    {
                        "type": "image",
                        "source": {
                            "type": "base64",
                            "media_type": m.group(1),
                            "data": m.group(2),
                        },
                    }
                )
            else:
                # never drop evidence silently
                logger.warning("skipping non-base64 image chunk (%.40s...)", u)
        content.append({"type": "text", "text": prompt})
        messages: List[Dict[str, Any]] = []
        if request.chat_history:
            messages.extend({"role": m.role, "content": m.content} for m in request.chat_history)
        messages.append({"role": "user", "content": content})
        payload: Dict[str, Any] = {
            "model": self.model,
            "messages": messages,
            "max_tokens": request.max_tokens or 1024,
            "stream": stream,
        }
        if request.temperature is not None:
            payload["temperature"] = request.temperature
        if request.response_schema:
            payload["system"] = (
                "Respond ONLY with JSON matching this schema:\n"
                + json.dumps(request.response_schema)
            )
        if request.llm_config and request.llm_config.get("model"):
            payload["model"] = request.llm_config["model"]
        return payload

    async def complete(self, request: CompletionRequest) -> CompletionResponse:
        import httpx

        async with httpx.AsyncClient(timeout=self.timeout) as client:
            r = await client.post(
                f"{self.base_url}/v1/messages",
                json=self._payload(request, False),
                headers=self._headers(),
            )
            r.raise_for_status()
            data = r.json()
        text = "".join(b.get("text", "") for b in data.get("content", []) if b.get("type") == "text")
        completion: Any = text
        if request.response_schema:
            try:
                completion = json.loads(re.sub(r"^```(json)?|```$", "", text.strip(), flags=re.M))
            except (json.JSONDecodeError, TypeError):
                logger.warning("anthropic structured output parse failed; returning raw text")
        usage = data.get("usage", {})
        pt, ct = usage.get("input_tokens", 0), usage.get("output_tokens", 0)
        return CompletionResponse(
            completion=completion,
            usage={"prompt_tokens": pt, "completion_tokens": ct, "total_tokens": pt + ct},
            finish_reason=data.get("stop_reason"),
            metadata={"model": data.get("model", self.model)},
        )

    async def complete_stream(self, request: CompletionRequest) -> AsyncIterator[str]:
        import httpx

        async with httpx.AsyncClient(timeout=self.timeout) as client:
            async with client.stream(
                "POST",
                f"{self.base_url}/v1/messages",
                json=self._payload(request, True),
                headers=self._headers(),
            ) as r:
                r.raise_for_status()
                async for line in r.aiter_lines():
                    if not line.startswith("data: "):
                        continue
                    try:
                        obj = json.loads(line[6:])
                    except json.JSONDecodeError:
                        continue
                    if obj.get("type") == "content_block_delta":
                        delta = obj.get("delta", {}).get("text")
                        if delta:
                            yield delta
                    elif obj.get("type") == "message_stop":
                        break


def build_completion_model(
    registered: Dict[str, Dict[str, Any]],
    model_key: str,
    environment: str = "development",
) -> BaseCompletionModel:
    """Resolve a registered_models entry (reference morphik.toml:17-63) to
    a provider, like the reference's LiteLLM routing
    (litellm_completion.py:620-740):
      - provider="ollama" (or model_name "ollama/..."/"ollama_chat/...")
        -> native /api/chat with raw-b64 `images` vision blocks
      - provider="anthropic" (or model_name "anthropic/..."/"claude...")
        -> /v1/messages with x-api-key + base64 image source blocks
      - any other api_base -> OpenAI-compatible /chat/completions
      - nothing configured -> offline stub (development only)

    Outside development, a misconfigured model key refuses to boot
    instead of silently serving extractive stub answers with HTTP 200
    (same policy as ColpaliEmbeddingModel's missing-checkpoint guard)."""
    cfg = registered.get(model_key, {})
    api_base = cfg.get("api_base")
    name = cfg.get("model_name", model_key)
    provider = cfg.get("provider")
    if provider is None:
        if api_base:
            # an explicit api_base without an explicit provider keeps the
            # OpenAI-compatible wire format — a pre-existing proxy config
            # like {model_name: "anthropic/claude-x", api_base: openrouter}
            # must NOT be silently re-routed to /v1/messages by its name
            provider = "openai"
        elif name.startswith(("ollama/", "ollama_chat/")):
            provider = "ollama"
        elif name.startswith("anthropic/") or name.startswith("claude"):
            provider = "anthropic"
    if provider == "ollama":
        return OllamaNativeCompletionModel(
            base_url=api_base or "http://localhost:11434",
            model=name.split("/", 1)[1] if "/" in name else name,
        )
    if provider == "anthropic":
        return AnthropicCompletionModel(
            model=name.split("/", 1)[1] if name.startswith("anthropic/") else name,
            api_key=cfg.get("api_key"),
            base_url=api_base or "https://api.anthropic.com",
        )
    if api_base:
        return OpenAICompatCompletionModel(
            base_url=api_base,
            model=name,
            api_key=cfg.get("api_key"),
        )
    if environment != "development" and model_key != "stub":
        known = sorted(registered)
        raise RuntimeError(
            f"completion model {model_key!r} is "
            + ("not in registered_models" if model_key not in registered
               else "missing api_base")
            + f" (known keys: {known}); refusing to serve stub completions in "
            f"environment={environment!r} — set completion.model='stub' to opt in"
        )
    logger.warning("model %s has no api_base — using offline stub completion", model_key)
    return StubCompletionModel(model_name=model_key)
