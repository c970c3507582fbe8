"""Single-vector text embedding models (the reference's "regular" path,
reference core/embedding/litellm_embedding.py).

Providers:
  - RoutedEmbeddingModel: the LiteLLMEmbeddingModel counterpart — takes
    a `registered_models` key and routes by provider (ollama native
    /api/embed, azure api-key deployments, any OpenAI-compatible
    /embeddings for everything else), with the reference's local-vs-API
    batch sizing and 2000-dim cap (litellm_embedding.py:22-141).
  - OpenAICompatEmbeddingModel: direct OpenAI-compatible /embeddings
    endpoint (OpenAI, Ollama-openai, vLLM, ...).
  - HashingEmbeddingModel: deterministic offline feature-hashing
    embedder (n-gram hashing -> L2-normalized dense vector). No
    network, no weights; used as the default in air-gapped dev/test
    and as the failover.
"""

from __future__ import annotations

import hashlib
import logging
import re
from typing import List, Optional, Union

import numpy as np

from morphik_core_tpu.embedding.base_embedding_model import BaseEmbeddingModel
from morphik_core_tpu.models.schemas import Chunk

logger = logging.getLogger(__name__)

_TOKEN_RE = re.compile(r"[a-z0-9]+")


class HashingEmbeddingModel(BaseEmbeddingModel):
    """Feature-hashing embeddings: unigrams + bigrams hashed into `dim`
    buckets with sign hashing, sublinear tf, L2 norm."""

    def __init__(self, dim: int = 768):
        self.dim = dim

    def _embed(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float32)
        toks = _TOKEN_RE.findall(text.lower())
        grams = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
        for g in grams:
            h = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "little")
            idx = h % self.dim
            sign = 1.0 if (h >> 63) & 1 else -1.0
            v[idx] += sign
        # sublinear scaling then normalize
        v = np.sign(v) * np.log1p(np.abs(v))
        n = float(np.linalg.norm(v))
        return v / n if n > 0 else v

    async def embed_for_ingestion(self, chunks: Union[Chunk, List[Chunk]]) -> List[np.ndarray]:
        if isinstance(chunks, Chunk):
            chunks = [chunks]
        return [self._embed(c.content) for c in chunks]

    async def embed_for_query(self, text: str) -> np.ndarray:
        return self._embed(text)


class OpenAICompatEmbeddingModel(BaseEmbeddingModel):
    """POST {base_url}/embeddings with {model, input:[...]}; dims capped
    for store compatibility (reference litellm_embedding.py:35)."""

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: Optional[str] = None,
        batch_size: int = 100,
        max_dims: int = 2000,
        timeout: float = 30.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.batch_size = batch_size
        self.max_dims = max_dims
        self.timeout = timeout

    async def _post(self, inputs: List[str]) -> List[np.ndarray]:
        import httpx

        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        async with httpx.AsyncClient(timeout=self.timeout) as client:
            r = await client.post(
                f"{self.base_url}/embeddings",
                json={"model": self.model, "input": inputs},
                headers=headers,
            )
            r.raise_for_status()
            data = r.json()["data"]
        out = [np.asarray(d["embedding"], dtype=np.float32)[: self.max_dims] for d in data]
        return out

    async def embed_for_ingestion(self, chunks: Union[Chunk, List[Chunk]]) -> List[np.ndarray]:
        if isinstance(chunks, Chunk):
            chunks = [chunks]
        texts = [c.content for c in chunks]
        out: List[np.ndarray] = []
        for i in range(0, len(texts), self.batch_size):
            out.extend(await self._post(texts[i : i + self.batch_size]))
        return out

    async def embed_for_query(self, text: str) -> np.ndarray:
        return (await self._post([text]))[0]


class RoutedEmbeddingModel(BaseEmbeddingModel):
    """Multi-provider routing over `registered_models` config entries —
    the counterpart of the reference's LiteLLMEmbeddingModel
    (core/embedding/litellm_embedding.py:14-141).

    Entry shape (morphik_tpu.toml [registered_models.<key>]):
        model_name = "text-embedding-3-small" | "ollama/nomic-embed-text"
                     | "azure/<deployment>"
        api_base   = "https://..."        (required for non-OpenAI hosts)
        api_key    = "..."                (or env var, applied by config)

    Routing: "ollama/x" -> Ollama native POST {api_base}/api/embed;
    "azure/x" -> {api_base}/embeddings with an `api-key` header;
    everything else -> OpenAI-compatible POST {api_base}/embeddings.
    Batch sizing follows the reference: 5 for local providers
    (localhost / :11434 / ollama), 100 for hosted APIs; dims capped at
    min(configured, 2000)."""

    def __init__(self, model_key: str, settings=None):
        from morphik_core_tpu.config import get_settings

        s = settings or get_settings()
        if model_key not in s.registered_models:
            raise ValueError(f"Model '{model_key}' not found in registered_models configuration")
        self.model_key = model_key
        self.model_config = dict(s.registered_models[model_key])
        self.dimensions = min(s.embedding.dimensions or 2000, 2000)
        name = str(self.model_config.get("model_name", model_key))
        base = str(self.model_config.get("api_base", "") or "")
        self._is_local = (
            any(h in base.lower() for h in ("localhost", "127.0.0.1", "host.docker.internal", ":11434"))
            or "ollama" in name.lower()
        )
        self.batch_size = 5 if self._is_local else 100
        if name.startswith("ollama/"):
            self.provider, self.model_name = "ollama", name.split("/", 1)[1]
            self.api_base = (base or "http://localhost:11434").rstrip("/")
        elif name.startswith("azure/"):
            self.provider, self.model_name = "azure", name.split("/", 1)[1]
            if not base:
                raise ValueError(
                    f"registered model {model_key!r}: azure/* requires api_base"
                )
            self.api_base = base.rstrip("/")
            self.azure_api_version = str(
                self.model_config.get("api_version", "2024-02-01")
            )
        else:
            self.provider, self.model_name = "openai", name.removeprefix("openai/")
            self.api_base = (base or "https://api.openai.com/v1").rstrip("/")
        self.api_key = self.model_config.get("api_key")
        self.timeout = float(self.model_config.get("timeout", 30.0))

    async def _request(self, url: str, payload: dict, headers: dict) -> dict:
        """Transport seam (tests stub this)."""
        import httpx

        async with httpx.AsyncClient(timeout=self.timeout) as client:
            r = await client.post(url, json=payload, headers=headers)
            r.raise_for_status()
            return r.json()

    async def _embed_batch(self, texts: List[str]) -> List[np.ndarray]:
        headers = {"Content-Type": "application/json"}
        if self.provider == "ollama":
            data = await self._request(
                f"{self.api_base}/api/embed",
                {"model": self.model_name, "input": texts},
                headers,
            )
            vecs = data["embeddings"]
        else:
            if self.api_key:
                if self.provider == "azure":
                    headers["api-key"] = self.api_key
                else:
                    headers["Authorization"] = f"Bearer {self.api_key}"
            if self.provider == "azure":
                # Azure's deployment-scoped URL shape (what litellm built
                # for the reference from the same config)
                url = (
                    f"{self.api_base}/openai/deployments/{self.model_name}"
                    f"/embeddings?api-version={self.azure_api_version}"
                )
                payload = {"input": texts}
            else:
                url = f"{self.api_base}/embeddings"
                payload = {"model": self.model_name, "input": texts}
            data = await self._request(url, payload, headers)
            vecs = [d["embedding"] for d in data["data"]]
        return [np.asarray(v, dtype=np.float32)[: self.dimensions] for v in vecs]

    async def embed_documents(self, texts: List[str]) -> List[np.ndarray]:
        out: List[np.ndarray] = []
        for i in range(0, len(texts), self.batch_size):
            out.extend(await self._embed_batch(texts[i : i + self.batch_size]))
        return out

    async def embed_for_ingestion(self, chunks: Union[Chunk, List[Chunk]]) -> List[np.ndarray]:
        if isinstance(chunks, Chunk):
            chunks = [chunks]
        return await self.embed_documents([c.content for c in chunks])

    async def embed_for_query(self, text: str) -> np.ndarray:
        return (await self.embed_documents([text]))[0]
