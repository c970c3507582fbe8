"""Single-vector text embedding models (the reference's "regular" path,
reference core/embedding/litellm_embedding.py).

Two providers:
  - OpenAICompatEmbeddingModel: any OpenAI-compatible /embeddings HTTP
    endpoint (OpenAI, Ollama, vLLM, ...) — the deployment-time analogue
    of the reference's LiteLLM routing.
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
