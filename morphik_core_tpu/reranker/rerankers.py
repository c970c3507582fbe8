"""Rerankers for the non-colpali retrieval path (reference
core/reranker/flag_reranker.py wraps FlagEmbedding's BGE cross-encoder).

  - CrossEncoderReranker: sentence-transformers cross-encoder when the
    package + weights are available (gated import).
  - OverlapReranker: deterministic lexical scorer (BM25-ish token
    overlap with idf weighting) as the always-available fallback.
"""

from __future__ import annotations

import logging
import math
import re
from abc import ABC, abstractmethod
from typing import List, Optional, Sequence, Union

from morphik_core_tpu.models.schemas import DocumentChunk

logger = logging.getLogger(__name__)


class BaseReranker(ABC):
    @abstractmethod
    async def rerank(self, query: str, chunks: List[DocumentChunk]) -> List[DocumentChunk]:
        """Rescore chunks against the query; returns chunks sorted desc."""

    @abstractmethod
    async def compute_score(self, query: str, texts: Union[str, List[str]]) -> Union[float, List[float]]:
        ...


_TOK = re.compile(r"[a-z0-9]+")


class OverlapReranker(BaseReranker):
    def _scores(self, query: str, texts: Sequence[str]) -> List[float]:
        q = _TOK.findall(query.lower())
        if not q or not texts:
            return [0.0] * len(texts)
        docs = [_TOK.findall(t.lower()) for t in texts]
        n = len(docs)
        df = {}
        for d in docs:
            for w in set(d):
                df[w] = df.get(w, 0) + 1
        out = []
        for d in docs:
            counts = {}
            for w in d:
                counts[w] = counts.get(w, 0) + 1
            s = 0.0
            for w in q:
                if w in counts:
                    idf = math.log(1 + n / df.get(w, 1))
                    tf = counts[w] / (counts[w] + 1.5)
                    s += idf * tf
            out.append(s / (math.sqrt(len(q)) or 1.0))
        return out

    async def rerank(self, query: str, chunks: List[DocumentChunk]) -> List[DocumentChunk]:
        scores = self._scores(query, [c.content for c in chunks])
        for c, s in zip(chunks, scores):
            c.score = float(s)
        return sorted(chunks, key=lambda c: -c.score)

    async def compute_score(self, query: str, texts: Union[str, List[str]]) -> Union[float, List[float]]:
        single = isinstance(texts, str)
        scores = self._scores(query, [texts] if single else list(texts))
        return scores[0] if single else scores


class CrossEncoderReranker(BaseReranker):
    def __init__(self, model_name: str = "BAAI/bge-reranker-v2-m3", device: str = "cpu"):
        from sentence_transformers import CrossEncoder  # gated import

        self.model = CrossEncoder(model_name, device=device)

    async def rerank(self, query: str, chunks: List[DocumentChunk]) -> List[DocumentChunk]:
        scores = self.model.predict([(query, c.content) for c in chunks]).tolist()
        for c, s in zip(chunks, scores):
            c.score = float(s)
        return sorted(chunks, key=lambda c: -c.score)

    async def compute_score(self, query: str, texts: Union[str, List[str]]) -> Union[float, List[float]]:
        single = isinstance(texts, str)
        pairs = [(query, texts)] if single else [(query, t) for t in texts]
        scores = self.model.predict(pairs).tolist()
        return scores[0] if single else scores


def build_reranker(model_name: Optional[str] = None) -> BaseReranker:
    if model_name:
        try:
            return CrossEncoderReranker(model_name)
        except Exception as e:  # noqa: BLE001 — package/weights unavailable
            logger.warning("cross-encoder reranker unavailable (%s); using overlap reranker", e)
    return OverlapReranker()


class ColQwenReranker(BaseReranker):
    """TPU-native late-interaction reranker: embeds query and chunk TEXT
    through the ColQwen text tower and scores with exact MaxSim on
    device. Replaces the reference's CPU BGE cross-encoder
    (core/reranker/flag_reranker.py:30) with the model already resident
    in HBM — no second model, no extra weights."""

    def __init__(self, colpali_embedding_model, batch_size: int = 16):
        self.embedding_model = colpali_embedding_model
        self.batch_size = batch_size

    async def compute_score(self, query: str, texts: Union[str, List[str]]) -> Union[float, List[float]]:
        single = isinstance(texts, str)
        items = [texts] if single else list(texts)
        if not items:
            return []
        import jax.numpy as jnp
        import numpy as np

        from morphik_core_tpu.ops.maxsim import maxsim_scores, pad_multivectors

        q = await self.embedding_model.embed_for_query(query)
        model = self.embedding_model.model
        mvs: List[np.ndarray] = []
        for s in range(0, len(items), self.batch_size):
            mvs.extend(model.embed_queries(items[s : s + self.batch_size]))
        dense, mask = pad_multivectors(mvs)
        scores = maxsim_scores(
            jnp.asarray(q), jnp.asarray(dense), jnp.asarray(mask), use_pallas=False
        )
        out = [float(v) for v in np.asarray(scores)]
        return out[0] if single else out

    async def rerank(self, query: str, chunks: List[DocumentChunk]) -> List[DocumentChunk]:
        if not chunks:
            return chunks
        scores = await self.compute_score(query, [c.content for c in chunks])
        for c, s in zip(chunks, scores):
            c.score = float(s)
        return sorted(chunks, key=lambda c: -c.score)
