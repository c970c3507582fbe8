"""Single-vector text store (the reference's pgvector path,
reference core/vector_store/pgvector_store.py:98-594): cosine top-k over
the stored embedding matrix on device, per-namespace, with oversampling
hooks for the reranker and npz persistence.

Being in-process (unlike pgvector), the store also keeps exact corpus
statistics and scores a BM25 lexical component alongside the cosine —
hybrid retrieval recovers the precision that the air-gapped hashing
embedder lacks vs the reference's hosted neural embeddings. Disable
with hybrid_lexical=False when a real embedding endpoint is configured.
"""

from __future__ import annotations

import json
import logging
import math
import re
import threading
from collections import Counter
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from morphik_core_tpu.models.schemas import DocumentChunk
from morphik_core_tpu.vector_store.base_vector_store import BaseVectorStore

logger = logging.getLogger(__name__)

_DEFAULT_NS = "default"


_TOKEN_RE = re.compile(r"[a-z0-9]+")

_BM25_K1 = 1.5
_BM25_B = 0.75


class _Namespace:
    def __init__(self, dim: Optional[int] = None):
        self.dim = dim
        self.vectors = np.zeros((0, dim or 1), dtype=np.float32)
        self.rows: List[DocumentChunk] = []
        self._id_to_row: Dict[str, int] = {}
        self.alive: List[bool] = []
        # BM25 corpus statistics (exact; maintained on store/delete)
        self.tf: List[Counter] = []  # per-row term frequencies
        self.df: Counter = Counter()  # term -> number of alive rows containing it
        self.total_len = 0  # sum of alive rows' token counts

    def n_alive(self) -> int:
        return sum(self.alive)

    def add_lexical(self, text: str) -> None:
        toks = Counter(_TOKEN_RE.findall(text.lower()))
        self.tf.append(toks)
        for t in toks:
            self.df[t] += 1
        self.total_len += sum(toks.values())

    def drop_lexical(self, row: int) -> None:
        toks = self.tf[row]
        for t in toks:
            self.df[t] -= 1
            if self.df[t] <= 0:
                del self.df[t]
        self.total_len -= sum(toks.values())

    def bm25(self, query: str, mask: np.ndarray) -> np.ndarray:
        """Exact BM25 over alive rows (k1/b standard)."""
        n = self.n_alive()
        scores = np.zeros(len(self.rows), dtype=np.float32)
        if n == 0:
            return scores
        avg_len = max(self.total_len / n, 1.0)
        q_terms = set(_TOKEN_RE.findall(query.lower()))
        idf = {}
        for t in q_terms:
            dft = self.df.get(t, 0)
            if dft:
                idf[t] = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
        if not idf:
            return scores
        for i in np.nonzero(mask)[0]:
            tfs = self.tf[int(i)]
            dl = sum(tfs.values())
            s = 0.0
            for t, w in idf.items():
                f = tfs.get(t, 0)
                if f:
                    s += w * (f * (_BM25_K1 + 1)) / (f + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avg_len))
            scores[int(i)] = s
        return scores


class TextVectorStore(BaseVectorStore):
    def __init__(self, path: Optional[str | Path] = None, hybrid_lexical: bool = True):
        self.path = Path(path) if path else None
        self.hybrid_lexical = hybrid_lexical
        self._ns_map: Dict[str, _Namespace] = {}
        self._lock = threading.RLock()
        if self.path and self.path.exists():
            self._load()

    def _ns(self, app_id: Optional[str]) -> _Namespace:
        key = app_id or _DEFAULT_NS
        if key not in self._ns_map:
            self._ns_map[key] = _Namespace()
        return self._ns_map[key]

    async def initialize(self) -> bool:
        return True

    async def store_embeddings(
        self, chunks: List[DocumentChunk], app_id: Optional[str] = None
    ) -> Tuple[bool, List[str], Dict[str, Any]]:
        if not chunks:
            return True, [], {}
        ns = self._ns(app_id)
        ids = []
        with self._lock:
            vecs = [np.asarray(c.embedding, dtype=np.float32).reshape(-1) for c in chunks]
            if ns.dim is None:
                ns.dim = vecs[0].shape[0]
                ns.vectors = np.zeros((0, ns.dim), dtype=np.float32)
            for c, v in zip(chunks, vecs):
                sid = f"{c.document_id}-{c.chunk_number}"
                old = ns._id_to_row.get(sid)
                if old is not None and ns.alive[old]:
                    ns.alive[old] = False
                    ns.drop_lexical(old)
                row = len(ns.rows)
                stored = DocumentChunk(
                    document_id=c.document_id,
                    chunk_number=c.chunk_number,
                    content=c.content,
                    embedding=[],
                    metadata=c.metadata,
                )
                ns.rows.append(stored)
                ns.alive.append(True)
                ns.add_lexical(c.content or "")
                ns._id_to_row[sid] = row
                n = float(np.linalg.norm(v))
                ns.vectors = np.vstack([ns.vectors, (v / n if n else v)[None]])
                ids.append(sid)
        return True, ids, {"vector_store_backend": "tpu_text", "vector_store_rows": len(chunks)}

    async def query_similar(
        self,
        query_embedding: Union[np.ndarray, List[float]],
        k: int,
        doc_ids: Optional[Sequence[str]] = None,
        app_id: Optional[str] = None,
        skip_image_content: bool = False,
        query_text: Optional[str] = None,
    ) -> List[DocumentChunk]:
        ns = self._ns(app_id)
        if not ns.rows:
            return []
        q = np.asarray(query_embedding, dtype=np.float32).reshape(-1)
        qn = np.linalg.norm(q)
        if qn:
            q = q / qn
        mask = np.array(ns.alive, dtype=bool)
        if doc_ids is not None:
            allowed = set(doc_ids)
            mask &= np.array([r.document_id in allowed for r in ns.rows], dtype=bool)
        if not mask.any():
            return []
        # Small stores score on host (a device round-trip + first-compile
        # costs far more than a tiny matvec); large stores use the device.
        if ns.vectors.shape[0] < 50_000:
            scores = ns.vectors @ q
        else:
            scores = np.array(jnp.asarray(ns.vectors) @ jnp.asarray(q))
        if self.hybrid_lexical and query_text:
            lex = ns.bm25(query_text, mask)
            peak = float(lex.max())
            if peak > 0:
                # equal-weight hybrid; BM25 normalized per query so the
                # combined score stays cosine-scaled for min_score filters
                scores = 0.5 * scores + 0.5 * (lex / peak)
        scores[~mask] = -np.inf
        k = min(k, int(mask.sum()))
        top = np.argpartition(-scores, k - 1)[:k]
        top = top[np.argsort(-scores[top])]
        out = []
        for i in top:
            c = ns.rows[int(i)]
            out.append(
                DocumentChunk(
                    document_id=c.document_id,
                    chunk_number=c.chunk_number,
                    content=c.content,
                    embedding=[],
                    metadata=c.metadata,
                    score=float(scores[int(i)]),
                )
            )
        return out

    async def get_chunks_by_id(
        self,
        chunk_identifiers: Sequence[Tuple[str, int]],
        app_id: Optional[str] = None,
        skip_image_content: bool = False,
    ) -> List[DocumentChunk]:
        ns = self._ns(app_id)
        out = []
        for doc_id, num in chunk_identifiers:
            row = ns._id_to_row.get(f"{doc_id}-{num}")
            if row is not None and ns.alive[row]:
                out.append(ns.rows[row])
        return out

    async def delete_chunks_by_document_id(self, document_id: str, app_id: Optional[str] = None) -> bool:
        ns = self._ns(app_id)
        with self._lock:
            for i, r in enumerate(ns.rows):
                if r.document_id == document_id and ns.alive[i]:
                    ns.alive[i] = False
                    ns.drop_lexical(i)
                    ns._id_to_row.pop(f"{r.document_id}-{r.chunk_number}", None)
        return True

    # ------------------------------------------------------------- persist

    def save(self) -> None:
        if not self.path:
            return
        self.path.mkdir(parents=True, exist_ok=True)
        for key, ns in self._ns_map.items():
            np.save(self.path / f"{key}.vectors.npy", ns.vectors)
            with open(self.path / f"{key}.rows.json", "w") as f:
                json.dump(
                    {
                        "alive": ns.alive,
                        "rows": [r.model_dump(exclude={"embedding"}) for r in ns.rows],
                    },
                    f,
                )

    def _load(self) -> None:
        for vec_file in self.path.glob("*.vectors.npy"):
            key = vec_file.name[: -len(".vectors.npy")]
            rows_file = self.path / f"{key}.rows.json"
            if not rows_file.exists():
                continue
            ns = _Namespace()
            ns.vectors = np.load(vec_file)
            ns.dim = ns.vectors.shape[1] if ns.vectors.size else None
            with open(rows_file) as f:
                data = json.load(f)
            ns.alive = data["alive"]
            for i, rd in enumerate(data["rows"]):
                rd["embedding"] = []
                c = DocumentChunk(**rd)
                ns.rows.append(c)
                if ns.alive[i]:
                    ns._id_to_row[f"{c.document_id}-{c.chunk_number}"] = i
                    ns.add_lexical(c.content or "")
                else:
                    ns.tf.append(Counter())
            self._ns_map[key] = ns
