"""Single-vector text store (the reference's pgvector path,
reference core/vector_store/pgvector_store.py:98-594): cosine top-k over
the stored embedding matrix, per-namespace, with oversampling hooks for
the reranker and npz persistence.

Scale design (the reference leans on pgvector's ivfflat index,
pgvector_store.py:87-95; this store is TPU-native instead):
  - embeddings live in a capacity-doubling host matrix (amortized O(1)
    append) and, past a row threshold, in a device-resident buffer that
    is updated TAIL-ONLY on ingest (one dynamic_update_slice program —
    never a full re-upload) and scanned with one jitted masked matvec +
    top-k per query. Exact, not approximate: a v5e chip brute-forces
    1M x 768 f32 at ~3 GB / 819 GB/s ~ 4 ms, beating ivfflat probes
    without its recall loss.
  - BM25 lexical scoring uses an inverted index (term -> row postings),
    so hybrid scoring is O(rows matching the query terms), not
    O(corpus). The hybrid top-k is exact: candidates = device cosine
    top-M ∪ BM25-matching rows; any row outside both has zero BM25 and
    a cosine below the M-th, so it cannot enter the top-k (k <= M).

Being in-process (unlike pgvector), the store keeps exact corpus
statistics; the BM25 component recovers the precision that the
air-gapped hashing embedder lacks vs the reference's hosted neural
embeddings. Disable with hybrid_lexical=False when a real embedding
endpoint is configured.
"""

from __future__ import annotations

import functools
import json
import logging
import math
import re
import threading
from collections import Counter
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from morphik_core_tpu.models.schemas import DocumentChunk
from morphik_core_tpu.vector_store.base_vector_store import BaseVectorStore

logger = logging.getLogger(__name__)

_DEFAULT_NS = "default"

_TOKEN_RE = re.compile(r"[a-z0-9]+")

_BM25_K1 = 1.5
_BM25_B = 0.75

#: below this many rows, a host matvec beats a device round trip
DEVICE_SCAN_MIN_ROWS = 50_000


@functools.partial(jax.jit, donate_argnums=(0,))
def _tail_update(buf: jax.Array, rows: jax.Array, start) -> jax.Array:
    return jax.lax.dynamic_update_slice(buf, rows, (start, 0))


@functools.partial(jax.jit, static_argnames=("m",))
def _masked_topm(buf: jax.Array, q: jax.Array, mask: jax.Array, m: int):
    scores = buf @ q
    scores = jnp.where(mask > 0, scores, -jnp.inf)
    return jax.lax.top_k(scores, m)


class _Namespace:
    def __init__(self, dim: Optional[int] = None):
        self.dim = dim
        self.vectors = np.zeros((0, dim or 1), dtype=np.float32)  # capacity rows
        self.count = 0
        self.rows: List[DocumentChunk] = []
        self._id_to_row: Dict[str, int] = {}
        self.alive: List[bool] = []
        # BM25 corpus statistics + inverted index (exact; maintained on
        # store/delete; postings are append-only, dead rows masked out)
        self.tf: List[Counter] = []  # per-row term frequencies
        self.df: Counter = Counter()  # term -> number of alive rows containing it
        self.postings: Dict[str, List[int]] = {}
        self.total_len = 0  # sum of alive rows' token counts
        # device-resident scan state
        self.dev_buf: Optional[jax.Array] = None
        self.dev_rows = 0  # rows reflected in dev_buf
        self.dev_alive: Optional[jax.Array] = None
        self.dev_alive_rows = -1

    def n_alive(self) -> int:
        return sum(self.alive)

    # ------------------------------------------------------------ vectors

    def append_vector(self, v: np.ndarray) -> None:
        if self.count == self.vectors.shape[0]:
            cap = max(1024, 2 * self.count)
            grown = np.zeros((cap, self.dim), dtype=np.float32)
            grown[: self.count] = self.vectors[: self.count]
            self.vectors = grown
        self.vectors[self.count] = v
        self.count += 1

    def device_scan(self, q: np.ndarray, mask: Optional[np.ndarray], m: int) -> np.ndarray:
        """Exact masked cosine scores for all rows, computed on device;
        returns a host (count,) array with -inf at masked rows. Only the
        tail appended since the last query is uploaded; mask=None means
        'alive rows' and reuses a device-cached mask (a fresh 4 MB mask
        upload per query would dominate on remote-attached TPUs)."""
        cap = self.vectors.shape[0]
        if self.dev_buf is None or self.dev_buf.shape[0] != cap:
            self.dev_buf = jnp.asarray(self.vectors)
            self.dev_rows = self.count
            self.dev_alive_rows = -1
        elif self.dev_rows < self.count:
            tail = jnp.asarray(self.vectors[self.dev_rows : self.count])
            self.dev_buf = _tail_update(self.dev_buf, tail, self.dev_rows)
            self.dev_rows = self.count
        if mask is None:
            if self.dev_alive is None or self.dev_alive_rows != self.count or (
                self.dev_alive.shape[0] != cap
            ):
                mfull = np.zeros(cap, np.float32)
                mfull[: self.count] = np.asarray(self.alive, dtype=np.float32)
                self.dev_alive = jnp.asarray(mfull)
                self.dev_alive_rows = self.count
            m_dev = self.dev_alive
        else:
            mfull = np.zeros(cap, np.float32)
            mfull[: self.count] = mask
            m_dev = jnp.asarray(mfull)
        v, i = _masked_topm(self.dev_buf, jnp.asarray(q), m_dev, min(m, cap))
        v, i = np.asarray(v), np.asarray(i)
        out = np.full(self.count, -np.inf, dtype=np.float32)
        ok = np.isfinite(v) & (i < self.count)
        out[i[ok]] = v[ok]
        return out

    # ------------------------------------------------------------- lexical

    def add_lexical(self, text: str, row: int) -> None:
        toks = Counter(_TOKEN_RE.findall(text.lower()))
        self.tf.append(toks)
        for t in toks:
            self.df[t] += 1
            self.postings.setdefault(t, []).append(row)
        self.total_len += sum(toks.values())

    def drop_lexical(self, row: int) -> None:
        toks = self.tf[row]
        for t in toks:
            self.df[t] -= 1
            if self.df[t] <= 0:
                del self.df[t]
        self.total_len -= sum(toks.values())

    def bm25_candidates(self, query: str, mask: np.ndarray) -> Dict[int, float]:
        """Exact BM25 over rows matching >=1 query term (inverted-index
        walk — O(matching rows), never O(corpus))."""
        n = self.n_alive()
        if n == 0:
            return {}
        avg_len = max(self.total_len / n, 1.0)
        q_terms = set(_TOKEN_RE.findall(query.lower()))
        idf = {}
        rows: set = set()
        for t in q_terms:
            dft = self.df.get(t, 0)
            if dft:
                idf[t] = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
                rows.update(self.postings.get(t, ()))
        scores: Dict[int, float] = {}
        for i in rows:
            if not mask[i]:
                continue
            tfs = self.tf[i]
            dl = sum(tfs.values())
            s = 0.0
            for t, w in idf.items():
                f = tfs.get(t, 0)
                if f:
                    s += w * (f * (_BM25_K1 + 1)) / (
                        f + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avg_len)
                    )
            if s:
                scores[i] = s
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
                    ns.dev_alive_rows = -1
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
                ns.add_lexical(c.content or "", row)
                ns._id_to_row[sid] = row
                n = float(np.linalg.norm(v))
                ns.append_vector(v / n if n else v)
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
        k = min(k, int(mask.sum()))
        # Small stores score on host (a device round-trip + first-compile
        # costs far more than a tiny matvec); large stores use the
        # device-resident buffer. Device path returns exact top-M scores
        # with M sized so hybrid merging stays exact (see module doc).
        if ns.count < DEVICE_SCAN_MIN_ROWS:
            scores = ns.vectors[: ns.count] @ q
            scores = np.where(mask, scores, -np.inf).astype(np.float32)
        else:
            m = max(4 * k, 256)
            scores = ns.device_scan(
                q, None if doc_ids is None else mask.astype(np.float32), m
            )
        if self.hybrid_lexical and query_text:
            lex_map = ns.bm25_candidates(query_text, mask)
            if lex_map:
                peak = max(lex_map.values())
                # equal-weight hybrid; BM25 normalized per query so the
                # combined score stays cosine-scaled for min_score filters
                combined = np.where(np.isfinite(scores), 0.5 * scores, -np.inf)
                for i, s in lex_map.items():
                    cos = scores[i]
                    if not np.isfinite(cos):  # outside device top-M: exact host dot
                        cos = float(ns.vectors[i] @ q)
                    combined[i] = 0.5 * cos + 0.5 * (s / peak)
                scores = combined
        top = np.argpartition(-scores, k - 1)[:k]
        top = top[np.argsort(-scores[top])]
        out = []
        for i in top:
            if not np.isfinite(scores[int(i)]):
                continue
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
                    ns.dev_alive_rows = -1
        return True

    # ------------------------------------------------------------- persist

    def save(self) -> None:
        if not self.path:
            return
        self.path.mkdir(parents=True, exist_ok=True)
        for key, ns in self._ns_map.items():
            np.save(self.path / f"{key}.vectors.npy", ns.vectors[: ns.count])
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
            ns.vectors = np.ascontiguousarray(np.load(vec_file), dtype=np.float32)
            ns.count = ns.vectors.shape[0]
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
                    ns.add_lexical(c.content or "", i)
                else:
                    ns.tf.append(Counter())
            self._ns_map[key] = ns
