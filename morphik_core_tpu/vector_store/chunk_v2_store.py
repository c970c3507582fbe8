"""v2 chunk store (reference core/vector_store/chunk_v2_store.py:26-445):
single-table chunk storage with app/folder/metadata columns, cosine
scoring (score = 1 - dist/2 in the reference == normalized cosine sim),
and metadata-filtered queries evaluated in-store."""

from __future__ import annotations

import logging
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from morphik_core_tpu.database.metadata_filters import matches_filter
from morphik_core_tpu.models.schemas import DocumentChunk

logger = logging.getLogger(__name__)


class ChunkV2Store:
    def __init__(self):
        self._rows: List[Dict[str, Any]] = []
        self._vectors: Optional[np.ndarray] = None
        self._lock = threading.RLock()

    async def initialize(self) -> bool:
        return True

    async def store_chunks(
        self,
        chunks: List[DocumentChunk],
        embeddings: Sequence[np.ndarray],
        app_id: Optional[str] = None,
        folder_path: Optional[str] = None,
    ) -> List[str]:
        ids = []
        with self._lock:
            for c, e in zip(chunks, embeddings):
                v = np.asarray(e, dtype=np.float32).reshape(-1)
                n = float(np.linalg.norm(v))
                v = v / n if n else v
                self._rows.append(
                    {
                        "document_id": c.document_id,
                        "chunk_number": c.chunk_number,
                        "content": c.content,
                        "metadata": c.metadata,
                        "app_id": app_id,
                        "folder_path": folder_path,
                        "alive": True,
                    }
                )
                if self._vectors is None:
                    self._vectors = v[None]
                else:
                    self._vectors = np.vstack([self._vectors, v[None]])
                ids.append(f"{c.document_id}-{c.chunk_number}")
        return ids

    async def query(
        self,
        query_embedding: np.ndarray,
        k: int,
        app_id: Optional[str] = None,
        folder_path: Optional[str] = None,
        filters: Optional[Dict[str, Any]] = None,
        document_ids: Optional[Sequence[str]] = None,
    ) -> List[DocumentChunk]:
        with self._lock:
            if not self._rows:
                return []
            q = np.asarray(query_embedding, dtype=np.float32).reshape(-1)
            n = float(np.linalg.norm(q))
            q = q / n if n else q
            mask = np.array(
                [
                    r["alive"]
                    and (app_id is None or r["app_id"] == app_id)
                    and (folder_path is None or (r["folder_path"] or "").startswith(folder_path))
                    and (document_ids is None or r["document_id"] in set(document_ids))
                    and matches_filter(filters, r["metadata"])
                    for r in self._rows
                ],
                dtype=bool,
            )
            if not mask.any():
                return []
            scores = self._vectors @ q
            scores[~mask] = -np.inf
            k = min(k, int(mask.sum()))
            top = np.argpartition(-scores, k - 1)[:k]
            top = top[np.argsort(-scores[top])]
            out = []
            for i in top:
                r = self._rows[int(i)]
                out.append(
                    DocumentChunk(
                        document_id=r["document_id"],
                        chunk_number=r["chunk_number"],
                        content=r["content"],
                        embedding=[],
                        metadata=r["metadata"],
                        score=float(scores[int(i)]),
                    )
                )
            return out

    async def delete_document(self, document_id: str, app_id: Optional[str] = None) -> int:
        n = 0
        with self._lock:
            for r in self._rows:
                if r["document_id"] == document_id and (app_id is None or r["app_id"] == app_id) and r["alive"]:
                    r["alive"] = False
                    n += 1
        return n
