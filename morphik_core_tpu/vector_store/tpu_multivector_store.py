"""TPU multivector store: the serving-side replacement for BOTH reference
multivector stores (SURVEY.md §2.4) — Turbopuffer+storage
(fast_multivector_store.py) and Postgres max_sim (multi_vector_store.py).

Layout:
  - one MultiVectorIndex per namespace (app_id), lazily created and
    persisted under {index_path}/{namespace}/;
  - chunk payloads: inline for text, offloaded to storage for images
    with key {app_id}/{doc_id}/{chunk_number}{ext} (same key scheme as
    reference multi_vector_store.py:400-456) and restored on read;
  - store metrics dict per call (reference utils.build_store_metrics).
"""

from __future__ import annotations

import logging
import re
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from morphik_core_tpu.index.multivector_index import IndexRecord, MultiVectorIndex
from morphik_core_tpu.models.schemas import DocumentChunk
from morphik_core_tpu.ops.fde import FDEConfig
from morphik_core_tpu.storage.base_storage import BaseStorage
from morphik_core_tpu.utils.fast_ops import bytes_to_data_uri, data_uri_to_bytes
from morphik_core_tpu.vector_store.base_vector_store import BaseVectorStore

logger = logging.getLogger(__name__)

MULTIVECTOR_CHUNKS_BUCKET = "multivector-chunks"
_DEFAULT_NS = "default"


def _detect_ext(content: str) -> str:
    m = re.match(r"data:image/(\w+);base64,", content)
    return f".{m.group(1)}" if m else ".png"


class TPUMultiVectorStore(BaseVectorStore):
    def __init__(
        self,
        storage: Optional[BaseStorage] = None,
        fde_config: Optional[FDEConfig] = None,
        index_path: Optional[str | Path] = None,
        mesh=None,
        prefilter_multiplier: int = 30,
        prefilter_cap: int = 300,
        use_pallas: Optional[bool] = None,
        provider: str = "fde",  # "fde" (two-stage, reference 'morphik') |
        #                         "binary" (exact Hamming scan, reference 'postgres')
        pooling_factor: int = 1,
        ann_dtype: str = "int8",
        device_block_rows: int = 65536,
        compact_dead_fraction: float = 0.25,
        compact_min_rows: int = 4096,
        device_cache_slots: int = 0,
        device_cache_token_bucket: int = 1024,
        rerank_dtype: str = "bf16",
        rerank_prefilter_pooling: int = 0,
        pooled_tier_factor: int = 0,
        pooled_tier_budget_mb: int = 6144,
        pooled_refine_iters: int = 3,
        query_token_dedup: float = 0.98,
    ):
        self.storage = storage
        self.fde_config = fde_config or FDEConfig()
        # training-free token pooling of stored multivectors (ops/pooling.py)
        self.pooling_factor = max(1, int(pooling_factor))
        self.index_path = Path(index_path) if index_path else None
        self.mesh = mesh
        self.prefilter_multiplier = prefilter_multiplier
        self.prefilter_cap = prefilter_cap
        self.use_pallas = use_pallas
        self.provider = provider
        self.ann_dtype = ann_dtype
        self.device_block_rows = device_block_rows
        self.compact_dead_fraction = compact_dead_fraction
        self.compact_min_rows = compact_min_rows
        self.device_cache_slots = device_cache_slots
        self.device_cache_token_bucket = device_cache_token_bucket
        self.rerank_dtype = rerank_dtype
        self.rerank_prefilter_pooling = rerank_prefilter_pooling
        self.pooled_tier_factor = pooled_tier_factor
        self.pooled_tier_budget_mb = pooled_tier_budget_mb
        self.pooled_refine_iters = pooled_refine_iters
        self.query_token_dedup = query_token_dedup
        self._indexes: Dict[str, Any] = {}
        self.last_store_metrics: Dict[str, Any] = {}

    async def initialize(self) -> bool:
        return True

    def _ns(self, app_id: Optional[str]):
        ns = app_id or _DEFAULT_NS
        if ns not in self._indexes:
            if self.provider == "binary":
                from morphik_core_tpu.index.binary_index import BinaryMultiVectorIndex

                self._indexes[ns] = BinaryMultiVectorIndex(dim=self.fde_config.dimension)
            else:
                path = (self.index_path / ns) if self.index_path else None
                self._indexes[ns] = MultiVectorIndex(
                    self.fde_config,
                    mesh=self.mesh,
                    prefilter_multiplier=self.prefilter_multiplier,
                    prefilter_cap=self.prefilter_cap,
                    path=path,
                    use_pallas=self.use_pallas,
                    ann_dtype=self.ann_dtype,
                    device_block_rows=self.device_block_rows,
                    compact_dead_fraction=self.compact_dead_fraction,
                    compact_min_rows=self.compact_min_rows,
                    device_cache_slots=self.device_cache_slots,
                    device_cache_token_bucket=self.device_cache_token_bucket,
                    rerank_dtype=self.rerank_dtype,
                    rerank_prefilter_pooling=self.rerank_prefilter_pooling,
                    pooled_tier_factor=self.pooled_tier_factor,
                    pooled_tier_budget_mb=self.pooled_tier_budget_mb,
                    pooled_refine_iters=self.pooled_refine_iters,
                    query_token_dedup=self.query_token_dedup,
                )
        return self._indexes[ns]

    # ------------------------------------------------------------------

    async def _offload_payload(self, chunk: DocumentChunk, app_id: Optional[str]) -> Tuple[Optional[str], int]:
        """Images go to object storage; text stays inline. Returns (key, bytes)."""
        if self.storage is None or not chunk.metadata.get("is_image"):
            return None, 0
        ext = _detect_ext(chunk.content)
        key = f"{app_id or _DEFAULT_NS}/{chunk.document_id}/{chunk.chunk_number}{ext}"
        data = data_uri_to_bytes(chunk.content)
        await self.storage.upload_file(data, key, bucket=MULTIVECTOR_CHUNKS_BUCKET)
        return key, len(data)

    async def _restore_payload(self, rec: IndexRecord, skip_image_content: bool) -> str:
        if rec.content_key is None:
            return rec.metadata.get("_content", "")
        if skip_image_content:
            return rec.content_key
        assert self.storage is not None
        data = await self.storage.download_file(MULTIVECTOR_CHUNKS_BUCKET, rec.content_key)
        ext = rec.content_key.rsplit(".", 1)[-1]
        return bytes_to_data_uri(data, f"image/{ext}")

    async def store_embeddings(
        self,
        chunks: List[DocumentChunk],
        app_id: Optional[str] = None,
        fde_vectors: Optional[List[Optional[np.ndarray]]] = None,
    ) -> Tuple[bool, List[str], Dict[str, Any]]:
        """`fde_vectors` (chunk-aligned, None entries allowed) carries
        document FDE rows the embedding step already computed ON DEVICE
        (fused ingest FDE, colpali_embedding_model.embed_images) — when
        complete and no stored-token pooling rewrites the multivector,
        the index skips its own encode_documents upload+dispatch."""
        if not chunks:
            return True, [], {}
        index = self._ns(app_id)
        metrics: Dict[str, Any] = {
            "vector_store_backend": "tpu_multivector",
            "vector_store_rows": len(chunks),
        }
        t0 = time.perf_counter()
        payload_bytes = 0
        records: List[IndexRecord] = []
        mvs: List[np.ndarray] = []
        for chunk in chunks:
            key, nbytes = await self._offload_payload(chunk, app_id)
            payload_bytes += nbytes
            md = dict(chunk.metadata)
            if key is None:
                md["_content"] = chunk.content
            records.append(
                IndexRecord(
                    document_id=chunk.document_id,
                    chunk_number=chunk.chunk_number,
                    metadata=md,
                    content_key=key,
                )
            )
            mv = np.asarray(chunk.embedding, dtype=np.float32)
            if self.pooling_factor > 1 and chunk.metadata.get("is_image"):
                from morphik_core_tpu.ops.pooling import pool_multivector

                mv = pool_multivector(mv, self.pooling_factor)
            mvs.append(mv)
        metrics["chunk_payload_bytes"] = payload_bytes
        metrics["chunk_payload_upload_s"] = time.perf_counter() - t0

        t1 = time.perf_counter()
        fde = None
        if (
            fde_vectors is not None
            and len(fde_vectors) == len(chunks)
            and all(v is not None for v in fde_vectors)
            and self.pooling_factor <= 1  # pooled stores change the mv
        ):
            fde = np.stack([np.asarray(v, np.float32) for v in fde_vectors])
            metrics["fde_precomputed"] = True
        ids = index.store(mvs, records, fde_vectors=fde)
        metrics["vector_store_write_s"] = time.perf_counter() - t1
        self.last_store_metrics = metrics
        return True, ids, metrics

    async def query_similar(
        self,
        query_embedding: Union[np.ndarray, List[float]],
        k: int,
        doc_ids: Optional[Sequence[str]] = None,
        app_id: Optional[str] = None,
        skip_image_content: bool = False,
    ) -> List[DocumentChunk]:
        index = self._ns(app_id)
        q = np.asarray(query_embedding, dtype=np.float32)
        results = index.query(q, k, doc_ids=doc_ids, return_timing=True)
        out = []
        for rec, score in results:
            content = await self._restore_payload(rec, skip_image_content)
            md = {mk: mv for mk, mv in rec.metadata.items() if mk != "_content"}
            out.append(
                DocumentChunk(
                    document_id=rec.document_id,
                    chunk_number=rec.chunk_number,
                    content=content,
                    embedding=[],
                    metadata=md,
                    score=score,
                )
            )
        return out

    async def get_chunks_by_id(
        self,
        chunk_identifiers: Sequence[Tuple[str, int]],
        app_id: Optional[str] = None,
        skip_image_content: bool = False,
    ) -> List[DocumentChunk]:
        index = self._ns(app_id)
        out = []
        for rec in index.get_chunks_by_id(chunk_identifiers):
            if rec is None:
                continue
            content = await self._restore_payload(rec, skip_image_content)
            md = {mk: mv for mk, mv in rec.metadata.items() if mk != "_content"}
            out.append(
                DocumentChunk(
                    document_id=rec.document_id,
                    chunk_number=rec.chunk_number,
                    content=content,
                    embedding=[],
                    metadata=md,
                    score=0.0,
                )
            )
        return out

    async def delete_chunks_by_document_id(self, document_id: str, app_id: Optional[str] = None) -> bool:
        index = self._ns(app_id)
        n = index.delete_document(document_id)
        logger.info("deleted %d chunks of %s", n, document_id)
        return True

    def save(self) -> None:
        for ns, ix in self._indexes.items():
            if ix.path:
                ix.save()
