"""Ingestion pipeline (reference core/services/ingestion_service.py:60-1912
+ the worker job body, reference core/workers/ingestion_worker.py:336-1350).

Flow (SURVEY.md §3.1): document stub (status=processing) -> raw upload ->
queue -> [worker] download -> detect type -> parse text -> chunk ->
rasterize to page-image chunks (ColPali path) -> batched TPU embed ->
store (multivector + text stores) -> document completed.

Rasterization dispatch mirrors reference `_create_chunks_multivector`
(ingestion_service.py:1396-1897): standalone images resized + re-encoded
as JPEG data URIs; PDFs rendered per page at the configured DPI; Word /
PowerPoint converted page/slide-wise (LibreOffice in the reference; the
offline ladder here extracts text and renders synthetic pages); Excel
stays text; blank pages skipped.
"""

from __future__ import annotations

import asyncio
import collections
import contextlib
import io
import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from morphik_core_tpu.config import Settings, get_settings
from morphik_core_tpu.database.sqlite_database import SQLiteDatabase
from morphik_core_tpu.embedding.base_embedding_model import BaseEmbeddingModel
from morphik_core_tpu.models.schemas import AuthContext, Chunk, Document, DocumentChunk
from morphik_core_tpu.parser.morphik_parser import MorphikParser
from morphik_core_tpu.parser.office import pptx_to_slides
from morphik_core_tpu.parser.pdf import _render_text_page, rasterize_pdf
from morphik_core_tpu.storage.base_storage import BaseStorage
from morphik_core_tpu.storage.content_types import DOCX, PPTX, detect_content_type, is_colpali_native_format
from morphik_core_tpu.utils.fast_ops import bytes_to_data_uri, data_uri_to_bytes
from morphik_core_tpu.vector_store.base_vector_store import BaseVectorStore

logger = logging.getLogger(__name__)


def _image_to_data_uri(img: Image.Image, max_width: int, quality: int = 80) -> str:
    if img.width > max_width:
        ratio = max_width / img.width
        img = img.resize((max_width, max(1, int(img.height * ratio))), Image.Resampling.LANCZOS)
    if img.mode not in ("RGB", "L"):
        img = img.convert("RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return bytes_to_data_uri(buf.getvalue(), "image/jpeg")


from morphik_core_tpu.parser.raster_pool import is_blank_page as _is_blank_page  # noqa: E402


class IngestionService:
    def __init__(
        self,
        database: SQLiteDatabase,
        storage: BaseStorage,
        parser: MorphikParser,
        embedding_model: BaseEmbeddingModel,
        vector_store: BaseVectorStore,
        colpali_embedding_model: Optional[BaseEmbeddingModel] = None,
        colpali_vector_store: Optional[BaseVectorStore] = None,
        settings: Optional[Settings] = None,
    ):
        self.db = database
        self.storage = storage
        self.parser = parser
        self.embedding_model = embedding_model
        self.vector_store = vector_store
        self.colpali_embedding_model = colpali_embedding_model
        self.colpali_vector_store = colpali_vector_store
        self.settings = settings or get_settings()
        from morphik_core_tpu.parser.raster_pool import RasterPool

        self.raster_pool = RasterPool(self.settings.worker.raster_processes)
        # Serializes the device-bound embed+store phase across concurrent
        # ingest jobs (worker.max_jobs=2): job k+1's parse/raster host
        # phases overlap job k's embed instead of queueing behind it.
        # Lazily bound to the running loop (asyncio.Lock is loop-affine).
        self._embed_lock: Optional[asyncio.Lock] = None

    def _get_embed_lock(self) -> asyncio.Lock:
        if self._embed_lock is None:
            self._embed_lock = asyncio.Lock()
        return self._embed_lock

    # ----------------------------------------------------------- ingest text

    async def ingest_text(
        self,
        content: str,
        filename: Optional[str],
        metadata: Dict[str, Any],
        auth: AuthContext,
        *,
        folder_name: Optional[str] = None,
        end_user_id: Optional[str] = None,
        use_colpali: bool = True,
        metadata_types: Optional[Dict[str, str]] = None,
    ) -> Document:
        doc = Document(
            content_type="text/plain",
            filename=filename,
            metadata=metadata or {},
            metadata_types=metadata_types or {},
            folder_name=folder_name,
            end_user_id=end_user_id,
            app_id=auth.app_id,
        )
        await self._resolve_folder(doc, folder_name, auth)
        await self.db.store_document(doc, auth)
        try:
            chunks = await self.parser.split_text(content)
            await self._embed_and_store(doc, chunks, [], auth, use_colpali)
        except Exception as e:  # noqa: BLE001 — doc must never stay 'processing'
            await self.db.update_document(
                doc.external_id,
                {"system_metadata": {"status": "failed", "error": str(e)[:500]}},
                auth,
            )
            raise
        await self.db.update_document(
            doc.external_id,
            {"system_metadata": {"status": "completed", "content_length": len(content)},
             "chunk_ids": doc.chunk_ids},
            auth,
        )
        doc.system_metadata["status"] = "completed"
        return doc

    # ----------------------------------------------------------- ingest file

    async def ingest_file_content(
        self,
        file_bytes: bytes,
        filename: Optional[str],
        metadata: Dict[str, Any],
        auth: AuthContext,
        *,
        content_type: Optional[str] = None,
        folder_name: Optional[str] = None,
        end_user_id: Optional[str] = None,
        use_colpali: bool = True,
        metadata_types: Optional[Dict[str, str]] = None,
        external_id: Optional[str] = None,
    ) -> Document:
        """Create the document stub + upload raw bytes. Processing happens in
        `process_ingestion_job` (queued by the caller / API layer).
        `external_id` preserves a source document ID during migration
        (reference routes/migrate.py POST /migrate/document)."""
        ctype = detect_content_type(file_bytes, filename, content_type)
        doc = Document(
            content_type=ctype,
            filename=filename,
            metadata=metadata or {},
            metadata_types=metadata_types or {},
            folder_name=folder_name,
            end_user_id=end_user_id,
            app_id=auth.app_id,
        )
        if external_id:
            doc.external_id = external_id
        await self._resolve_folder(doc, folder_name, auth)
        key = f"ingest/{doc.external_id}/{filename or 'file'}"
        bucket, key = await self.storage.upload_file(file_bytes, key, ctype)
        doc.storage_info = {"bucket": bucket, "key": key}
        await self.db.store_document(doc, auth)
        await self.db.add_storage_bytes(auth, len(file_bytes))
        return doc

    async def process_ingestion_job(
        self,
        document_id: str,
        auth: AuthContext,
        use_colpali: bool = True,
    ) -> Document:
        """The worker job body (reference ingestion_worker.py:336-1350)."""
        phase_times: Dict[str, float] = {}
        t0 = time.perf_counter()
        doc = await self.db.get_document(document_id, auth)
        if doc is None:
            raise ValueError(f"document {document_id} not found")
        try:
            data = await self.storage.download_file(doc.storage_info["bucket"], doc.storage_info["key"])
            phase_times["download"] = time.perf_counter() - t0

            t = time.perf_counter()
            ctype = doc.content_type or detect_content_type(data, doc.filename)
            skip_text = use_colpali and self.colpali_vector_store is not None and is_colpali_native_format(ctype)
            additional_metadata: Dict[str, Any] = {}
            text = ""
            text_chunks: List[Chunk] = []
            # Parse fallback ladder (reference ingestion_worker.py:764-902):
            # text parse failure on a ColPali-native file does NOT fail the
            # job — the page images still make it searchable; a failure on a
            # text-only file does.
            try:
                if self.parser.is_xml_file(doc.filename, ctype):
                    text_chunks = self.parser.parse_and_chunk_xml(data.decode("utf-8", errors="replace"))
                else:
                    additional_metadata, text = await self.parser.parse_file_to_text(data, doc.filename, ctype)
                    if text.strip():
                        text_chunks = await self.parser.split_text(text)
                    elif not skip_text:
                        logger.warning("no text extracted from %s", doc.filename)
            except Exception as e:  # noqa: BLE001
                if use_colpali and self.colpali_vector_store is not None and is_colpali_native_format(ctype):
                    logger.warning(
                        "text parse of %s failed (%s); continuing image-only", doc.filename, e
                    )
                    additional_metadata = {"parse_error": str(e)}
                else:
                    raise
            phase_times["parse"] = time.perf_counter() - t

            image_chunks: List[Chunk] = []
            if use_colpali and self.colpali_vector_store is not None:
                t = time.perf_counter()
                image_chunks = None
                if ctype == "application/pdf":
                    image_chunks = await self._rasterize_pdf_pooled(data)
                if image_chunks is None:
                    image_chunks = self._create_chunks_multivector(ctype, data, text)
                phase_times["rasterize"] = time.perf_counter() - t

            # Deep-parse rung of the ladder (reference
            # ingestion_worker.py:822-902 + morphik_parser.py:552-582):
            # nothing searchable so far -> OCR the pages through the
            # configured engine; still nothing -> accept the document but
            # record it as unsearchable instead of failing the job.
            unsearchable = False
            if not text_chunks and not image_chunks:
                deep = getattr(self.parser, "parse_file_to_text_deep", None)
                if deep is not None:
                    t = time.perf_counter()
                    deep_meta, deep_text = await deep(data, doc.filename, ctype)
                    phase_times["deep_parse"] = time.perf_counter() - t
                    if deep_text.strip():
                        text = deep_text
                        additional_metadata.update(deep_meta)
                        text_chunks = await self.parser.split_text(deep_text)
                        logger.info(
                            "deep parse recovered %d text chunks for %s",
                            len(text_chunks), doc.filename,
                        )
                if not text_chunks:
                    unsearchable = True
                    logger.warning("document %s accepted but unsearchable", doc.filename)

            t = time.perf_counter()
            await self._embed_and_store(doc, text_chunks, image_chunks, auth, use_colpali)
            phase_times["embed_store"] = time.perf_counter() - t

            updates = {
                "system_metadata": {
                    "status": "completed",
                    "page_count": len(image_chunks) or None,
                    "phase_times": phase_times,
                    **({"unsearchable": True} if unsearchable else {}),
                },
                "additional_metadata": additional_metadata,
                "chunk_ids": doc.chunk_ids,
            }
            await self.db.update_document(document_id, updates, auth)
            doc.system_metadata.update(updates["system_metadata"])
            total_s = time.perf_counter() - t0
            logger.info(
                "ingested %s: %d text + %d image chunks in %.2fs %s",
                doc.filename, len(text_chunks), len(image_chunks),
                total_s, phase_times,
            )
            self._write_ingestion_summary(
                doc, status="completed", total_s=total_s, phase_times=phase_times,
                n_text=len(text_chunks), n_pages=len(image_chunks),
            )
            return doc
        except Exception as e:
            logger.exception("ingestion of %s failed", document_id)
            await self.db.update_document(
                document_id, {"system_metadata": {"status": "failed", "error": str(e)}}, auth
            )
            self._write_ingestion_summary(
                doc, status="failed", total_s=time.perf_counter() - t0,
                phase_times=phase_times, error=str(e),
            )
            raise

    def _write_ingestion_summary(
        self,
        doc: Document,
        *,
        status: str,
        total_s: float,
        phase_times: Dict[str, float],
        n_text: int = 0,
        n_pages: int = 0,
        error: Optional[str] = None,
    ) -> None:
        """Per-job JSONL summary with throughput (reference
        logs/ingestion_summary.jsonl, ingestion_worker.py:64-74,1284-1334
        + `_with_throughput` metric accumulation :228-276)."""
        import json as _json
        from datetime import datetime, timezone

        row = {
            "ts": datetime.now(timezone.utc).isoformat(),
            "document_id": doc.external_id,
            "filename": doc.filename,
            "app_id": doc.app_id,
            "status": status,
            "total_s": round(total_s, 3),
            "phase_times": {k: round(v, 3) for k, v in phase_times.items()},
            "text_chunks": n_text,
            "pages": n_pages,
            "pages_per_s": round(n_pages / total_s, 3) if total_s > 0 else None,
        }
        if error:
            row["error"] = error
        if self.colpali_vector_store is not None:
            metrics = getattr(self.colpali_vector_store, "last_store_metrics", None)
            if metrics:
                row["store_metrics"] = metrics
        try:
            path = Path("./logs/ingestion_summary.jsonl")
            path.parent.mkdir(parents=True, exist_ok=True)
            with open(path, "a") as f:
                f.write(_json.dumps(row, default=str) + "\n")
        except OSError:  # logging must never fail the job
            logger.debug("could not write ingestion summary")

    async def _rasterize_pdf_pooled(self, data: bytes) -> Optional[List[Chunk]]:
        """PDF pages -> image chunks via the raster pool (keeps the TPU
        fed; SURVEY.md §7 host-raster bottleneck). None = fall back to the
        in-process ladder.

        Runs in prep mode: each page's u8 patches are computed at raster
        time from the in-hand PIL image and travel to the embed stage in
        chunk metadata `_patches` — the JPEG payload is never decoded
        back, and blank detection happens in the raster worker (the old
        flow paid TWO JPEG decodes per page on the embed side)."""
        prep = (self.settings.model.min_pixels, self.settings.model.max_pixels)
        try:
            pages = await self.raster_pool.rasterize_pdf_jpegs(
                data, dpi=self.settings.pdf.colpali_pdf_dpi, prep=prep
            )
        except Exception as e:  # noqa: BLE001
            logger.warning("raster pool failed (%s); falling back inline", e)
            return None
        if pages is None:
            return None
        chunks = []
        for page, jpeg, patches, grid, blank in pages:  # TRUE page indices
            if blank:
                logger.info("skipping blank page %d", page)
                continue
            chunks.append(
                Chunk(
                    content=bytes_to_data_uri(jpeg, "image/jpeg"),
                    metadata={"is_image": True, "page": page,
                              "_patches": (patches, grid)},
                )
            )
        return chunks

    # ------------------------------------------------- rasterize dispatcher

    def _create_chunks_multivector(self, ctype: str, data: bytes, text: str) -> List[Chunk]:
        """File bytes -> page-image Chunks (data URIs, is_image metadata)."""
        max_w = 1024
        dpi = self.settings.pdf.colpali_pdf_dpi
        images: List[Image.Image] = []
        if ctype.startswith("image/"):
            try:
                images = [Image.open(io.BytesIO(data))]
            except Exception as e:  # noqa: BLE001
                logger.warning("image decode failed: %s", e)
                return []
        elif ctype == "application/pdf":
            images, backend = rasterize_pdf(data, dpi=dpi)
            logger.info("rasterized %d pdf pages via %s", len(images), backend)
        elif ctype == PPTX:
            try:
                slides = pptx_to_slides(data)
                images = [_render_text_page(s, dpi=100) for s in slides]
            except Exception as e:  # noqa: BLE001
                logger.warning("pptx raster failed: %s", e)
        elif ctype in (DOCX, "application/msword"):
            # offline ladder: no office->PDF converter; paginate extracted text
            pages = [text[i : i + 3200] for i in range(0, max(len(text), 1), 3200)]
            images = [_render_text_page(p, dpi=100) for p in pages]
        elif ctype.startswith("video/"):
            return []  # video chunks are text (frame descriptions) only
        else:
            return []

        chunks = []
        page = 0
        for img in images:
            if _is_blank_page(img):
                logger.info("skipping blank page %d", page)
                page += 1
                continue
            uri = _image_to_data_uri(img, max_width=max_w)
            chunks.append(Chunk(content=uri, metadata={"is_image": True, "page": page}))
            page += 1
        return chunks

    # --------------------------------------------------------- embed+store

    async def _embed_and_store(
        self,
        doc: Document,
        text_chunks: List[Chunk],
        image_chunks: List[Chunk],
        auth: AuthContext,
        use_colpali: bool,
    ) -> None:
        chunk_ids: List[str] = []
        # regular text store (single-vector path)
        if text_chunks:
            embeddings = await self.embedding_model.embed_for_ingestion(text_chunks)
            doc_chunks = [
                c.to_document_chunk(doc.external_id, i, e)
                for i, (c, e) in enumerate(zip(text_chunks, embeddings))
            ]
            ok, ids, _ = await self.vector_store.store_embeddings(doc_chunks, app_id=auth.app_id)
            chunk_ids.extend(ids)

        # colpali multivector store: image chunks, or text chunks when the
        # file has no visual form (reference embeds text chunks too)
        if use_colpali and self.colpali_vector_store is not None and self.colpali_embedding_model is not None:
            async with self._get_embed_lock():
                await self._embed_and_store_colpali(doc, text_chunks, image_chunks, auth, chunk_ids)
        doc.chunk_ids = chunk_ids

    async def _embed_and_store_colpali(
        self,
        doc: Document,
        text_chunks: List[Chunk],
        image_chunks: List[Chunk],
        auth: AuthContext,
        chunk_ids: List[str],
    ) -> None:
        """Device-bound half of ingest, serialized across jobs by
        `_embed_lock` — with worker.max_jobs=2, doc k+1's parse/raster
        run while doc k sits here."""
        colpali_chunks = image_chunks if image_chunks else text_chunks
        batch = self.settings.worker.colpali_store_batch_size
        embed_sync = getattr(
            self.colpali_embedding_model, "embed_for_ingestion_sync", None
        )
        starts = list(range(0, len(colpali_chunks), batch))

        async def _embed(s: int):
            sub = colpali_chunks[s : s + batch]
            if embed_sync is not None:
                # worker thread: embed batches run concurrently with
                # each other and with the host-side store (fused FDE
                # included) — jax dispatch is thread-safe, and the
                # relay upload of batch k+1 rides under compute/store
                # of batch k instead of waiting for it.
                return await asyncio.to_thread(embed_sync, sub)
            return await self.colpali_embedding_model.embed_for_ingestion(sub), []

        # Depth-N software pipeline (worker.ingest_embed_prefetch).
        # Depth 1 reproduces the old embed[k+1] ∥ store[k] overlap;
        # depth 2+ additionally overlaps uploads across batches —
        # measured round 4 on the 500-page job-path bench: the
        # serial path spends ~2.7 s per 16-page batch of which only
        # ~0.3 s is device compute; the rest is transfer + store that
        # pipelining hides.
        depth = max(1, int(getattr(self.settings.worker, "ingest_embed_prefetch", 2)))
        if embed_sync is None:
            depth = 1  # remote/API embedder: keep one request in flight
        inflight = collections.deque(
            asyncio.ensure_future(_embed(s)) for s in starts[:depth]
        )
        try:
            for bi, s in enumerate(starts):
                embs, fde = await inflight.popleft()
                if bi + depth < len(starts):
                    inflight.append(asyncio.ensure_future(_embed(starts[bi + depth])))
                sub = colpali_chunks[s : s + batch]
                for c in sub:  # transient raster artifacts never persist
                    c.metadata.pop("_patches", None)
                doc_chunks = [
                    c.to_document_chunk(doc.external_id, s + j, e)
                    for j, (c, e) in enumerate(zip(sub, embs))
                ]
                ok, ids, metrics = await self.colpali_vector_store.store_embeddings(
                    doc_chunks, app_id=auth.app_id,
                    fde_vectors=fde if len(fde) == len(doc_chunks) else None,
                )
                chunk_ids.extend(ids)
        except BaseException:
            for fut in inflight:
                if not fut.done():
                    fut.cancel()
            for fut in inflight:
                with contextlib.suppress(BaseException):
                    await fut
            raise
        doc.chunk_ids = chunk_ids

    # -------------------------------------------------------------- update

    async def update_document(
        self,
        document_id: str,
        auth: AuthContext,
        *,
        content: Optional[str] = None,
        file_bytes: Optional[bytes] = None,
        filename: Optional[str] = None,
        metadata: Optional[Dict[str, Any]] = None,
        use_colpali: bool = True,
    ) -> Optional[Document]:
        doc = await self.db.get_document(document_id, auth)
        if doc is None:
            return None
        if metadata is not None:
            merged = dict(doc.metadata)
            merged.update(metadata)
            await self.db.update_document(document_id, {"metadata": merged}, auth)
        if content is not None or file_bytes is not None:
            # re-ingest: old chunks removed first (reference worker :968-998)
            if self.colpali_vector_store is not None:
                await self.colpali_vector_store.delete_chunks_by_document_id(document_id, auth.app_id)
            await self.vector_store.delete_chunks_by_document_id(document_id, auth.app_id)
            if file_bytes is not None:
                from morphik_core_tpu.storage.content_types import detect_content_type

                new_name = filename or doc.filename
                # the replacement bytes may be a different format: re-detect
                # so re-ingestion parses with the NEW type, not the old
                ctype = detect_content_type(file_bytes, new_name)
                key = f"ingest/{doc.external_id}/{new_name or 'file'}"
                bucket, key = await self.storage.upload_file(file_bytes, key, ctype)
                await self.db.update_document(
                    document_id,
                    {"storage_info": {"bucket": bucket, "key": key},
                     "filename": new_name,
                     "content_type": ctype,
                     "system_metadata": {"status": "processing"}},
                    auth,
                )
                return await self.process_ingestion_job(document_id, auth, use_colpali)
            text_chunks = await self.parser.split_text(content)
            doc.chunk_ids = []
            await self._embed_and_store(doc, text_chunks, [], auth, use_colpali)
            await self.db.update_document(
                document_id,
                {"system_metadata": {"status": "completed"}, "chunk_ids": doc.chunk_ids},
                auth,
            )
        return await self.db.get_document(document_id, auth)

    # --------------------------------------------------------------- misc

    async def _resolve_folder(self, doc: Document, folder_name: Optional[str], auth: AuthContext) -> None:
        if not folder_name:
            return
        folder = await self.db.create_folder(folder_name.strip("/"), auth)
        doc.folder_name = folder["name"]
        doc.folder_path = folder["path"]
        doc.folder_id = folder["id"]
