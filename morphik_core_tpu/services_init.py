"""Service container: builds the full singleton stack from Settings
(reference core/services_init.py:43-243 builds the same graph at import
time; here it's an explicit, testable factory)."""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

from morphik_core_tpu.completion.models import BaseCompletionModel, build_completion_model
from morphik_core_tpu.config import Settings, get_settings
from morphik_core_tpu.database.sqlite_database import SQLiteDatabase
from morphik_core_tpu.embedding.colpali_embedding_model import ColpaliEmbeddingModel
from morphik_core_tpu.embedding.text_embedding import HashingEmbeddingModel, OpenAICompatEmbeddingModel
from morphik_core_tpu.ops.fde import FDEConfig
from morphik_core_tpu.parser.morphik_parser import MorphikParser
from morphik_core_tpu.reranker.rerankers import build_reranker
from morphik_core_tpu.services.document_service import DocumentService
from morphik_core_tpu.services.ingestion_service import IngestionService
from morphik_core_tpu.services.telemetry import TelemetryService
from morphik_core_tpu.services.user_service import UserService
from morphik_core_tpu.services.v2_document_service import V2DocumentService
from morphik_core_tpu.vector_store.chunk_v2_store import ChunkV2Store
from morphik_core_tpu.storage.local_storage import LocalStorage
from morphik_core_tpu.vector_store.text_vector_store import TextVectorStore
from morphik_core_tpu.vector_store.tpu_multivector_store import TPUMultiVectorStore
from morphik_core_tpu.workers.job_queue import JobQueue

logger = logging.getLogger(__name__)


def build_storage(settings: Settings):
    """Storage provider selection (reference core/services_init.py:65-80):
    local filesystem or S3, optionally fronted by the disk LRU cache."""
    import os

    from morphik_core_tpu.storage.base_storage import BaseStorage

    base: BaseStorage
    if settings.storage.provider == "aws-s3":
        from morphik_core_tpu.storage.s3_storage import S3Storage

        base = S3Storage(
            default_bucket=settings.storage.bucket_name,
            region_name=settings.storage.region,
            endpoint_url=settings.storage.endpoint_url,
            aws_access_key_id=os.environ.get("AWS_ACCESS_KEY_ID"),
            aws_secret_access_key=os.environ.get("AWS_SECRET_ACCESS_KEY"),
            upload_concurrency=settings.storage.upload_concurrency,
        )
        if settings.storage.cache_enabled:
            from morphik_core_tpu.storage.cache_manager import CachedStorage, FileCacheManager

            cache = FileCacheManager(settings.storage.cache_path, settings.storage.cache_max_bytes)
            return CachedStorage(base, cache)
        return base
    return LocalStorage(settings.storage.storage_path)


@dataclass
class Services:
    settings: Settings
    database: SQLiteDatabase
    storage: object  # BaseStorage (local / s3 / cached wrapper)
    parser: MorphikParser
    embedding_model: object
    vector_store: TextVectorStore
    colpali_embedding_model: Optional[ColpaliEmbeddingModel]
    colpali_vector_store: Optional[TPUMultiVectorStore]
    completion_model: BaseCompletionModel
    document_service: DocumentService
    ingestion_service: IngestionService
    telemetry: TelemetryService
    job_queue: JobQueue
    user_service: UserService = None
    v2_document_service: V2DocumentService = None
    on_the_fly: object = None  # OnTheFlyService

    log_uploader: object = None
    heartbeat: object = None

    async def initialize(self) -> None:
        await self.database.initialize()
        await self.vector_store.initialize()
        if self.colpali_vector_store is not None:
            await self.colpali_vector_store.initialize()
        self.job_queue.register("process_ingestion_job", self._process_ingestion_job)
        await self.job_queue.start()
        if (
            self.settings.tpu.warmup_on_start
            and self.colpali_embedding_model is not None
            and hasattr(self.colpali_embedding_model, "warmup")
        ):
            import asyncio

            await asyncio.to_thread(self.colpali_embedding_model.warmup)
        # Background telemetry threads (reference app_factory.py:126-157);
        # network sends are disabled unless endpoints are configured.
        from morphik_core_tpu.services.log_uploader import Heartbeat, LogUploader

        tcfg = self.settings.telemetry
        self.log_uploader = LogUploader(
            tcfg.telemetry_dir, tcfg.upload_url,
            interval_s=tcfg.upload_interval_s, budget_bytes=tcfg.local_budget_bytes,
        )
        self.log_uploader.start()
        if tcfg.heartbeat_url:
            self.heartbeat = Heartbeat(
                tcfg.heartbeat_url, self.settings.storage.storage_path,
                self.settings.service.version,
            )
            self.heartbeat.start()

    async def shutdown(self) -> None:
        await self.job_queue.stop()
        if self.log_uploader is not None:
            self.log_uploader.stop()
        if self.heartbeat is not None:
            self.heartbeat.stop()
        if self.colpali_vector_store is not None:
            self.colpali_vector_store.save()
        self.vector_store.save()
        self.telemetry.flush()

    async def _process_ingestion_job(self, document_id: str, auth: dict, use_colpali: bool = True):
        from morphik_core_tpu.models.schemas import AuthContext

        ctx = AuthContext(**auth) if isinstance(auth, dict) else auth
        await self.ingestion_service.process_ingestion_job(document_id, ctx, use_colpali)
        self.persist_indexes()

    def persist_indexes(self) -> None:
        """Durable snapshot of vector indexes (called after each ingest job
        so rows survive an unclean shutdown)."""
        try:
            if self.colpali_vector_store is not None:
                self.colpali_vector_store.save()
            self.vector_store.save()
        except Exception:  # noqa: BLE001
            logger.exception("index persistence failed")


def build_services(
    settings: Optional[Settings] = None,
    *,
    mesh=None,
    colqwen_model=None,
) -> Services:
    settings = settings or get_settings()
    if mesh is None and settings.tpu.auto_mesh:
        import jax

        if len(jax.devices()) > 1:
            from morphik_core_tpu.parallel.mesh import best_mesh, make_mesh

            shape = list(settings.tpu.mesh_shape)
            axes = tuple(settings.tpu.mesh_axis_names)
            if jax.process_count() > 1:  # pod slice: hybrid ICI/DCN order
                mesh = best_mesh(axes, model_parallel=shape[1] if len(shape) > 1 else 1)
            else:
                mesh = make_mesh(shape, axes)
            logger.info("auto mesh: %s", dict(zip(axes, mesh.devices.shape)))
    storage_root = Path(settings.storage.storage_path)
    database = SQLiteDatabase(settings.database.path)
    storage = build_storage(settings)
    completion_model = build_completion_model(
        settings.registered_models, settings.completion.model,
        environment=settings.service.environment,
    )

    # Video frame description (reference VisionModelClient,
    # parse_video.py:27-280) + contextual chunking both reuse the
    # configured completion model.
    async def describe_frame(image_uri: str, prev_description: str = "") -> str:
        from morphik_core_tpu.models.schemas import CompletionRequest

        resp = await completion_model.complete(
            CompletionRequest(
                query="Describe this video frame. Note what changed from the previous frame."
                + (f"\nPrevious frame: {prev_description}" if prev_description else ""),
                context_chunks=[image_uri],
                max_tokens=300,
            )
        )
        return str(resp.completion)

    async def complete_text(prompt: str) -> str:
        from morphik_core_tpu.models.schemas import CompletionRequest

        resp = await completion_model.complete(CompletionRequest(query=prompt))
        return str(resp.completion)

    parser = MorphikParser(settings, describe_fn=describe_frame, complete_fn=complete_text)
    # Text-path embeddings: a registered_models key routes to its
    # provider (reference LiteLLMEmbeddingModel semantics); otherwise the
    # offline hashing embedder keeps dev/test air-gapped.
    if settings.embedding.model in settings.registered_models:
        from morphik_core_tpu.embedding.text_embedding import RoutedEmbeddingModel

        embedding_model = RoutedEmbeddingModel(settings.embedding.model, settings)
    else:
        embedding_model = HashingEmbeddingModel(dim=settings.embedding.dimensions)

    colpali_embedding_model = None
    colpali_vector_store = None
    if settings.morphik.enable_colpali and settings.morphik.colpali_mode != "off":
        if settings.morphik.colpali_mode == "api":
            from morphik_core_tpu.embedding.colpali_api_embedding_model import (
                ColpaliApiEmbeddingModel,
            )

            colpali_embedding_model = ColpaliApiEmbeddingModel(
                settings.morphik.morphik_embedding_api_endpoints,
                embedding_dim=settings.model.embedding_dim,
            )
        else:
            colpali_embedding_model = ColpaliEmbeddingModel(
                settings, model=colqwen_model, mesh=mesh
            )
        fde_cfg = FDEConfig(
            dimension=colpali_embedding_model.embedding_dim,
            num_repetitions=settings.vector_store.fde_num_repetitions,
            num_simhash_projections=settings.vector_store.fde_num_simhash_projections,
            projection_dimension=settings.vector_store.fde_projection_dimension,
            seed=settings.vector_store.fde_seed,
        )
        # fused ingest FDE: the in-process tower computes document FDE on
        # device right after the forward (skips re-uploading multivectors
        # for encode). Only valid when stored multivectors aren't pooled
        # (pooling rewrites the rows the FDE must describe).
        if (
            settings.morphik.colpali_mode == "local"
            and settings.vector_store.multivector_pooling <= 1
        ):
            colpali_embedding_model.fde_config = fde_cfg
        colpali_vector_store = TPUMultiVectorStore(
            storage=storage,
            fde_config=fde_cfg,
            index_path=settings.vector_store.index_path,
            mesh=mesh,
            prefilter_multiplier=settings.vector_store.prefilter_multiplier,
            prefilter_cap=settings.vector_store.prefilter_cap,
            pooling_factor=settings.vector_store.multivector_pooling,
            # None = auto (Pallas on TPU backends only); False = force XLA path
            use_pallas=None if settings.tpu.use_pallas else False,
            ann_dtype=settings.vector_store.ann_dtype,
            device_block_rows=settings.vector_store.device_block_rows,
            compact_dead_fraction=settings.vector_store.compact_dead_fraction,
            compact_min_rows=settings.vector_store.compact_min_rows,
            device_cache_slots=settings.vector_store.device_cache_slots,
            device_cache_token_bucket=settings.vector_store.device_cache_token_bucket,
            rerank_dtype=settings.vector_store.rerank_dtype,
            rerank_prefilter_pooling=settings.vector_store.rerank_prefilter_pooling,
            pooled_tier_factor=settings.vector_store.pooled_tier_factor,
            pooled_tier_budget_mb=settings.vector_store.pooled_tier_budget_mb,
            pooled_refine_iters=settings.vector_store.pooled_refine_iters,
            query_token_dedup=settings.vector_store.query_token_dedup,
        )

    vector_store = TextVectorStore(path=storage_root / "text_index")
    # Reranker for the text path: the ColQwen late-interaction scorer when
    # the tower is in-process (TPU-native, no extra weights), else lexical.
    if colpali_embedding_model is not None and settings.morphik.colpali_mode == "local":
        from morphik_core_tpu.reranker.rerankers import ColQwenReranker

        reranker = ColQwenReranker(colpali_embedding_model)
    else:
        reranker = build_reranker(None)
    telemetry = TelemetryService(settings.telemetry.telemetry_dir, settings.telemetry.enabled)

    ingestion_service = IngestionService(
        database=database,
        storage=storage,
        parser=parser,
        embedding_model=embedding_model,
        vector_store=vector_store,
        colpali_embedding_model=colpali_embedding_model,
        colpali_vector_store=colpali_vector_store,
        settings=settings,
    )
    document_service = DocumentService(
        database=database,
        vector_store=vector_store,
        embedding_model=embedding_model,
        storage=storage,
        completion_model=completion_model,
        reranker=reranker,
        colpali_embedding_model=colpali_embedding_model,
        colpali_vector_store=colpali_vector_store,
        settings=settings,
    )
    job_queue = JobQueue(
        path=storage_root / "jobs.db",
        max_jobs=settings.worker.max_jobs,
        job_timeout_s=settings.worker.job_timeout_s,
    )
    user_service = UserService(
        path=storage_root / "user_limits.db",
        enforce=(settings.morphik.mode == "cloud"),
    )
    from morphik_core_tpu.services.on_the_fly import OnTheFlyService

    on_the_fly = OnTheFlyService(parser, completion_model)
    v2_document_service = V2DocumentService(
        database=database,
        storage=storage,
        parser=parser,
        embedding_model=embedding_model,
        chunk_store=ChunkV2Store(),
    )
    return Services(
        settings=settings,
        database=database,
        storage=storage,
        parser=parser,
        embedding_model=embedding_model,
        vector_store=vector_store,
        colpali_embedding_model=colpali_embedding_model,
        colpali_vector_store=colpali_vector_store,
        completion_model=completion_model,
        document_service=document_service,
        ingestion_service=ingestion_service,
        telemetry=telemetry,
        job_queue=job_queue,
        user_service=user_service,
        v2_document_service=v2_document_service,
        on_the_fly=on_the_fly,
    )
