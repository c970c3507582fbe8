"""Configuration system: `morphik_tpu.toml` -> cached pydantic Settings.

Mirrors the reference's single-TOML config surface (reference
core/config.py:175-458, morphik.toml) with TPU-native knobs added
([tpu] mesh/dtype/bucketing) and GPU/external-service knobs removed.
"""

from __future__ import annotations

import os
import threading
import tomllib
from pathlib import Path
from typing import Any, Dict, List, Literal, Optional

from pydantic import BaseModel, Field

DEFAULT_CONFIG_FILENAME = "morphik_tpu.toml"


class ApiConfig(BaseModel):
    host: str = "0.0.0.0"
    port: int = 8000


class AuthConfig(BaseModel):
    jwt_algorithm: str = "HS256"
    jwt_secret_key: str = "dev-secret-key"
    bypass_auth_mode: bool = True
    dev_user_id: str = "dev_user"
    dev_entity_type: str = "developer"
    dev_permissions: List[str] = Field(default_factory=lambda: ["read", "write", "admin"])
    # Password gating /local/generate_uri (reference LOCAL_URI_PASSWORD,
    # core/api.py:963-977). Required when bypass_auth_mode is off.
    local_uri_password: Optional[str] = None


class ServiceConfig(BaseModel):
    environment: Literal["development", "staging", "production"] = "development"
    version: str = "0.1.0"
    enable_profiling: bool = False


class TPUConfig(BaseModel):
    """TPU-native execution knobs (no analogue in the reference)."""

    # Mesh axes: data-parallel over pages/batches, model-parallel over
    # the tower's hidden dims. (-1 = infer from device count.)
    mesh_shape: List[int] = Field(default_factory=lambda: [-1, 1])
    mesh_axis_names: List[str] = Field(default_factory=lambda: ["data", "model"])
    # Build the serving mesh from mesh_shape at boot (dp-sharded embeds,
    # tp-sharded decoder, mesh-sharded ANN). Off by default: single-chip
    # serving skips the sharding machinery entirely. Multi-host pod
    # slices get the hybrid ICI/DCN device order (parallel/mesh.py
    # best_mesh).
    auto_mesh: bool = False
    compute_dtype: Literal["bfloat16", "float32"] = "bfloat16"
    # Static-shape buckets for variable-resolution pages (Qwen2-VL
    # NaViT-style patching is ragged; XLA wants static shapes).
    token_buckets: List[int] = Field(default_factory=lambda: [256, 512, 1024, 2048])
    embed_batch_size: int = 8
    # Pallas MaxSim kernel tiling.
    maxsim_candidate_tile: int = 128
    maxsim_doc_token_tile: int = 256
    use_pallas: bool = True  # fall back to pure-XLA scoring when False / non-TPU
    # Precompile the query buckets (and the most common page grid) at
    # startup so the first live request doesn't pay a multi-second
    # compile. Off by default (slows dev/test boot); the persistent
    # compilation cache makes repeated warmups cheap.
    warmup_on_start: bool = False


class ModelConfig(BaseModel):
    """ColPali-family checkpoint to serve."""

    name: str = "colqwen2.5-3b"
    checkpoint_path: Optional[str] = None  # local HF-format dir (safetensors)
    embedding_dim: int = 128
    max_query_tokens: int = 64
    # "bf16" = parity-tested default. "int8" = W8A8 dynamic-quantized
    # serving (per-channel weight + per-token activation scales; the MXU
    # runs int8 at 2x its bf16 rate on v5e). Opt-in: validate retrieval
    # quality on your checkpoint with evaluations/ before enabling.
    # W8A8 int8 serving is DEFAULT-ON: the fidelity gate passed on real
    # 3B geometry + 100k-row index (EVAL_r03.json: top-1 match 1.0,
    # exact-rerank score Pearson 0.993, int8-index pool-recall delta
    # -0.006 vs f32; evaluations/fidelity_eval.py defines the gate).
    # Set "bf16" to serve at parity precision instead.
    matmul_precision: Literal["bf16", "int8"] = "int8"
    # QK^T attention contraction precision. int8 quantizes q/k per
    # token/head and accumulates int32 on the MXU (the score matmul is
    # the biggest bf16 block left in the int8 step — PROFILE_r04
    # attention share 57 ms of 306 ms). Opt-in pending an on-chip A/B +
    # fidelity gate; PV stays bf16 either way.
    attention_precision: Literal["bf16", "int8"] = "bf16"
    # Calibrated STATIC activation scales for the int8 vision tower
    # (models/colqwen/calibrate.py): replaces the dynamic per-token
    # max-abs pass at every quantized vision site with a per-(layer,
    # site) scale calibrated at startup on deterministic rendered pages
    # (~one extra vision compile + 2 batches). int8 mode only; the
    # fidelity gate (evaluations/fidelity_eval.py) exercises the same
    # startup path, so gate results cover exactly what serving runs.
    static_act_scales: bool = False
    # Qwen2-VL style image token budget per page.
    min_pixels: int = 4 * 28 * 28
    max_pixels: int = 768 * 28 * 28


class EmbeddingConfig(BaseModel):
    model: str = "colqwen2.5-3b"
    dimensions: int = 128
    similarity_metric: Literal["cosine", "dotProduct"] = "cosine"


class CompletionConfig(BaseModel):
    model: str = "stub"
    default_max_tokens: int = 1000
    default_temperature: float = 0.3


class ParserConfig(BaseModel):
    chunk_size: int = 6000
    chunk_overlap: int = 300
    use_contextual_chunking: bool = False
    xml_max_tokens: int = 350
    frame_sample_rate: int = 120  # video: sample 1 frame / N frames
    # "api" = POST documents to remote parse endpoints (reference
    # PARSER_MODE="api", morphik_parser.py:502-525) with failover.
    parser_mode: Literal["local", "api"] = "local"
    parse_api_endpoints: List[str] = Field(default_factory=list)
    parse_api_key: Optional[str] = None  # env MORPHIK_PARSE_API_KEY
    # Deep-parse OCR hook (reference EasyOCR deep fallback,
    # morphik_parser.py:552-582): none | api | auto | tesseract.
    ocr_mode: str = "none"
    ocr_api_endpoint: Optional[str] = None
    ocr_api_key: Optional[str] = None  # env MORPHIK_OCR_API_KEY
    # Ask the OCR api for table structure (?tables=true); returned
    # markdown tables merge into searchable chunks (reference deep parse
    # runs accurate TableFormer table structure, morphik_parser.py:552-582).
    ocr_tables: bool = True
    # Video transcription provider (reference: AssemblyAI,
    # parse_video.py:162-253). Any OpenAI-compatible
    # /audio/transcriptions endpoint (whisper servers, hosted APIs);
    # unset -> transcript series stays empty.
    transcription_api_base: Optional[str] = None
    transcription_api_key: Optional[str] = None  # env MORPHIK_TRANSCRIPTION_API_KEY
    transcription_model: str = "whisper-1"


class PdfConfig(BaseModel):
    colpali_pdf_dpi: int = 150
    high_density_threshold_bytes: int = 1_000_000
    high_density_batch_pages: int = 2


class StorageConfig(BaseModel):
    provider: Literal["local", "aws-s3"] = "local"
    storage_path: str = "./storage"
    cache_enabled: bool = True
    cache_path: str = "./storage/cache"
    cache_max_bytes: int = 10 * 1024**3
    # aws-s3 provider knobs (reference core/storage/s3_storage.py).
    bucket_name: str = "morphik-storage"
    region: Optional[str] = None
    endpoint_url: Optional[str] = None
    upload_concurrency: int = 8


class DatabaseConfig(BaseModel):
    provider: Literal["sqlite"] = "sqlite"
    path: str = "./storage/morphik.db"
    max_retries: int = 3
    retry_delay: float = 1.0


class VectorStoreConfig(BaseModel):
    provider: Literal["tpu", "memory"] = "tpu"
    # FDE (MUVERA) prefilter configuration — mirrors the reference's
    # FixedDimensionalEncodingConfig (fast_multivector_store.py:325-331).
    fde_dimension: int = 128
    fde_num_repetitions: int = 20
    fde_num_simhash_projections: int = 5
    fde_projection_dimension: int = 16
    fde_seed: int = 42
    # ANN candidate pool before exact rerank: min(prefilter_multiplier*k,
    # prefilter_cap). Default pool 300 at k=10 — chosen from the measured
    # curve, not the reference's 75 (fast_multivector_store.py:529-532):
    # EVAL part B pool_scaling shows exact-top10 capture 0.74@75 ->
    # 0.82@150 -> 0.89@300 at 100k rows, while the fused device pooled
    # tier makes the wider scan zero-transfer (BENCH e2e_pool_p50_ms:
    # ~flat 75->300 through the relay).
    prefilter_multiplier: int = 30
    prefilter_cap: int = 300
    # Training-free token pooling of stored page multivectors (PAPERS.md;
    # 1 = off). Factor 2-4 cuts index memory + rerank FLOPs by the same
    # factor at a small recall cost; queries are never pooled.
    multivector_pooling: int = 1
    index_path: str = "./storage/index"
    # Device-resident ANN buffer dtype. int8 (per-row scale) is the
    # default: the FDE scan is HBM-bandwidth-bound, so int8 is ~4x the
    # scan rate of f32 AND what fits a 1M-page x 10,240-d index in one
    # v5e chip's HBM; exact MaxSim rerank follows, so prefilter
    # quantization noise only perturbs pool composition.
    ann_dtype: Literal["int8", "bfloat16", "float32"] = "int8"
    # Rows per immutable device block (single-chip path): ingest
    # re-uploads only the tail block.
    device_block_rows: int = 65536
    # Tombstone compaction trigger: dead_rows/rows threshold.
    compact_dead_fraction: float = 0.25
    compact_min_rows: int = 4096
    # HBM LRU of rerank-candidate multivectors (the TPU analogue of the
    # reference's disk FileCacheManager): hot candidates are gathered on
    # device and skip the host read + transfer; 0 disables.
    # One int8 slot costs
    # token_bucket x dim bytes (+ f32 scales) ~ 135 KB at 1024x128, so
    # 2048 slots ~ 277 MB — sized to keep a ~68-query working set
    # (each query pins max(2k, 16, prefilter_cap/10) = 30 rescore rows
    # at the pool-300 default) fully resident. A cyclic LRU gives ZERO
    # hits the moment a working set exceeds capacity (measured round 4,
    # warm_curve_by_working_set), so set this from expected
    # distinct-query concurrency, not from hit-rate averages.
    device_cache_slots: int = 2048
    device_cache_token_bucket: int = 1024
    # Rerank precision: "int8" (default: per-token scales — half the
    # pool transfer + 2x the cache capacity + int8 MXU rate; still 8x
    # the precision of the reference's 1-bit postgres rerank, and the
    # EVAL_r03 fidelity gate measured exact-rerank score Pearson 0.993
    # through this path) | "bf16" (matches the reference's f32-npy
    # exact rerank within 16-bit store noise).
    rerank_dtype: Literal["bf16", "int8"] = "int8"
    # Cold-pool transfer diet: pools that miss the HBM cache first go
    # through an int8 token-POOLED prefilter (upload bytes / factor);
    # only the top max(2k, 16) rows then get the exact full-token
    # rerank. 0/1 = off. Factor 4 cuts the cold 75-candidate pool
    # upload ~4x with the winner still decided by exact MaxSim.
    rerank_prefilter_pooling: int = 4
    # DEVICE-RESIDENT pooled-candidate tier: keep every row's
    # token-pooled int8 multivector in HBM (blocks sharing the FDE
    # geometry) and fuse the pooled prefilter into the ANN scan — a
    # cold query uploads NOTHING for the prefilter; only the top
    # max(2k, 16) exact-rescore rows pay transfer. pooled_tier_factor
    # is the pooling (0 = off); the tier auto-falls-back to the upload
    # pooled pass above when its HBM estimate exceeds the budget. At
    # factor 32 a 1M-page corpus of ~1k-token pages costs ~4.2 GB next
    # to the 10.2 GB int8 FDE matrix on one v5e chip.
    pooled_tier_factor: int = 32
    pooled_tier_budget_mb: int = 6144
    # k-means passes refining pooled vectors (both pooled paths) from
    # their consecutive-mean init. Pure spatial pooling averages away a
    # trained checkpoint's salient tokens — measured round 4: gold-page
    # survival through the pooled stage at factor 32 is 17% (0 iters)
    # vs ~50% refined, with the FDE-head union guard bounding the worst
    # case either way. ~0.3 ms/row host-side, paid ONCE at ingest and
    # persisted in the index's pooled.bin side-store; 0 = off.
    pooled_refine_iters: int = 3
    # Cosine threshold for deduping near-identical query tokens in the
    # CANDIDATE-SELECTION stages (FDE ANN + pooled rescore; the exact
    # rerank always uses the full query — returned scores unchanged).
    # Page-like image queries carry ~800 near-identical blank tokens
    # that drown the FDE query sum (measured round 4: keyword-page FDE
    # recall at chance without dedup, 2x with). Applied only to queries
    # with > 64 tokens; 0 = off.
    query_token_dedup: float = 0.98


class WorkerConfig(BaseModel):
    # 2 (vs the reference's arq max_jobs=1 default,
    # ingestion_worker.py:1835): the embed/store phase is serialized on
    # the device by IngestionService._embed_lock, so a second in-flight
    # job contributes exactly its HOST phases — doc k+1 parses and
    # rasterizes (process pool / executor threads) while doc k occupies
    # the TPU. That cross-doc overlap is the round-5 ingest pipeline;
    # max_jobs=1 reproduces the strictly sequential reference behavior.
    max_jobs: int = 2
    job_timeout_s: int = 7200
    colpali_store_batch_size: int = 16
    raster_processes: int = 0  # 0 = cpu_count
    # How many embed batches the ingest pipeline keeps in flight in
    # worker threads. At 1 the upload of batch k+1 only starts after
    # batch k's store finishes; at 2+ the relay upload (the ingest
    # bottleneck, ~50 MB/s data plane) rides under device compute,
    # fetch, and the host-side store of earlier batches (measured
    # round 4: 2.98 -> ~2x pages/s on the 500-page job-path bench).
    ingest_embed_prefetch: int = 2


class MorphikFlags(BaseModel):
    enable_colpali: bool = True
    # "api" = fan out to N remote TPU embedding servers (each exposing
    # POST /embeddings) instead of running the tower in-process.
    colpali_mode: Literal["off", "local", "api"] = "local"
    morphik_embedding_api_endpoints: List[str] = Field(default_factory=list)
    # Bearer key protecting POST /embeddings (reference
    # MORPHIK_EMBEDDING_API_KEY, colpali_api_embedding_model.py:285).
    # When unset, /embeddings falls back to the normal JWT auth path.
    morphik_embedding_api_key: Optional[str] = None
    mode: Literal["self_hosted", "cloud"] = "self_hosted"


class TelemetryConfig(BaseModel):
    enabled: bool = True
    telemetry_dir: str = "./logs/telemetry"
    # Optional collector endpoints; both OFF (None) by default — uploads
    # only make sense for hosted deployments with egress.
    upload_url: Optional[str] = None
    heartbeat_url: Optional[str] = None
    upload_interval_s: float = 4 * 3600
    local_budget_bytes: int = 1024**3


class EEConfig(BaseModel):
    """Enterprise connector settings (reference ee/ OAuth apps)."""

    google_client_id: Optional[str] = None
    google_client_secret: Optional[str] = None  # env MORPHIK_GOOGLE_CLIENT_SECRET
    google_redirect_uri: str = (
        "http://localhost:8000/ee/connectors/google_drive/oauth2callback"
    )


class Settings(BaseModel):
    api: ApiConfig = Field(default_factory=ApiConfig)
    auth: AuthConfig = Field(default_factory=AuthConfig)
    service: ServiceConfig = Field(default_factory=ServiceConfig)
    tpu: TPUConfig = Field(default_factory=TPUConfig)
    model: ModelConfig = Field(default_factory=ModelConfig)
    embedding: EmbeddingConfig = Field(default_factory=EmbeddingConfig)
    completion: CompletionConfig = Field(default_factory=CompletionConfig)
    parser: ParserConfig = Field(default_factory=ParserConfig)
    pdf: PdfConfig = Field(default_factory=PdfConfig)
    storage: StorageConfig = Field(default_factory=StorageConfig)
    database: DatabaseConfig = Field(default_factory=DatabaseConfig)
    vector_store: VectorStoreConfig = Field(default_factory=VectorStoreConfig)
    worker: WorkerConfig = Field(default_factory=WorkerConfig)
    morphik: MorphikFlags = Field(default_factory=MorphikFlags)
    telemetry: TelemetryConfig = Field(default_factory=TelemetryConfig)
    ee: EEConfig = Field(default_factory=EEConfig)
    registered_models: Dict[str, Dict[str, Any]] = Field(default_factory=dict)


_settings_lock = threading.Lock()
_settings: Optional[Settings] = None
_settings_path: Optional[str] = None


def _apply_env_overrides(s: Settings) -> Settings:
    """Secrets come from env vars, never the TOML (reference config.py
    reads JWT_SECRET_KEY / LOCAL_URI_PASSWORD / MORPHIK_EMBEDDING_API_KEY
    from the environment)."""
    if os.environ.get("JWT_SECRET_KEY"):
        s.auth.jwt_secret_key = os.environ["JWT_SECRET_KEY"]
    if os.environ.get("LOCAL_URI_PASSWORD"):
        s.auth.local_uri_password = os.environ["LOCAL_URI_PASSWORD"]
    if os.environ.get("MORPHIK_EMBEDDING_API_KEY"):
        s.morphik.morphik_embedding_api_key = os.environ["MORPHIK_EMBEDDING_API_KEY"]
    if os.environ.get("MORPHIK_PARSE_API_KEY"):
        s.parser.parse_api_key = os.environ["MORPHIK_PARSE_API_KEY"]
    if os.environ.get("MORPHIK_OCR_API_KEY"):
        s.parser.ocr_api_key = os.environ["MORPHIK_OCR_API_KEY"]
    if os.environ.get("MORPHIK_TRANSCRIPTION_API_KEY"):
        s.parser.transcription_api_key = os.environ["MORPHIK_TRANSCRIPTION_API_KEY"]
    if os.environ.get("MORPHIK_GOOGLE_CLIENT_SECRET"):
        s.ee.google_client_secret = os.environ["MORPHIK_GOOGLE_CLIENT_SECRET"]
    return s


def load_settings(path: Optional[str | Path] = None) -> Settings:
    """Parse the TOML config at `path` (or defaults if absent)."""
    if path is None:
        env = os.environ.get("MORPHIK_TPU_CONFIG")
        path = env if env else DEFAULT_CONFIG_FILENAME
    p = Path(path)
    if not p.exists():
        return _apply_env_overrides(Settings())
    with open(p, "rb") as f:
        raw = tomllib.load(f)
    return _apply_env_overrides(Settings.model_validate(raw))


def get_settings(path: Optional[str | Path] = None, *, reload: bool = False) -> Settings:
    """Cached settings singleton (reference core/config.py get_settings)."""
    global _settings, _settings_path
    with _settings_lock:
        key = str(path) if path is not None else None
        if _settings is None or reload or (key is not None and key != _settings_path):
            _settings = load_settings(path)
            _settings_path = key
        return _settings


def override_settings(settings: Settings) -> None:
    """Inject settings (tests)."""
    global _settings
    with _settings_lock:
        _settings = settings
