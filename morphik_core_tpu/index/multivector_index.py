"""In-process, mesh-shardable multivector index.

Replaces the reference's two external retrieval backends with one
TPU-resident structure (SURVEY.md §7 stage 2):

  reference FastMultiVectorStore = Turbopuffer ANN (FDE vectors)
      + S3/.npy multivector payloads + torch CPU/GPU rerank
      (core/vector_store/fast_multivector_store.py:295-605)
  reference MultiVectorStore     = Postgres BIT(128)[] + SQL max_sim
      (core/vector_store/multi_vector_store.py:39-980)

Here:
  - FDE vectors live in fixed-size device blocks (single chip) or a
    row-sharded buffer over the mesh's "data" axis (pod). Blocks are
    immutable once full, so an ingest job re-uploads only the tail
    block — not the corpus.
  - The device copy is int8-quantized by default (per-row scale):
    the ANN scan is HBM-bandwidth-bound, so int8 is a 4x scan speedup
    AND what lets a 1M-page x 10,240-d index fit one v5e chip
    (10.2 GB vs 41 GB f32). Exact MaxSim reranking follows, so
    prefilter quantization noise only perturbs pool composition.
  - Query = blocked matvec top-k (async-dispatched across blocks) or
    one shard_map matvec + tiny ICI all-gather merge (parallel/search.py),
    pool size min(multiplier*k, cap) like the reference
    (fast_multivector_store.py:529-532).
  - Exact MaxSim rerank of the pool runs through the Pallas kernel
    (ops/maxsim.py) over bucket-padded candidate multivectors.
  - Persistence is APPEND-ONLY: fde.bin / mv.bin raw appends + a
    records.jsonl WAL, so save() after an ingest job costs O(job), not
    O(corpus) (the reference's analogue: one .npy object per chunk
    streamed to S3, fast_multivector_store.py:673-707). Multivectors
    are read back via mmap — host RSS stays page-cache-bounded at any
    corpus size.
  - Tombstones (upsert/delete) are compacted automatically once the
    dead fraction crosses a threshold, bounding both file and HBM waste.
  - Authorization filtering = a validity mask built from doc ids
    (reference pre-filters ANN with document_id In [...]).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from morphik_core_tpu.ops.fde import FDEConfig, fde_document_batch, fde_query
from morphik_core_tpu.ops.maxsim import maxsim_scores, pad_multivectors
from morphik_core_tpu.parallel.search import quantize_rows_int8

logger = logging.getLogger(__name__)

FORMAT_VERSION = 2


def _fsync_dir(path: Path) -> None:
    """Make directory entries (file creations/renames) durable."""
    try:
        fd = os.open(str(path), os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    except OSError:  # platforms without dir fsync
        pass


def _round_capacity(n: int, minimum: int = 1024) -> int:
    """Power-of-2 capacity rounding (compiled-program reuse across grows)."""
    c = minimum
    while c < n:
        c *= 2
    return c


@dataclass
class IndexRecord:
    document_id: str
    chunk_number: int
    metadata: Dict[str, Any] = field(default_factory=dict)
    content_key: Optional[str] = None  # storage key of the chunk payload
    n_tokens: int = 0


class MultiVectorIndex:
    """One namespace (app) worth of chunk multivectors."""

    def __init__(
        self,
        fde_config: Optional[FDEConfig] = None,
        *,
        mesh=None,
        prefilter_multiplier: int = 30,
        prefilter_cap: int = 300,
        store_dtype=np.float16,
        path: Optional[str | Path] = None,
        use_pallas: Optional[bool] = None,
        ann_dtype: str = "int8",  # "int8" | "bfloat16" | "float32"
        device_block_rows: int = 65536,
        compact_dead_fraction: float = 0.25,
        compact_min_rows: int = 4096,
        device_cache_slots: int = 0,
        device_cache_token_bucket: int = 1024,
        rerank_dtype: str = "bf16",  # "bf16" | "int8" (per-token scales)
        rerank_prefilter_pooling: int = 0,  # 0/1 = off; p>1 = pooled first pass
        pooled_tier_factor: int = 0,  # 0 = off; p>1 = device-resident pooled tier
        pooled_tier_budget_mb: int = 6144,  # HBM budget gate for the tier
        pooled_refine_iters: int = 3,  # k-means passes refining pooled vectors
        query_token_dedup: float = 0.98,  # cosine thr for ANN-stage dedup; 0 = off
    ):
        self.fde_config = fde_config or FDEConfig()
        self.mesh = mesh
        self.prefilter_multiplier = prefilter_multiplier
        self.prefilter_cap = prefilter_cap
        self.store_dtype = np.dtype(store_dtype)
        self.use_pallas = use_pallas
        self.path = Path(path) if path else None
        self.ann_dtype = ann_dtype
        self.block_rows = int(device_block_rows)
        self.compact_dead_fraction = compact_dead_fraction
        self.compact_min_rows = compact_min_rows

        self._lock = threading.RLock()
        self.records: List[IndexRecord] = []
        self._id_to_row: Dict[str, int] = {}  # "docid-chunkno" -> row
        self._doc_rows: Dict[str, List[int]] = {}
        self._alive = np.zeros(0, dtype=bool)
        self._count = 0
        self._dead = 0
        # --- document codes: per-row int32 id of the owning document.
        # Filtered queries gate on `allowed[code]` ON DEVICE, so a
        # filtered query uploads O(n_docs) floats, not an O(n_rows) mask
        # (the device copy of codes is block-cached like the alive mask).
        self._doc_index: Dict[str, int] = {}  # doc_id -> code
        self._doc_alive: Dict[str, int] = {}  # doc_id -> alive row count
        self._row_code: List[int] = []

        self._fde_dim = self.fde_config.fde_dim
        self._dim = self.fde_config.dimension

        # --- persistence state: rows [0, _persisted) live in fde.bin /
        # mv.bin (mmap-read); rows [_persisted, _count) are the pending
        # tail held in RAM until the next flush.
        self._persisted = 0
        self._mv_off: List[int] = []  # per-row token offset into mv.bin (-1 = pending)
        self._fde_mm: Optional[np.memmap] = None
        self._mv_mm: Optional[np.memmap] = None
        self._fde_pending: List[np.ndarray] = []
        self._mv_pending: List[np.ndarray] = []
        self._wal_buffer: List[dict] = []  # ops since last flush, in event order
        self._mv_file_tokens = 0  # tokens already in mv.bin
        # --- pooled side-store (pooled.bin): per-row TIER-factor pooled
        # vectors, computed once at INGEST time and persisted, so the
        # device pooled tier never replays the k-means refinement over
        # the corpus inside a query (round-4 review: at 1M rows that was
        # ~5 min of host work under the lock on the first query after a
        # restart). Offsets are derived from records (no WAL change);
        # validity is gated on the header's pooled meta matching the
        # configured (factor, refine_iters) — a mismatch or a legacy
        # index disables the store until the next compaction rewrites it.
        self._pooled_pending: List[np.ndarray] = []
        self._pooled_off: List[int] = []  # per-row token offset (-1 = pending)
        self._pooled_mm: Optional[np.memmap] = None
        self._pooled_file_tokens = 0
        self._pooled_store_ok = pooled_tier_factor > 1

        # --- device state (single-chip blocked path). The active block
        # size grows pow-2 with the corpus (compiled-program reuse, no
        # 64k-row padding for small namespaces) and caps at block_rows.
        self._active_block = 0
        self._dev_blocks: List[Any] = []  # f/bf16 arrays or (int8, scales) tuples
        self._dev_rows = 0  # rows reflected in _dev_blocks
        self._mask_blocks: List[jax.Array] = []
        self._mask_rows = 0  # rows reflected in _mask_blocks (0 = rebuild all)
        self._code_blocks: List[jax.Array] = []  # int32 doc codes per block
        self._code_rows = 0
        self._allowed_ones: Dict[int, jax.Array] = {}  # device ones per pad size
        self._zeros_codes_cache: Optional[jax.Array] = None  # unfiltered-scan codes
        # --- device state (mesh path: row-sharded immutable blocks,
        # tail-refreshed exactly like _dev_blocks — an ingest uploads
        # only the tail block per shard, never the corpus)
        self._mesh_blocks: List[Any] = []
        self._mesh_dev_rows = 0
        self._mesh_mask_blocks: List[jax.Array] = []
        self._mesh_mask_rows = 0
        self._mesh_code_blocks: List[jax.Array] = []
        self._mesh_code_rows = 0
        self.last_mesh_upload_rows = 0  # observability for tests/telemetry
        self.last_filter_upload_floats = 0
        self._fde_q8_fn = None  # lazy fused device encode+quantize (int8 path)
        # HBM LRU of rerank candidates (the disk FileCacheManager's hot
        # tier, moved on-device — see index/device_cache.py). Lazy: the
        # buffers are only allocated on first use.
        self._cache_slots = int(device_cache_slots)
        self._cache_bucket = int(device_cache_token_bucket)
        self._pool_cache = None
        self._pooled_cache = None  # pooled-prefilter HBM tier (lazy)
        if rerank_dtype not in ("bf16", "int8"):
            raise ValueError(f"unknown rerank_dtype {rerank_dtype!r}")
        self.rerank_dtype = rerank_dtype
        # Cold-pool transfer diet: when the pool is not HBM-cache-resident,
        # an int8 token-POOLED first pass (bytes / pooling factor) ranks
        # the pool and only the top ~2k rows get the full-token exact
        # rerank. The reference's analogue is rerank-pool truncation
        # (min(10k, 75), fast_multivector_store.py:529-532); pooling
        # semantics per PAPERS.md training-free token pooling.
        self.rerank_prefilter_pooling = int(rerank_prefilter_pooling)
        # DEVICE-RESIDENT pooled-candidate tier: every row's token-pooled
        # int8 multivector lives in HBM blocks sharing the FDE block
        # geometry, and the pooled prefilter FUSES into the ANN scan
        # program — a cold query uploads NOTHING for the prefilter pass;
        # only the max(2k, 16) exact-rescore survivors pay transfer.
        # Gated by a byte budget (falls back to the upload-per-query
        # pooled pass above when the corpus outgrows it). Under a mesh
        # the tier is ROW-SHARDED: each chip holds 1/ndev of the pooled
        # blocks next to its FDE shard and the fused mesh program
        # (parallel/search.py::make_mesh_block_search_pooled) rescores
        # its LOCAL ANN candidates against its LOCAL pooled shard — the
        # gather never crosses ICI; one all-gather of (fde, pooled, id)
        # triples merges, and the replicated tail reproduces single-chip
        # pool semantics exactly (parity test test_pooled_tier.py::
        # test_mesh_pooled_tier_matches_single). The byte budget gates
        # the PER-CHIP share; the fused mesh program is int8-ANN-only
        # (float mesh indexes fall back to the upload prefilter). The
        # HBM rerank LRU below stays single-device either way: exact
        # rerank runs replicated-input kernels, so under a mesh the LRU
        # keeps working unchanged (it caches host->device rows, not
        # shards) — only its capacity is a single chip's HBM.
        self.pooled_tier_factor = int(pooled_tier_factor)
        self.pooled_tier_budget_mb = int(pooled_tier_budget_mb)
        # Pooled-vector fidelity (round 4, measured on a trained
        # checkpoint): consecutive-mean-only pooling averages away the
        # salient tokens of semantically structured pages; a few k-means
        # refinement passes (~0.3 ms/row host-side at ingest/build time)
        # triple the pooled stage's gold-survival rate at factor 32.
        # Both pooled paths (device tier + upload prefilter) share this
        # so their vectors stay bit-identical.
        self.pooled_refine_iters = int(pooled_refine_iters)
        # Query-token dedup for the CANDIDATE-SELECTION stages (round 4,
        # measured): a page-like image query carries ~800 near-identical
        # blank tokens that drown its few discriminative tokens in the
        # FDE query sum (keyword-page probe: FDE recall@28% = chance;
        # dedup@0.98 keeps ~55/845 tokens and doubles it) and dilute the
        # pooled rescore the same way. Applied ONLY to FDE encode + the
        # pooled stages — the exact rerank uses the FULL query, so
        # returned scores are unchanged; selection recall and ANN/pooled
        # latency improve. Gated to queries > 64 tokens (text queries
        # and crops are already dense).
        self.query_token_dedup = float(query_token_dedup)
        self._pooled_blocks: List[Any] = []  # (B, T, D) int8 per block
        self._pooled_scales: List[Any] = []  # (B, T) f32 (0 = padded token)
        self._pooled_rows = 0
        # mesh twin: row-sharded pooled tier (tail-incremental like
        # _mesh_blocks); the fused mesh program rescores each device's
        # local ANN candidates against its local pooled shard
        self._mesh_pooled_blocks: List[Any] = []
        self._mesh_pooled_scales: List[Any] = []
        self._mesh_pooled_rows = 0
        self._pooled_bucket = 0
        self._max_tokens = 0

        if self.path:
            # finish or discard an interrupted compaction before loading
            self.recover_compact(self.path)
        if self.path and (
            (self.path / "records.jsonl").exists() or (self.path / "meta.json").exists()
        ):
            self._load()

    # ----------------------------------------------------------- cache helpers

    def _invalidate_row_caches(self, row: int) -> None:
        if self._pool_cache is not None:
            self._pool_cache.invalidate(row)
        if self._pooled_cache is not None:
            self._pooled_cache.invalidate(row)

    def _invalidate_all_caches(self) -> None:
        if self._pool_cache is not None:
            self._pool_cache.invalidate_all()
        if self._pooled_cache is not None:
            self._pooled_cache.invalidate_all()

    # ------------------------------------------------------------------ size

    def __len__(self) -> int:
        return self._count - self._dead

    @property
    def count_rows(self) -> int:
        return self._count

    @property
    def dead_fraction(self) -> float:
        return self._dead / self._count if self._count else 0.0

    # ----------------------------------------------------------------- store

    def store(
        self,
        multivectors: Sequence[np.ndarray],
        records: Sequence[IndexRecord],
        fde_vectors: Optional[np.ndarray] = None,
    ) -> List[str]:
        """Insert chunks; returns stored ids "docid-chunkno".

        Upsert semantics: an existing (doc, chunk) row is tombstoned and
        re-appended (the reference deletes old chunks on re-ingest)."""
        assert len(multivectors) == len(records)
        if fde_vectors is None:
            fde_vectors = self.encode_documents(multivectors)
        ids = []
        with self._lock:
            need = self._count + len(records)
            if need > len(self._alive):
                alive = np.zeros(max(1024, 2 * need), dtype=bool)
                alive[: self._count] = self._alive[: self._count]
                self._alive = alive
            for mv, rec, fv in zip(multivectors, records, fde_vectors):
                sid = f"{rec.document_id}-{rec.chunk_number}"
                old = self._id_to_row.get(sid)
                if old is not None and self._alive[old]:
                    self._alive[old] = False
                    self._dead += 1
                    self._doc_alive[rec.document_id] = self._doc_alive.get(rec.document_id, 1) - 1
                    # dirty the cached device mask block covering the old
                    # row, exactly like delete_document — otherwise an
                    # unfiltered ANN query keeps serving the dead row
                    self._mask_rows = min(self._mask_rows, old)
                    self._mesh_mask_rows = min(self._mesh_mask_rows, old)
                    self._invalidate_row_caches(old)
                row = self._count
                mv = np.ascontiguousarray(mv, dtype=self.store_dtype)
                rec.n_tokens = int(mv.shape[0])
                self._max_tokens = max(self._max_tokens, rec.n_tokens)
                self.records.append(rec)
                self._mv_off.append(-1)
                self._mv_pending.append(mv)
                if self._pooled_store_ok:
                    # pay the pooling (+ k-means refine) here, at ingest —
                    # ~0.3 ms/row vs ~40 ms/page embed — NOT inside the
                    # first query's tier build
                    self._pooled_pending.append(self._pool_row(mv))
                    self._pooled_off.append(-1)
                self._fde_pending.append(np.asarray(fv, dtype=np.float32))
                self._alive[row] = True
                self._id_to_row[sid] = row
                self._doc_rows.setdefault(rec.document_id, []).append(row)
                code = self._doc_index.setdefault(rec.document_id, len(self._doc_index))
                self._row_code.append(code)
                self._doc_alive[rec.document_id] = self._doc_alive.get(rec.document_id, 0) + 1
                self._wal_buffer.append(
                    {
                        "op": "add",
                        "document_id": rec.document_id,
                        "chunk_number": rec.chunk_number,
                        "metadata": rec.metadata,
                        "content_key": rec.content_key,
                        "n_tokens": rec.n_tokens,
                    }
                )
                self._count += 1
                ids.append(sid)
            self._maybe_compact()
        return ids

    def encode_documents(self, multivectors: Sequence[np.ndarray]) -> np.ndarray:
        """Batched FDE encode (pads ragged token counts; masks padding)."""
        if not len(multivectors):
            return np.zeros((0, self._fde_dim), dtype=np.float32)
        dense, mask = pad_multivectors([np.asarray(m, np.float32) for m in multivectors])
        out = fde_document_batch(jnp.asarray(dense), jnp.asarray(mask), self.fde_config)
        return np.asarray(out, dtype=np.float32)

    def delete_document(self, document_id: str) -> int:
        with self._lock:
            rows = self._doc_rows.pop(document_id, [])
            n = 0
            for r in rows:
                if self._alive[r]:
                    self._alive[r] = False
                    self._dead += 1
                    n += 1
                    self._mask_rows = min(self._mask_rows, r)
                    self._mesh_mask_rows = min(self._mesh_mask_rows, r)
                    self._invalidate_row_caches(r)
                sid = f"{self.records[r].document_id}-{self.records[r].chunk_number}"
                self._id_to_row.pop(sid, None)
            if n:
                self._doc_alive.pop(document_id, None)
                self._wal_buffer.append({"op": "del_doc", "document_id": document_id})
                self._maybe_compact()
            return n

    # ------------------------------------------------------------- row access

    def _fde_rows(self, start: int, stop: int) -> np.ndarray:
        """FDE vectors for rows [start, stop) as float32 (mmap + pending)."""
        parts = []
        if start < self._persisted:
            parts.append(np.asarray(self._fde_mm[start : min(stop, self._persisted)]))
        if stop > self._persisted:
            lo = max(start, self._persisted) - self._persisted
            hi = stop - self._persisted
            pend = self._fde_pending[lo:hi]
            if pend:
                parts.append(np.stack(pend))
        if not parts:
            return np.zeros((0, self._fde_dim), dtype=np.float32)
        return parts[0] if len(parts) == 1 else np.concatenate(parts)

    def _mv_row(self, row: int) -> np.ndarray:
        """One multivector (n_tokens, dim) in store dtype (mmap or pending)."""
        if row >= self._persisted:
            return self._mv_pending[row - self._persisted]
        off = self._mv_off[row]
        n = self.records[row].n_tokens
        return np.asarray(self._mv_mm[off : off + n])

    # ----------------------------------------------------------------- query

    # --- device upload -----------------------------------------------------

    def _target_block_rows(self) -> int:
        return min(self.block_rows, _round_capacity(max(self._count, 1)))

    def _sync_block_size(self) -> None:
        B = self._target_block_rows()
        if B != self._active_block:
            self._active_block = B
            self._dev_blocks = []
            self._dev_rows = 0
            self._mask_blocks = []
            self._mask_rows = 0
            self._code_blocks = []
            self._code_rows = 0
            self._mesh_blocks = []
            self._mesh_dev_rows = 0
            self._mesh_mask_blocks = []
            self._mesh_mask_rows = 0
            self._mesh_code_blocks = []
            self._mesh_code_rows = 0
            self._pooled_blocks = []
            self._pooled_scales = []
            self._pooled_rows = 0
            self._mesh_pooled_blocks = []
            self._mesh_pooled_scales = []
            self._mesh_pooled_rows = 0

    def _block_host_arrays(self, b: int):
        """Host-side payload for block b (padded to B rows). int8 path
        returns (int8 rows, scales); float paths return one array."""
        B = self._active_block
        lo, hi = b * B, min((b + 1) * B, self._count)
        rows = self._fde_rows(lo, hi)
        if self.ann_dtype == "int8":
            q, s = quantize_rows_int8(rows)
            if rows.shape[0] < B:
                pad = B - rows.shape[0]
                q = np.concatenate([q, np.zeros((pad, self._fde_dim), np.int8)])
                s = np.concatenate([s, np.ones(pad, np.float32)])
            return q, s
        if rows.shape[0] < B:
            rows = np.concatenate(
                [rows, np.zeros((B - rows.shape[0], self._fde_dim), np.float32)]
            )
        dt = jnp.bfloat16 if self.ann_dtype == "bfloat16" else np.float32
        return rows.astype(dt)

    def _block_arrays(self, b: int):
        """Device payload for block b (single-chip path)."""
        host = self._block_host_arrays(b)
        if self.ann_dtype == "int8":
            return jnp.asarray(host[0]), jnp.asarray(host[1])
        return jnp.asarray(host)

    def _mask_block_host(self, b: int) -> np.ndarray:
        B = self._active_block
        lo, hi = b * B, min((b + 1) * B, self._count)
        m = np.zeros(B, np.float32)
        m[: hi - lo] = self._alive[lo:hi]
        return m

    def _code_block_host(self, b: int) -> np.ndarray:
        B = self._active_block
        lo, hi = b * B, min((b + 1) * B, self._count)
        c = np.zeros(B, np.int32)
        c[: hi - lo] = np.asarray(self._row_code[lo:hi], np.int32)
        return c

    def _ensure_device_blocks(self) -> None:
        """Refresh blocks covering rows >= _dev_rows (the tail); full
        blocks below _dev_rows are immutable and stay resident."""
        self._sync_block_size()
        if self._dev_rows == self._count and self._dev_blocks:
            return
        B = self._active_block
        first_dirty = self._dev_rows // B
        n_blocks = -(-self._count // B)
        del self._dev_blocks[first_dirty:]
        for b in range(first_dirty, n_blocks):
            self._dev_blocks.append(self._block_arrays(b))
        self._dev_rows = self._count

    def _ensure_mask_blocks(self) -> None:
        self._sync_block_size()
        if self._mask_rows == self._count and len(self._mask_blocks):
            return
        B = self._active_block
        first_dirty = min(self._mask_rows // B, len(self._mask_blocks))
        n_blocks = -(-self._count // B)
        del self._mask_blocks[first_dirty:]
        for b in range(first_dirty, n_blocks):
            self._mask_blocks.append(jnp.asarray(self._mask_block_host(b)))
        self._mask_rows = self._count

    def _ensure_code_blocks(self) -> None:
        """Device copy of per-row document codes (tail-incremental; codes
        of existing rows never change outside compaction). Built lazily:
        only FILTERED queries need codes — unfiltered queries gate with a
        shared zeros-codes block (allowed[0] == 1), so a deployment that
        never filters never pays the O(n_rows) upload."""
        self._sync_block_size()
        if self._code_rows == self._count and len(self._code_blocks):
            return
        B = self._active_block
        first_dirty = min(self._code_rows // B, len(self._code_blocks))
        n_blocks = -(-self._count // B)
        del self._code_blocks[first_dirty:]
        for b in range(first_dirty, n_blocks):
            self._code_blocks.append(jnp.asarray(self._code_block_host(b)))
        self._code_rows = self._count

    def _zero_codes(self, n_blocks: int):
        """One shared (B,) int32 zeros block reused for every block of an
        unfiltered scan (the gate reads allowed[0] == 1 everywhere)."""
        B = self._active_block
        if self._zeros_codes_cache is None or self._zeros_codes_cache.shape[0] != B:
            self._zeros_codes_cache = jnp.zeros((B,), jnp.int32)
        return (self._zeros_codes_cache,) * n_blocks

    # --- device-resident pooled tier ----------------------------------------

    def _tier_bucket(self) -> int:
        """Pooled token bucket: ceil(max_tokens / factor) rounded up to a
        multiple of 8 (the q8 kernel's minimum token tile)."""
        from morphik_core_tpu.ops.pooling import pooled_token_count

        p = self.pooled_tier_factor
        mt = max(self._max_tokens, 1)
        # pooled_token_count is NON-monotonic in row length: rows with
        # n <= factor stay unpooled (n tokens each), so the widest pooled
        # row is not necessarily the longest. Cover both regimes, or
        # short rows get silently truncated to the bucket in
        # _pooled_block_host and diverge from the upload prefilter
        # (round-4 review finding).
        n = max(pooled_token_count(mt, p), min(mt, p))
        return max(8, -(-n // 8) * 8)

    def tier_bytes_estimate(self) -> int:
        """HBM the pooled tier would occupy at the current corpus size
        (int8 tokens + f32 per-token scales, padded block geometry)."""
        self._sync_block_size()
        B = self._active_block
        n_blocks = -(-max(self._count, 1) // B)
        bucket = self._tier_bucket()
        return n_blocks * B * bucket * (self._dim + 4)

    def _tier_active(self) -> bool:
        """Device pooled tier serves the prefilter when configured and
        within the HBM byte budget. Under a mesh the tier is row-sharded
        (each chip holds 1/ndev of it, so the budget gates the PER-CHIP
        share) and the fused mesh program is int8-ANN-only — float mesh
        indexes fall back to the upload pooled pass. Re-checked per
        query, so a compaction that shrinks the corpus re-enables the
        tier automatically."""
        if self.pooled_tier_factor <= 1 or self._count == 0:
            return False
        est = self.tier_bytes_estimate()
        if self.mesh is not None:
            if self.ann_dtype != "int8":
                return False
            est = est // self._mesh_ndev()
        return est <= self.pooled_tier_budget_mb * (1 << 20)

    def _pool_row(self, mv: np.ndarray) -> np.ndarray:
        """Tier-factor pooled vector of one multivector row, in
        store_dtype (the pooled.bin on-disk representation)."""
        from morphik_core_tpu.ops.pooling import pool_multivector

        pv = pool_multivector(
            np.asarray(mv, np.float32), self.pooled_tier_factor,
            refine_iters=self.pooled_refine_iters,
        )
        return np.ascontiguousarray(pv, dtype=self.store_dtype)

    def _pooled_row(self, row: int) -> np.ndarray:
        """Per-row pooled vector (tier factor), f32. Served from the
        persisted side-store / pending tail when available; computed on
        the fly otherwise (legacy index, config change — the next
        compaction rewrites pooled.bin and re-enables the store)."""
        if self._pooled_store_ok:
            if row >= self._persisted:
                return np.asarray(
                    self._pooled_pending[row - self._persisted], np.float32
                )
            off = self._pooled_off[row] if row < len(self._pooled_off) else -1
            if off >= 0 and self._pooled_mm is not None:
                from morphik_core_tpu.ops.pooling import pooled_token_count

                n = pooled_token_count(
                    self.records[row].n_tokens, self.pooled_tier_factor
                )
                return np.asarray(self._pooled_mm[off : off + n], np.float32)
        return np.asarray(self._pool_row(self._mv_row(row)), np.float32)

    def _pooled_block_host(self, b: int, bucket: int):
        """Host payload for pooled block b: per-token int8 + scales with
        scale 0 marking padded tokens (doubles as the validity mask).
        Builds in bounded row chunks — a 64k-row block would otherwise
        materialize ~2 GB of f32 temporaries. Pooled vectors come from
        the persisted side-store (computed at ingest), so this is a
        read+quantize pass, not a k-means replay."""
        B = self._active_block
        lo, hi = b * B, min((b + 1) * B, self._count)
        q8 = np.zeros((B, bucket, self._dim), np.int8)
        sc = np.zeros((B, bucket), np.float32)
        CHUNK = 2048
        for start in range(lo, hi, CHUNK):
            stop = min(start + CHUNK, hi)
            dense = np.zeros((stop - start, bucket, self._dim), np.float32)
            for j, r in enumerate(range(start, stop)):
                if not self._alive[r]:
                    continue  # tombstones are never gathered; skip the IO
                pv = self._pooled_row(r)
                n = min(pv.shape[0], bucket)
                dense[j, :n] = pv[:n]
            qq, ss = quantize_rows_int8(dense)
            # zero-out scales at padded tokens (quantize gives them 1.0)
            ss = ss * (np.abs(dense).max(axis=-1) > 0)
            q8[start - lo : stop - lo] = qq
            sc[start - lo : stop - lo] = ss
        return q8, sc

    def _ensure_pooled_blocks(self) -> None:
        """Tail-incremental twin of _ensure_device_blocks for the pooled
        tier. A bucket change (a longer row arrived) REPACKS the tier at
        the new geometry — pooled vectors come from the persisted
        side-store, so that's a read+quantize+upload pass, never a
        k-means replay over the corpus."""
        self._sync_block_size()
        bucket = self._tier_bucket()
        if bucket != self._pooled_bucket:
            self._pooled_blocks = []
            self._pooled_scales = []
            self._pooled_rows = 0
            self._pooled_bucket = bucket
        if self._pooled_rows == self._count and self._pooled_blocks:
            return
        B = self._active_block
        first_dirty = self._pooled_rows // B
        n_blocks = -(-self._count // B)
        del self._pooled_blocks[first_dirty:]
        del self._pooled_scales[first_dirty:]
        for b in range(first_dirty, n_blocks):
            q8, sc = self._pooled_block_host(b, bucket)
            self._pooled_blocks.append(jnp.asarray(q8))
            self._pooled_scales.append(jnp.asarray(sc))
        self._pooled_rows = self._count

    def _ensure_mesh_pooled_blocks(self) -> None:
        """Row-sharded twin of _ensure_pooled_blocks: each pooled block
        is one device_put over the mesh data axis (tail-incremental —
        only blocks past the high-water mark re-upload). Pooled vectors
        come from the persisted side-store, never a k-means replay."""
        from morphik_core_tpu.parallel.search import shard_rows, shard_rows3

        self._sync_block_size()
        bucket = self._tier_bucket()
        # separate bucket watermark from the single-chip tier: queries
        # can alternate paths (tests), and a mesh-only index never runs
        # _ensure_pooled_blocks to advance _pooled_bucket
        if bucket != getattr(self, "_mesh_pooled_bucket", 0):
            self._mesh_pooled_blocks = []
            self._mesh_pooled_scales = []
            self._mesh_pooled_rows = 0
            self._mesh_pooled_bucket = bucket
        if self._mesh_pooled_rows == self._count and self._mesh_pooled_blocks:
            return
        B = self._active_block
        first_dirty = self._mesh_pooled_rows // B
        n_blocks = -(-self._count // B)
        del self._mesh_pooled_blocks[first_dirty:]
        del self._mesh_pooled_scales[first_dirty:]
        for b in range(first_dirty, n_blocks):
            q8, sc = self._pooled_block_host(b, bucket)
            self._mesh_pooled_blocks.append(jax.device_put(q8, shard_rows3(self.mesh)))
            self._mesh_pooled_scales.append(jax.device_put(sc, shard_rows(self.mesh)))
        self._mesh_pooled_rows = self._count

    def _mesh_pooled_topm(
        self,
        qe,
        q: np.ndarray,
        doc_ids: Optional[Sequence[str]],
        pool_size: int,
        m: int,
    ) -> List[int]:
        """Mesh twin of _ann_pooled_topm: sharded fused ANN + pooled
        rescore, one replicated fetch. Pool semantics (global FDE
        top-pool, union guard, pooled top-m) match the single-chip path
        exactly — parity is regression-tested on the virtual mesh."""
        from morphik_core_tpu.ops.maxsim import quantize_query_q8
        from morphik_core_tpu.parallel.search import make_mesh_block_search_pooled

        self._ensure_mesh_blocks(with_codes=doc_ids is not None)
        self._ensure_mesh_pooled_blocks()
        allowed = self._allowed_vec(doc_ids)
        n_blocks = len(self._mesh_blocks)
        mesh_codes = (
            tuple(self._mesh_code_blocks)
            if doc_ids is not None
            else self._mesh_zero_codes(n_blocks)
        )
        pool_pad = min(_round_capacity(pool_size, minimum=16), self._active_block)
        pool_true = min(pool_size, pool_pad)
        m_pad = min(_round_capacity(m, minimum=16), pool_true)
        guard = m // 2
        q8p, qsp = quantize_query_q8(q)
        search = make_mesh_block_search_pooled(
            self.mesh, n_blocks, pool_pad, pool_true, m_pad, guard
        )
        qq, qs = qe
        packed = np.asarray(
            search(
                qq, qs, allowed,
                tuple(b[0] for b in self._mesh_blocks),
                tuple(b[1] for b in self._mesh_blocks),
                tuple(self._mesh_mask_blocks),
                mesh_codes,
                tuple(self._mesh_pooled_blocks),
                tuple(self._mesh_pooled_scales),
                jnp.asarray(q8p), jnp.asarray(qsp),
            )
        )
        half = packed.shape[0] // 2
        vals, gids = packed[:half], packed[half:].astype(np.int64)
        out = [int(g) for g, s in zip(gids, vals) if np.isfinite(s) and g < self._count]
        return out[:m]

    def _ann_pooled_topm(
        self,
        qe,
        q: np.ndarray,
        doc_ids: Optional[Sequence[str]],
        pool_size: int,
        m: int,
    ) -> List[int]:
        """ONE compiled program: blocked ANN scan -> top-pool -> pooled
        MaxSim rescore against the device tier -> top-m survivors. The
        only per-query uploads are the (already device-resident) encoded
        query + the tiny int8 query multivector; the fetch is one packed
        (2m,) array. The first m//2 survivor slots hold the ANN (FDE)
        head set — the union guard (`_pooled_stage`) — the rest
        best-pooled-first; the exact rerank downstream re-sorts all."""
        from morphik_core_tpu.ops.maxsim import default_use_pallas, quantize_query_q8
        from morphik_core_tpu.parallel.search import (
            scan_blocks_topk_pooled,
            scan_blocks_topk_q_pooled,
        )

        self._ensure_device_blocks()
        self._ensure_mask_blocks()
        self._ensure_pooled_blocks()
        B = self._active_block
        kb = min(_round_capacity(pool_size, minimum=16), B)
        masks = tuple(self._mask_blocks)
        if doc_ids is None:
            codes = self._zero_codes(len(self._dev_blocks))
        else:
            self._ensure_code_blocks()
            codes = tuple(self._code_blocks)
        allowed = self._allowed_vec(doc_ids)
        q8p, qsp = quantize_query_q8(q)
        use_pallas = self.use_pallas if self.use_pallas is not None else default_use_pallas()
        m_pad = min(_round_capacity(m, minimum=16), pool_size)
        guard = m // 2  # union safety floor: FDE-head half always survives
        if self.ann_dtype == "int8":
            q_dev, qs_dev = qe
            packed = scan_blocks_topk_q_pooled(
                tuple(b[0] for b in self._dev_blocks),
                tuple(b[1] for b in self._dev_blocks),
                masks, codes, allowed, q_dev, qs_dev,
                tuple(self._pooled_blocks), tuple(self._pooled_scales),
                jnp.asarray(q8p), jnp.asarray(qsp),
                kb, pool_size, m_pad, use_pallas, guard=guard,
            )
        else:
            packed = scan_blocks_topk_pooled(
                tuple(self._dev_blocks), masks, codes, allowed, jnp.asarray(qe),
                tuple(self._pooled_blocks), tuple(self._pooled_scales),
                jnp.asarray(q8p), jnp.asarray(qsp),
                kb, pool_size, m_pad, use_pallas, guard=guard,
            )
        packed = np.asarray(packed)
        half = packed.shape[0] // 2
        vals, gids = packed[:half], packed[half:].astype(np.int64)
        out = [int(g) for g, s in zip(gids, vals) if np.isfinite(s) and g < self._count]
        return out[:m]

    # --- filtered-query gate ----------------------------------------------

    def _codes_pad(self) -> int:
        return _round_capacity(max(len(self._doc_index), 1), minimum=256)

    def _allowed_vec(self, doc_ids: Optional[Sequence[str]]):
        """Device gate over document codes. Unfiltered queries reuse a
        cached device ones-vector (zero upload); filtered queries upload
        one O(n_docs) float vector."""
        pad = self._codes_pad()
        if doc_ids is None:
            ones = self._allowed_ones.get(pad)
            if ones is None:
                ones = jnp.ones((pad,), jnp.float32)
                self._allowed_ones = {pad: ones}  # keep only current size
            self.last_filter_upload_floats = 0
            return ones
        a = np.zeros(pad, np.float32)
        for d in doc_ids:
            c = self._doc_index.get(d)
            if c is not None:
                a[c] = 1.0
        self.last_filter_upload_floats = pad
        return jnp.asarray(a)

    # --- mesh device state --------------------------------------------------

    def _mesh_ndev(self) -> int:
        return self.mesh.shape["data"]

    def _ensure_mesh_blocks(self, with_codes: bool = False) -> None:
        """Tail-incremental sharded twin of _ensure_device_blocks /
        _ensure_mask_blocks / _ensure_code_blocks: each block is one
        row-sharded device_put over the mesh's data axis. Only blocks
        covering rows >= the respective high-water mark re-upload."""
        from morphik_core_tpu.parallel.search import shard_rows, shard_vec

        self._sync_block_size()
        B = self._active_block
        if B % self._mesh_ndev():
            raise ValueError(
                f"device_block_rows-derived block {B} not divisible by "
                f"mesh data axis {self._mesh_ndev()}"
            )
        n_blocks = -(-self._count // B)
        uploaded = 0
        if self._mesh_dev_rows != self._count or not self._mesh_blocks:
            first_dirty = self._mesh_dev_rows // B
            del self._mesh_blocks[first_dirty:]
            for b in range(first_dirty, n_blocks):
                host = self._block_host_arrays(b)
                if self.ann_dtype == "int8":
                    self._mesh_blocks.append(
                        (
                            jax.device_put(host[0], shard_rows(self.mesh)),
                            jax.device_put(host[1], shard_vec(self.mesh)),
                        )
                    )
                else:
                    self._mesh_blocks.append(jax.device_put(host, shard_rows(self.mesh)))
                uploaded += min(B, self._count - b * B)
            self._mesh_dev_rows = self._count
        if self._mesh_mask_rows != self._count or not self._mesh_mask_blocks:
            first_dirty = min(self._mesh_mask_rows // B, len(self._mesh_mask_blocks))
            del self._mesh_mask_blocks[first_dirty:]
            for b in range(first_dirty, n_blocks):
                self._mesh_mask_blocks.append(
                    jax.device_put(self._mask_block_host(b), shard_vec(self.mesh))
                )
            self._mesh_mask_rows = self._count
        if with_codes and (self._mesh_code_rows != self._count or not self._mesh_code_blocks):
            # lazily built: only filtered queries gate on real doc codes
            first_dirty = min(self._mesh_code_rows // B, len(self._mesh_code_blocks))
            del self._mesh_code_blocks[first_dirty:]
            for b in range(first_dirty, n_blocks):
                self._mesh_code_blocks.append(
                    jax.device_put(self._code_block_host(b), shard_vec(self.mesh))
                )
            self._mesh_code_rows = self._count
        self.last_mesh_upload_rows = uploaded

    def _mesh_zero_codes(self, n_blocks: int):
        """Shared sharded zeros-codes block for unfiltered mesh scans
        (sharded like real code blocks so the jit signature matches)."""
        from morphik_core_tpu.parallel.search import shard_vec

        B = self._active_block
        z = getattr(self, "_mesh_zeros_cache", None)
        if z is None or z.shape[0] != B:
            self._mesh_zeros_cache = jax.device_put(
                np.zeros(B, np.int32), shard_vec(self.mesh)
            )
        return (self._mesh_zeros_cache,) * n_blocks

    def _dedup_query_tokens(self, q: np.ndarray) -> np.ndarray:
        """Greedy cosine dedup of query tokens for the selection stages
        (FDE ANN + pooled rescore). Keeps the first representative of
        each near-duplicate cluster in token order. O(n * kept) host
        numpy — ~60 reps from an 845-token page query in <1 ms."""
        thr = self.query_token_dedup
        if thr <= 0 or q.shape[0] <= 64:
            return q
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-9)
        kept: List[int] = []
        reps = np.empty_like(qn)
        for i in range(qn.shape[0]):
            if kept and float((reps[: len(kept)] @ qn[i]).max()) >= thr:
                continue
            reps[len(kept)] = qn[i]
            kept.append(i)
        return q[kept]

    def _encode_query(self, q: np.ndarray):
        """FDE-encode one query multivector. For the int8 ANN path the
        encode + quantize run fused ON DEVICE and the result never
        visits the host (one fewer round trip per query); other dtypes
        return the float32 FDE vector."""
        if self.ann_dtype == "int8":
            if self._fde_q8_fn is None:
                from morphik_core_tpu.parallel.search import quantize_vec_int8

                cfg = self.fde_config
                self._fde_q8_fn = jax.jit(lambda x: quantize_vec_int8(fde_query(x, cfg)))
            return self._fde_q8_fn(jnp.asarray(q))
        return np.asarray(fde_query(jnp.asarray(q), self.fde_config))

    # --- search ------------------------------------------------------------

    def _ann_pool(
        self, qe: np.ndarray, doc_ids: Optional[Sequence[str]], pool_size: int
    ) -> List[int]:
        """Top-`pool_size` candidate rows by FDE dot product. Filtering
        (auth doc sets) is gated on device via per-row document codes —
        a filtered query uploads one O(n_docs) `allowed` vector (the
        reference's `document_id In [...]` ANN filter,
        fast_multivector_store.py:526-532)."""
        from morphik_core_tpu.parallel.search import (
            make_mesh_block_search,
            scan_blocks_topk,
            scan_blocks_topk_q,
        )

        allowed = self._allowed_vec(doc_ids)

        if self.mesh is not None:
            self._ensure_mesh_blocks(with_codes=doc_ids is not None)
            B = self._active_block
            n_blocks = len(self._mesh_blocks)
            mesh_codes = (
                tuple(self._mesh_code_blocks)
                if doc_ids is not None
                else self._mesh_zero_codes(n_blocks)
            )
            # pow-2 bucket the compiled top-k size so corpus growth doesn't
            # recompile the kernel per query; extra candidates are trimmed
            # by the merge below. k is the PER-DEVICE local top-k.
            k = min(_round_capacity(pool_size, minimum=16), B // self._mesh_ndev())
            search = make_mesh_block_search(
                self.mesh, n_blocks, k, self.ann_dtype == "int8"
            )
            if self.ann_dtype == "int8":
                qq, qs = qe  # device (int8 vec, scale) from _encode_query
                packed = search(
                    qq, qs, allowed,
                    tuple(b[0] for b in self._mesh_blocks),
                    tuple(b[1] for b in self._mesh_blocks),
                    tuple(self._mesh_mask_blocks),
                    mesh_codes,
                )
            else:
                packed = search(
                    jnp.asarray(qe), allowed,
                    tuple(self._mesh_blocks),
                    tuple(self._mesh_mask_blocks),
                    mesh_codes,
                )
            packed = np.asarray(packed)  # one fetch: [scores | row ids]
            half = packed.shape[0] // 2
            scores, idx = packed[:half], packed[half:].astype(np.int64)
            out = [int(i) for i, s in zip(idx, scores) if np.isfinite(s) and i < self._count]
            return out[:pool_size]

        # blocked single-device path: ALL blocks scanned + merged in one
        # compiled program (one dispatch, one fetch — per-block dispatch
        # pays the host<->device RTT n_blocks times on remote TPUs)
        self._ensure_device_blocks()
        self._ensure_mask_blocks()
        B = self._active_block
        kb = min(_round_capacity(pool_size, minimum=16), B)
        masks = tuple(self._mask_blocks)
        if doc_ids is None:
            codes = self._zero_codes(len(self._dev_blocks))
        else:
            self._ensure_code_blocks()
            codes = tuple(self._code_blocks)
        if self.ann_dtype == "int8":
            q_dev, qs_dev = qe  # device (int8 vec, scale) from _encode_query
            packed = scan_blocks_topk_q(
                tuple(b[0] for b in self._dev_blocks),
                tuple(b[1] for b in self._dev_blocks),
                masks, codes, allowed, q_dev, qs_dev, kb, pool_size,
            )
        else:
            packed = scan_blocks_topk(
                tuple(self._dev_blocks), masks, codes, allowed, jnp.asarray(qe), kb, pool_size
            )
        # single fetch: [scores | row ids] packed in one array (one RTT)
        packed = np.asarray(packed)
        half = packed.shape[0] // 2
        vm, gi = packed[:half], packed[half:].astype(np.int64)
        return [int(g) for g, s in zip(gi, vm) if np.isfinite(s) and g < self._count]

    def query(
        self,
        query_embedding: np.ndarray,
        k: int,
        doc_ids: Optional[Sequence[str]] = None,
        return_timing: bool = False,
    ) -> List[Tuple[IndexRecord, float]]:
        """Two-stage search: FDE ANN pool -> exact MaxSim rerank -> top-k.
        Returns [(record, score)] best-first."""
        with self._lock:
            t0 = time.perf_counter()
            if self._count == 0 or k <= 0:
                return []
            q = np.asarray(query_embedding, dtype=np.float32)
            # selection stages see the DEDUPED query (FDE encode + pooled
            # rescores); the exact rerank below keeps the full q, so the
            # returned scores are unchanged — dedup only improves which
            # candidates reach it (and shrinks the selection compute)
            q_sel = self._dedup_query_tokens(q)
            qe = self._encode_query(q_sel)
            t1 = time.perf_counter()

            pool_size = min(self.prefilter_multiplier * k, self.prefilter_cap)
            pool_size = min(max(pool_size, k), self._count)
            if doc_ids is not None:
                # O(len(doc_ids)) dict lookups — no per-row host work
                if not any(self._doc_alive.get(d, 0) > 0 for d in doc_ids):
                    return []
            elif len(self) == 0:
                return []
            # exact-rescore survivor count: the pooled prefilter (either
            # variant) narrows the ANN pool to this many rows before the
            # full-token exact rerank. Scales mildly with the pool so a
            # wide ANN pool (default 300 since round 4 — EVAL pool_scaling
            # showed exact-top10 capture 0.74@75 -> 0.89@300 while the
            # fused device tier makes wide pools ~latency-free) doesn't
            # funnel through a fixed-20 pooled-selection bottleneck.
            rescore_n = max(2 * k, 16, pool_size // 10)
            tier = self._tier_active() and pool_size > rescore_n
            if tier:
                # fused path: ANN scan + device pooled-tier rescore in one
                # program — zero candidate upload for the prefilter pass
                # (row-sharded twin under a mesh)
                if self.mesh is not None:
                    pool = self._mesh_pooled_topm(qe, q_sel, doc_ids, pool_size, rescore_n)
                else:
                    pool = self._ann_pooled_topm(qe, q_sel, doc_ids, pool_size, rescore_n)
            else:
                pool = self._ann_pool(qe, doc_ids, pool_size)
            t2 = time.perf_counter()
            if not pool:
                return []

            # exact rerank of the pool. Hot candidates come from the HBM
            # LRU (insert-on-miss, device gather — zero bulk transfer on
            # warm queries). A COLD pool (when the device pooled tier is
            # off/over-budget) first goes through an int8 token-POOLED
            # prefilter (transfer / pooling factor) that narrows it to
            # max(2k, 16) rows before the full-token exact rerank — only
            # those rows pay the full upload / cache slots. The fallback
            # exact path uploads 16-bit (halves the transfer vs f32;
            # f16->bf16 rounding is orders of magnitude below MaxSim
            # ranking margins).
            rescores = None
            resident = (
                self._cache_slots > 0
                and self._pool_cache is not None
                and self._pool_cache.resident(pool)
            )
            p = self.rerank_prefilter_pooling
            if not tier and not resident and p > 1 and len(pool) > rescore_n:
                pool = self._pooled_prefilter(pool, q_sel, rescore_n, p)
            if self._cache_slots > 0:
                rescores = self._pool_scores_cached(pool, q)
            if rescores is None:
                cand = [self._mv_row(r) for r in pool]
                if self.rerank_dtype == "int8":
                    from morphik_core_tpu.ops.maxsim import maxsim_scores_q8, quantize_pool_int8

                    d8, ds, dmask = quantize_pool_int8(
                        [np.asarray(c, np.float32) for c in cand]
                    )
                    rescores = np.asarray(
                        maxsim_scores_q8(q, d8, ds, dmask, use_pallas=self.use_pallas)
                    )
                else:
                    dense, dmask = pad_multivectors(cand, dtype=self.store_dtype)
                    if dense.dtype == np.float16:
                        dense = dense.astype(jnp.bfloat16)
                    rescores = np.asarray(
                        maxsim_scores(
                            jnp.asarray(q), jnp.asarray(dense), jnp.asarray(dmask),
                            use_pallas=self.use_pallas,
                        )
                    )
            order = np.argsort(-rescores)[: min(k, len(pool))]
            t3 = time.perf_counter()
            if return_timing:
                self.last_timing = {
                    "encode_ms": (t1 - t0) * 1e3,
                    "ann_ms": (t2 - t1) * 1e3,
                    "rerank_ms": (t3 - t2) * 1e3,
                    "pool": len(pool),
                    "pooled_tier": tier,
                }
                logger.info(
                    "index.query timing encode=%.1fms ann=%.1fms rerank=%.1fms pool=%d",
                    (t1 - t0) * 1e3, (t2 - t1) * 1e3, (t3 - t2) * 1e3, len(pool),
                )
            return [(self.records[pool[i]], float(rescores[i])) for i in order]

    def _pooled_prefilter(self, pool: List[int], q: np.ndarray, m: int, factor: int) -> List[int]:
        """Rank `pool` by MaxSim over token-POOLED int8 candidates and
        return `m` survivor rows. A cold pool uploads 1/factor of the
        full-token bytes; with the HBM cache enabled, pooled rows get
        their own small cache tier (token_bucket/factor int8 slots), so
        REPEATED queries run the pooled pass with zero bulk transfer.

        Union guard (round 4): `pool` arrives in ANN (FDE) score order,
        and pooled vectors are lossy — the first m//2 rows survive
        unconditionally, only the remaining slots are chosen by pooled
        score (same safety floor as the fused device tier,
        parallel/search.py::_pooled_stage). The survivors then get the
        exact full-token rerank."""
        from morphik_core_tpu.ops.pooling import pool_multivector, pooled_token_count

        def fetch_pooled(r: int) -> np.ndarray:
            if factor == self.pooled_tier_factor:
                return self._pooled_row(r)  # persisted at ingest — no k-means
            return pool_multivector(
                np.asarray(self._mv_row(r), np.float32), factor,
                refine_iters=self.pooled_refine_iters,
            )

        scores = None
        if self._cache_slots > 0 and len(pool) <= self._cache_slots:
            if self._pooled_cache is None:
                from morphik_core_tpu.index.device_cache import DevicePoolCache

                pooled_max = -(-self._cache_bucket // factor)  # ceil
                bucket = max(8, -(-pooled_max // 8) * 8)  # round up to 8
                self._pooled_cache = DevicePoolCache(
                    self._cache_slots, bucket, self._dim, quantized=True
                )
            scores = self._pooled_cache.score(
                pool, q,
                fetch_row=fetch_pooled,
                n_tokens=lambda r: pooled_token_count(self.records[r].n_tokens, factor),
                use_pallas=self.use_pallas,
            )
        if scores is None:
            from morphik_core_tpu.ops.maxsim import maxsim_scores_q8, quantize_pool_int8

            d8, ds, dmask = quantize_pool_int8([fetch_pooled(r) for r in pool])
            scores = np.asarray(
                maxsim_scores_q8(q, d8, ds, dmask, use_pallas=self.use_pallas)
            )
        m = min(m, len(pool))
        g = m // 2  # FDE-head half survives regardless of pooled score
        order = [i for i in np.argsort(-scores) if i >= g]
        return pool[:g] + [pool[i] for i in order[: m - g]]

    def _pool_scores_cached(self, pool: List[int], q: np.ndarray) -> Optional[np.ndarray]:
        """MaxSim scores via the HBM candidate cache; None -> fall back
        (oversized rows, or the cache can't hold this pool)."""
        if len(pool) > self._cache_slots:
            return None
        if self._pool_cache is None:
            from morphik_core_tpu.index.device_cache import DevicePoolCache

            self._pool_cache = DevicePoolCache(
                self._cache_slots, self._cache_bucket, self._dim,
                quantized=self.rerank_dtype == "int8",
            )
        return self._pool_cache.score(
            pool, q,
            fetch_row=self._mv_row,
            n_tokens=lambda r: self.records[r].n_tokens,
            use_pallas=self.use_pallas,
        )

    def get_chunks_by_id(self, chunk_ids: Sequence[Tuple[str, int]]) -> List[Optional[IndexRecord]]:
        out = []
        for doc_id, chunk_no in chunk_ids:
            row = self._id_to_row.get(f"{doc_id}-{chunk_no}")
            out.append(self.records[row] if row is not None and self._alive[row] else None)
        return out

    def get_multivector(self, document_id: str, chunk_number: int) -> Optional[np.ndarray]:
        row = self._id_to_row.get(f"{document_id}-{chunk_number}")
        if row is None or not self._alive[row]:
            return None
        return self._mv_row(row).astype(np.float32)

    # ------------------------------------------------------------- persistence
    #
    # Layout under self.path:
    #   header.json    — format version + FDE config + store dtype
    #   records.jsonl  — append-only op log (add / del_doc), replayed on load
    #   fde.bin        — raw float32 rows, appended in row order
    #   mv.bin         — raw store_dtype tokens, appended; rows located by
    #                    (token offset, n_tokens)

    def _header(self) -> dict:
        return {
            "format": FORMAT_VERSION,
            "store_dtype": self.store_dtype.name,
            # pooled.bin provenance: derived data, so a mismatch only
            # disables the side-store (next compaction regenerates it)
            "pooled": {
                "factor": self.pooled_tier_factor,
                "refine_iters": self.pooled_refine_iters,
            },
            "fde": {
                "dimension": self.fde_config.dimension,
                "num_repetitions": self.fde_config.num_repetitions,
                "num_simhash_projections": self.fde_config.num_simhash_projections,
                "projection_dimension": self.fde_config.projection_dimension,
                "projection_type": self.fde_config.projection_type,
                "seed": self.fde_config.seed,
            },
        }

    def save(self) -> None:
        """Flush the pending tail: O(new rows since last save), not
        O(corpus) — fde/mv data is appended, WAL lines are appended."""
        if not self.path:
            raise ValueError("index created without a path")
        with self._lock:
            self.path.mkdir(parents=True, exist_ok=True)
            hdr = self.path / "header.json"
            if not hdr.exists():
                with open(hdr, "w") as fh:
                    json.dump(self._header(), fh)
            # records.jsonl must exist even for an EMPTY index: a
            # zero-survivor compaction swap relies on replacing the old
            # WAL with this (empty) one — otherwise the old rows would
            # silently resurrect on reload
            wal = self.path / "records.jsonl"
            if not wal.exists():
                wal.touch()
            if not self._wal_buffer and self._persisted == self._count:
                return
            # 1) data appends BEFORE the WAL lines that reference them —
            #    a crash in between leaves harmless orphan bytes that the
            #    loader truncates.
            if self._fde_pending:
                with open(self.path / "fde.bin", "ab") as fh:
                    fh.write(np.stack(self._fde_pending).tobytes())
            new_offs: List[int] = []
            if self._mv_pending:
                off = self._mv_file_tokens
                bufs = []
                for mv in self._mv_pending:
                    new_offs.append(off)
                    off += mv.shape[0]
                    bufs.append(mv.tobytes())
                with open(self.path / "mv.bin", "ab") as fh:
                    fh.write(b"".join(bufs))
                self._mv_file_tokens = off
            new_pooled_offs: List[int] = []
            if self._pooled_store_ok and self._pooled_pending:
                off = self._pooled_file_tokens
                bufs = []
                for pv in self._pooled_pending:
                    new_pooled_offs.append(off)
                    off += pv.shape[0]
                    bufs.append(pv.tobytes())
                with open(self.path / "pooled.bin", "ab") as fh:
                    fh.write(b"".join(bufs))
                self._pooled_file_tokens = off
            # 2) WAL lines (adds get their mv offsets in append order)
            it = iter(new_offs)
            lines = []
            for op in self._wal_buffer:
                if op["op"] == "add":
                    op = {**op, "mv_off": next(it)}
                lines.append(json.dumps(op, default=str))
            with open(self.path / "records.jsonl", "a") as fh:
                fh.write("".join(line + "\n" for line in lines))
                fh.flush()
                os.fsync(fh.fileno())
            # 3) promote pending -> persisted
            for i, off in enumerate(new_offs):
                self._mv_off[self._persisted + i] = off
            for i, off in enumerate(new_pooled_offs):
                self._pooled_off[self._persisted + i] = off
            self._persisted = self._count
            self._fde_pending.clear()
            self._mv_pending.clear()
            self._pooled_pending.clear()
            self._wal_buffer.clear()
            self._open_mmaps()

    def _open_mmaps(self) -> None:
        fde_p, mv_p = self.path / "fde.bin", self.path / "mv.bin"
        if self._persisted and fde_p.exists():
            self._fde_mm = np.memmap(
                fde_p, dtype=np.float32, mode="r", shape=(self._persisted, self._fde_dim)
            )
        if self._mv_file_tokens and mv_p.exists():
            self._mv_mm = np.memmap(
                mv_p, dtype=self.store_dtype, mode="r", shape=(self._mv_file_tokens, self._dim)
            )
        pooled_p = self.path / "pooled.bin"
        if self._pooled_store_ok and self._pooled_file_tokens and pooled_p.exists():
            self._pooled_mm = np.memmap(
                pooled_p, dtype=self.store_dtype, mode="r",
                shape=(self._pooled_file_tokens, self._dim),
            )

    def _load(self) -> None:
        if not (self.path / "records.jsonl").exists():
            self._load_legacy()
            return
        with open(self.path / "header.json") as fh:
            hdr = json.load(fh)
        stored = hdr["fde"]
        current = self._header()["fde"]
        # EVERY field matters: dims/reps/projections change the row
        # stride (stale strides silently truncate data on load) and the
        # seed changes the random projections (same shapes, broken
        # retrieval). scripts/rebuild_fde.py re-encodes an index.
        if stored != current:
            raise ValueError(
                f"index at {self.path} was built with a different FDE config: "
                f"stored={stored} configured={current}"
            )
        self.store_dtype = np.dtype(hdr.get("store_dtype", "float16"))
        fde_rows_on_disk = (self.path / "fde.bin").stat().st_size // (4 * self._fde_dim) if (
            self.path / "fde.bin"
        ).exists() else 0
        mv_tokens_on_disk = (self.path / "mv.bin").stat().st_size // (
            self.store_dtype.itemsize * self._dim
        ) if (self.path / "mv.bin").exists() else 0

        with open(self.path / "records.jsonl") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    op = json.loads(line)
                except json.JSONDecodeError:
                    logger.warning("truncated WAL line in %s — stopping replay", self.path)
                    break
                if op["op"] == "add":
                    row = self._count
                    if row >= fde_rows_on_disk or op["mv_off"] + op["n_tokens"] > mv_tokens_on_disk:
                        logger.warning("WAL references missing data in %s — stopping replay", self.path)
                        break
                    rec = IndexRecord(
                        document_id=op["document_id"],
                        chunk_number=op["chunk_number"],
                        metadata=op.get("metadata") or {},
                        content_key=op.get("content_key"),
                        n_tokens=op["n_tokens"],
                    )
                    self._max_tokens = max(self._max_tokens, rec.n_tokens)
                    sid = f"{rec.document_id}-{rec.chunk_number}"
                    old = self._id_to_row.get(sid)
                    if row >= len(self._alive):
                        alive = np.zeros(max(1024, 2 * (row + 1)), dtype=bool)
                        alive[: self._count] = self._alive[: self._count]
                        self._alive = alive
                    if old is not None and self._alive[old]:
                        self._alive[old] = False
                        self._dead += 1
                        self._doc_alive[rec.document_id] = (
                            self._doc_alive.get(rec.document_id, 1) - 1
                        )
                    self.records.append(rec)
                    self._mv_off.append(op["mv_off"])
                    self._alive[row] = True
                    self._id_to_row[sid] = row
                    self._doc_rows.setdefault(rec.document_id, []).append(row)
                    code = self._doc_index.setdefault(rec.document_id, len(self._doc_index))
                    self._row_code.append(code)
                    self._doc_alive[rec.document_id] = self._doc_alive.get(rec.document_id, 0) + 1
                    self._count += 1
                elif op["op"] == "del_doc":
                    for r in self._doc_rows.pop(op["document_id"], []):
                        if self._alive[r]:
                            self._alive[r] = False
                            self._dead += 1
                        sid = f"{self.records[r].document_id}-{self.records[r].chunk_number}"
                        self._id_to_row.pop(sid, None)
                    self._doc_alive.pop(op["document_id"], None)
        self._persisted = self._count
        # truncate orphan bytes (data appended but WAL write crashed) so
        # future appends stay row-aligned
        if fde_rows_on_disk > self._count:
            with open(self.path / "fde.bin", "r+b") as fh:
                fh.truncate(self._count * 4 * self._fde_dim)
        used_tokens = max(
            (self._mv_off[r] + self.records[r].n_tokens for r in range(self._count)),
            default=0,
        )
        if mv_tokens_on_disk > used_tokens:
            with open(self.path / "mv.bin", "r+b") as fh:
                fh.truncate(used_tokens * self.store_dtype.itemsize * self._dim)
        self._mv_file_tokens = used_tokens
        self._load_pooled_store(hdr)
        self._open_mmaps()

    def _load_pooled_store(self, hdr: dict) -> None:
        """Validate pooled.bin against the header's pooled meta and the
        replayed records; a mismatch (legacy index, factor/refine config
        change, short file) DISABLES the side-store — pooled rows are
        then computed on the fly until the next compaction rewrites the
        file under the current config. Derived data: never a load error."""
        from morphik_core_tpu.ops.pooling import pooled_token_count

        if self.pooled_tier_factor <= 1:
            self._pooled_store_ok = False
            return
        meta = hdr.get("pooled") or {}
        if (
            meta.get("factor") != self.pooled_tier_factor
            or meta.get("refine_iters") != self.pooled_refine_iters
        ):
            self._pooled_store_ok = False
            return
        pooled_p = self.path / "pooled.bin"
        on_disk = (
            pooled_p.stat().st_size // (self.store_dtype.itemsize * self._dim)
            if pooled_p.exists() else 0
        )
        offs: List[int] = []
        off = 0
        for r in range(self._count):
            offs.append(off)
            off += pooled_token_count(self.records[r].n_tokens, self.pooled_tier_factor)
        if on_disk < off:
            # rows were persisted without pooled data (older build /
            # crash between pooled append and WAL fsync is impossible —
            # pooled.bin is appended before the WAL — but a pre-pooled
            # index upgraded in place lands here)
            self._pooled_store_ok = False
            return
        if on_disk > off:  # orphan bytes from a crashed append
            with open(pooled_p, "r+b") as fh:
                fh.truncate(off * self.store_dtype.itemsize * self._dim)
        self._pooled_off = offs
        self._pooled_file_tokens = off
        self._pooled_store_ok = True

    def _load_legacy(self) -> None:
        """Migrate the round-1 snapshot layout (meta.json + fde.npy +
        multivectors/{row}.npy) to the append-only format by STREAMING
        rows into a side directory (bounded RAM — one .npy at a time,
        never the whole corpus), then committing with the same two-phase
        COMMIT swap compaction uses: a crash mid-migration discards the
        partial side build and retries from the intact legacy files; the
        swap itself deletes meta.json/multivectors. Dead rows are dropped
        on the way in (compact-on-migrate)."""
        with open(self.path / "meta.json") as fh:
            meta = json.load(fh)
        fde = np.load(self.path / "fde.npy", mmap_mode="r")
        mv_dir = self.path / "multivectors"
        tmp = self.path.with_name(self.path.name + ".compact")
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        n_alive = 0
        with open(tmp / "header.json", "w") as fh:
            json.dump(self._header(), fh)
        with open(tmp / "fde.bin", "wb") as fde_f, open(tmp / "mv.bin", "wb") as mv_f, open(
            tmp / "records.jsonl", "w"
        ) as wal_f:
            off_tokens = 0
            for i, rm in enumerate(meta["records"]):
                if not rm.get("alive", True):
                    continue
                f = mv_dir / f"{i}.npy"
                mv = np.load(f).astype(self.store_dtype) if f.exists() else np.zeros(
                    (0, self._dim), self.store_dtype
                )
                fde_f.write(np.ascontiguousarray(fde[i], dtype=np.float32).tobytes())
                mv_f.write(np.ascontiguousarray(mv).tobytes())
                wal_f.write(
                    json.dumps(
                        {
                            "op": "add",
                            "document_id": rm["document_id"],
                            "chunk_number": rm["chunk_number"],
                            "metadata": rm["metadata"],
                            "content_key": rm.get("content_key"),
                            # actual stored token count, NOT the metadata
                            # claim — mv_off accounting depends on it
                            "n_tokens": int(mv.shape[0]),
                            "mv_off": off_tokens,
                        },
                        default=str,
                    )
                    + "\n"
                )
                off_tokens += int(mv.shape[0])
                n_alive += 1
            for f in (fde_f, mv_f, wal_f):
                f.flush()
                os.fsync(f.fileno())
        with open(tmp / "COMMIT", "w") as fh:
            fh.flush()
            os.fsync(fh.fileno())
        _fsync_dir(tmp)
        # the swap also removes meta.json + multivectors/ (superseded)
        self._swap_compact_files(self.path, tmp)
        (self.path / "fde.npy").unlink(missing_ok=True)
        logger.info("migrated legacy snapshot at %s (%d alive rows)", self.path, n_alive)
        self._load()

    # ------------------------------------------------------------- compaction

    def _maybe_compact(self) -> None:
        if (
            self._count >= self.compact_min_rows
            and self.dead_fraction > self.compact_dead_fraction
        ):
            self.compact()

    _COMPACT_FILES = ("header.json", "records.jsonl", "fde.bin", "mv.bin", "pooled.bin")

    COMPACT_BATCH_ROWS = 4096  # streaming-copy granularity (bounds RSS)

    def compact(self) -> None:
        """Drop tombstoned rows: rewrite files (if persistent) and rebuild
        in-memory + device state. O(alive rows); amortized by the
        dead-fraction trigger.

        The persistent path STREAMS alive rows mmap -> side files in
        COMPACT_BATCH_ROWS chunks, so peak host RSS is bounded by one
        batch regardless of corpus size (a 1M-page index would otherwise
        materialize ~60 GB of multivectors + FDE rows in RAM exactly when
        the dead-fraction trigger fires).

        Crash safety (persistent case): the side directory is fully
        built first (this object's state untouched until it succeeds),
        then committed two-phase — a COMMIT marker makes the per-file
        os.replace swap resumable by `recover_compact` on the next load.
        A failure during the build leaves the live index exactly as it
        was."""
        with self._lock:
            if self.path and self.path.exists():
                kept = self._compact_streaming()
                self._reload_from_disk()
            else:
                keep = [r for r in range(self._count) if self._alive[r]]
                new_records = [
                    IndexRecord(
                        document_id=self.records[r].document_id,
                        chunk_number=self.records[r].chunk_number,
                        metadata=self.records[r].metadata,
                        content_key=self.records[r].content_key,
                        n_tokens=self.records[r].n_tokens,
                    )
                    for r in keep
                ]
                new_mvs = [np.asarray(self._mv_row(r)) for r in keep]
                new_fde = (
                    np.stack([np.asarray(self._fde_rows(r, r + 1)[0]) for r in keep])
                    if keep else np.zeros((0, self._fde_dim), np.float32)
                )
                new_id_to_row: Dict[str, int] = {}
                new_doc_rows: Dict[str, List[int]] = {}
                for new_row, rec in enumerate(new_records):
                    new_id_to_row[f"{rec.document_id}-{rec.chunk_number}"] = new_row
                    new_doc_rows.setdefault(rec.document_id, []).append(new_row)
                self._reset_state(new_records, [f for f in new_fde], new_mvs,
                                  new_id_to_row, new_doc_rows)
                kept = len(new_records)
            logger.info("compacted index: %d rows kept", kept)

    def _compact_streaming(self) -> int:
        """Phase 1+2 of a persistent compaction: stream alive rows into a
        side directory in bounded chunks, then COMMIT + swap. Returns the
        number of surviving rows. Caller reloads in-memory state."""
        tmp = self.path.with_name(self.path.name + ".compact")
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        kept = 0
        with open(tmp / "header.json", "w") as fh:
            json.dump(self._header(), fh)
        write_pooled = self.pooled_tier_factor > 1
        pooled_f = open(tmp / "pooled.bin", "wb") if write_pooled else None
        with open(tmp / "fde.bin", "wb") as fde_f, open(tmp / "mv.bin", "wb") as mv_f, open(
            tmp / "records.jsonl", "w"
        ) as wal_f:
            off_tokens = 0
            batch_fde: List[np.ndarray] = []
            batch_mv: List[bytes] = []
            batch_pooled: List[bytes] = []
            batch_lines: List[str] = []

            def flush_batch() -> None:
                if batch_fde:
                    fde_f.write(np.stack(batch_fde).tobytes())
                if batch_mv:
                    mv_f.write(b"".join(batch_mv))
                if pooled_f is not None and batch_pooled:
                    pooled_f.write(b"".join(batch_pooled))
                wal_f.write("".join(line + "\n" for line in batch_lines))
                batch_fde.clear()
                batch_mv.clear()
                batch_pooled.clear()
                batch_lines.clear()

            for r in range(self._count):
                if not self._alive[r]:
                    continue
                rec = self.records[r]
                mv = np.ascontiguousarray(self._mv_row(r), dtype=self.store_dtype)
                batch_fde.append(np.asarray(self._fde_rows(r, r + 1)[0], np.float32))
                batch_mv.append(mv.tobytes())
                if write_pooled:
                    # stream-copy from the live side-store when valid,
                    # (re)compute otherwise — compaction is the heal
                    # path that re-enables a disabled pooled store
                    pv = (
                        self._pooled_row(r).astype(self.store_dtype)
                        if self._pooled_store_ok else self._pool_row(mv)
                    )
                    batch_pooled.append(np.ascontiguousarray(pv).tobytes())
                batch_lines.append(
                    json.dumps(
                        {
                            "op": "add",
                            "document_id": rec.document_id,
                            "chunk_number": rec.chunk_number,
                            "metadata": rec.metadata,
                            "content_key": rec.content_key,
                            "n_tokens": rec.n_tokens,
                            "mv_off": off_tokens,
                        },
                        default=str,
                    )
                )
                off_tokens += rec.n_tokens
                kept += 1
                if len(batch_lines) >= self.COMPACT_BATCH_ROWS:
                    flush_batch()
            flush_batch()
            # side files durable BEFORE the COMMIT marker: recovery
            # replays the swap assuming their contents are complete
            durable = [fde_f, mv_f, wal_f] + ([pooled_f] if pooled_f else [])
            for f in durable:
                f.flush()
                os.fsync(f.fileno())
        if pooled_f is not None:
            pooled_f.close()
        # COMMIT marker, made DURABLE before any rename — a crash must
        # never see replaced files without the marker (recover_compact
        # would discard tmp and leave a mixed old/new live dir)
        with open(tmp / "COMMIT", "w") as fh:
            fh.flush()
            os.fsync(fh.fileno())
        _fsync_dir(tmp)
        self._swap_compact_files(self.path, tmp)
        return kept

    @classmethod
    def _swap_compact_files(cls, path: Path, tmp: Path) -> None:
        """Phase 2 of compaction: move the side-built files over the live
        ones. Idempotent — re-runnable after a crash at any point."""
        for name in cls._COMPACT_FILES:
            src = tmp / name
            if src.exists():
                os.replace(src, path / name)
            elif name == "pooled.bin":
                # a tier-off compaction must not leave a stale pooled.bin
                # behind (its offsets no longer match the renumbered rows)
                (path / name).unlink(missing_ok=True)
        _fsync_dir(path)
        # legacy snapshot files are superseded
        (path / "meta.json").unlink(missing_ok=True)
        legacy = path / "multivectors"
        if legacy.exists():
            shutil.rmtree(legacy, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)

    @classmethod
    def recover_compact(cls, path: Path) -> bool:
        """Finish (COMMIT marker present) or discard (no marker) an
        interrupted compaction. Returns True if a swap was completed."""
        tmp = Path(path).with_name(Path(path).name + ".compact")
        if not tmp.exists():
            return False
        if (tmp / "COMMIT").exists():
            logger.warning("completing interrupted compaction at %s", path)
            cls._swap_compact_files(Path(path), tmp)
            return True
        logger.warning("discarding incomplete compaction build at %s", tmp)
        shutil.rmtree(tmp, ignore_errors=True)
        return False

    def _reload_from_disk(self) -> None:
        """Re-derive ALL in-memory + device state from the on-disk files
        (used after a compaction swap)."""
        self.records = []
        self._id_to_row = {}
        self._doc_rows = {}
        self._alive = np.zeros(0, dtype=bool)
        self._count = 0
        self._dead = 0
        self._doc_index = {}
        self._doc_alive = {}
        self._row_code = []
        self._persisted = 0
        self._mv_off = []
        self._fde_mm = None
        self._mv_mm = None
        self._fde_pending = []
        self._mv_pending = []
        self._wal_buffer = []
        self._mv_file_tokens = 0
        self._pooled_pending = []
        self._pooled_off = []
        self._pooled_mm = None
        self._pooled_file_tokens = 0
        self._pooled_store_ok = self.pooled_tier_factor > 1
        self._max_tokens = 0
        self._reset_device_state()
        self._invalidate_all_caches()  # row ids were renumbered
        self._load()

    def _reset_device_state(self) -> None:
        self._dev_blocks = []
        self._dev_rows = 0
        self._mask_blocks = []
        self._mask_rows = 0
        self._code_blocks = []
        self._code_rows = 0
        self._allowed_ones = {}
        self._zeros_codes_cache = None
        self._mesh_zeros_cache = None
        self._mesh_blocks = []
        self._mesh_dev_rows = 0
        self._mesh_mask_blocks = []
        self._mesh_mask_rows = 0
        self._mesh_code_blocks = []
        self._mesh_code_rows = 0
        self._pooled_blocks = []
        self._pooled_scales = []
        self._pooled_rows = 0
        self._pooled_bucket = 0
        self._mesh_pooled_blocks = []
        self._mesh_pooled_scales = []
        self._mesh_pooled_rows = 0

    def _reset_state(self, records, fde_pending, mv_pending, id_to_row, doc_rows) -> None:
        self.records = records
        self._fde_pending = fde_pending
        self._mv_pending = mv_pending
        self._id_to_row = id_to_row
        self._doc_rows = doc_rows
        self._count = len(records)
        self._dead = 0
        self._persisted = 0
        self._mv_off = [-1] * self._count
        self._mv_file_tokens = 0
        self._fde_mm = None
        self._mv_mm = None
        self._pooled_mm = None
        self._pooled_file_tokens = 0
        self._pooled_store_ok = self.pooled_tier_factor > 1
        self._pooled_off = [-1] * self._count if self._pooled_store_ok else []
        self._pooled_pending = (
            [self._pool_row(mv) for mv in mv_pending] if self._pooled_store_ok else []
        )
        alive = np.zeros(max(1024, 2 * max(self._count, 1)), dtype=bool)
        alive[: self._count] = True
        self._alive = alive
        self._doc_index = {}
        self._doc_alive = {}
        self._row_code = []
        self._max_tokens = 0
        for rec in records:
            code = self._doc_index.setdefault(rec.document_id, len(self._doc_index))
            self._row_code.append(code)
            self._doc_alive[rec.document_id] = self._doc_alive.get(rec.document_id, 0) + 1
            self._max_tokens = max(self._max_tokens, rec.n_tokens)
        self._wal_buffer = [
            {
                "op": "add",
                "document_id": r.document_id,
                "chunk_number": r.chunk_number,
                "metadata": r.metadata,
                "content_key": r.content_key,
                "n_tokens": r.n_tokens,
            }
            for r in records
        ]
        self._reset_device_state()
        self._invalidate_all_caches()  # compaction renumbers rows
