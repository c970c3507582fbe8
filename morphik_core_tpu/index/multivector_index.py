"""In-process, mesh-shardable multivector index.

Replaces the reference's two external retrieval backends with one
TPU-resident structure (SURVEY.md §7 stage 2):

  reference FastMultiVectorStore = Turbopuffer ANN (FDE vectors)
      + S3/.npy multivector payloads + torch CPU/GPU rerank
      (core/vector_store/fast_multivector_store.py:295-605)
  reference MultiVectorStore     = Postgres BIT(128)[] + SQL max_sim
      (core/vector_store/multi_vector_store.py:39-980)

Here:
  - FDE vectors live in a device buffer (replicated on 1 chip, sharded
    over the mesh's "data" axis on a pod), grown by power-of-2
    capacity doubling so compiled programs are reused.
  - Query = FDE matvec + local top-k + tiny ICI merge
    (parallel/search.py), pool size min(multiplier*k, cap) like the
    reference (fast_multivector_store.py:529-532).
  - Exact MaxSim rerank of the pool runs through the Pallas kernel
    (ops/maxsim.py) over bucket-padded candidate multivectors.
  - Full multivectors are kept host-side (numpy, fp16 by default) and
    persisted as .npy under the index dir — same durable layout idea
    as the reference's multivector/{doc_id}/{chunk}.npy objects.
  - Authorization filtering = a validity mask built from doc ids
    (reference pre-filters ANN with document_id In [...]).
"""

from __future__ import annotations

import json
import logging
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

logger = logging.getLogger(__name__)


@dataclass
class IndexRecord:
    document_id: str
    chunk_number: int
    metadata: Dict[str, Any] = field(default_factory=dict)
    content_key: Optional[str] = None  # storage key of the chunk payload
    n_tokens: int = 0


def _round_capacity(n: int, minimum: int = 1024) -> int:
    c = minimum
    while c < n:
        c *= 2
    return c


class MultiVectorIndex:
    """One namespace (app) worth of chunk multivectors."""

    def __init__(
        self,
        fde_config: Optional[FDEConfig] = None,
        *,
        mesh=None,
        prefilter_multiplier: int = 10,
        prefilter_cap: int = 75,
        store_dtype=np.float16,
        path: Optional[str | Path] = None,
        use_pallas: Optional[bool] = None,
    ):
        self.fde_config = fde_config or FDEConfig()
        self.mesh = mesh
        self.prefilter_multiplier = prefilter_multiplier
        self.prefilter_cap = prefilter_cap
        self.store_dtype = store_dtype
        self.use_pallas = use_pallas
        self.path = Path(path) if path else None

        self._lock = threading.RLock()
        self.records: List[IndexRecord] = []
        self.multivectors: List[np.ndarray] = []  # host copies (n_tokens, d)
        self._id_to_row: Dict[str, int] = {}  # "docid-chunkno" -> row
        self._doc_rows: Dict[str, List[int]] = {}
        self._alive = np.zeros(0, dtype=bool)

        self._fde_dim = self.fde_config.fde_dim
        self._capacity = 0
        self._count = 0
        self._fde_host = np.zeros((0, self._fde_dim), dtype=np.float32)
        self._fde_dev = None  # device copy, refreshed lazily
        self._dev_dirty = True

        if self.path and (self.path / "meta.json").exists():
            self._load()

    # ------------------------------------------------------------------ size

    def __len__(self) -> int:
        return int(self._alive[: self._count].sum()) if self._count else 0

    @property
    def count_rows(self) -> int:
        return self._count

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
            if need > self._capacity:
                self._grow(need)
            for mv, rec, fv in zip(multivectors, records, fde_vectors):
                sid = f"{rec.document_id}-{rec.chunk_number}"
                old = self._id_to_row.get(sid)
                if old is not None:
                    self._alive[old] = False
                row = self._count
                rec.n_tokens = int(mv.shape[0])
                self.records.append(rec)
                self.multivectors.append(np.asarray(mv, dtype=self.store_dtype))
                self._fde_host[row] = fv
                self._alive[row] = True
                self._id_to_row[sid] = row
                self._doc_rows.setdefault(rec.document_id, []).append(row)
                self._count += 1
                ids.append(sid)
            self._dev_dirty = True
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
                    n += 1
                sid = f"{self.records[r].document_id}-{self.records[r].chunk_number}"
                self._id_to_row.pop(sid, None)
                self.multivectors[r] = np.zeros((0, self.fde_config.dimension), self.store_dtype)
            if n:
                self._dev_dirty = True
            return n

    def _grow(self, need: int) -> None:
        new_cap = _round_capacity(need)
        fde = np.zeros((new_cap, self._fde_dim), dtype=np.float32)
        fde[: self._count] = self._fde_host[: self._count]
        alive = np.zeros(new_cap, dtype=bool)
        alive[: self._count] = self._alive[: self._count]
        self._fde_host, self._alive, self._capacity = fde, alive, new_cap
        self._dev_dirty = True

    # ----------------------------------------------------------------- query

    def _device_fde(self):
        if self._dev_dirty or self._fde_dev is None:
            buf = self._fde_host[: self._capacity]
            if self.mesh is not None:
                from morphik_core_tpu.parallel.search import shard_rows

                self._fde_dev = jax.device_put(buf, shard_rows(self.mesh))
            else:
                self._fde_dev = jnp.asarray(buf)
            self._dev_dirty = False
        return self._fde_dev

    def _valid_mask(self, doc_ids: Optional[Sequence[str]]) -> np.ndarray:
        mask = self._alive[: self._capacity].copy()
        if doc_ids is not None:
            allowed = np.zeros(self._capacity, dtype=bool)
            for d in doc_ids:
                for r in self._doc_rows.get(d, []):
                    allowed[r] = True
            mask &= allowed
        return mask

    def query(
        self,
        query_embedding: np.ndarray,
        k: int,
        doc_ids: Optional[Sequence[str]] = None,
        return_timing: bool = False,
    ) -> List[Tuple[IndexRecord, float]]:
        """Two-stage search: FDE ANN pool -> exact MaxSim rerank -> top-k.
        Returns [(record, score)] best-first."""
        t0 = time.perf_counter()
        if self._count == 0 or k <= 0:
            return []
        q = np.asarray(query_embedding, dtype=np.float32)
        qe = np.asarray(fde_query(jnp.asarray(q), self.fde_config))
        t1 = time.perf_counter()

        pool_size = min(self.prefilter_multiplier * k, self.prefilter_cap)
        pool_size = min(max(pool_size, k), self._capacity)
        mask = self._valid_mask(doc_ids)
        if not mask.any():
            return []
        f = self._device_fde()
        if self.mesh is not None:
            from morphik_core_tpu.parallel.search import make_sharded_search, shard_vec

            search = make_sharded_search(self.mesh, pool_size)
            mask_dev = jax.device_put(mask.astype(np.float32), shard_vec(self.mesh))
            scores, idx = search(f, jnp.asarray(qe), mask_dev)
        else:
            from morphik_core_tpu.parallel.search import single_device_search

            scores, idx = single_device_search(f, jnp.asarray(qe), jnp.asarray(mask.astype(np.float32)), pool_size)
        idx = np.asarray(idx)
        pool = [int(i) for i, s in zip(idx, np.asarray(scores)) if np.isfinite(s)]
        t2 = time.perf_counter()
        if not pool:
            return []

        # exact rerank of the pool
        cand = [self.multivectors[r].astype(np.float32) for r in pool]
        dense, dmask = pad_multivectors(cand)
        rescores = np.asarray(
            maxsim_scores(jnp.asarray(q), jnp.asarray(dense), jnp.asarray(dmask), use_pallas=self.use_pallas)
        )
        order = np.argsort(-rescores)[: min(k, len(pool))]
        t3 = time.perf_counter()
        if return_timing:
            logger.info(
                "index.query timing encode=%.1fms ann=%.1fms rerank=%.1fms pool=%d",
                (t1 - t0) * 1e3, (t2 - t1) * 1e3, (t3 - t2) * 1e3, len(pool),
            )
        return [(self.records[pool[i]], float(rescores[i])) for i in order]

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
        return self.multivectors[row].astype(np.float32)

    # ------------------------------------------------------------- persistence

    def save(self) -> None:
        """Durable snapshot: meta.json + fde.npy + mv_{row}.npy payloads."""
        if not self.path:
            raise ValueError("index created without a path")
        with self._lock:
            self.path.mkdir(parents=True, exist_ok=True)
            meta = {
                "count": self._count,
                "fde": {
                    "dimension": self.fde_config.dimension,
                    "num_repetitions": self.fde_config.num_repetitions,
                    "num_simhash_projections": self.fde_config.num_simhash_projections,
                    "projection_dimension": self.fde_config.projection_dimension,
                    "projection_type": self.fde_config.projection_type,
                    "seed": self.fde_config.seed,
                },
                "records": [
                    {
                        "document_id": r.document_id,
                        "chunk_number": r.chunk_number,
                        "metadata": r.metadata,
                        "content_key": r.content_key,
                        "n_tokens": r.n_tokens,
                        "alive": bool(self._alive[i]),
                    }
                    for i, r in enumerate(self.records)
                ],
            }
            with open(self.path / "meta.json", "w") as fh:
                json.dump(meta, fh)
            np.save(self.path / "fde.npy", self._fde_host[: self._count])
            mv_dir = self.path / "multivectors"
            mv_dir.mkdir(exist_ok=True)
            for i, mv in enumerate(self.multivectors):
                if self._alive[i]:
                    np.save(mv_dir / f"{i}.npy", mv)

    def _load(self) -> None:
        with open(self.path / "meta.json") as fh:
            meta = json.load(fh)
        fde = np.load(self.path / "fde.npy")
        n = meta["count"]
        self._capacity = _round_capacity(max(n, 1))
        self._fde_host = np.zeros((self._capacity, self._fde_dim), dtype=np.float32)
        self._fde_host[:n] = fde
        self._alive = np.zeros(self._capacity, dtype=bool)
        self._count = n
        mv_dir = self.path / "multivectors"
        for i, rm in enumerate(meta["records"]):
            rec = IndexRecord(
                document_id=rm["document_id"],
                chunk_number=rm["chunk_number"],
                metadata=rm["metadata"],
                content_key=rm.get("content_key"),
                n_tokens=rm.get("n_tokens", 0),
            )
            self.records.append(rec)
            alive = rm.get("alive", True)
            self._alive[i] = alive
            f = mv_dir / f"{i}.npy"
            if alive and f.exists():
                self.multivectors.append(np.load(f))
            else:
                self.multivectors.append(np.zeros((0, self.fde_config.dimension), self.store_dtype))
            if alive:
                self._id_to_row[f"{rec.document_id}-{rec.chunk_number}"] = i
                self._doc_rows.setdefault(rec.document_id, []).append(i)
        self._dev_dirty = True
