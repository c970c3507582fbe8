"""Binary-quantized multivector index — the 'postgres provider' parity
path (reference core/vector_store/multi_vector_store.py:39-980): every
token quantized to 128 bits (32x compression), retrieval = EXACT binary
MaxSim over all authorized rows (the reference's SQL `max_sim` over
BIT(128)[] columns), here an on-device XOR+popcount scan.

Storage: packed uint8 (rows, token_bucket, d/8) padded to a bucket, with
fp32 multivectors optionally retained host-side for fidelity reranking.
"""

from __future__ import annotations

import logging
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from morphik_core_tpu.index.multivector_index import IndexRecord, _round_capacity
from morphik_core_tpu.ops.binary import binary_maxsim_scores
from morphik_core_tpu.utils.fast_ops import binary_quantize_packed

logger = logging.getLogger(__name__)


class BinaryMultiVectorIndex:
    def __init__(
        self,
        dim: int = 128,
        token_bucket: int = 1024,
        block_rows: int = 4096,
        device_budget_bytes: int = 4 * 1024**3,
    ):
        self.dim = dim
        self.token_bucket = token_bucket
        self.block_rows = block_rows
        # Up to this many packed bytes stay RESIDENT in device memory so
        # queries scan HBM instead of re-uploading blocks (host->device
        # per query is the reference postgres-provider's equivalent of
        # table scans; residency is the TPU-native win). Beyond the
        # budget, the scan streams blocks.
        self.device_budget_bytes = device_budget_bytes
        self._lock = threading.RLock()
        self.records: List[IndexRecord] = []
        self._id_to_row: Dict[str, int] = {}
        self._doc_rows: Dict[str, List[int]] = {}
        self._capacity = 0
        self._count = 0
        self._bits: Optional[np.ndarray] = None  # (cap, bucket, dim//8) uint8
        self._ntok: Optional[np.ndarray] = None  # (cap,)
        self._alive = np.zeros(0, dtype=bool)
        self._device_bits = None  # jax array cache of _bits[:count]
        self._device_tokmask = None
        self._device_count = 0  # rows covered by the device cache

    def __len__(self) -> int:
        return int(self._alive[: self._count].sum()) if self._count else 0

    def _grow(self, need: int) -> None:
        cap = _round_capacity(need)
        bits = np.zeros((cap, self.token_bucket, self.dim // 8), dtype=np.uint8)
        ntok = np.zeros(cap, dtype=np.int32)
        alive = np.zeros(cap, dtype=bool)
        if self._count:
            bits[: self._count] = self._bits[: self._count]
            ntok[: self._count] = self._ntok[: self._count]
            alive[: self._count] = self._alive[: self._count]
        self._bits, self._ntok, self._alive, self._capacity = bits, ntok, alive, cap

    def store(self, multivectors: Sequence[np.ndarray], records: Sequence[IndexRecord]) -> List[str]:
        ids = []
        with self._lock:
            if self._count + len(records) > self._capacity:
                self._grow(self._count + len(records))
            for mv, rec in zip(multivectors, records):
                mv = np.asarray(mv, dtype=np.float32)[: self.token_bucket]
                packed = binary_quantize_packed(mv)
                sid = f"{rec.document_id}-{rec.chunk_number}"
                old = self._id_to_row.get(sid)
                if old is not None:
                    self._alive[old] = False
                row = self._count
                rec.n_tokens = mv.shape[0]
                self.records.append(rec)
                self._bits[row, : packed.shape[0]] = packed
                self._ntok[row] = packed.shape[0]
                self._alive[row] = True
                self._id_to_row[sid] = row
                self._doc_rows.setdefault(rec.document_id, []).append(row)
                self._count += 1
                ids.append(sid)
        return ids

    def delete_document(self, document_id: str) -> int:
        with self._lock:
            rows = self._doc_rows.pop(document_id, [])
            n = 0
            for r in rows:
                if self._alive[r]:
                    self._alive[r] = False
                    n += 1
                self._id_to_row.pop(f"{document_id}-{self.records[r].chunk_number}", None)
            return n

    def get_chunks_by_id(self, chunk_ids: Sequence[Tuple[str, int]]) -> List[Optional[IndexRecord]]:
        out = []
        for doc_id, chunk_no in chunk_ids:
            row = self._id_to_row.get(f"{doc_id}-{chunk_no}")
            out.append(self.records[row] if row is not None and self._alive[row] else None)
        return out

    def save(self) -> None:  # interface parity; binary provider is rebuildable
        logger.debug("binary index save() is a no-op (rebuilt from multivector payloads)")

    def query(
        self,
        query_embedding: np.ndarray,
        k: int,
        doc_ids: Optional[Sequence[str]] = None,
        return_timing: bool = False,
    ) -> List[Tuple[IndexRecord, float]]:
        """Exact binary MaxSim over all (authorized) rows, blocked scan."""
        if self._count == 0 or k <= 0:
            return []
        q_packed = binary_quantize_packed(np.asarray(query_embedding, np.float32))
        mask_rows = self._alive[: self._count].copy()
        if doc_ids is not None:
            allowed = np.zeros(self._count, dtype=bool)
            for d in doc_ids:
                for r in self._doc_rows.get(d, []):
                    if r < self._count:
                        allowed[r] = True
            mask_rows &= allowed
        if not mask_rows.any():
            return []

        qj = jnp.asarray(q_packed)
        scores = np.full(self._count, -np.inf, dtype=np.float32)

        resident = self._ensure_device_cache()
        if resident:
            # one device scan over ALL resident rows; row filter applied host-side
            all_scores = np.asarray(
                binary_maxsim_scores(qj, self._device_bits, self._device_tokmask, dim=self.dim)
            )
            covered = min(self._device_count, self._count)
            sel = mask_rows[:covered]
            scores[:covered][sel] = all_scores[:covered][sel]
            start_stream = covered
        else:
            start_stream = 0
        idx_all = np.nonzero(mask_rows)[0]
        idx_all = idx_all[idx_all >= start_stream]
        for s in range(0, len(idx_all), self.block_rows):
            rows = idx_all[s : s + self.block_rows]
            bits = jnp.asarray(self._bits[rows])
            tok_mask = (np.arange(self.token_bucket)[None, :] < self._ntok[rows][:, None]).astype(np.float32)
            block_scores = np.asarray(binary_maxsim_scores(qj, bits, jnp.asarray(tok_mask), dim=self.dim))
            scores[rows] = block_scores
        top = np.argsort(-scores)[: min(k, int(mask_rows.sum()))]
        return [(self.records[int(i)], float(scores[int(i)])) for i in top if np.isfinite(scores[int(i)])]

    def _ensure_device_cache(self) -> bool:
        """Keep bits[:count] resident on device under the byte budget.
        The cache only ever EXTENDS (rows are append-only; deletes are
        host-side alive-mask filtering), so stores invalidate nothing."""
        nbytes = self._count * self.token_bucket * (self.dim // 8)
        if self._count == 0 or nbytes > self.device_budget_bytes:
            return False
        if self._device_count != self._count:
            self._device_bits = jnp.asarray(self._bits[: self._count])
            tok_mask = (
                np.arange(self.token_bucket)[None, :] < self._ntok[: self._count][:, None]
            ).astype(np.float32)
            self._device_tokmask = jnp.asarray(tok_mask)
            self._device_count = self._count
        return True
