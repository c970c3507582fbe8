"""Device-resident LRU cache of rerank-candidate multivectors.

The reference keeps hot multivectors in a disk LRU so retrieval reads
storage "cache-first" (FileCacheManager, reference
core/vector_store/fast_multivector_store.py:69-292, 713-774). On TPU
the equivalent hot tier is HBM: a fixed pool of (token_bucket, dim)
slots living next to the FDE index. A query's candidate rows that are
already resident are gathered ON DEVICE; only misses pay the host mmap
read + host->device transfer, and inserting them into the pool doubles
as the upload. One fused jit performs insert + gather + exact MaxSim,
so a fully-warm query costs a single dispatch with zero bulk transfer.

Eviction is host-side LRU over slot ids; upserts/deletes invalidate by
row id. Rows longer than the slot bucket bypass the cache (the caller
falls back to the direct upload path).
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from morphik_core_tpu.ops.maxsim import maxsim_scores
from morphik_core_tpu.parallel.search import quantize_rows_int8


def _round_pow2(n: int, minimum: int = 8) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def _token_tile(bucket: int) -> int:
    """Largest MOSAIC-LEGAL kernel token tile that divides the slot
    bucket (the q8 kernel core takes pre-padded arrays: N %% tile == 0,
    no implicit padding). Pow-2 slot buckets always landed on a legal
    tile by luck; `legal_token_tile` makes the guarantee explicit —
    tile is a 128-multiple or the full bucket width."""
    from morphik_core_tpu.ops.maxsim import legal_token_tile

    return legal_token_tile(bucket)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _insert(buf, mbuf, new_rows, new_masks, slots):
    """Scatter `new_rows` into the pool at `slots` (donated buffers —
    the update happens in place on device)."""
    buf = buf.at[slots].set(new_rows.astype(buf.dtype))
    mbuf = mbuf.at[slots].set(new_masks)
    return buf, mbuf


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _insert_q8(buf, sbuf, mbuf, new_q8, new_scales, new_masks, slots):
    buf = buf.at[slots].set(new_q8)
    sbuf = sbuf.at[slots].set(new_scales)
    mbuf = mbuf.at[slots].set(new_masks)
    return buf, sbuf, mbuf


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def _gather_and_score(buf, mbuf, gather_idx, q, use_pallas: bool):
    dense = buf[gather_idx]
    dmask = mbuf[gather_idx]
    return maxsim_scores(q, dense, dmask, use_pallas=use_pallas)


@functools.partial(jax.jit, static_argnames=("token_tile", "interpret"))
def _gather_and_score_q8(buf, sbuf, mbuf, gather_idx, q8, qs, token_tile: int, interpret: bool):
    from morphik_core_tpu.ops.maxsim import _maxsim_pallas_q8

    return _maxsim_pallas_q8(
        q8, qs, buf[gather_idx], sbuf[gather_idx], mbuf[gather_idx],
        candidate_tile=8, token_tile=token_tile, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=())
def _gather_and_score_q8_ref(buf, sbuf, mbuf, gather_idx, q8, qs):
    """CPU path: dequantize the gathered pool and run the XLA reference
    (same quantization as the kernel — backend-consistent scores)."""
    from morphik_core_tpu.ops.maxsim import maxsim_scores_ref

    deq_d = buf[gather_idx].astype(jnp.float32) * sbuf[gather_idx][:, :, None]
    deq_q = q8.astype(jnp.float32) * qs[0][:, None]
    return maxsim_scores_ref(deq_q, deq_d, mbuf[gather_idx])


class DevicePoolCache:
    def __init__(self, slots: int, token_bucket: int, dim: int, dtype=jnp.bfloat16,
                 quantized: bool = False):
        """`quantized=True` stores slots as per-token int8 + scale —
        half the HBM per slot (2x capacity at the same budget) and the
        int8 MXU rate in the rerank kernel; fidelity stays far above the
        reference's 1-bit postgres rerank."""
        self.slots = int(slots)
        self.token_bucket = int(token_bucket)
        if quantized and self.token_bucket % 8:
            raise ValueError(
                f"quantized cache needs token_bucket % 8 == 0, got {token_bucket}"
            )
        self.dim = int(dim)
        self.quantized = bool(quantized)
        slot_dtype = jnp.int8 if quantized else dtype
        self._buf = jnp.zeros((self.slots, self.token_bucket, self.dim), slot_dtype)
        self._sbuf = (
            jnp.ones((self.slots, self.token_bucket), jnp.float32) if quantized else None
        )
        self._mbuf = jnp.zeros((self.slots, self.token_bucket), jnp.float32)
        self._row_to_slot: "OrderedDict[int, int]" = OrderedDict()  # LRU: oldest first
        self._slot_to_row: Dict[int, int] = {}
        self._free: List[int] = list(range(self.slots))
        self.hits = 0
        self.misses = 0

    # ------------------------------------------------------------- state

    def resident(self, rows: Sequence[int]) -> bool:
        """True when every row is already cached (a fully-warm pool can
        skip the pooled prefilter and score on device with zero
        transfer)."""
        return all(r in self._row_to_slot for r in rows)

    def invalidate(self, row: int) -> None:
        slot = self._row_to_slot.pop(row, None)
        if slot is not None:
            self._slot_to_row.pop(slot, None)
            self._free.append(slot)

    def invalidate_all(self) -> None:
        self._row_to_slot.clear()
        self._slot_to_row.clear()
        self._free = list(range(self.slots))

    def _alloc(self, n: int, protected: frozenset) -> List[int]:
        """Free/evict `n` slots, never evicting `protected` rows (the
        current query's pool — its hits haven't been LRU-touched yet).
        Safe: pool_size <= slots guarantees enough unprotected victims."""
        out = []
        while len(out) < n:
            if self._free:
                out.append(self._free.pop())
                continue
            row, slot = next(iter(self._row_to_slot.items()))  # LRU first
            if row in protected:
                self._row_to_slot.move_to_end(row)
                continue
            del self._row_to_slot[row]
            self._slot_to_row.pop(slot, None)
            out.append(slot)
        return out

    # ------------------------------------------------------------- query

    def score(
        self,
        pool_rows: Sequence[int],
        q: np.ndarray,
        fetch_row,  # row -> (n_tokens, dim) np array in store dtype
        n_tokens,  # row -> int
        use_pallas: Optional[bool],
    ) -> Optional[np.ndarray]:
        """Exact MaxSim scores for `pool_rows` (in order), insert-on-miss.
        Returns None when any row exceeds the slot bucket (caller falls
        back to the direct path)."""
        if any(n_tokens(r) > self.token_bucket for r in pool_rows):
            return None
        misses = [r for r in pool_rows if r not in self._row_to_slot]
        if misses:
            # bucket the insert batch to a multiple of 8: a fresh compile
            # per distinct miss count would dominate cold queries, while
            # pow-2 padding would UPLOAD up to 2x the miss bytes (the
            # insert is the one transfer a cold rescore pays). Padding
            # repeats the LAST miss (same slot, same data — the duplicate
            # scatter writes are idempotent). 16-bit (or int8+scale)
            # upload.
            m_pad = max(8, -(-len(misses) // 8) * 8)
            up_dtype = np.int8 if self.quantized else np.float16
            new = np.zeros((m_pad, self.token_bucket, self.dim), up_dtype)
            scales = np.ones((m_pad, self.token_bucket), np.float32) if self.quantized else None
            masks = np.zeros((m_pad, self.token_bucket), np.float32)
            if self.quantized:
                # ONE batched quantization pass over the dense miss
                # buffer (a per-row loop costs ~1 ms/row of numpy temp
                # churn — material on cold 75-row pools)
                dense = np.zeros((len(misses), self.token_bucket, self.dim), np.float32)
                for j, r in enumerate(misses):
                    mv = np.asarray(fetch_row(r), dtype=np.float32)
                    dense[j, : mv.shape[0]] = mv
                    masks[j, : mv.shape[0]] = 1.0
                q8, sc = quantize_rows_int8(dense)
                new[: len(misses)] = q8
                scales[: len(misses)] = sc
            else:
                for j, r in enumerate(misses):
                    mv = np.asarray(fetch_row(r), dtype=np.float32)
                    n = mv.shape[0]
                    new[j, :n] = mv.astype(np.float16)
                    masks[j, :n] = 1.0
            slots = self._alloc(len(misses), frozenset(pool_rows))
            new[len(misses):] = new[len(misses) - 1]
            masks[len(misses):] = masks[len(misses) - 1]
            slot_arr = np.asarray(slots + [slots[-1]] * (m_pad - len(slots)), np.int32)
            if self.quantized:
                scales[len(misses):] = scales[len(misses) - 1]
                self._buf, self._sbuf, self._mbuf = _insert_q8(
                    self._buf, self._sbuf, self._mbuf, jnp.asarray(new),
                    jnp.asarray(scales), jnp.asarray(masks), jnp.asarray(slot_arr),
                )
            else:
                self._buf, self._mbuf = _insert(
                    self._buf, self._mbuf, jnp.asarray(new), jnp.asarray(masks),
                    jnp.asarray(slot_arr),
                )
            for r, s in zip(misses, slots):
                self._row_to_slot[r] = s
                self._slot_to_row[s] = r
        self.hits += len(pool_rows) - len(misses)
        self.misses += len(misses)
        # LRU touch in query order
        gather = []
        for r in pool_rows:
            self._row_to_slot.move_to_end(r)
            gather.append(self._row_to_slot[r])
        if use_pallas is None:
            from morphik_core_tpu.ops.maxsim import default_use_pallas

            use_pallas = default_use_pallas()
        # pow-2 bucket the gather too (pool size varies with k); padded
        # entries repeat the last slot and are sliced off after
        g_pad = _round_pow2(len(gather))
        g_arr = np.asarray(gather + [gather[-1]] * (g_pad - len(gather)), np.int32)
        if self.quantized:
            from morphik_core_tpu.ops.maxsim import quantize_query_q8

            # same quantize+pad recipe as the cold path -> identical
            # kernel shapes for cached and uncached reranks
            q8, qs = quantize_query_q8(q)
            if use_pallas:
                scores = _gather_and_score_q8(
                    self._buf, self._sbuf, self._mbuf, jnp.asarray(g_arr),
                    jnp.asarray(q8), jnp.asarray(qs),
                    token_tile=_token_tile(self.token_bucket), interpret=False,
                )
            else:
                scores = _gather_and_score_q8_ref(
                    self._buf, self._sbuf, self._mbuf, jnp.asarray(g_arr),
                    jnp.asarray(q8), jnp.asarray(qs),
                )
        else:
            scores = _gather_and_score(
                self._buf, self._mbuf, jnp.asarray(g_arr),
                jnp.asarray(np.asarray(q, np.float32)), use_pallas,
            )
        return np.asarray(scores)[: len(pool_rows)]
