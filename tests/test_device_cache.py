"""HBM candidate cache (index/device_cache.py): score parity with the
direct path, LRU eviction, invalidation on upsert/delete, oversized
bypass. Runs on the CPU backend (same code path, host buffers)."""

import numpy as np
import pytest

from morphik_core_tpu.index.device_cache import DevicePoolCache
from morphik_core_tpu.index.multivector_index import IndexRecord, MultiVectorIndex
from morphik_core_tpu.ops.fde import FDEConfig

CFG = FDEConfig(dimension=16, num_repetitions=4, num_simhash_projections=3, projection_dimension=8)


def _mk_index(n_docs=10, cache_slots=16, bucket=32, seed=0):
    rng = np.random.default_rng(seed)
    idx = MultiVectorIndex(CFG, device_cache_slots=cache_slots,
                           device_cache_token_bucket=bucket)
    mvs, recs = [], []
    for i in range(n_docs):
        mv = rng.standard_normal((8 + (i % 5), 16)).astype(np.float32)
        mv /= np.linalg.norm(mv, axis=-1, keepdims=True)
        mvs.append(mv)
        recs.append(IndexRecord(document_id=f"d{i}", chunk_number=0))
    idx.store(mvs, recs)
    return idx, rng


def test_cached_scores_match_direct_path():
    idx, rng = _mk_index()
    q = rng.standard_normal((4, 16)).astype(np.float32)
    warm = idx.query(q, k=5)  # fills the cache
    again = idx.query(q, k=5)  # fully warm
    assert [(r.document_id, round(s, 5)) for r, s in warm] == \
           [(r.document_id, round(s, 5)) for r, s in again]
    # direct-path oracle: same index without a cache
    idx2, _ = _mk_index(cache_slots=0)
    direct = idx2.query(q, k=5)
    assert [r.document_id for r, _ in warm] == [r.document_id for r, _ in direct]
    np.testing.assert_allclose([s for _, s in warm], [s for _, s in direct],
                               rtol=1e-2, atol=1e-2)
    assert idx._pool_cache.hits > 0


def test_cache_hit_accounting_and_eviction():
    idx, rng = _mk_index(n_docs=10, cache_slots=4)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    idx.query(q, k=2)  # pool limited by cache? pool = min(10*2, 75)=20 > slots 4 -> bypass
    # pool bigger than slots must bypass the cache entirely
    assert idx._pool_cache is None or idx._pool_cache.misses == 0

    idx3, rng3 = _mk_index(n_docs=3, cache_slots=8)
    q3 = rng3.standard_normal((4, 16)).astype(np.float32)
    idx3.query(q3, k=1)
    m1 = idx3._pool_cache.misses
    assert m1 > 0 and idx3._pool_cache.hits == 0
    idx3.query(q3, k=1)
    assert idx3._pool_cache.misses == m1  # all warm now
    assert idx3._pool_cache.hits == m1


def test_cache_invalidation_on_upsert():
    """After an upsert, cached scores must reflect the NEW multivector —
    compared against a cache-less oracle index that saw the same ops."""
    idx, rng = _mk_index(n_docs=3, cache_slots=8)
    oracle, _ = _mk_index(n_docs=3, cache_slots=0)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    idx.query(q, k=3)  # warm the cache with the OLD d0 row
    new = -np.copy(idx.get_multivector("d0", 0))
    idx.store([new], [IndexRecord(document_id="d0", chunk_number=0)])
    oracle.store([np.copy(new)], [IndexRecord(document_id="d0", chunk_number=0)])
    got = dict((r.document_id, s) for r, s in idx.query(q, k=3))
    want = dict((r.document_id, s) for r, s in oracle.query(q, k=3))
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-2, (d, got[d], want[d])


def test_cache_invalidation_on_delete():
    idx, rng = _mk_index(n_docs=3, cache_slots=8)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    idx.query(q, k=3)
    idx.delete_document("d1")
    res = idx.query(q, k=3)
    assert all(r.document_id != "d1" for r, _ in res)


def test_oversized_rows_bypass_cache():
    rng = np.random.default_rng(1)
    idx = MultiVectorIndex(CFG, device_cache_slots=8, device_cache_token_bucket=8)
    mv = rng.standard_normal((20, 16)).astype(np.float32)  # 20 tokens > bucket 8
    idx.store([mv], [IndexRecord(document_id="big", chunk_number=0)])
    q = rng.standard_normal((4, 16)).astype(np.float32)
    res = idx.query(q, k=1)
    assert res and res[0][0].document_id == "big"
    assert idx._pool_cache is None or idx._pool_cache.misses == 0  # bypassed


def test_lru_eviction_order():
    cache = DevicePoolCache(slots=2, token_bucket=4, dim=8)
    rows = {i: np.full((2, 8), float(i + 1), np.float32) for i in range(3)}
    q = np.ones((1, 8), np.float32)

    def fetch(r):
        return rows[r]

    cache.score([0, 1], q, fetch, lambda r: 2, use_pallas=False)
    cache.score([0], q, fetch, lambda r: 2, use_pallas=False)  # touch 0
    cache.score([2], q, fetch, lambda r: 2, use_pallas=False)  # evicts 1 (LRU)
    assert 0 in cache._row_to_slot and 2 in cache._row_to_slot
    assert 1 not in cache._row_to_slot


def test_alloc_never_evicts_current_pool():
    """Inserting misses must not evict rows that are HITS of the same
    query's pool (regression: KeyError on LRU touch)."""
    cache = DevicePoolCache(slots=4, token_bucket=4, dim=8)
    rows = {i: np.full((2, 8), float(i + 1), np.float32) for i in range(8)}
    q = np.ones((1, 8), np.float32)

    def fetch(r):
        return rows[r]

    cache.score([0, 1, 2, 3], q, fetch, lambda r: 2, use_pallas=False)  # fill
    # pool = {0 (hit, LRU-oldest), 4, 5, 6 (misses)}: allocating 3 slots
    # with naive LRU would evict row 0 mid-query
    out = cache.score([0, 4, 5, 6], q, fetch, lambda r: 2, use_pallas=False)
    assert out is not None and out.shape == (4,)
    assert 0 in cache._row_to_slot  # survived


def test_int8_rerank_matches_bf16_ranking():
    """rerank_dtype=int8 (cold + cached paths) ranks like bf16 and its
    scores stay within per-token-int8 tolerance."""
    rng = np.random.default_rng(3)
    mvs, recs = [], []
    for i in range(8):
        mv = rng.standard_normal((12 + i, 16)).astype(np.float32)
        mv /= np.linalg.norm(mv, axis=-1, keepdims=True)
        mvs.append(mv)
        recs.append(IndexRecord(document_id=f"d{i}", chunk_number=0))
    ref_idx = MultiVectorIndex(CFG)
    ref_idx.store([np.copy(m) for m in mvs], [IndexRecord(document_id=r.document_id, chunk_number=0) for r in recs])

    for slots in (0, 16):  # 0 = cold int8 path, 16 = cached int8 path
        q8_idx = MultiVectorIndex(CFG, rerank_dtype="int8",
                                  device_cache_slots=slots, device_cache_token_bucket=32)
        q8_idx.store([np.copy(m) for m in mvs],
                     [IndexRecord(document_id=r.document_id, chunk_number=0) for r in recs])
        q = rng.standard_normal((4, 16)).astype(np.float32)
        want = ref_idx.query(q, k=8)
        got = q8_idx.query(q, k=8)
        got = q8_idx.query(q, k=8)  # warm pass for the cached variant
        w = {r.document_id: s for r, s in want}
        g = {r.document_id: s for r, s in got}
        assert set(w) == set(g)
        for d in w:
            assert abs(w[d] - g[d]) < 0.02 * max(1.0, abs(w[d])), (slots, d, w[d], g[d])


def test_int8_rerank_rejects_bad_dtype():
    with pytest.raises(ValueError):
        MultiVectorIndex(CFG, rerank_dtype="fp4")


def test_working_set_residency_boundary():
    """Cyclic working-set behavior that sizes device_cache_slots in
    production (round-4 warm-curve measurement): W distinct queries,
    each pinning a fixed candidate pool, replayed in a cycle. When
    W x pool_rows <= slots the second pass is all hits; once the cycle
    exceeds capacity, an LRU gives ZERO hits (every row is evicted
    before its next use). The config default must be sized from this
    boundary, not from average hit rates."""

    def run_cycle(slots, n_queries, rows_per_q):
        cache = DevicePoolCache(slots, token_bucket=8, dim=16)
        rng = np.random.default_rng(7)
        rows = {
            qi: list(range(qi * rows_per_q, (qi + 1) * rows_per_q))
            for qi in range(n_queries)
        }
        mv = {r: rng.standard_normal((8, 16)).astype(np.float32)
              for r in range(n_queries * rows_per_q)}
        q = rng.standard_normal((4, 16)).astype(np.float32)
        for _pass in range(2):
            for qi in range(n_queries):
                cache.score(rows[qi], q, fetch_row=lambda r: mv[r],
                            n_tokens=lambda r: 8, use_pallas=False)
        return cache

    # 4 queries x 4 rows = 16 rows in 16 slots: pass 2 fully warm
    fits = run_cycle(slots=16, n_queries=4, rows_per_q=4)
    assert fits.hits == 16 and fits.misses == 16

    # 5 queries x 4 rows = 20 rows cycling through 16 slots: LRU evicts
    # every row before its reuse -> zero hits on pass 2
    thrash = run_cycle(slots=16, n_queries=5, rows_per_q=4)
    assert thrash.hits == 0 and thrash.misses == 40
