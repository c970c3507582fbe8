"""Training-free multivector token pooling (PAPERS.md technique):
shape/normalization semantics + retrieval quality preserved at 2x."""

import asyncio

import numpy as np

from morphik_core_tpu.ops.pooling import pool_multivector


def test_pool_shapes_and_norms():
    rng = np.random.default_rng(0)
    mv = rng.standard_normal((10, 16)).astype(np.float32)
    mv /= np.linalg.norm(mv, axis=-1, keepdims=True)
    p2 = pool_multivector(mv, 2)
    assert p2.shape == (5, 16)
    np.testing.assert_allclose(np.linalg.norm(p2, axis=-1), 1.0, atol=1e-5)
    p3 = pool_multivector(mv, 3)
    assert p3.shape == (4, 16)  # ceil(10/3); last group averages 1 token
    np.testing.assert_allclose(p3[-1], mv[-1], atol=1e-5)  # single-token group unchanged
    assert pool_multivector(mv, 1) is mv


def test_pool_refine_shapes_and_norms():
    """k-means refinement keeps count/norm/dtype semantics identical to
    the consecutive-mean path (round 4, pooled-fidelity fix)."""
    rng = np.random.default_rng(2)
    mv = rng.standard_normal((37, 16)).astype(np.float32)
    mv /= np.linalg.norm(mv, axis=-1, keepdims=True)
    base = pool_multivector(mv, 4)
    ref = pool_multivector(mv, 4, refine_iters=3)
    assert ref.shape == base.shape == (10, 16)
    assert ref.dtype == mv.dtype
    np.testing.assert_allclose(np.linalg.norm(ref, axis=-1), 1.0, atol=1e-5)
    assert pool_multivector(mv, 1, refine_iters=3) is mv


def test_pool_refine_preserves_salient_tokens():
    """Adversarial layout for spatial pooling: a salient direction is
    interleaved token-by-token with background, so every consecutive
    group averages it half away. k-means reassignment must recover a
    centroid near the salient direction (this is the measured failure
    mode on trained checkpoints — CLAUDE.md round-4 notes)."""
    rng = np.random.default_rng(3)
    d = 32
    sal = rng.standard_normal(d).astype(np.float32)
    bg = rng.standard_normal(d).astype(np.float32)
    sal /= np.linalg.norm(sal)
    bg -= (bg @ sal) * sal  # orthogonal background
    bg /= np.linalg.norm(bg)
    mv = np.empty((64, d), np.float32)
    for i in range(64):
        base = sal if i % 2 == 0 else bg
        t = base + 0.05 * rng.standard_normal(d).astype(np.float32)
        mv[i] = t / np.linalg.norm(t)
    plain = pool_multivector(mv, 8)
    refined = pool_multivector(mv, 8, refine_iters=3)
    best_plain = float((plain @ sal).max())
    best_ref = float((refined @ sal).max())
    assert best_plain < 0.85  # consecutive-mean dilutes the salient token
    assert best_ref > 0.95, f"refined max-sim {best_ref} (plain {best_plain})"
    assert best_ref > best_plain + 0.1


def test_pooled_store_retrieval_quality(tmp_path):
    """At factor 2, self-similarity retrieval over pooled stores still
    ranks the right page first, with half the stored tokens."""
    from morphik_core_tpu.index.multivector_index import IndexRecord
    from morphik_core_tpu.models.schemas import DocumentChunk
    from morphik_core_tpu.ops.fde import FDEConfig
    from morphik_core_tpu.vector_store.tpu_multivector_store import TPUMultiVectorStore

    rng = np.random.default_rng(1)
    cfg = FDEConfig(dimension=16, num_repetitions=4, num_simhash_projections=3, projection_dimension=8)
    store = TPUMultiVectorStore(fde_config=cfg, pooling_factor=2)
    loop = asyncio.new_event_loop()

    def unit(n):
        x = rng.standard_normal((n, 16)).astype(np.float32)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    mvs = [unit(40) for _ in range(8)]
    chunks = [
        DocumentChunk(document_id=f"d{i}", chunk_number=0, content=f"page {i}",
                      embedding=mv, metadata={"is_image": True})
        for i, mv in enumerate(mvs)
    ]
    ok, ids, _ = loop.run_until_complete(store.store_embeddings(chunks))
    assert ok
    index = store._ns(None)
    stored = index.get_multivector("d3", 0)
    assert stored.shape[0] == 20  # pooled 40 -> 20

    for i, mv in enumerate(mvs):
        res = loop.run_until_complete(store.query_similar(mv, k=1))
        assert res[0].document_id == f"d{i}"


def test_pooled_prefilter_rerank_matches_exact():
    """Cold-pool transfer diet (round-3): with rerank_prefilter_pooling
    the pool is first ranked over int8 token-POOLED candidates, and only
    max(2k,16) survivors get the exact full-token rerank. Top-k must
    match the always-exact path on a clustered corpus, and repeated
    queries must serve the pooled pass from its HBM tier (zero misses)."""
    from morphik_core_tpu.index.multivector_index import IndexRecord, MultiVectorIndex
    from morphik_core_tpu.ops.fde import FDEConfig

    CFG = FDEConfig(dimension=32, num_repetitions=8, num_simhash_projections=4,
                    projection_dimension=8)
    rng = np.random.default_rng(0)
    concepts = rng.standard_normal((100, 32)).astype(np.float32)
    concepts /= np.linalg.norm(concepts, axis=1, keepdims=True)
    mvs, topics = [], []
    for _ in range(120):
        t = rng.choice(100, 3, replace=False)
        x = concepts[rng.choice(t, rng.integers(16, 40))]
        x = x + 0.1 * rng.standard_normal(x.shape).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        mvs.append(x.astype(np.float32))
        topics.append(t)

    def recs():
        return [IndexRecord(document_id=f"doc{i}", chunk_number=0) for i in range(120)]

    exact = MultiVectorIndex(CFG)
    pooled = MultiVectorIndex(CFG, rerank_prefilter_pooling=4,
                              device_cache_slots=128, device_cache_token_bucket=64)
    exact.store(mvs, recs())
    pooled.store(mvs, recs())
    agree = 0
    for qi in range(20):
        q = concepts[topics[qi]]
        r1 = [r.document_id for r, _ in exact.query(q, k=3)]
        r2 = [r.document_id for r, _ in pooled.query(q, k=3)]
        agree += r1 == r2
    assert agree >= 18, f"pooled-prefilter top-3 agreed on only {agree}/20 queries"

    # warm path: identical query again -> pooled tier serves every row
    q = concepts[topics[0]]
    pooled.query(q, k=3)
    h0, m0 = pooled._pooled_cache.hits, pooled._pooled_cache.misses
    pooled.query(q, k=3)
    assert pooled._pooled_cache.misses == m0  # zero new misses
    assert pooled._pooled_cache.hits > h0
