"""Device-resident pooled-candidate tier tests.

The tier keeps token-POOLED int8 multivectors of every row in HBM
blocks and fuses the pooled prefilter into the ANN scan program, so a
cold query uploads nothing until the max(2k, 16)-row exact rescore
(replaces the reference's cache-first candidate downloads,
core/vector_store/fast_multivector_store.py:713-774).
"""

import numpy as np

from morphik_core_tpu.index import IndexRecord, MultiVectorIndex
from morphik_core_tpu.ops.fde import FDEConfig

CFG = FDEConfig(dimension=32, num_repetitions=8, num_simhash_projections=4, projection_dimension=8)


def _corpus(rng, n_docs, d=32, tok=(10, 30)):
    concepts = rng.standard_normal((100, d)).astype(np.float32)
    concepts /= np.linalg.norm(concepts, axis=1, keepdims=True)
    mvs, topics = [], []
    for _ in range(n_docs):
        t = rng.choice(100, 3, replace=False)
        x = concepts[rng.choice(t, rng.integers(*tok))]
        x = x + 0.1 * rng.standard_normal(x.shape).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        mvs.append(x.astype(np.float32))
        topics.append(t)
    return concepts, mvs, topics


def _fill(index, mvs, doc_prefix="doc"):
    recs = [
        IndexRecord(document_id=f"{doc_prefix}{i}", chunk_number=0, metadata={"i": i})
        for i in range(len(mvs))
    ]
    return index.store(mvs, recs)


def _mk(tier: bool, **kw) -> MultiVectorIndex:
    return MultiVectorIndex(
        CFG,
        pooled_tier_factor=2 if tier else 0,
        pooled_tier_budget_mb=64,
        rerank_prefilter_pooling=2,
        prefilter_cap=75,
        **kw,
    )


def test_tier_query_matches_upload_path():
    """The fused device tier and the upload pooled prefilter compute the
    same pooled vectors with the same quantization — the survivor set
    and final exact ranking must agree."""
    rng = np.random.default_rng(0)
    concepts, mvs, topics = _corpus(rng, 120)
    a = _mk(tier=True)
    b = _mk(tier=False)
    _fill(a, mvs)
    _fill(b, mvs)
    assert a._tier_active() and not b._tier_active()
    for t in (3, 57, 99):
        q = concepts[topics[t]] + 0.05 * rng.standard_normal((3, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        ra = a.query(q, k=5, return_timing=True)
        assert a.last_timing["pooled_tier"] is True
        rb = b.query(q, k=5)
        assert [r.document_id for r, _ in ra] == [r.document_id for r, _ in rb]
        np.testing.assert_allclose(
            [s for _, s in ra], [s for _, s in rb], rtol=1e-5, atol=1e-5
        )
        assert ra[0][0].document_id == f"doc{t}"


def test_tier_filtered_query():
    rng = np.random.default_rng(1)
    concepts, mvs, topics = _corpus(rng, 60)
    idx = _mk(tier=True)
    _fill(idx, mvs)
    q = concepts[topics[5]]
    allowed = [f"doc{i}" for i in range(0, 60, 3)]
    res = idx.query(q, k=8, doc_ids=allowed)
    assert res and all(r.document_id in allowed for r, _ in res)
    assert idx.query(q, k=5, doc_ids=[]) == []


def test_tier_upsert_delete_and_compact():
    rng = np.random.default_rng(2)
    concepts, mvs, topics = _corpus(rng, 40)
    idx = _mk(tier=True, compact_min_rows=8)
    _fill(idx, mvs)
    q = concepts[topics[7]]
    assert idx.query(q, k=3)[0][0].document_id == "doc7"
    # upsert doc7 with doc20's content: the tier must serve the NEW row
    idx.store([mvs[20]], [IndexRecord(document_id="doc7", chunk_number=0)])
    res = idx.query(concepts[topics[20]], k=3)
    assert {r.document_id for r, _ in res} >= {"doc20", "doc7"}
    # delete + enough churn to trip compaction (row renumbering)
    idx.delete_document("doc20")
    for i in range(30):
        idx.store([mvs[i]], [IndexRecord(document_id=f"doc{i}", chunk_number=0)])
    res = idx.query(concepts[topics[11]], k=3)
    assert res[0][0].document_id == "doc11"
    assert all(r.document_id != "doc20" for r, _ in res)


def test_tier_budget_fallback():
    """Over-budget corpora must fall back to the upload pooled path and
    still answer correctly (and re-report tier inactive)."""
    rng = np.random.default_rng(3)
    concepts, mvs, topics = _corpus(rng, 50)
    idx = MultiVectorIndex(
        CFG, pooled_tier_factor=2, pooled_tier_budget_mb=0, rerank_prefilter_pooling=2
    )
    _fill(idx, mvs)
    assert not idx._tier_active()
    res = idx.query(concepts[topics[9]], k=5, return_timing=True)
    assert idx.last_timing["pooled_tier"] is False
    assert res[0][0].document_id == "doc9"


def test_tier_bucket_grows_with_longer_rows():
    """A row longer than the current pooled bucket rebuilds the tier at
    the new geometry instead of truncating tokens."""
    rng = np.random.default_rng(4)
    concepts, mvs, topics = _corpus(rng, 30, tok=(10, 16))
    idx = _mk(tier=True)
    _fill(idx, mvs)
    idx.query(concepts[topics[0]], k=3)  # builds the tier at small bucket
    b0 = idx._pooled_bucket
    long_mv = np.tile(concepts[topics[3]], (40, 1)).astype(np.float32)
    long_mv /= np.linalg.norm(long_mv, axis=1, keepdims=True)
    idx.store([long_mv], [IndexRecord(document_id="long", chunk_number=0)])
    res = idx.query(concepts[topics[3]], k=3)
    assert idx._pooled_bucket > b0
    assert "long" in {r.document_id for r, _ in res}


def test_tier_persistence_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    concepts, mvs, topics = _corpus(rng, 30)
    idx = _mk(tier=True, path=tmp_path / "ix")
    _fill(idx, mvs)
    idx.save()
    idx2 = _mk(tier=True, path=tmp_path / "ix")
    res = idx2.query(concepts[topics[12]], k=3, return_timing=True)
    assert idx2.last_timing["pooled_tier"] is True
    assert res[0][0].document_id == "doc12"

def test_pooled_stage_union_guard():
    """Union safety floor (round 4): pooled vectors are lossy, so the
    fused rescore must keep the ANN (FDE) head unconditionally. Build an
    adversarial tier where the FDE-top row's pooled vector ANTI-matches
    the query: without the guard it is dropped, with guard it survives
    in the FDE-head slots."""
    import jax.numpy as jnp

    from morphik_core_tpu.ops.maxsim import quantize_query_q8
    from morphik_core_tpu.parallel.search import (
        quantize_rows_int8,
        scan_blocks_topk_q_pooled,
    )

    rng = np.random.default_rng(7)
    B, D, T, dim = 64, 64, 8, 32
    qmv = rng.standard_normal((4, dim)).astype(np.float32)
    qmv /= np.linalg.norm(qmv, axis=1, keepdims=True)
    # FDE scores: descending by row id -> ANN pool head = rows 0,1,2...
    fde = np.linspace(1.0, 0.1, B)[:, None].astype(np.float32) * np.ones(
        (B, D), np.float32
    )
    qv = np.ones(D, np.float32)
    f8, fs = quantize_rows_int8(fde)
    q8v, qsv = quantize_rows_int8(qv[None])
    # pooled tier: row 0 anti-matches the query, all other rows match it
    p = np.tile(qmv.mean(0), (B, T, 1)).astype(np.float32)
    p[0] = -p[0]
    p8 = np.clip(np.round(p * 127), -127, 127).astype(np.int8)
    ps = np.full((B, T), 1.0 / 127, np.float32)
    q8p, qsp = quantize_query_q8(qmv)
    args = (
        (jnp.asarray(f8),), (jnp.asarray(fs),),
        (jnp.asarray(np.ones(B, np.float32)),),
        (jnp.asarray(np.zeros(B, np.int32)),),
        jnp.asarray(np.ones(8, np.float32)),
        jnp.asarray(q8v[0]), jnp.asarray(qsv[0]),
        (jnp.asarray(p8),), (jnp.asarray(ps),),
        jnp.asarray(q8p), jnp.asarray(qsp),
    )
    m = 8
    no_guard = np.asarray(
        scan_blocks_topk_q_pooled(*args, 32, 32, m, use_pallas=False, guard=0)
    )
    guarded = np.asarray(
        scan_blocks_topk_q_pooled(*args, 32, 32, m, use_pallas=False, guard=m // 2)
    )
    assert 0 not in no_guard[m:].astype(np.int64)  # pooled cut drops the FDE-top row
    gids = guarded[m:].astype(np.int64)
    # the first m//2 slots are exactly the FDE-head SET (ordered by
    # pooled score within the head; the exact rerank re-sorts anyway)
    assert set(gids[: m // 2]) == {0, 1, 2, 3}
    assert np.isfinite(guarded[:m]).all()  # caller's validity filter keeps them


def test_prefilter_union_guard():
    """Host upload-path twin of the fused guard: `_pooled_prefilter` must
    return the FDE-head half of the pool verbatim before any
    pooled-score picks, with no duplicate rows."""
    rng = np.random.default_rng(8)
    concepts, mvs, topics = _corpus(rng, 40)
    idx = MultiVectorIndex(CFG, rerank_prefilter_pooling=4)
    _fill(idx, mvs)
    q = concepts[topics[3]].astype(np.float32)
    pool = list(range(24))
    out = idx._pooled_prefilter(pool, q, 10, 4)
    assert out[:5] == pool[:5]  # guard half, FDE order preserved
    assert len(out) == 10 and len(set(out)) == 10
    assert all(r in pool for r in out)


def test_pooled_side_store_roundtrip_no_repool(tmp_path, monkeypatch):
    """pooled.bin: per-row pooled vectors are computed at INGEST and
    persisted, so a reloaded index builds its device tier WITHOUT
    re-running pool_multivector over the corpus (round-4 review: at 1M
    rows the lazy k-means replay stalled the first query ~minutes)."""
    import morphik_core_tpu.ops.pooling as pooling_mod

    rng = np.random.default_rng(11)
    concepts, mvs, topics = _corpus(rng, 60)
    idx = _mk(tier=True, path=tmp_path / "ix")
    _fill(idx, mvs)
    idx.save()
    assert (tmp_path / "ix" / "pooled.bin").exists()

    idx2 = _mk(tier=True, path=tmp_path / "ix")
    assert idx2._pooled_store_ok

    def boom(*a, **k):
        raise AssertionError("pool_multivector must not run on reload")

    monkeypatch.setattr(pooling_mod, "pool_multivector", boom)
    res = idx2.query(concepts[topics[17]], k=3, return_timing=True)
    assert idx2.last_timing["pooled_tier"] is True
    assert res[0][0].document_id == "doc17"


def test_pooled_side_store_config_change_disables_then_heals(tmp_path):
    """Changing (factor, refine_iters) invalidates pooled.bin: the store
    is DISABLED (queries compute pooled rows on the fly, still correct)
    and the next compaction rewrites it under the current config."""
    rng = np.random.default_rng(12)
    concepts, mvs, topics = _corpus(rng, 40)
    idx = MultiVectorIndex(CFG, pooled_tier_factor=2, pooled_tier_budget_mb=64,
                           rerank_prefilter_pooling=2, pooled_refine_iters=3,
                           path=tmp_path / "ix")
    _fill(idx, mvs)
    idx.save()
    # reload with different refine config -> side-store rejected
    idx2 = MultiVectorIndex(CFG, pooled_tier_factor=2, pooled_tier_budget_mb=64,
                            rerank_prefilter_pooling=2, pooled_refine_iters=0,
                            path=tmp_path / "ix")
    assert not idx2._pooled_store_ok
    res = idx2.query(concepts[topics[9]], k=3, return_timing=True)
    assert idx2.last_timing["pooled_tier"] is True  # tier still serves
    assert res[0][0].document_id == "doc9"
    # compaction heals: pooled.bin rewritten under the live config
    idx2.delete_document("doc0")
    idx2.compact()
    assert idx2._pooled_store_ok
    assert idx2.query(concepts[topics[9]], k=3)[0][0].document_id == "doc9"
    # and a fresh load under the same config accepts it
    idx3 = MultiVectorIndex(CFG, pooled_tier_factor=2, pooled_tier_budget_mb=64,
                            rerank_prefilter_pooling=2, pooled_refine_iters=0,
                            path=tmp_path / "ix")
    assert idx3._pooled_store_ok
    assert idx3.query(concepts[topics[9]], k=3)[0][0].document_id == "doc9"


def test_tier_short_rows_not_truncated():
    """A short row (n_tokens <= factor) stays UNPOOLED, so it can be
    WIDER than ceil(max_tokens/factor): the tier bucket must cover it or
    its tokens are silently truncated and tier-on/tier-off disagree
    (round-4 review finding)."""
    rng = np.random.default_rng(10)
    d = 32
    # long rows: 100 tokens of shared background; factor 16 pools to 7
    bg = rng.standard_normal((100, d)).astype(np.float32)
    bg /= np.linalg.norm(bg, axis=1, keepdims=True)
    mvs = [
        (bg + 0.05 * rng.standard_normal((100, d))).astype(np.float32)
        for _ in range(60)
    ]
    mvs = [m / np.linalg.norm(m, axis=1, keepdims=True) for m in mvs]
    # one 14-token row whose distinctive content lives in its TAIL tokens
    # (the part truncation would cut)
    sig = rng.standard_normal((14, d)).astype(np.float32)
    sig /= np.linalg.norm(sig, axis=1, keepdims=True)
    mvs.append(sig)
    tier = MultiVectorIndex(CFG, pooled_tier_factor=16, pooled_tier_budget_mb=64,
                            rerank_prefilter_pooling=16)
    flat = MultiVectorIndex(CFG)
    _fill(tier, mvs)
    _fill(flat, mvs)
    assert tier._tier_bucket() >= 14
    q = sig[8:]  # tail-token query
    rt = tier.query(q, k=3, return_timing=True)
    assert tier.last_timing["pooled_tier"] is True
    rf = flat.query(q, k=3)
    assert rt[0][0].document_id == rf[0][0].document_id == "doc60"


def test_multiblock_ref_path_matches_kernel():
    """2+ pooled blocks on the NON-Pallas path: rows fully masked in the
    other block must contribute exactly 0 to the cross-block score sum
    (the ref scorer returns ~-nq*1e30 for fully-masked candidates —
    regression for the round-4 review finding that this swamped every
    real score and the union guard on CPU deployments)."""
    import jax.numpy as jnp

    from morphik_core_tpu.ops.maxsim import quantize_query_q8
    from morphik_core_tpu.parallel.search import (
        quantize_rows_int8,
        scan_blocks_topk_q_pooled,
    )

    rng = np.random.default_rng(9)
    B, D, T, dim = 32, 64, 8, 32
    fde = rng.standard_normal((2 * B, D)).astype(np.float32)
    f8a, fsa = quantize_rows_int8(fde[:B])
    f8b, fsb = quantize_rows_int8(fde[B:])
    p8 = rng.integers(-127, 128, (2 * B, T, dim)).astype(np.int8)
    ps = np.abs(rng.standard_normal((2 * B, T))).astype(np.float32) + 0.1
    qv = rng.standard_normal(D).astype(np.float32)
    q8v, qsv = quantize_rows_int8(qv[None])
    qmv = rng.standard_normal((4, dim)).astype(np.float32)
    q8p, qsp = quantize_query_q8(qmv)
    ones = np.ones(2 * B, np.float32)
    args = (
        (jnp.asarray(f8a), jnp.asarray(f8b)), (jnp.asarray(fsa), jnp.asarray(fsb)),
        (jnp.asarray(ones[:B]), jnp.asarray(ones[B:])),
        (jnp.asarray(np.zeros(B, np.int32)), jnp.asarray(np.zeros(B, np.int32))),
        jnp.asarray(np.ones(8, np.float32)),
        jnp.asarray(q8v[0]), jnp.asarray(qsv[0]),
        (jnp.asarray(p8[:B]), jnp.asarray(p8[B:])),
        (jnp.asarray(ps[:B]), jnp.asarray(ps[B:])),
        jnp.asarray(q8p), jnp.asarray(qsp),
    )
    m = 8
    ref = np.asarray(
        scan_blocks_topk_q_pooled(*args, 32, 24, m, use_pallas=False, guard=4)
    )
    ker = np.asarray(
        scan_blocks_topk_q_pooled(
            *args, 32, 24, m, use_pallas=True, interpret=True, guard=4
        )
    )
    assert np.isfinite(ref[:m]).all() and (ref[:m] > -1e20).all()
    np.testing.assert_array_equal(ref[m:], ker[m:])
    np.testing.assert_allclose(ref[:m], ker[:m], rtol=1e-4, atol=1e-4)


def test_fused_kernel_interpret_matches_ref():
    """Run the fused scan+pooled-rescore program with the Pallas q8
    kernel in interpret mode and check it matches the XLA reference
    path bit-for-bit on the survivor set (validates the kernel's tile
    shapes without TPU hardware)."""
    import jax.numpy as jnp

    from morphik_core_tpu.parallel.search import (
        quantize_rows_int8,
        scan_blocks_topk_q_pooled,
    )

    rng = np.random.default_rng(6)
    B, D, T, dim = 64, 64, 16, 32
    fde = rng.standard_normal((B, D)).astype(np.float32)
    f8, fs = quantize_rows_int8(fde)
    mask = np.zeros(B, np.float32)
    mask[:50] = 1.0
    codes = np.zeros(B, np.int32)
    allowed = np.ones(8, np.float32)
    p8 = rng.integers(-127, 128, (B, T, dim)).astype(np.int8)
    ps = np.abs(rng.standard_normal((B, T))).astype(np.float32) + 0.1
    ps[:, 12:] = 0.0  # padded tokens
    qv = rng.standard_normal(D).astype(np.float32)
    q8v, qs = quantize_rows_int8(qv[None])
    from morphik_core_tpu.ops.maxsim import quantize_query_q8

    qmv = rng.standard_normal((5, dim)).astype(np.float32)
    q8p, qsp = quantize_query_q8(qmv)

    args = (
        (jnp.asarray(f8),), (jnp.asarray(fs),), (jnp.asarray(mask),),
        (jnp.asarray(codes),), jnp.asarray(allowed),
        jnp.asarray(q8v[0]), jnp.asarray(qs[0]),
        (jnp.asarray(p8),), (jnp.asarray(ps),),
        jnp.asarray(q8p), jnp.asarray(qsp),
    )
    ref = np.asarray(scan_blocks_topk_q_pooled(*args, 32, 24, 8, use_pallas=False))
    ker = np.asarray(
        scan_blocks_topk_q_pooled(*args, 32, 24, 8, use_pallas=True, interpret=True)
    )
    np.testing.assert_array_equal(ref[8:], ker[8:])  # same survivor ids
    np.testing.assert_allclose(ref[:8], ker[:8], rtol=1e-5, atol=1e-5)


def test_mesh_pooled_tier_matches_single(mesh8):
    """Row-sharded pooled tier (round 4): the fused mesh program (sharded
    int8 ANN + local pooled rescore + union guard, one replicated fetch)
    must return the same final ranking as the single-chip fused path —
    same global-FDE-pool semantics, same guard."""
    rng = np.random.default_rng(13)
    concepts, mvs, topics = _corpus(rng, 96)
    single = _mk(tier=True)
    meshed = MultiVectorIndex(
        CFG, mesh=mesh8, pooled_tier_factor=2, pooled_tier_budget_mb=64,
        rerank_prefilter_pooling=2, prefilter_cap=75,
    )
    _fill(single, mvs)
    _fill(meshed, mvs)
    assert single._tier_active() and meshed._tier_active()
    for t in (5, 41, 77):
        q = concepts[topics[t]] + 0.05 * rng.standard_normal((3, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        rs = single.query(q, k=5, return_timing=True)
        assert single.last_timing["pooled_tier"] is True
        rm = meshed.query(q, k=5, return_timing=True)
        assert meshed.last_timing["pooled_tier"] is True
        assert [r.document_id for r, _ in rs] == [r.document_id for r, _ in rm]
        np.testing.assert_allclose(
            [s for _, s in rs], [s for _, s in rm], rtol=1e-5, atol=1e-5
        )
        assert rs[0][0].document_id == f"doc{t}"


def test_mesh_pooled_tier_filtered_and_tail_refresh(mesh8):
    """Filtered queries gate inside the fused mesh program; an ingest
    re-uploads only tail pooled blocks (tail-incremental)."""
    rng = np.random.default_rng(14)
    concepts, mvs, topics = _corpus(rng, 60)
    idx = MultiVectorIndex(
        CFG, mesh=mesh8, pooled_tier_factor=2, pooled_tier_budget_mb=64,
        rerank_prefilter_pooling=2,
    )
    _fill(idx, mvs)
    q = concepts[topics[7]]
    allowed = [f"doc{i}" for i in range(0, 60, 3)]
    res = idx.query(q, k=8, doc_ids=allowed, return_timing=True)
    assert idx.last_timing["pooled_tier"] is True
    assert res and all(r.document_id in allowed for r, _ in res)
    # tail refresh: new rows appear without a full tier rebuild
    n_before = len(idx._mesh_pooled_blocks)
    rows_before = idx._mesh_pooled_rows
    idx.store([mvs[3]], [IndexRecord(document_id="newdoc", chunk_number=0)])
    res = idx.query(concepts[topics[3]], k=4)
    assert "newdoc" in {r.document_id for r, _ in res}
    assert idx._mesh_pooled_rows == rows_before + 1
    assert len(idx._mesh_pooled_blocks) >= n_before


def test_mesh_pool_cut_is_exact_not_padded(mesh8):
    """The mesh global FDE pool must cut at the EXACT configured pool
    size, not the pow-2-padded kernel width — otherwise FDE-rank-301..
    512 rows with high pooled scores displace in-pool survivors and
    mesh/single-chip deployments diverge (round-4 review). Corpus is
    much larger than the pool so the cut genuinely bites."""
    rng = np.random.default_rng(15)
    concepts, mvs, topics = _corpus(rng, 200)
    kw = dict(pooled_tier_factor=2, pooled_tier_budget_mb=64,
              rerank_prefilter_pooling=2, prefilter_cap=40)
    single = MultiVectorIndex(CFG, **kw)
    meshed = MultiVectorIndex(CFG, mesh=mesh8, **kw)
    _fill(single, mvs)
    _fill(meshed, mvs)
    for t in (11, 99, 180):
        q = concepts[topics[t]].astype(np.float32)
        qe_s = single._encode_query(q)
        qe_m = meshed._encode_query(q)
        surv_s = single._ann_pooled_topm(qe_s, q, None, 40, 16)
        surv_m = meshed._mesh_pooled_topm(qe_m, q, None, 40, 16)
        assert set(surv_s) == set(surv_m), f"survivor sets diverged for doc{t}"
        rs = [r.document_id for r, _ in single.query(q, k=5)]
        rm = [r.document_id for r, _ in meshed.query(q, k=5)]
        assert rs == rm


def test_pooled_side_store_orphan_truncation(tmp_path):
    """A crash between the pooled.bin append and the WAL fsync leaves
    orphan bytes; reload must truncate them (derived offsets) and keep
    the store valid."""
    rng = np.random.default_rng(16)
    concepts, mvs, topics = _corpus(rng, 30)
    idx = _mk(tier=True, path=tmp_path / "ix")
    _fill(idx, mvs)
    idx.save()
    p = tmp_path / "ix" / "pooled.bin"
    good = p.stat().st_size
    with open(p, "ab") as fh:
        fh.write(b"\x00" * 4096)  # orphan bytes from a crashed append
    idx2 = _mk(tier=True, path=tmp_path / "ix")
    assert idx2._pooled_store_ok
    assert p.stat().st_size == good  # orphans truncated on load
    res = idx2.query(concepts[topics[8]], k=3, return_timing=True)
    assert idx2.last_timing["pooled_tier"] is True
    assert res[0][0].document_id == "doc8"
