"""MultiVectorIndex tests: store/query/delete/upsert/persistence, auth
filtering, and the mesh-sharded search path on the virtual 8-device mesh."""

import numpy as np
import pytest

from morphik_core_tpu.index import IndexRecord, MultiVectorIndex
from morphik_core_tpu.ops.fde import FDEConfig

CFG = FDEConfig(dimension=32, num_repetitions=8, num_simhash_projections=4, projection_dimension=8)


def _corpus(rng, n_docs, d=32):
    concepts = rng.standard_normal((100, d)).astype(np.float32)
    concepts /= np.linalg.norm(concepts, axis=1, keepdims=True)
    mvs, topics = [], []
    for _ in range(n_docs):
        t = rng.choice(100, 3, replace=False)
        x = concepts[rng.choice(t, rng.integers(10, 30))]
        x = x + 0.1 * rng.standard_normal(x.shape).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        mvs.append(x.astype(np.float32))
        topics.append(t)
    return concepts, mvs, topics


def _fill(index, mvs, doc_prefix="doc"):
    recs = [IndexRecord(document_id=f"{doc_prefix}{i}", chunk_number=0, metadata={"i": i}) for i in range(len(mvs))]
    return index.store(mvs, recs)


def test_store_and_query_roundtrip():
    rng = np.random.default_rng(0)
    concepts, mvs, topics = _corpus(rng, 50)
    idx = MultiVectorIndex(CFG)
    ids = _fill(idx, mvs)
    assert len(idx) == 50 and ids[3] == "doc3-0"

    target = 17
    q = concepts[topics[target]] + 0.05 * rng.standard_normal((3, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    res = idx.query(q, k=5)
    assert len(res) == 5
    assert res[0][0].document_id == f"doc{target}"
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)


def test_doc_id_filter():
    rng = np.random.default_rng(1)
    concepts, mvs, topics = _corpus(rng, 30)
    idx = MultiVectorIndex(CFG)
    _fill(idx, mvs)
    q = concepts[topics[5]]
    allowed = ["doc1", "doc2", "doc3"]
    res = idx.query(q, k=10, doc_ids=allowed)
    assert res and all(r.document_id in allowed for r, _ in res)
    assert idx.query(q, k=5, doc_ids=[]) == []


def test_delete_and_upsert():
    rng = np.random.default_rng(2)
    _, mvs, _ = _corpus(rng, 10)
    idx = MultiVectorIndex(CFG)
    _fill(idx, mvs)
    assert idx.delete_document("doc4") == 1
    assert len(idx) == 9
    assert idx.get_multivector("doc4", 0) is None
    res = idx.query(mvs[4][:4], k=10)
    assert all(r.document_id != "doc4" for r, _ in res)
    # upsert doc5 with new content: old row tombstoned
    idx.store([mvs[0]], [IndexRecord(document_id="doc5", chunk_number=0)])
    assert len(idx) == 9
    np.testing.assert_allclose(idx.get_multivector("doc5", 0), mvs[0].astype(np.float16), rtol=1e-3)


def test_persistence_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    concepts, mvs, topics = _corpus(rng, 20)
    idx = MultiVectorIndex(CFG, path=tmp_path / "ix")
    _fill(idx, mvs)
    idx.delete_document("doc3")
    idx.save()

    idx2 = MultiVectorIndex(CFG, path=tmp_path / "ix")
    assert len(idx2) == 19
    q = concepts[topics[7]]
    r1 = [(r.document_id, round(s, 4)) for r, s in idx.query(q, k=5)]
    r2 = [(r.document_id, round(s, 4)) for r, s in idx2.query(q, k=5)]
    assert r1 == r2


def test_mesh_sharded_query_matches_single(mesh8):
    rng = np.random.default_rng(4)
    concepts, mvs, topics = _corpus(rng, 64)
    # mesh uses only the "data" axis of mesh8 for sharding rows
    idx_single = MultiVectorIndex(CFG)
    idx_mesh = MultiVectorIndex(CFG, mesh=mesh8)
    _fill(idx_single, mvs)
    _fill(idx_mesh, mvs)
    q = concepts[topics[42]]
    r1 = [(r.document_id, round(s, 3)) for r, s in idx_single.query(q, k=8)]
    r2 = [(r.document_id, round(s, 3)) for r, s in idx_mesh.query(q, k=8)]
    assert r1 == r2


def test_mesh_refresh_is_tail_incremental(mesh8):
    """Round-2 verdict item: the mesh path used to re-materialize +
    re-upload the WHOLE corpus on any change. Now it must upload only
    the dirty tail blocks, like the single-chip path."""
    rng = np.random.default_rng(7)
    _, mvs, _ = _corpus(rng, 48)
    idx = MultiVectorIndex(CFG, mesh=mesh8, device_block_rows=16)
    _fill(idx, mvs[:32])
    idx.query(mvs[0][:4], k=4)
    assert idx.last_mesh_upload_rows == 32  # cold: everything uploads
    idx.query(mvs[1][:4], k=4)
    assert idx.last_mesh_upload_rows == 0  # warm: nothing re-uploads
    # ingest a tail -> only blocks covering the tail re-upload
    recs = [IndexRecord(document_id=f"tail{i}", chunk_number=0) for i in range(16)]
    idx.store(mvs[32:48], recs)
    idx.query(mvs[2][:4], k=4)
    assert 0 < idx.last_mesh_upload_rows <= 16 + 16  # tail + one partial block
    assert len(idx) == 48


def test_mesh_filtered_query_matches_single(mesh8):
    rng = np.random.default_rng(8)
    concepts, mvs, topics = _corpus(rng, 40)
    idx_single = MultiVectorIndex(CFG)
    idx_mesh = MultiVectorIndex(CFG, mesh=mesh8)
    _fill(idx_single, mvs)
    _fill(idx_mesh, mvs)
    q = concepts[topics[9]]
    allowed = [f"doc{i}" for i in range(0, 40, 2)]
    r1 = [(r.document_id, round(s, 3)) for r, s in idx_single.query(q, k=6, doc_ids=allowed)]
    r2 = [(r.document_id, round(s, 3)) for r, s in idx_mesh.query(q, k=6, doc_ids=allowed)]
    assert r1 == r2
    assert all(d in allowed for d, _ in r1)


def test_filtered_query_upload_is_o_docs():
    """A filtered query must upload an O(n_docs) code-gate vector, not
    an O(n_rows) mask (round-2 verdict: 1M rows = ~4 MB per filtered
    query through the relay)."""
    rng = np.random.default_rng(9)
    _, mvs, _ = _corpus(rng, 200)
    idx = MultiVectorIndex(CFG)
    # 200 rows but only 10 documents (20 chunks each)
    recs = [IndexRecord(document_id=f"doc{i // 20}", chunk_number=i % 20) for i in range(200)]
    idx.store(mvs, recs)
    idx.query(mvs[0][:4], k=3)
    assert idx.last_filter_upload_floats == 0  # unfiltered: cached device ones
    # unfiltered queries never pay the O(n_rows) code upload (deferred)
    assert idx._code_blocks == []
    res = idx.query(mvs[0][:4], k=3, doc_ids=["doc1", "doc3"])
    assert idx._code_blocks  # built on the first filtered query
    assert res and all(r.document_id in ("doc1", "doc3") for r, _ in res)
    # pad bucket is pow2(max(n_docs,256)) -- far below the 200-row corpus scale
    assert idx.last_filter_upload_floats == 256


def test_get_chunks_by_id():
    rng = np.random.default_rng(5)
    _, mvs, _ = _corpus(rng, 5)
    idx = MultiVectorIndex(CFG)
    _fill(idx, mvs)
    got = idx.get_chunks_by_id([("doc2", 0), ("doc9", 0), ("doc2", 7)])
    assert got[0] is not None and got[0].document_id == "doc2"
    assert got[1] is None and got[2] is None


def test_query_token_dedup_improves_sparse_query_selection():
    """Round 4: page-like queries carry hundreds of near-identical
    'blank' tokens that drown their few discriminative tokens in the
    FDE query sum. Dedup (selection stages only) must (a) leave dense-
    query results and SCORES bit-identical to the no-dedup index, and
    (b) recover a sparse query whose discriminative token the full-sum
    FDE misses."""
    rng = np.random.default_rng(21)
    d = 32
    blank = rng.standard_normal(d).astype(np.float32)
    blank /= np.linalg.norm(blank)
    sigs = rng.standard_normal((40, d)).astype(np.float32)
    sigs /= np.linalg.norm(sigs, axis=1, keepdims=True)
    # docs: mostly-blank pages with a few signature tokens
    mvs = []
    for i in range(40):
        toks = [blank + 0.02 * rng.standard_normal(d) for _ in range(20)]
        toks += [sigs[i] + 0.02 * rng.standard_normal(d) for _ in range(4)]
        mv = np.stack(toks).astype(np.float32)
        mvs.append(mv / np.linalg.norm(mv, axis=1, keepdims=True))
    on = MultiVectorIndex(CFG, query_token_dedup=0.95, prefilter_cap=8)
    off = MultiVectorIndex(CFG, query_token_dedup=0.0, prefilter_cap=8)
    _fill(on, mvs)
    _fill(off, mvs)

    # dense query (few tokens, <= 64): dedup is a no-op — identical output
    qd = mvs[7][:12]
    r_on = on.query(qd, k=3)
    r_off = off.query(qd, k=3)
    assert [(r.document_id, s) for r, s in r_on] == [(r.document_id, s) for r, s in r_off]

    # sparse query: 800 blank tokens + gold's signature tokens. The
    # full-sum FDE ranks by blank-similarity (everything ties); with a
    # pool of 8 of 40 the gold is usually lost without dedup.
    hits_on = hits_off = 0
    for t in range(12):
        toks = [blank + 0.02 * rng.standard_normal(d) for _ in range(800)]
        toks += [sigs[t] + 0.02 * rng.standard_normal(d) for _ in range(4)]
        q = np.stack(toks).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        hits_on += on.query(q, k=1)[0][0].document_id == f"doc{t}"
        hits_off += off.query(q, k=1)[0][0].document_id == f"doc{t}"
    assert hits_on >= 10, f"dedup index found only {hits_on}/12 sparse golds"
    assert hits_on > hits_off, (hits_on, hits_off)
