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


def test_get_chunks_by_id():
    rng = np.random.default_rng(5)
    _, mvs, _ = _corpus(rng, 5)
    idx = MultiVectorIndex(CFG)
    _fill(idx, mvs)
    got = idx.get_chunks_by_id([("doc2", 0), ("doc9", 0), ("doc2", 7)])
    assert got[0] is not None and got[0].document_id == "doc2"
    assert got[1] is None and got[2] is None
