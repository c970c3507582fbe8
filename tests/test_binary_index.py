"""BinaryMultiVectorIndex tests — exact Hamming MaxSim scan parity with
the float index's ordering on clustered data."""

import numpy as np

from morphik_core_tpu.index.binary_index import BinaryMultiVectorIndex
from morphik_core_tpu.index.multivector_index import IndexRecord


def _corpus(rng, n, d=128):
    concepts = rng.standard_normal((80, d)).astype(np.float32)
    concepts /= np.linalg.norm(concepts, axis=1, keepdims=True)
    mvs, topics = [], []
    for _ in range(n):
        t = rng.choice(80, 3, replace=False)
        x = concepts[rng.choice(t, rng.integers(10, 30))]
        x += 0.1 * rng.standard_normal(x.shape).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        mvs.append(x)
        topics.append(t)
    return concepts, mvs, topics


def test_binary_index_store_query_delete():
    rng = np.random.default_rng(0)
    concepts, mvs, topics = _corpus(rng, 40)
    ix = BinaryMultiVectorIndex(dim=128, token_bucket=64, block_rows=16)
    recs = [IndexRecord(document_id=f"d{i}", chunk_number=0) for i in range(40)]
    ids = ix.store(mvs, recs)
    assert len(ix) == 40 and ids[0] == "d0-0"

    target = 7
    q = concepts[topics[target]]
    res = ix.query(q, k=5)
    assert res[0][0].document_id == f"d{target}"
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)

    # doc filter
    res = ix.query(q, k=5, doc_ids=["d1", "d2"])
    assert {r.document_id for r, _ in res} <= {"d1", "d2"}

    # delete
    assert ix.delete_document(f"d{target}") == 1
    res = ix.query(q, k=5)
    assert all(r.document_id != f"d{target}" for r, _ in res)


def test_binary_index_upsert():
    rng = np.random.default_rng(1)
    _, mvs, _ = _corpus(rng, 4)
    ix = BinaryMultiVectorIndex(dim=128, token_bucket=64)
    ix.store(mvs[:2], [IndexRecord(document_id="a", chunk_number=0), IndexRecord(document_id="b", chunk_number=0)])
    ix.store([mvs[2]], [IndexRecord(document_id="a", chunk_number=0)])
    assert len(ix) == 2
    res = ix.query(mvs[2], k=2)
    assert res[0][0].document_id == "a"
