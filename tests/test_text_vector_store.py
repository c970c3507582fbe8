"""TextVectorStore: scalable internals (capacity-doubling appends,
device-resident tail-updated scan, inverted-index BM25) must score
exactly like a brute-force oracle."""

import asyncio

from conftest import run_once

import numpy as np
import pytest

import morphik_core_tpu.vector_store.text_vector_store as tvs_mod
from morphik_core_tpu.models.schemas import DocumentChunk
from morphik_core_tpu.vector_store.text_vector_store import TextVectorStore


def run(coro):
    return run_once(coro)


def _chunks(vecs, texts, doc="d"):
    return [
        DocumentChunk(document_id=f"{doc}{i // 4}", chunk_number=i % 4,
                      content=texts[i], embedding=list(map(float, v)))
        for i, v in enumerate(vecs)
    ]


def _mk_corpus(n=64, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    texts = [" ".join(rng.choice(words, size=5)) for _ in range(n)]
    return vecs, texts


def _oracle(store, ns_key, q, query_text, k, hybrid):
    """Brute-force reimplementation of the scoring contract."""
    ns = store._ns_map[ns_key]
    qn = q / np.linalg.norm(q)
    cos = np.array([ns.vectors[i] @ qn if ns.alive[i] else -np.inf
                    for i in range(ns.count)], dtype=np.float32)
    if hybrid and query_text:
        mask = np.array(ns.alive, bool)
        lex = ns.bm25_candidates(query_text, mask)
        if lex:
            peak = max(lex.values())
            comb = np.where(np.isfinite(cos), 0.5 * cos, -np.inf)
            for i, s in lex.items():
                comb[i] = 0.5 * cos[i] + 0.5 * s / peak
            cos = comb
    order = np.argsort(-cos)[:k]
    return [(int(i), float(cos[i])) for i in order if np.isfinite(cos[i])]


@pytest.mark.parametrize("force_device", [False, True])
def test_query_matches_oracle(monkeypatch, force_device):
    if force_device:
        monkeypatch.setattr(tvs_mod, "DEVICE_SCAN_MIN_ROWS", 1)
    store = TextVectorStore()
    vecs, texts = _mk_corpus()
    run(store.store_embeddings(_chunks(vecs, texts)))
    q = vecs[7] + 0.1
    res = run(store.query_similar(q, k=5, query_text="alpha charlie"))
    expect = _oracle(store, "default", q.astype(np.float32), "alpha charlie", 5, True)
    got = [(store._ns_map["default"]._id_to_row[f"{c.document_id}-{c.chunk_number}"], c.score)
           for c in res]
    assert [i for i, _ in got] == [i for i, _ in expect]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in expect], rtol=1e-4, atol=1e-5)


def test_device_scan_tail_update_and_delete(monkeypatch):
    monkeypatch.setattr(tvs_mod, "DEVICE_SCAN_MIN_ROWS", 1)
    store = TextVectorStore()
    vecs, texts = _mk_corpus(n=32)
    run(store.store_embeddings(_chunks(vecs, texts)))
    q = vecs[3]
    r1 = run(store.query_similar(q, k=3, query_text=None))
    assert r1  # warm device buffer
    # append more (tail update path) and re-query
    vecs2, texts2 = _mk_corpus(n=16, seed=9)
    run(store.store_embeddings(_chunks(vecs2, texts2, doc="x")))
    r2 = run(store.query_similar(vecs2[0], k=1, query_text=None))
    assert r2[0].document_id == "x0" and r2[0].chunk_number == 0
    # delete invalidates the cached alive mask
    run(store.delete_chunks_by_document_id("x0"))
    r3 = run(store.query_similar(vecs2[0], k=4, query_text=None))
    assert all(not (c.document_id == "x0" and c.chunk_number == 0) for c in r3)


def test_doc_filter_and_upsert(monkeypatch):
    monkeypatch.setattr(tvs_mod, "DEVICE_SCAN_MIN_ROWS", 1)
    store = TextVectorStore()
    vecs, texts = _mk_corpus(n=16)
    run(store.store_embeddings(_chunks(vecs, texts)))
    res = run(store.query_similar(vecs[0], k=8, doc_ids=["d1"]))
    assert res and all(c.document_id == "d1" for c in res)
    # upsert same (doc, chunk) replaces the old row
    new = DocumentChunk(document_id="d0", chunk_number=0, content="zulu yankee",
                        embedding=list(map(float, -vecs[0])))
    run(store.store_embeddings([new]))
    top = run(store.query_similar(-vecs[0], k=1))
    assert top[0].document_id == "d0" and top[0].content == "zulu yankee"


def test_bm25_inverted_index_consistency():
    store = TextVectorStore()
    vecs, _ = _mk_corpus(n=8)
    texts = ["apple pie", "apple tart", "banana split", "cherry pie",
             "apple", "grape", "pie pie pie", "nothing"]
    run(store.store_embeddings(_chunks(vecs, texts)))
    ns = store._ns_map["default"]
    mask = np.ones(8, bool)
    scores = ns.bm25_candidates("apple pie", mask)
    # only rows containing apple or pie appear
    assert set(scores) == {0, 1, 3, 4, 6}
    assert scores[0] > scores[4]  # both terms beat one term


def test_persistence_roundtrip(tmp_path):
    store = TextVectorStore(path=tmp_path / "ts")
    vecs, texts = _mk_corpus(n=12)
    run(store.store_embeddings(_chunks(vecs, texts)))
    run(store.delete_chunks_by_document_id("d1"))
    store.save()
    re = TextVectorStore(path=tmp_path / "ts")
    r = run(re.query_similar(vecs[0], k=3, query_text=texts[0]))
    assert r and all(c.document_id != "d1" for c in r)
    ns = re._ns_map["default"]
    assert ns.count == 12 and ns.n_alive() == 8
