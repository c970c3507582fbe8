"""Multi-endpoint embedding client tests (reference seams:
core/embedding/colpali_api_embedding_model.py — interleaved sharding,
health/cooldown failover, 413 batch halving)."""

import asyncio

import numpy as np
import pytest

from morphik_core_tpu.embedding.colpali_api_embedding_model import (
    AllEndpointsDown,
    ColpaliApiEmbeddingModel,
    PayloadTooLarge,
)
from morphik_core_tpu.models.schemas import Chunk


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def make_model(endpoints, post_sync):
    m = ColpaliApiEmbeddingModel(endpoints, embedding_dim=8)
    m._post_sync = post_sync
    return m


def emb_for(text):
    # Deterministic fake multivector: value encodes the input
    return np.full((3, 8), float(hash(text) % 997), dtype=np.float32)


def test_order_preserved_across_interleaved_shards():
    calls = []

    def post(ep, input_type, inputs):
        calls.append((ep, list(inputs)))
        return [emb_for(v) for v in inputs]

    m = make_model(["http://a", "http://b", "http://c"], post)
    texts = [f"t{i}" for i in range(7)]
    out = run(m._embed_batch("text", texts))
    assert len(out) == 7
    for t, e in zip(texts, out):
        assert np.array_equal(e, emb_for(t))
    # interleaved: endpoint a gets t0,t3,t6; b gets t1,t4; c gets t2,t5
    by_ep = dict((ep.split("//")[1], v) for ep, v in calls)
    assert by_ep["a"] == ["t0", "t3", "t6"]
    assert by_ep["b"] == ["t1", "t4"]
    assert by_ep["c"] == ["t2", "t5"]


def test_failed_shard_retried_on_survivor():
    def post(ep, input_type, inputs):
        if ep == "http://bad":
            raise ConnectionError("down")
        return [emb_for(v) for v in inputs]

    m = make_model(["http://bad", "http://good"], post)
    out = run(m._embed_batch("text", ["x", "y", "z"]))
    assert all(o is not None for o in out)
    assert not m._health["http://bad"].healthy
    assert m._health["http://good"].healthy
    # second batch goes entirely to the survivor without raising
    out2 = run(m._embed_batch("text", ["p", "q"]))
    assert len(out2) == 2


def test_all_endpoints_down_resets_health():
    def post(ep, input_type, inputs):
        raise ConnectionError("down")

    m = make_model(["http://a", "http://b"], post)
    with pytest.raises(AllEndpointsDown):
        run(m._embed_batch("text", ["x"]))
    # health reset so the next request re-probes
    assert all(h.healthy for h in m._health.values())


def test_413_batch_halving():
    sizes = []

    def post(ep, input_type, inputs):
        sizes.append(len(inputs))
        if len(inputs) > 2:
            raise PayloadTooLarge(ep)
        return [emb_for(v) for v in inputs]

    m = make_model(["http://a"], post)
    texts = [f"t{i}" for i in range(8)]
    out = run(m._embed_batch("text", texts))
    assert [np.array_equal(e, emb_for(t)) for t, e in zip(texts, out)] == [True] * 8
    assert max(s for s in sizes if s <= 2) <= 2  # eventually split to <=2
    assert 8 in sizes  # first attempt was the full batch


def test_embed_for_ingestion_splits_streams():
    seen = {}

    def post(ep, input_type, inputs):
        seen.setdefault(input_type, []).extend(inputs)
        return [emb_for(v) for v in inputs]

    m = make_model(["http://a"], post)
    chunks = [
        Chunk(content="plain text", metadata={}),
        Chunk(content="data:image/png;base64,AAAA", metadata={"is_image": True}),
        Chunk(content="more text", metadata={}),
    ]
    out = run(m.embed_for_ingestion(chunks))
    assert len(out) == 3
    assert seen["image"] == ["data:image/png;base64,AAAA"]
    assert seen["text"] == ["plain text", "more text"]
    assert np.array_equal(out[1], emb_for("data:image/png;base64,AAAA"))
