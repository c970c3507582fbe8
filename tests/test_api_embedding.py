"""Multi-endpoint embedding client tests (reference seams:
core/embedding/colpali_api_embedding_model.py — interleaved sharding,
health/cooldown failover, 413 batch halving)."""

import asyncio

from conftest import run_once

import numpy as np
import pytest

from morphik_core_tpu.embedding.colpali_api_embedding_model import (
    AllEndpointsDown,
    ColpaliApiEmbeddingModel,
    PayloadTooLarge,
)
from morphik_core_tpu.models.schemas import Chunk


def run(coro):
    return run_once(coro)


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


# ---------------------------------------------------------------------------
# RoutedEmbeddingModel (reference LiteLLMEmbeddingModel routing semantics)
# ---------------------------------------------------------------------------

from morphik_core_tpu.config import Settings
from morphik_core_tpu.embedding.text_embedding import RoutedEmbeddingModel


def _settings(models, dims=64):
    return Settings.model_validate(
        {"registered_models": models, "embedding": {"model": list(models)[0], "dimensions": dims}}
    )


def _capture(model, response_fn):
    calls = []

    async def fake(url, payload, headers):
        calls.append((url, payload, headers))
        return response_fn(payload)

    model._request = fake
    return calls


def test_routed_openai_compat():
    s = _settings({"emb": {"model_name": "text-embedding-3-small", "api_key": "sk-x"}})
    m = RoutedEmbeddingModel("emb", s)
    assert m.provider == "openai" and m.batch_size == 100
    calls = _capture(m, lambda p: {"data": [{"embedding": [0.5] * 128} for _ in p["input"]]})
    out = run(m.embed_documents(["a", "b"]))
    assert len(out) == 2 and out[0].shape == (64,)  # capped at configured dims
    url, payload, headers = calls[0]
    assert url == "https://api.openai.com/v1/embeddings"
    assert headers["Authorization"] == "Bearer sk-x"
    assert payload == {"model": "text-embedding-3-small", "input": ["a", "b"]}


def test_routed_ollama_native_and_local_batching():
    s = _settings({"emb": {"model_name": "ollama/nomic-embed-text",
                           "api_base": "http://localhost:11434"}})
    m = RoutedEmbeddingModel("emb", s)
    assert m.provider == "ollama" and m.batch_size == 5  # local -> small batches
    calls = _capture(m, lambda p: {"embeddings": [[0.1] * 32 for _ in p["input"]]})
    out = run(m.embed_documents([f"t{i}" for i in range(7)]))
    assert len(out) == 7
    assert len(calls) == 2  # 5 + 2
    assert calls[0][0] == "http://localhost:11434/api/embed"
    assert calls[0][1]["model"] == "nomic-embed-text"


def test_routed_azure_header():
    s = _settings({"emb": {"model_name": "azure/embed-deploy",
                           "api_base": "https://corp.azure.example/v1", "api_key": "az-1"}})
    m = RoutedEmbeddingModel("emb", s)
    calls = _capture(m, lambda p: {"data": [{"embedding": [1.0] * 8} for _ in p["input"]]})
    vec = run(m.embed_for_query("q"))
    assert vec.shape == (8,)
    url, _, headers = calls[0]
    assert url == ("https://corp.azure.example/v1/openai/deployments/"
                   "embed-deploy/embeddings?api-version=2024-02-01")
    assert headers["api-key"] == "az-1" and "Authorization" not in headers


def test_routed_unknown_key_raises():
    s = _settings({"emb": {"model_name": "x"}})
    with pytest.raises(ValueError):
        RoutedEmbeddingModel("nope", s)
