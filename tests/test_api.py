"""HTTP API tests: real socket server + httpx client driving the public
endpoints (ingest -> worker -> retrieve -> query, folders, documents,
auth, SSE streaming)."""

import asyncio
import io
import json

import httpx
import pytest
from PIL import Image, ImageDraw

from morphik_core_tpu.api.app import build_app
from morphik_core_tpu.api.http import HTTPServer
from morphik_core_tpu.config import Settings
from morphik_core_tpu.services_init import build_services

_LOOP = asyncio.new_event_loop()


def run(coro):
    return _LOOP.run_until_complete(coro)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("api")
    settings = Settings.model_validate(
        {
            "api": {"port": 0},
            "storage": {"storage_path": str(root / "storage")},
            "database": {"path": str(root / "db.sqlite")},
            "vector_store": {
                "index_path": str(root / "index"),
                "fde_num_repetitions": 8,
                "fde_num_simhash_projections": 4,
                "fde_projection_dimension": 8,
            },
        }
    )
    services = build_services(settings)
    run(services.initialize())
    srv = HTTPServer(build_app(services), "127.0.0.1", 0)
    run(srv.start())
    yield f"http://127.0.0.1:{srv.port}", services
    run(srv.stop())
    run(services.shutdown())


def _client(base):
    return httpx.AsyncClient(base_url=base, timeout=180.0)


def test_ping_health(server):
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.get("/ping")
            assert r.status_code == 200 and r.json()["status"] == "ok"
            r = await c.get("/health")
            assert r.json()["status"] == "healthy"

    run(go())


def test_ingest_text_retrieve_query(server):
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post(
                "/ingest/text",
                json={
                    "content": "The warp drive requires dilithium crystals. Output is 9000 gigawatts.",
                    "filename": "warp.txt",
                    "metadata": {"topic": "engineering"},
                    "use_colpali": False,
                },
            )
            assert r.status_code == 200, r.text
            doc = r.json()
            assert doc["system_metadata"]["status"] == "completed"

            r = await c.post(
                "/retrieve/chunks",
                json={"query": "dilithium crystals", "k": 3, "use_colpali": False},
            )
            assert r.status_code == 200
            chunks = r.json()
            assert chunks and chunks[0]["document_id"] == doc["external_id"]

            r = await c.post(
                "/query",
                json={"query": "What does the warp drive require?", "k": 2, "use_colpali": False},
            )
            body = r.json()
            assert "dilithium" in str(body["completion"]).lower()
            assert body["sources"]

    run(go())


def test_ingest_file_worker_and_status(server):
    base, services = server

    async def go():
        img = Image.new("RGB", (448, 336), (255, 255, 255))
        d = ImageDraw.Draw(img)
        d.rectangle([40, 40, 220, 160], fill=(20, 90, 170))
        d.text((40, 220), "blueprint alpha", fill=(0, 0, 0))
        buf = io.BytesIO()
        img.save(buf, format="PNG")

        async with _client(base) as c:
            r = await c.post(
                "/ingest/file",
                files={"file": ("blueprint.png", buf.getvalue(), "image/png")},
                data={"metadata": json.dumps({"kind": "blueprint"}), "use_colpali": "true"},
            )
            assert r.status_code == 200, r.text
            doc = r.json()
            assert doc["system_metadata"]["status"] == "processing"

            assert await services.job_queue.drain(180)
            r = await c.get(f"/documents/{doc['external_id']}/status")
            assert r.json()["status"] == "completed"

            r = await c.post(
                "/retrieve/chunks",
                json={"query": "blueprint", "k": 1, "use_colpali": True,
                      "filters": {"kind": "blueprint"}},
            )
            chunks = r.json()
            assert chunks and chunks[0]["content"].startswith("data:image/")

            r = await c.post("/documents/pages", json={"document_id": doc["external_id"]})
            pages = r.json()["pages"]
            assert pages and pages[0]["image"].startswith("data:image/")

            r = await c.get(f"/documents/{doc['external_id']}/download_url")
            assert r.json()["download_url"].startswith("file://")

            r = await c.get(f"/documents/{doc['external_id']}/file")
            assert r.status_code == 200 and r.content[:8] == b"\x89PNG\r\n\x1a\n"

    run(go())


def test_streaming_query_sse(server):
    base, _ = server

    async def go():
        async with _client(base) as c:
            await c.post(
                "/ingest/text",
                json={"content": "The moon base has 14 crew members.", "filename": "moon.txt",
                      "use_colpali": False},
            )
            events = []
            async with c.stream(
                "POST", "/query",
                json={"query": "How many crew members?", "k": 1, "use_colpali": False,
                      "stream_response": True},
            ) as r:
                assert r.status_code == 200
                assert r.headers["content-type"].startswith("text/event-stream")
                async for line in r.aiter_lines():
                    if line.startswith("data: "):
                        events.append(line[6:])
            assert events[-1] == "[DONE]"
            toks = [json.loads(e) for e in events[:-1]]
            text = "".join(t["content"] for t in toks if t.get("type") == "assistant")
            assert "14" in text
            assert any(t.get("type") == "sources" for t in toks)

    run(go())


def test_documents_and_folders_api(server):
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post("/folders", json={"name": "Archive"})
            folder = r.json()
            assert folder["path"] == "/Archive"
            r = await c.post("/folders", json={"name": "2024", "parent_path": "/Archive"})
            sub = r.json()
            assert sub["path"] == "/Archive/2024"

            r = await c.post(
                "/ingest/text",
                json={"content": "archived report omega", "filename": "omega.txt",
                      "folder_name": "Archive/2024", "use_colpali": False},
            )
            doc = r.json()
            assert doc["folder_path"] == "/Archive/2024"

            r = await c.post("/documents", json={"folder_name": "/Archive", "folder_depth": -1})
            docs = r.json()
            assert any(d["external_id"] == doc["external_id"] for d in docs)

            r = await c.get("/folders")
            assert {f["path"] for f in r.json()} >= {"/Archive", "/Archive/2024"}

            r = await c.post("/search/documents", json={"query": "omega"})
            assert any(d["external_id"] == doc["external_id"] for d in r.json())

            r = await c.delete(f"/documents/{doc['external_id']}")
            assert r.json()["status"] == "deleted"
            r = await c.get(f"/documents/{doc['external_id']}")
            assert r.status_code == 404

    run(go())


def test_auth_token_flow(server):
    base, services = server

    async def go():
        async with _client(base) as c:
            r = await c.post("/local/generate_uri", json={"name": "alice"})
            uri = r.json()["uri"]
            assert uri.startswith("morphik://alice:")
            token = uri.split("morphik://alice:")[1].split("@")[0]

            headers = {"Authorization": f"Bearer {token}"}
            r = await c.post(
                "/ingest/text",
                json={"content": "alice private note", "filename": "n.txt", "use_colpali": False},
                headers=headers,
            )
            assert r.status_code == 200
            doc = r.json()
            # dev-bypass (different entity) cannot see alice's doc
            r = await c.get(f"/documents/{doc['external_id']}")
            assert r.status_code == 404
            r = await c.get(f"/documents/{doc['external_id']}", headers=headers)
            assert r.status_code == 200
            # garbage token rejected
            r = await c.get("/documents/x", headers={"Authorization": "Bearer junk.token.sig"})
            assert r.status_code == 401

    run(go())


def test_batch_and_models(server):
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post(
                "/ingest/text",
                json={"content": "batch content one two three", "filename": "b.txt",
                      "use_colpali": False},
            )
            doc = r.json()
            r = await c.post("/batch/documents", json={"document_ids": [doc["external_id"]]})
            assert len(r.json()) == 1
            r = await c.post(
                "/batch/chunks",
                json={"sources": [{"document_id": doc["external_id"], "chunk_number": 0}]},
            )
            assert r.json() and "batch content" in r.json()[0]["content"]
            r = await c.get("/models")
            assert any(m.get("backend") == "tpu" for m in r.json())

    run(go())


def test_error_paths(server):
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post("/ingest/text", json={})
            assert r.status_code == 422
            r = await c.post("/ingest/file", files={"wrong": ("a.txt", b"x")})
            assert r.status_code == 422
            r = await c.get("/nonexistent/route")
            assert r.status_code == 404
            r = await c.post("/retrieve/chunks", content=b"{not json", headers={"Content-Type": "application/json"})
            assert r.status_code == 400
            r = await c.delete("/ping")
            assert r.status_code == 405

    run(go())


def test_embeddings_endpoint_npz_roundtrip(server):
    """POST /embeddings speaks the reference GPU-endpoint wire contract
    (npz of emb_i), and ColpaliApiEmbeddingModel can drive it."""
    import io

    import numpy as np

    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post(
                "/embeddings",
                json={"input_type": "text", "inputs": ["alpha beta", "gamma"]},
            )
            assert r.status_code == 200
            npz = np.load(io.BytesIO(r.content))
            assert set(npz.files) == {"emb_0", "emb_1"}
            assert npz["emb_0"].ndim == 2  # (n_tokens, dim) multivector

    run(go())

    from morphik_core_tpu.embedding.colpali_api_embedding_model import ColpaliApiEmbeddingModel

    m = ColpaliApiEmbeddingModel([base])
    emb = run(m.embed_for_query("hello world"))
    assert emb.ndim == 2 and emb.shape[0] >= 1


def test_api_keys_crud(server):
    """Provider API-key storage with sanitized listing (reference
    routes/models.py:221-300)."""
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.get("/api-keys")
            before = r.json()
            r = await c.post("/api-keys", json={"provider": "openai", "api_key": "sk-secret",
                                                "base_url": "https://api.openai.com/v1"})
            assert r.status_code == 200
            r = await c.get("/api-keys")
            keys = r.json()
            assert keys["openai"]["configured"] is True
            assert keys["openai"]["apiKey"] == "***"  # sanitized
            assert "sk-secret" not in r.text
            # update path (same provider twice -> no duplicate)
            r = await c.post("/api-keys", json={"provider": "openai", "api_key": "sk-new"})
            assert r.status_code == 200
            r = await c.get("/api-keys")
            assert list(r.json()).count("openai") == 1
            r = await c.post("/api-keys", json={"provider": "openai"})
            assert r.status_code == 422

    run(go())


def test_custom_models_isolated_from_api_keys(server):
    """Custom models live under provider="custom" rows; api-key rows own
    the provider-named slots (reference routes/models.py:142-167).
    Saving a key for a provider a custom model uses must NOT overwrite
    the model, and /models/custom must never leak key material
    (round-4 review findings)."""
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post("/models/custom", json={
                "provider": "openai", "name": "my-gpt", "model": "gpt-4o-mini",
                "api_base": "https://proxy.internal/v1"})
            assert r.status_code == 200
            mid = r.json()["id"]
            # key save for the SAME provider must not clobber the model
            r = await c.post("/api-keys", json={"provider": "openai",
                                                "api_key": "sk-collision"})
            assert r.status_code == 200
            r = await c.get("/models/custom")
            models = r.json()
            mine = [m for m in models if m["id"] == mid]
            assert mine and mine[0]["config_data"]["name"] == "my-gpt"
            assert mine[0]["config_data"]["model"] == "gpt-4o-mini"
            # key rows are absent and no secret material appears anywhere
            assert all(m["provider"] == "custom" for m in models)
            assert "sk-collision" not in r.text
            r = await c.get("/api-keys")
            assert r.json()["openai"]["configured"] is True

    run(go())


def test_health_components(server):
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.get("/health")
            body = r.json()
            assert body["status"] in ("healthy", "degraded")
            assert body["components"]["database"] == "ok"
            assert body["components"]["storage"] == "ok"
            assert body["components"]["colpali"]["enabled"] is True

    run(go())


def test_concurrent_requests(server):
    """The single-loop server interleaves many simultaneous requests
    (ingest + retrieve + reads) without errors or cross-talk."""
    base, _ = server

    async def go():
        async with _client(base) as c:
            async def ingest(i):
                r = await c.post(
                    "/ingest/text",
                    json={"content": f"concurrent doc {i} token {i*13}",
                          "filename": f"c{i}.txt", "use_colpali": False},
                )
                assert r.status_code == 200
                return r.json()["external_id"]

            ids = await asyncio.gather(*[ingest(i) for i in range(12)])
            assert len(set(ids)) == 12

            async def retrieve(i):
                r = await c.post(
                    "/retrieve/chunks",
                    json={"query": f"concurrent doc {i} token {i*13}", "k": 1,
                          "use_colpali": False},
                )
                assert r.status_code == 200 and r.json()
                return r.json()[0]["content"]

            async def read(i):
                r = await c.get(f"/documents/{ids[i]}")
                assert r.status_code == 200
                return r.json()["filename"]

            results = await asyncio.gather(
                *[retrieve(i) for i in range(12)], *[read(i) for i in range(12)]
            )
            # no cross-talk: each retrieval hits its own doc's content
            for i in range(12):
                assert f"token {i*13}" in results[i] or f"doc {i} " in results[i]
            assert results[12:] == [f"c{i}.txt" for i in range(12)]

    run(go())


def test_typed_metadata_filters_route_level(server):
    """Typed metadata ($gt on numbers, datetime coercion) through the
    public route (reference api.py:356-373 filter language contract)."""
    base, _ = server

    async def go():
        async with _client(base) as c:
            for name, price, when in [("cheap", 5, "2026-01-10T00:00:00"),
                                       ("mid", 50, "2026-03-10T00:00:00"),
                                       ("dear", 500, "2026-06-10T00:00:00")]:
                r = await c.post(
                    "/ingest/text",
                    json={"content": f"catalog item {name}", "filename": f"{name}.txt",
                          "use_colpali": False,
                          "metadata": {"price": price, "listed_at": when, "kind": "catalog"},
                          "metadata_types": {"price": "number", "listed_at": "datetime"}},
                )
                assert r.status_code == 200
            r = await c.post("/documents", json={"filters": {
                "$and": [{"kind": "catalog"}, {"price": {"$gt": 10}}]}})
            names = sorted(d["filename"] for d in r.json())
            assert names == ["dear.txt", "mid.txt"]
            r = await c.post("/documents", json={"filters": {
                "$and": [{"kind": "catalog"},
                          {"listed_at": {"$gte": "2026-03-01T00:00:00"}}]}})
            names = sorted(d["filename"] for d in r.json())
            assert names == ["dear.txt", "mid.txt"]
            r = await c.post("/retrieve/chunks", json={
                "query": "catalog item", "k": 5, "use_colpali": False,
                "filters": {"price": {"$lt": 100}}})
            contents = {x["content"] for x in r.json()}
            assert any("cheap" in t for t in contents)
            assert not any("dear" in t for t in contents)

    run(go())


def test_image_query_retrieval(server):
    """query_image: retrieve by PIL image through the public route,
    with the reference's 10 MB cap enforced (document_service.py:234-246)."""
    import io as _io

    from morphik_core_tpu.utils.fast_ops import bytes_to_data_uri

    base, _ = server

    async def go():
        async with _client(base) as c:
            # ingest a visual page
            img = Image.new("RGB", (336, 224), (255, 255, 255))
            d = ImageDraw.Draw(img)
            for y in range(20, 200, 16):
                d.text((10, y), "IMAGE QUERY TARGET PAGE", fill=(0, 0, 0))
            buf = _io.BytesIO()
            img.save(buf, format="PNG")
            r = await c.post("/ingest/file", files={"file": ("iq.png", buf.getvalue(), "image/png")})
            did = r.json()["external_id"]
            for _ in range(450):
                s = (await c.get(f"/documents/{did}/status")).json()
                if s["status"] in ("completed", "failed"):
                    break
                await asyncio.sleep(0.2)
            assert s["status"] == "completed"

            # query WITH AN IMAGE (same page) -> must hit itself
            r = await c.post(
                "/retrieve/chunks",
                json={"query": "", "k": 1,
                      "query_image": bytes_to_data_uri(buf.getvalue(), "image/png")},
            )
            assert r.status_code == 200 and r.json(), r.text
            assert r.json()[0]["document_id"] == did

            # oversized image query -> 400 (reference 10 MB cap)
            big = bytes_to_data_uri(b"\x89PNG" + b"0" * (11 * 1024 * 1024), "image/png")
            r = await c.post("/retrieve/chunks", json={"query": "", "k": 1, "query_image": big})
            assert r.status_code == 400

    run(go())


def test_output_format_text_for_image_chunks(server):
    """output_format='text': image chunks come back as text (VLM markdown
    when a vision model is configured; placeholder under the offline
    stub — never a data URI). Reference document_service.py:1497."""
    import io as _io

    base, _ = server

    async def go():
        async with _client(base) as c:
            img = Image.new("RGB", (336, 224), (255, 255, 255))
            d = ImageDraw.Draw(img)
            d.text((10, 100), "TEXT FORMAT PAGE", fill=(0, 0, 0))
            buf = _io.BytesIO()
            img.save(buf, format="PNG")
            r = await c.post("/ingest/file", files={"file": ("tf.png", buf.getvalue(), "image/png")})
            did = r.json()["external_id"]
            for _ in range(450):
                s = (await c.get(f"/documents/{did}/status")).json()
                if s["status"] in ("completed", "failed"):
                    break
                await asyncio.sleep(0.2)
            r = await c.post("/retrieve/chunks", json={
                "query": "text format page", "k": 1, "output_format": "text"})
            content = r.json()[0]["content"]
            assert not content.startswith("data:image")
            assert "tf.png" in content or content  # placeholder mentions the file

    run(go())


def test_chat_history_persistence(server):
    """chat_id threads history through /query; /chat/{id}, /chats and
    title rename work (reference api.py:640-849, 1709-1749)."""
    base, _ = server

    async def go():
        async with _client(base) as c:
            await c.post("/ingest/text", json={"content": "The chat corpus mentions zeppelins.",
                                               "use_colpali": False})
            r = await c.post("/query", json={"query": "What is mentioned?", "k": 1,
                                             "use_colpali": False, "chat_id": "chat-77"})
            assert r.status_code == 200
            r = await c.post("/query", json={"query": "Anything else?", "k": 1,
                                             "use_colpali": False, "chat_id": "chat-77"})
            assert r.status_code == 200
            r = await c.get("/chat/chat-77")
            hist = r.json()["history"]
            assert [m["role"] for m in hist] == ["user", "assistant", "user", "assistant"]
            assert hist[0]["content"] == "What is mentioned?"
            r = await c.get("/chats")
            assert any(ch["chat_id"] == "chat-77" for ch in r.json())
            r = await c.patch("/chats/chat-77/title", json={"title": "Zeppelin chat"})
            assert r.json()["success"] is True
            r = await c.get("/chats")
            assert any(ch.get("title") == "Zeppelin chat" for ch in r.json())

    run(go())


def test_batch_ingest_files_error_isolation(server):
    """/ingest/files: one bad upload doesn't sink the batch (reference
    routes/ingest.py:167 BatchIngestResponse semantics)."""
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post(
                "/ingest/files",
                files=[
                    ("files", ("ok1.txt", b"first good file", "text/plain")),
                    ("files", ("ok2.txt", b"second good file", "text/plain")),
                ],
                data={"use_colpali": "false"},
            )
            assert r.status_code == 200
            body = r.json()
            assert len(body["documents"]) == 2 and body["errors"] == []
            names = {d["filename"] for d in body["documents"]}
            assert names == {"ok1.txt", "ok2.txt"}

    run(go())


def test_grouped_retrieval_with_padding_route(server):
    """/retrieve/chunks/grouped with padding over a multi-page PDF:
    response carries flat chunks + groups with main/padding split
    (reference GroupedChunkResponse, models/documents.py:136-159)."""
    from tests.test_parser import make_pdf

    base, _ = server

    async def go():
        async with _client(base) as c:
            pdf = make_pdf([f"Grouped page {i}: reactor output {i * 100} MW" for i in range(4)])
            r = await c.post("/ingest/file", files={"file": ("g.pdf", pdf, "application/pdf")},
                              data={"metadata": json.dumps({"grouped_test": True})})
            did = r.json()["external_id"]
            for _ in range(450):
                s = (await c.get(f"/documents/{did}/status")).json()
                if s["status"] in ("completed", "failed"):
                    break
                await asyncio.sleep(0.2)
            assert s["status"] == "completed"
            r = await c.post(
                "/retrieve/chunks/grouped",
                json={"query": "reactor output 200", "k": 1, "padding": 1,
                      "filters": {"grouped_test": True}},
            )
            body = r.json()
            assert body["chunks"], body
            assert body["groups"]
            g = body["groups"][0]
            assert g["main_chunk"]["document_id"] == did
            pads = g["padding_chunks"]
            assert all(p["is_padding"] for p in pads)
            assert all(p["score"] == 0.0 for p in pads)
            # neighbors are page +-1 of the main chunk
            main_no = g["main_chunk"]["chunk_number"]
            assert all(abs(p["chunk_number"] - main_no) <= 1 for p in pads)

    run(go())


def test_ingest_requeue_route(server):
    """POST /ingest/requeue re-drives a document through the worker
    (reference routes/ingest.py:272)."""
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post("/ingest/file",
                             files={"file": ("rq.txt", b"requeue target body", "text/plain")},
                             data={"use_colpali": "false"})
            did = r.json()["external_id"]
            for _ in range(450):
                s = (await c.get(f"/documents/{did}/status")).json()
                if s["status"] in ("completed", "failed"):
                    break
                await asyncio.sleep(0.2)
            assert s["status"] == "completed"
            r = await c.post("/ingest/requeue", json={"document_ids": [did, "missing-id"],
                                                       "use_colpali": False})
            assert r.json()["requeued"] == [did]  # unknown ids skipped
            for _ in range(450):
                s = (await c.get(f"/documents/{did}/status")).json()
                if s["status"] == "completed":
                    break
                await asyncio.sleep(0.2)
            assert s["status"] == "completed"  # re-processed back to completed

    run(go())


def test_console_served(server):
    """GET /console serves the single-file admin console (counterpart of
    reference ee/ui-component) with its main sections present."""
    base, _ = server

    async def fetch():
        async with _client(base) as c:
            return await c.get("/console")

    r = run(fetch())
    assert r.status_code == 200
    assert r.headers["content-type"].startswith("text/html")
    body = r.text
    for marker in ("Morphik", 'data-tab="documents"', 'data-tab="search"',
                   'data-tab="chat"', 'data-tab="folders"', "/retrieve/chunks",
                   "/ingest/file", "stream_response",
                   # round-3: PDF page viewer + connector management
                   'data-tab="connectors"', "/documents/pages", "auth_status",
                   "viewercard", "/ingest'", "disconnect",
                   # round-4: model-config + API-key panels
                   'data-tab="models"', "/models/custom", "/models/available",
                   "/api-keys", "custmodels", "akrows",
                   # round-4: filterable telemetry logs panel
                   'data-tab="logs"', "lgrows", "since_hours", "op_type"):
        assert marker in body, marker


def test_upload_preserves_trailing_newlines(server):
    """Regression: the multipart parser stripped trailing \\r/\\n bytes
    from uploaded content (framing CRLF vs payload bytes)."""
    base, services = server

    async def go():
        payload = b"line1\nline2\n\n"
        async with _client(base) as c:
            r = await c.post("/ingest/file", files={"file": ("nl.txt", payload)},
                             data={"metadata": "{}", "use_colpali": "false"})
            assert r.status_code == 200, r.text
            doc_id = r.json()["external_id"]
            for _ in range(900):
                s = await c.get(f"/documents/{doc_id}/status")
                if s.json()["status"] == "completed":
                    break
                await asyncio.sleep(0.1)
            f = await c.get(f"/documents/{doc_id}/file")
            assert f.content == payload  # byte-identical round trip

    run(go())


def test_percent_encoded_filename_route(server):
    """Regression: %-encoded path segments (spaces) must match routes."""
    base, services = server

    async def go():
        async with _client(base) as c:
            r = await c.post("/ingest/text", json={
                "content": "space file content", "filename": "my file.txt",
                "use_colpali": False})
            assert r.status_code == 200
            g = await c.get("/documents/filename/my%20file.txt")
            assert g.status_code == 200
            assert g.json()["filename"] == "my file.txt"

    run(go())


def test_documents_pages_range_validation(server):
    base, services = server

    async def go():
        async with _client(base) as c:
            r = await c.post("/ingest/text", json={"content": "x", "filename": "pg.txt",
                                                   "use_colpali": False})
            doc_id = r.json()["external_id"]
            bad = await c.post("/documents/pages", json={
                "document_id": doc_id, "start_page": 0, "end_page": 2_000_000_000})
            assert bad.status_code == 422
            bad2 = await c.post("/documents/pages", json={
                "document_id": doc_id, "start_page": 5, "end_page": 1})
            assert bad2.status_code == 422

    run(go())

@pytest.fixture(scope="module", autouse=True)
def _loop_lifecycle():
    """Run pending callbacks (async-generator aclose tasks scheduled at
    GC) and CLOSE the module loop — an abandoned loop turns those into
    'Task was destroyed but it is pending!' at interpreter exit."""
    yield
    try:
        _LOOP.run_until_complete(asyncio.sleep(0.05))
    finally:
        _LOOP.close()


def test_reference_route_aliases(server):
    """Reference-surface aliases: POST /documents/list_docs, POST
    /models, DELETE /models/{id}, PATCH /apps/rename (query params) all
    behave like their canonical twins (reference routes/documents.py:48,
    routes/models.py:70,176, core/api.py:1584)."""
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post("/documents/list_docs", json={"limit": 5})
            assert r.status_code == 200 and isinstance(r.json(), list)
            r = await c.post("/models", json={"provider": "openai",
                                              "name": "alias-model", "model": "gpt-x"})
            assert r.status_code == 200
            mid = r.json()["id"]
            r = await c.get("/models/custom")
            assert any(m["id"] == mid for m in r.json())
            r = await c.request("DELETE", f"/models/{mid}")
            assert r.status_code == 200 and r.json()["success"] is True
            r = await c.get("/models/custom")
            assert all(m["id"] != mid for m in r.json())
            # PATCH rename via query params (reference signature)
            r = await c.post("/cloud/generate_uri", json={"name": "alias_app"})
            app_id = r.json()["app_id"]
            r = await c.request(
                "PATCH", f"/apps/rename?app_id={app_id}&new_name=alias_app_two"
            )
            assert r.status_code == 200 and r.json()["name"] == "alias_app_two"

    run(go())
