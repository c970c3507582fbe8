"""App management, cloud URIs, token rotation/revocation, summaries, and
on-the-fly document query (reference core/api.py:1028-1707,
routes/documents.py:207-236, routes/folders.py:257-307,
routes/ingest.py:471)."""

import asyncio
import json

import httpx
import pytest

from morphik_core_tpu.api.app import build_app
from morphik_core_tpu.api.http import HTTPServer
from morphik_core_tpu.config import Settings
from morphik_core_tpu.services_init import build_services

_LOOP = asyncio.new_event_loop()


def run(coro):
    return _LOOP.run_until_complete(coro)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("apps")
    settings = Settings.model_validate(
        {
            "api": {"port": 0},
            "storage": {"storage_path": str(root / "storage")},
            "database": {"path": str(root / "db.sqlite")},
            "vector_store": {
                "index_path": str(root / "index"),
                "fde_num_repetitions": 4,
                "fde_num_simhash_projections": 3,
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
    return httpx.AsyncClient(base_url=base, timeout=120.0)


def test_cloud_uri_apps_lifecycle(server):
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post("/cloud/generate_uri", json={"name": "myapp"})
            assert r.status_code == 200, r.text
            out = r.json()
            assert out["uri"].startswith("morphik://myapp:")
            app_id = out["app_id"]
            token = out["uri"].split("morphik://myapp:")[1].split("@")[0]

            r = await c.get("/apps")
            assert r.status_code == 200
            assert any(a["app_id"] == app_id for a in r.json()["apps"])

            # token works before rotation
            hdr = {"Authorization": f"Bearer {token}"}
            r = await c.post("/documents", json={}, headers=hdr)
            assert r.status_code == 200

            r = await c.post("/apps/rename", json={"app_id": app_id, "new_name": "renamed"})
            assert r.status_code == 200
            r = await c.get("/apps")
            assert any(a["name"] == "renamed" for a in r.json()["apps"])

            # rotation revokes the old token
            r = await c.post("/apps/rotate_token", json={"app_id": app_id})
            assert r.status_code == 200 and r.json()["token_version"] == 2
            new_token = r.json()["uri"].split(":", 2)[2].split("@")[0]
            r = await c.post("/documents", json={}, headers=hdr)
            assert r.status_code == 401  # old token dead
            r = await c.post(
                "/documents", json={}, headers={"Authorization": f"Bearer {new_token}"}
            )
            assert r.status_code == 200  # new token works

            r = await c.delete("/apps", params={"app_id": app_id})
            assert r.status_code == 200
            r = await c.get("/apps")
            assert not any(a["app_id"] == app_id for a in r.json()["apps"])

    run(go())


def test_document_and_folder_summaries(server):
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post(
                "/ingest/text",
                json={"content": "Summary target document.", "filename": "s.txt",
                      "use_colpali": False, "folder_name": "reports"},
            )
            doc_id = r.json()["external_id"]

            r = await c.get(f"/documents/{doc_id}/summary")
            assert r.status_code == 404
            r = await c.put(f"/documents/{doc_id}/summary", json={"content": "v1 summary"})
            assert r.status_code == 200 and r.json()["version"] == 1
            r = await c.put(f"/documents/{doc_id}/summary", json={"content": "v2 summary"})
            assert r.json()["version"] == 2
            r = await c.get(f"/documents/{doc_id}/summary")
            assert r.json()["content"] == "v2 summary" and r.json()["version"] == 2

            # folder summaries
            r = await c.get("/folders/summary")
            assert r.status_code == 200
            entries = {e["name"]: e for e in r.json()}
            assert "reports" in entries and entries["reports"]["doc_count"] >= 1
            folder_id = entries["reports"]["id"]
            r = await c.put(f"/folders/{folder_id}/summary", json={"content": "folder notes"})
            assert r.status_code == 200
            r = await c.get(f"/folders/{folder_id}/summary")
            assert r.json()["content"] == "folder notes"

            # oversized summary rejected
            r = await c.put(f"/documents/{doc_id}/summary", json={"content": "x" * 300_000})
            assert r.status_code == 400

    run(go())


def test_on_the_fly_document_query(server):
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post(
                "/ingest/document/query",
                files={"file": ("note.txt", b"The reactor outputs 42 terawatts.", "text/plain")},
                data={"prompt": "What is the power output?"},
            )
            assert r.status_code == 200, r.text
            out = r.json()
            assert out["completion"]
            assert out["document"] is None

            # structured output + follow-up ingestion
            schema = {"type": "object", "properties": {"answer": {"type": "string"}}}
            r = await c.post(
                "/ingest/document/query",
                files={"file": ("note.txt", b"The reactor outputs 42 terawatts.", "text/plain")},
                data={
                    "prompt": "Extract the power output.",
                    "schema": json.dumps(schema),
                    "ingestion_options": json.dumps({"ingest": True, "use_colpali": False}),
                },
            )
            assert r.status_code == 200, r.text
            out = r.json()
            assert out["document"] is not None
            doc_id = out["document"]["external_id"]
            for _ in range(450):
                s = (await c.get(f"/documents/{doc_id}/status")).json()
                if s["status"] in ("completed", "failed"):
                    break
                await asyncio.sleep(0.2)
            assert s["status"] == "completed"

            # empty file rejected
            r = await c.post(
                "/ingest/document/query",
                files={"file": ("e.txt", b"", "text/plain")},
                data={"prompt": "?"},
            )
            assert r.status_code in (400, 422)  # empty upload rejected

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
