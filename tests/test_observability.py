"""Telemetry event reader, /logs route, /migrate/document, profiling
middleware, log-uploader budget enforcement (reference routes/logs.py,
routes/migrate.py, middleware/profiling.py, services/log_uploader.py)."""

import asyncio
import json
from datetime import datetime, timedelta, timezone
from pathlib import Path

import httpx
import pytest

from morphik_core_tpu.api.app import build_app
from morphik_core_tpu.api.http import HTTPServer, Request, Response, Router
from morphik_core_tpu.config import Settings
from morphik_core_tpu.services.log_uploader import LogUploader, enforce_local_budget
from morphik_core_tpu.services.telemetry import TelemetryEventReader, TelemetryService
from morphik_core_tpu.services_init import build_services

_LOOP = asyncio.new_event_loop()


def run(coro):
    return _LOOP.run_until_complete(coro)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("obs")
    TelemetryService.reset()
    settings = Settings.model_validate(
        {
            "api": {"port": 0},
            "service": {"enable_profiling": False},
            "storage": {"storage_path": str(root / "storage")},
            "database": {"path": str(root / "db.sqlite")},
            "telemetry": {"telemetry_dir": str(root / "telemetry")},
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
    TelemetryService.reset()


def _client(base):
    return httpx.AsyncClient(base_url=base, timeout=120.0)


def test_event_reader_filters(tmp_path):
    d = tmp_path / "tel"
    d.mkdir()
    now = datetime.now(timezone.utc)
    rows = [
        {"operation": "query", "status": "ok", "user_id": "u1", "start": now.isoformat()},
        {"operation": "ingest_text", "status": "error", "user_id": "u1", "start": now.isoformat()},
        {"operation": "query", "status": "ok", "user_id": "u2",
         "start": (now - timedelta(hours=10)).isoformat()},
    ]
    (d / "spans_20260816.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    r = TelemetryEventReader(d)
    assert len(r.query()) == 3
    assert len(r.query(operation_type="query")) == 2
    assert len(r.query(status="error")) == 1
    assert len(r.query(user_id="u2")) == 1
    assert len(r.query(since=now - timedelta(hours=4))) == 2
    assert len(r.query(limit=1)) == 1


def test_logs_route(server):
    base, services = server

    async def go():
        async with _client(base) as c:
            await c.post("/ingest/text", json={"content": "log source", "use_colpali": False})
            r = await c.get("/logs")
            assert r.status_code == 200
            ops = [e["operation"] for e in r.json()["events"]]
            assert "ingest_text" in ops
            r = await c.get("/logs", params={"op_type": "nonexistent_op"})
            assert r.json()["count"] == 0

    run(go())


def test_migrate_document_preserves_id(server):
    base, _ = server

    async def go():
        async with _client(base) as c:
            r = await c.post(
                "/migrate/document",
                files={"file": ("m.txt", b"migrated body text", "text/plain")},
                data={"source_document_id": "legacy-doc-42", "use_colpali": "false"},
            )
            assert r.status_code == 200, r.text
            out = r.json()
            assert out["status"] == "created"
            assert out["document"]["external_id"] == "legacy-doc-42"
            for _ in range(450):
                s = (await c.get("/documents/legacy-doc-42/status")).json()
                if s["status"] in ("completed", "failed"):
                    break
                await asyncio.sleep(0.2)
            assert s["status"] == "completed"

            # conflict: skip returns existing, fail 409s
            r = await c.post(
                "/migrate/document",
                files={"file": ("m.txt", b"migrated body text", "text/plain")},
                data={"source_document_id": "legacy-doc-42"},
            )
            assert r.json()["status"] == "skipped"
            r = await c.post(
                "/migrate/document",
                files={"file": ("m.txt", b"migrated body text", "text/plain")},
                data={"source_document_id": "legacy-doc-42", "on_conflict": "fail"},
            )
            assert r.status_code == 409

    run(go())


def test_profiling_wrapper(tmp_path):
    from morphik_core_tpu.api.middleware import make_profiling_wrapper

    router = Router()
    router.wrappers.append(make_profiling_wrapper(tmp_path))

    @router.get("/x")
    async def x(req: Request) -> Response:
        return Response.json({"ok": True})

    req = Request(method="GET", path="/x", headers={}, body=b"", query={})
    resp = run(router.dispatch(req))
    assert resp.status == 200
    profs = list(Path(tmp_path).glob("profile_GET_x_*.prof"))
    assert len(profs) == 1
    import pstats

    stats = pstats.Stats(str(profs[0]))  # parses -> valid profile
    assert stats.total_calls >= 0


def test_log_uploader_budget(tmp_path):
    d = tmp_path / "tel"
    d.mkdir()
    old = d / "spans_old.jsonl"
    new = d / "spans_new.jsonl"
    old.write_text("x" * 600)
    new.write_text("y" * 600)
    import os
    import time as _t

    os.utime(old, (_t.time() - 1000, _t.time() - 1000))
    freed = enforce_local_budget(d, budget_bytes=1000)
    assert freed == 600
    assert not old.exists() and new.exists()

    # uploader with no URL configured never uploads but enforces budget
    up = LogUploader(d, upload_url=None, budget_bytes=100)
    assert up.upload_once() is False
    assert not new.exists()  # over budget -> dropped


def test_device_profile_capture(server):
    """POST /logs/profile/device captures a jax trace window (reference
    yappi middleware analogue, SURVEY.md §5 -> xprof)."""
    base, _ = server

    async def go():
        async with httpx.AsyncClient(base_url=base, timeout=60.0) as c:
            r = await c.post("/logs/profile/device", json={"seconds": 0.2})
            assert r.status_code == 200, r.text
            out = r.json()
            assert out["seconds"] == 0.2
            import pathlib
            assert pathlib.Path(out["trace_dir"]).exists()
            return out

    out = run(go())
    # a trace directory is produced (file layout is backend-specific)
    assert "trace_dir" in out

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
