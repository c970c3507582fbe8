"""Strict-auth mode (bypass off): missing/forged/expired tokens are
rejected on the wire; valid tokens carry entity identity + permissions
(reference auth_utils.py:146-205)."""

import asyncio

import httpx
import pytest

from morphik_core_tpu.api.app import build_app
from morphik_core_tpu.api.auth import create_token
from morphik_core_tpu.api.http import HTTPServer
from morphik_core_tpu.config import Settings
from morphik_core_tpu.services_init import build_services

_LOOP = asyncio.new_event_loop()


def run(coro):
    return _LOOP.run_until_complete(coro)


@pytest.fixture(scope="module")
def strict_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("strict")
    settings = Settings.model_validate(
        {
            "auth": {"bypass_auth_mode": False, "jwt_secret_key": "test-secret"},
            "storage": {"storage_path": str(root / "storage")},
            "database": {"path": str(root / "db.sqlite")},
            "vector_store": {"index_path": str(root / "index")},
        }
    )
    services = build_services(settings)
    run(services.initialize())
    srv = HTTPServer(build_app(services), "127.0.0.1", 0)
    run(srv.start())
    yield f"http://127.0.0.1:{srv.port}", settings
    run(srv.stop())
    run(services.shutdown())


def test_strict_auth_rejections(strict_server):
    base, settings = strict_server

    async def go():
        async with httpx.AsyncClient(base_url=base, timeout=60.0) as c:
            # no token
            r = await c.post("/documents", json={})
            assert r.status_code == 401
            # forged signature
            bad = create_token(
                Settings.model_validate({"auth": {"jwt_secret_key": "WRONG"}}), entity_id="x"
            )
            r = await c.post("/documents", json={}, headers={"Authorization": f"Bearer {bad}"})
            assert r.status_code == 401
            # expired
            expired = create_token(settings, entity_id="x", expires_in_s=-10)
            r = await c.post("/documents", json={}, headers={"Authorization": f"Bearer {expired}"})
            assert r.status_code == 401
            # malformed
            r = await c.post("/documents", json={}, headers={"Authorization": "Bearer not.a.jwt"})
            assert r.status_code == 401

            # valid token works; read-only token cannot write
            rw = create_token(settings, entity_id="alice")
            r = await c.post("/documents", json={}, headers={"Authorization": f"Bearer {rw}"})
            assert r.status_code == 200
            ro = create_token(settings, entity_id="bob", permissions=["read"])
            r = await c.post("/ingest/text", json={"content": "x"},
                             headers={"Authorization": f"Bearer {ro}"})
            assert r.status_code == 403

            # tenancy isolation: alice's documents invisible to bob
            r = await c.post("/ingest/text", json={"content": "alice secret", "use_colpali": False},
                             headers={"Authorization": f"Bearer {rw}"})
            assert r.status_code == 200
            bob = create_token(settings, entity_id="bob")
            r = await c.post("/documents", json={}, headers={"Authorization": f"Bearer {bob}"})
            assert r.json() == []

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
