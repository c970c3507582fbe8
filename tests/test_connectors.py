"""EE connector framework tests (reference ee/services/connectors/ +
ee/routers/connectors_router.py): local-directory connector end-to-end
through the API, GitHub connector against a faked transport, credential
storage semantics."""

import asyncio
import base64
import json

import httpx
import pytest

from morphik_core_tpu.api.app import build_app
from morphik_core_tpu.api.http import HTTPServer
from morphik_core_tpu.config import Settings
from morphik_core_tpu.ee.connectors import get_connector
from morphik_core_tpu.ee.connectors.base import sanitize_user_id
from morphik_core_tpu.ee.connectors.github import GitHubConnector
from morphik_core_tpu.services_init import build_services

_LOOP = asyncio.new_event_loop()


def run(coro):
    return _LOOP.run_until_complete(coro)


def test_sanitize_user_id():
    a = sanitize_user_id("user@example.com")
    b = sanitize_user_id("user@example!com")
    assert a != b and "/" not in a and "@" not in a
    c = sanitize_user_id("../../etc")
    assert "/" not in c and ".." not in c  # no traversal characters survive


def test_local_connector_lifecycle(tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha")
    (src / "sub" / "b.txt").write_text("beta")

    conn = get_connector("local", "u1", tmp_path / "creds")
    status = run(conn.get_auth_status())
    assert not status.is_authenticated
    assert run(conn.initiate_auth())["credentials_required"] == ["root"]
    assert run(conn.finalize_auth({"root": str(src)}))
    assert run(conn.get_auth_status()).is_authenticated

    out = run(conn.list_files())
    names = [f.name for f in out["files"]]
    assert names == ["sub", "a.txt"]  # dirs first
    sub = run(conn.list_files(path="sub"))
    assert [f.id for f in sub["files"]] == ["sub/b.txt"]

    buf = run(conn.download_file_by_id("sub/b.txt"))
    assert buf.read() == b"beta"
    meta = run(conn.get_file_metadata_by_id("a.txt"))
    assert meta.size == 5 and not meta.is_folder

    with pytest.raises(ValueError):
        run(conn.download_file_by_id("../outside"))

    assert run(conn.disconnect())
    assert not run(conn.get_auth_status()).is_authenticated


def test_unknown_connector_type(tmp_path):
    with pytest.raises(KeyError):
        get_connector("dropbox", "u", tmp_path)


def _gh_entry(path, type_="file", content=None):
    e = {"path": path, "name": path.rsplit("/", 1)[-1], "type": type_, "size": 10}
    if content is not None:
        e["encoding"] = "base64"
        e["content"] = base64.b64encode(content).decode()
    return e


def test_github_connector_faked_transport(tmp_path):
    conn = GitHubConnector("u2", tmp_path / "creds")
    assert not run(conn.get_auth_status()).is_authenticated
    assert run(conn.finalize_auth({"token": "ghp_x", "repo": "acme/docs"}))

    def fake_json(url):
        assert "acme/docs" in url
        if url.split("?")[0].endswith("/contents/"):
            return [_gh_entry("README.md"), _gh_entry("src", "dir")]
        if url.endswith("/contents/README.md"):
            return _gh_entry("README.md", content=b"# hello")
        if "/git/trees/" in url:
            return {"tree": [{"path": "README.md", "type": "blob", "size": 7},
                             {"path": "src", "type": "tree"}]}
        raise AssertionError(url)

    conn._request_json = fake_json
    out = run(conn.list_files())
    assert {f.name for f in out["files"]} == {"README.md", "src"}
    assert [f.is_folder for f in out["files"] if f.name == "src"] == [True]
    buf = run(conn.download_file_by_id("README.md"))
    assert buf.read() == b"# hello"
    tree = run(conn.list_repository_tree())
    assert len(tree["files"]) == 2 and not tree["truncated"]

    # bad finalize payloads rejected
    assert not run(conn.finalize_auth({"token": "x"}))
    assert not run(conn.finalize_auth({"repo": "no-slash", "token": "x"}))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("conn")
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
    yield f"http://127.0.0.1:{srv.port}", services, root
    run(srv.stop())
    run(services.shutdown())


def test_connector_routes_end_to_end(server, tmp_path):
    base, _, _root = server
    src = tmp_path / "watched"
    src.mkdir()
    (src / "doc.txt").write_text("Connector-sourced knowledge: flux capacitors need 1.21 GW.")

    async def go():
        async with httpx.AsyncClient(base_url=base, timeout=120.0) as c:
            r = await c.get("/ee/connectors/local/auth_status")
            assert not r.json()["is_authenticated"]
            r = await c.get("/ee/connectors/local/files")
            assert r.status_code == 200 and r.json()["files"] == []
            r = await c.post("/ee/connectors/local/auth/finalize", json={"root": str(src)})
            assert r.status_code == 200
            r = await c.get("/ee/connectors/local/files")
            assert [f["name"] for f in r.json()["files"]] == ["doc.txt"]
            r = await c.post(
                "/ee/connectors/local/ingest",
                json={"file_id": "doc.txt", "use_colpali": False},
            )
            assert r.status_code == 202, r.text
            doc_id = r.json()["document"]["external_id"]
            for _ in range(450):
                s = (await c.get(f"/documents/{doc_id}/status")).json()
                if s["status"] in ("completed", "failed"):
                    break
                await asyncio.sleep(0.2)
            assert s["status"] == "completed"
            r = await c.post(
                "/retrieve/chunks",
                json={"query": "flux capacitor power", "k": 1, "use_colpali": False},
            )
            assert r.json() and "1.21 GW" in r.json()[0]["content"]
            doc = (await c.get(f"/documents/{doc_id}")).json()
            assert doc["metadata"]["connector"]["type"] == "local"
            r = await c.post("/ee/connectors/local/disconnect")
            assert r.json()["status"] == "disconnected"
            r = await c.get("/ee/connectors/unknown/files")
            assert r.status_code == 404

    run(go())


def test_oauth_callback_route(server):
    """GET oauth2callback finalizes auth from code+state (google-drive
    connector accepts direct token injection in the same seam)."""
    base, _, root = server

    async def go():
        async with httpx.AsyncClient(base_url=base, timeout=60.0) as c:
            # local connector rejects code-based finalize -> 400 html
            r = await c.get("/ee/connectors/local/oauth2callback", params={"code": "x"})
            assert r.status_code == 400
            r = await c.get("/ee/connectors/local/oauth2callback")
            assert r.status_code == 400
            # unknown connector -> 404
            r = await c.get("/ee/connectors/nope/oauth2callback", params={"code": "x"})
            assert r.status_code == 404

    run(go())


def test_google_drive_token_injection(tmp_path):
    """GoogleDriveConnector accepts direct access_token injection
    (service accounts / tests) and refreshes via _post_form."""
    from morphik_core_tpu.ee.connectors.google_drive import GoogleDriveConnector

    conn = GoogleDriveConnector("u3", tmp_path / "creds")
    assert not run(conn.get_auth_status()).is_authenticated
    assert run(conn.finalize_auth({"access_token": "tok123"}))
    assert run(conn.get_auth_status()).is_authenticated

    def fake_json(url, token):
        assert token == "tok123"
        if "/files?" in url:
            return {"files": [{"id": "f1", "name": "Doc", "mimeType": "application/pdf",
                               "size": "9", "modifiedTime": "2026-01-01T00:00:00Z"}]}
        return {"id": "f1", "name": "Doc", "mimeType": "application/pdf", "size": "9"}

    conn._request_json = fake_json
    out = run(conn.list_files())
    assert out["files"][0].name == "Doc" and out["files"][0].size == 9
    meta = run(conn.get_file_metadata_by_id("f1"))
    assert meta.mime_type == "application/pdf"
    conn._request_bytes = lambda url, token: b"%PDF-bytes"
    buf = run(conn.download_file_by_id("f1"))
    assert buf.read() == b"%PDF-bytes"


def test_google_drive_oauth_state_validated(tmp_path):
    """Regression: finalize_auth ignored the OAuth state param (CSRF /
    code-injection)."""
    from morphik_core_tpu.ee.connectors.google_drive import GoogleDriveConnector

    conn = GoogleDriveConnector("u1", tmp_path, client_id="cid", client_secret="cs")
    out = run(conn.initiate_auth())
    assert "auth_url" in out and out["state"]

    async def fake_post(url, data):
        return {"access_token": "at", "refresh_token": "rt", "expires_in": 3600}

    import asyncio as _aio
    conn._post_form = lambda url, data: {"access_token": "at", "refresh_token": "rt",
                                         "expires_in": 3600}
    # wrong state -> rejected (and the issued state is consumed)
    assert not run(conn.finalize_auth({"code": "C", "state": "forged"}))
    # a fresh initiate + matching state -> accepted
    out2 = run(conn.initiate_auth())
    assert run(conn.finalize_auth({"code": "C", "state": out2["state"]}))
    assert run(conn.get_auth_status()).is_authenticated


def test_google_drive_config_wired(tmp_path, monkeypatch):
    """Regression: the registry never passed the OAuth client, so the
    Drive flow could not produce an auth_url from the server path."""
    from morphik_core_tpu.config import Settings
    import morphik_core_tpu.config as cfg_mod
    from morphik_core_tpu.ee.connectors import get_connector

    s = Settings.model_validate({"ee": {"google_client_id": "cid-x",
                                        "google_client_secret": "cs-x"}})
    monkeypatch.setattr(cfg_mod, "_settings", s)
    conn = get_connector("google_drive", "u2", tmp_path)
    assert conn.client_id == "cid-x"
    out = run(conn.initiate_auth())
    assert "auth_url" in out and "cid-x" in out["auth_url"]


def test_github_list_files_paginates(tmp_path):
    from morphik_core_tpu.ee.connectors.github import GitHubConnector

    conn = GitHubConnector("u3", tmp_path)
    run(conn.finalize_auth({"token": "t", "repo": "acme/big"}))
    calls = []

    def fake_json(url):
        calls.append(url)
        page = int(url.split("page=")[-1])
        n = 100 if page == 1 else 7
        return [{"path": f"f{page}_{i}", "name": f"f{page}_{i}", "type": "file", "size": 1}
                for i in range(n)]

    conn._request_json = fake_json
    p1 = run(conn.list_files())
    assert len(p1["files"]) == 100 and p1["next_page_token"] == "2"
    p2 = run(conn.list_files(page_token=p1["next_page_token"]))
    assert len(p2["files"]) == 7 and p2["next_page_token"] is None

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
