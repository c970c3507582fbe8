"""SDK tests against a live in-process server (reference sdk-marker
tests drive a running server the same way)."""

import asyncio

from conftest import run_once
import threading

import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "sdks" / "python"))

from morphik_tpu_sdk import Morphik  # noqa: E402

from morphik_core_tpu.api.app import build_app  # noqa: E402
from morphik_core_tpu.api.http import HTTPServer  # noqa: E402
from morphik_core_tpu.config import Settings  # noqa: E402
from morphik_core_tpu.services_init import build_services  # noqa: E402


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    root = tmp_path_factory.mktemp("sdk")
    settings = Settings.model_validate(
        {
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
    loop = asyncio.new_event_loop()
    services = build_services(settings)
    srv_holder = {}

    def runner():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(services.initialize())
        srv = HTTPServer(build_app(services), "127.0.0.1", 0)
        loop.run_until_complete(srv.start())
        srv_holder["srv"] = srv
        loop.run_forever()

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    import time

    for _ in range(100):
        if "srv" in srv_holder:
            break
        time.sleep(0.1)
    yield f"http://127.0.0.1:{srv_holder['srv'].port}"

    async def _teardown():
        await srv_holder["srv"].stop()
        await services.shutdown()

    asyncio.run_coroutine_threadsafe(_teardown(), loop).result(timeout=30)
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=10)
    loop.close()


def test_sdk_end_to_end(server_url):
    with Morphik(base_url=server_url) as db:
        assert db.ping()["status"] == "ok"
        doc = db.ingest_text(
            "Saturn has 146 known moons. Titan is the largest.",
            filename="saturn.txt",
            metadata={"topic": "space"},
            use_colpali=False,
        )
        assert doc.status == "completed"
        chunks = db.retrieve_chunks("moons of saturn", k=2, use_colpali=False)
        assert chunks and chunks[0].document_id == doc.external_id
        resp = db.query("How many moons does Saturn have?", k=2, use_colpali=False)
        assert "146" in str(resp.completion)
        docs = db.list_documents(filters={"topic": "space"})
        assert any(d.external_id == doc.external_id for d in docs)
        got = db.get_document_by_filename("saturn.txt")
        assert got.external_id == doc.external_id


def test_sdk_file_ingest_wait_and_image(server_url):
    import io

    from PIL import Image, ImageDraw

    img = Image.new("RGB", (448, 336), (250, 250, 250))
    ImageDraw.Draw(img).text((50, 100), "sdk test page", fill=(0, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")

    with Morphik(base_url=server_url) as db:
        doc = db.ingest_file(buf.getvalue(), filename="page.png",
                             metadata={"src": "sdk"}, wait=True, timeout_s=240)
        assert doc.status == "completed"
        chunks = db.retrieve_chunks("test page", k=1, use_colpali=True, filters={"src": "sdk"})
        assert chunks and chunks[0].image is not None
        # image-query retrieval: a PIL image goes straight in (coerced to
        # a data URI; reference RetrieveRequest.query_image)
        hits = db.retrieve_chunks(k=1, use_colpali=True, query_image=img,
                                  filters={"src": "sdk"})
        assert hits and hits[0].document_id == doc.external_id


def test_sdk_streaming_and_folders(server_url):
    with Morphik(base_url=server_url) as db:
        db.create_folder("SDKFolder")
        f = db.folder("SDKFolder")
        doc = f.ingest_text("folder scoped fact: the code is 7777", filename="c.txt", use_colpali=False)
        assert doc.folder_path == "/SDKFolder"
        toks = list(db.query_stream("what is the code?", k=1, use_colpali=False))
        assert "7777" in "".join(toks)
        folders = db.list_folders()
        assert any(fd["path"] == "/SDKFolder" for fd in folders)


def test_sdk_new_surface(server_url, tmp_path):
    """query_document, summaries, apps, connectors, migrate, logs."""
    db = Morphik(base_url=server_url)

    # on-the-fly analysis
    out = db.query_document(b"The relay closes at 7 volts.", "What voltage closes the relay?",
                            filename="spec.txt")
    assert out["completion"]

    # summaries
    doc = db.ingest_text("summary target", filename="st.txt", use_colpali=False)
    s = db.set_document_summary(doc.external_id, "short summary")
    assert s["version"] == 1
    assert db.get_document_summary(doc.external_id)["content"] == "short summary"
    assert isinstance(db.get_folder_summaries(), list)

    # apps lifecycle
    uri = db.generate_cloud_uri("sdkapp")
    assert uri["uri"].startswith("morphik://sdkapp:")
    apps = db.list_apps()
    assert any(a["app_id"] == uri["app_id"] for a in apps["apps"])
    rot = db.rotate_app_token(uri["app_id"])
    assert rot["token_version"] == 2

    # connectors via local directory
    src = tmp_path / "conn_src"
    src.mkdir()
    (src / "n.txt").write_text("connector text")
    assert not db.connector_auth_status("local")["is_authenticated"]
    db.connector_finalize_auth("local", {"root": str(src)})
    files = db.connector_list_files("local")
    assert [f["name"] for f in files["files"]] == ["n.txt"]
    queued = db.connector_ingest("local", "n.txt", use_colpali=False)
    assert queued["status"] == "queued"

    # migrate with preserved id
    m = db.migrate_document(b"migrated body", "sdk-legacy-1", filename="m.txt",
                            use_colpali=False)
    assert m["status"] == "created" and m["document"]["external_id"] == "sdk-legacy-1"

    # logs
    logs = db.get_logs()
    assert "events" in logs
    db.close()


def test_async_sdk_parity(server_url, tmp_path):
    import asyncio as aio

    from morphik_tpu_sdk import AsyncMorphik

    async def go():
        async with AsyncMorphik(base_url=server_url) as db:
            assert (await db.ping())["status"] == "ok"
            doc = await db.ingest_file(b"Async ingested body: antimatter ratio 3:1.",
                                       filename="a.txt", use_colpali=False, wait=True)
            assert doc.system_metadata["status"] == "completed"
            chunks = await db.retrieve_chunks("antimatter ratio", k=1, use_colpali=False)
            assert chunks and "3:1" in chunks[0].content
            docs = await db.list_documents(limit=5)
            assert docs
            out = await db.query_document(b"Core temp is 9 kilokelvin.", "What is the core temp?",
                                          filename="c.txt")
            assert out["completion"]
            s = await db.set_document_summary(doc.external_id, "async summary")
            assert s["version"] == 1
            assert (await db.get_document_summary(doc.external_id))["content"] == "async summary"
            uri = await db.generate_cloud_uri("asyncapp")
            assert uri["uri"].startswith("morphik://asyncapp:")
            src = tmp_path / "async_conn"
            src.mkdir()
            (src / "f.txt").write_text("connector async")
            await db.connector_finalize_auth("local", {"root": str(src)})
            files = await db.connector_list_files("local")
            assert [f["name"] for f in files["files"]] == ["f.txt"]
            toks = []
            async for tok in db.query_stream("antimatter", k=1, use_colpali=False):
                toks.append(tok)
            assert toks

    run_once(go())


def test_sdk_v2_pipeline(server_url):
    db = Morphik(base_url=server_url)
    doc = db.v2_ingest(b"V2 sdk ingest body about turbines.", filename="t.txt")
    assert doc.system_metadata.get("status") == "completed"
    chunks = db.v2_retrieve_chunks("turbines", k=2)
    assert chunks and chunks[0]["content"].startswith("<page")
    out = db.v2_delete(doc.external_id)
    assert out["status"] == "deleted"
    db.close()


def test_sdk_grouped_and_folder_ops(server_url):
    db = Morphik(base_url=server_url)
    f = db.create_folder("sdkgroup/sub")
    doc = db.ingest_text("grouped sdk doc body", filename="gs.txt", use_colpali=False,
                         metadata={"sdk_grouped": True})
    out = db.add_document_to_folder(f["id"], doc.external_id)
    assert out["status"] == "added"
    grouped = db.retrieve_chunks_grouped("grouped sdk doc", k=1, use_colpali=False,
                                         filters={"sdk_grouped": True})
    assert grouped["chunks"] and grouped["groups"]
    details = db.folder_details([f["id"]])
    assert details["count"] >= 1
    moved = db.move_folder(f["id"], None)
    assert moved["status"] == "moved"
    db.close()


def test_sdk_folder_objects_and_user_scope(server_url, tmp_path):
    """Reference Folder/UserScope object surface (sync.py:394-590):
    folder handles carry the scope, expose metadata, and support
    lifecycle verbs; signin returns a UserScope."""
    from morphik_tpu_sdk.client import Folder, UserScope

    db = Morphik(base_url=server_url)

    folder = db.create_folder("proj-x", description="folder object test")
    assert isinstance(folder, Folder)
    assert folder.name == "proj-x" and folder.full_path == "/proj-x"
    assert folder.id and folder["id"] == folder.id  # dict-style compat
    assert folder.description == "folder object test"

    # scoped verbs on the handle
    doc = folder.ingest_text("folder object fact: answer is 4242",
                             filename="fx.txt", use_colpali=False)
    assert doc.folder_path == "/proj-x"
    chunks = folder.retrieve_chunks("folder object fact", k=1, use_colpali=False)
    assert chunks and chunks[0].document_id == doc.external_id
    docs = folder.list_documents()
    assert any(d.external_id == doc.external_id for d in docs)

    # lifecycle: info / rename / move
    info = folder.get_info()
    assert info["path"] == "/proj-x"
    folder.rename("proj-y")
    assert folder.full_path == "/proj-y"
    assert db.get_document(doc.external_id).folder_path == "/proj-y"
    parent = db.create_folder("archive")
    folder.move(parent.full_path)
    assert folder.full_path == "/archive/proj-y"
    assert db.get_document(doc.external_id).folder_path == "/archive/proj-y"
    # the renamed+moved folder is retrievable by name/path
    got = db.get_folder_by_name("/archive/proj-y")
    assert got.id == folder.id

    # user scoping: plain and folder-scoped
    user = db.signin("alice")
    assert isinstance(user, UserScope) and user.end_user_id == "alice"
    udoc = user.ingest_text("alice private note 777", filename="an.txt", use_colpali=False)
    assert udoc.end_user_id == "alice"
    fuser = folder.signin("bob")
    assert fuser.folder_name == "/archive/proj-y" and fuser.end_user_id == "bob"
    fdoc = fuser.ingest_text("bob note in folder", filename="bn.txt", use_colpali=False)
    assert fdoc.end_user_id == "bob" and fdoc.folder_path == "/archive/proj-y"

    # add/remove document through the handle
    loose = db.ingest_text("loose doc", filename="ld.txt", use_colpali=False)
    assert folder.add_document(loose.external_id)["status"] == "added"
    assert db.get_document(loose.external_id).folder_path == "/archive/proj-y"
    assert folder.remove_document(loose.external_id)["status"] == "removed"

    # summaries through the handle
    folder.upsert_summary("all about proj-y")
    assert folder.get_summary()["content"] == "all about proj-y"

    db.close()


def test_sdk_ingest_directory_pattern(server_url, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.txt").write_text("alpha doc")
    (tmp_path / "b.md").write_text("bravo doc")
    (tmp_path / "sub" / "c.txt").write_text("charlie doc")
    db = Morphik(base_url=server_url)
    docs = db.ingest_directory(tmp_path, pattern="*.txt", use_colpali=False)
    assert sorted(d.filename for d in docs) == ["a.txt"]
    docs = db.ingest_directory(tmp_path, recursive=True, pattern="*.txt", use_colpali=False)
    assert sorted(d.filename for d in docs) == ["a.txt", "c.txt"]
    with pytest.raises(ValueError):
        db.ingest_directory(tmp_path / "missing")
    db.close()


def test_sdk_final_chunk_pil_decode():
    """FinalChunkResult decodes image chunks to PIL (reference
    _internal.py:628-650) and falls back to text on garbage."""
    import base64
    import io as _io

    from PIL import Image

    from morphik_tpu_sdk.models import FinalChunkResult

    img = Image.new("RGB", (8, 8), (1, 2, 3))
    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    c = FinalChunkResult(content=uri, score=1.0, document_id="d", chunk_number=0,
                         metadata={"is_image": True})
    assert c.image is not None and c.image.size == (8, 8)
    assert c.decoded_content.size == (8, 8)

    c2 = FinalChunkResult(content="plain text", score=1.0, document_id="d", chunk_number=1,
                          metadata={})
    assert c2.image is None and c2.decoded_content == "plain text"

    c3 = FinalChunkResult(content="not-base64!!", score=1.0, document_id="d", chunk_number=2,
                          metadata={"is_image": True})
    assert c3.decoded_content == "not-base64!!"  # graceful fallback


def test_async_folder_and_user_scope(server_url):
    import asyncio as aio

    from morphik_tpu_sdk import AsyncMorphik
    from morphik_tpu_sdk.client import AsyncFolder, AsyncUserScope

    async def go():
        async with AsyncMorphik(base_url=server_url) as db:
            folder = await db.create_folder("async-proj")
            assert isinstance(folder, AsyncFolder) and folder.id
            doc = await folder.ingest_text("async folder fact 1212", filename="af.txt",
                                           use_colpali=False)
            assert doc.folder_path == "/async-proj"
            chunks = await folder.retrieve_chunks("async folder fact", k=1, use_colpali=False)
            assert chunks and chunks[0].document_id == doc.external_id
            folders = await db.list_folders()
            assert any(f.full_path == "/async-proj" for f in folders)
            user = db.signin("carol")
            assert isinstance(user, AsyncUserScope)
            ud = await user.ingest_text("carol async note", filename="cn.txt", use_colpali=False)
            assert ud.end_user_id == "carol"
            fu = folder.signin("dave")
            fd = await fu.ingest_file(b"dave doc body", filename="dd.txt", use_colpali=False)
            assert fd.end_user_id == "dave" and fd.folder_path == "/async-proj"

    run_once(go())
