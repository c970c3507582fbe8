"""SQLiteDatabase tests: documents CRUD, auth scoping, folder hierarchy,
chats, system filters (folder_path/depth semantics of the reference API)."""

import asyncio

from conftest import run_once

import pytest

from morphik_core_tpu.database import SQLiteDatabase
from morphik_core_tpu.models.schemas import AuthContext, Document


def run(coro):
    return run_once(coro)


@pytest.fixture()
def db():
    d = SQLiteDatabase(":memory:")
    run(d.initialize())
    return d


AUTH = AuthContext(entity_id="alice", permissions={"read", "write", "admin"})
BOB = AuthContext(entity_id="bob", permissions={"read", "write"})


def _doc(**kw):
    base = dict(content_type="application/pdf", filename="r.pdf")
    base.update(kw)
    return Document(**base)


def test_store_get_auth_scoping(db):
    async def go():
        doc = _doc(metadata={"dept": "eng"})
        await db.store_document(doc, AUTH)
        got = await db.get_document(doc.external_id, AUTH)
        assert got and got.metadata == {"dept": "eng"}
        assert await db.get_document(doc.external_id, BOB) is None

    run(go())


def test_find_authorized_filters_status_and_metadata(db):
    async def go():
        d1 = _doc(metadata={"dept": "eng", "n": 5})
        d1.system_metadata["status"] = "completed"
        d2 = _doc(metadata={"dept": "eng", "n": 50})
        d2.system_metadata["status"] = "completed"
        d3 = _doc(metadata={"dept": "eng", "n": 7})  # still processing
        for d in (d1, d2, d3):
            await db.store_document(d, AUTH)
        ids = await db.find_authorized_and_filtered_documents(AUTH, {"n": {"$lt": 10}})
        assert ids == [d1.external_id]  # d3 excluded by status, d2 by filter

    run(go())


def test_app_id_scoping_cloud_mode(db):
    async def go():
        app_auth = AuthContext(entity_id="alice", app_id="app1", permissions={"read", "write"})
        d = _doc()
        d.app_id = "app1"
        await db.store_document(d, app_auth)
        assert await db.get_document(d.external_id, app_auth) is not None
        other = AuthContext(entity_id="alice", app_id="app2")
        assert await db.get_document(d.external_id, other) is None

    run(go())


def test_folder_hierarchy_and_depth_filters(db):
    async def go():
        f = await db.create_folder("Reports", AUTH)
        sub = await db.create_folder("Q3", AUTH, parent_path="/Reports")
        assert f["path"] == "/Reports" and sub["path"] == "/Reports/Q3"
        assert sub["parent_id"] == f["id"]

        d1 = _doc(folder_name="Reports", folder_path="/Reports", folder_id=f["id"])
        d1.system_metadata["status"] = "completed"
        d2 = _doc(folder_name="Q3", folder_path="/Reports/Q3", folder_id=sub["id"])
        d2.system_metadata["status"] = "completed"
        for d in (d1, d2):
            await db.store_document(d, AUTH)

        exact = await db.find_authorized_and_filtered_documents(AUTH, None, {"folder_path": "/Reports", "folder_depth": 0})
        assert exact == [d1.external_id] or set(exact) == {d1.external_id}
        all_desc = await db.find_authorized_and_filtered_documents(AUTH, None, {"folder_path": "/Reports", "folder_depth": -1})
        assert set(all_desc) == {d1.external_id, d2.external_id}
        # folder_name accepting a full path (reference API quirk)
        by_name = await db.find_authorized_and_filtered_documents(AUTH, None, {"folder_name": "/Reports/Q3"})
        assert by_name == [d2.external_id]

    run(go())


def test_move_folder_updates_documents(db):
    async def go():
        await db.create_folder("A", AUTH)
        b = await db.create_folder("B", AUTH)
        c = await db.create_folder("C", AUTH, parent_path="/B")
        d = _doc(folder_name="C", folder_path="/B/C", folder_id=c["id"])
        await db.store_document(d, AUTH)
        ok = await db.move_folder(b["id"], "/A", AUTH)
        assert ok
        moved = await db.get_folder(c["id"], AUTH)
        assert moved["path"] == "/A/B/C"
        doc = await db.get_document(d.external_id, AUTH)
        assert doc.folder_path == "/A/B/C"

    run(go())


def test_update_and_delete_document(db):
    async def go():
        d = _doc(metadata={"v": 1})
        await db.store_document(d, AUTH)
        ok = await db.update_document(d.external_id, {"metadata": {"v": 2}, "system_metadata": {"status": "completed"}}, AUTH)
        assert ok
        got = await db.get_document(d.external_id, AUTH)
        assert got.metadata == {"v": 2} and got.system_metadata["status"] == "completed"
        assert await db.delete_document(d.external_id, AUTH)
        assert await db.get_document(d.external_id, AUTH) is None

    run(go())


def test_chats_roundtrip(db):
    async def go():
        hist = [{"role": "user", "content": "hi"}, {"role": "assistant", "content": "hello"}]
        await db.upsert_chat_history("c1", "alice", None, hist)
        got = await db.get_chat_history("c1", "alice", None)
        assert got == hist
        chats = await db.list_chats("alice", None)
        assert len(chats) == 1 and chats[0]["chat_id"] == "c1"
        assert await db.update_chat_title("c1", "greeting", "alice", None)

    run(go())


def test_search_documents_by_name(db):
    async def go():
        d1 = _doc(filename="annual_report_2024.pdf")
        d2 = _doc(filename="invoice.pdf")
        for d in (d1, d2):
            await db.store_document(d, AUTH)
        got = await db.search_documents_by_name(AUTH, "report")
        assert [g.external_id for g in got] == [d1.external_id]

    run(go())


def test_storage_accounting(db):
    async def go():
        assert await db.add_storage_bytes(AUTH, 100) == 100
        assert await db.add_storage_bytes(AUTH, 50) == 150
        assert await db.get_storage_bytes(AUTH) == 150
        assert await db.get_storage_bytes(BOB) == 0

    run(go())
