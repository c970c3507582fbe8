"""Regression tests for the database-layer tenant-isolation review:
document takeover, cross-tenant folder path collisions, chat ownership,
folder_depth levels, move guards, filter-evaluator edge cases."""

import asyncio

from conftest import run_once

import pytest

from morphik_core_tpu.database.metadata_filters import matches_filter
from morphik_core_tpu.database.sqlite_database import SQLiteDatabase
from morphik_core_tpu.models.schemas import AuthContext, Document


def run(coro):
    return run_once(coro)


A = AuthContext(entity_id="userA", permissions=["read", "write", "admin"], app_id="appA")
B = AuthContext(entity_id="userB", permissions=["read", "write", "admin"], app_id="appB")


@pytest.fixture()
def db(tmp_path):
    d = SQLiteDatabase(str(tmp_path / "db.sqlite"))
    run(d.initialize())
    return d


def test_store_document_cannot_take_over_foreign_id(db):
    run(db.store_document(Document(external_id="d1", content_type="text/plain"), A))
    with pytest.raises(PermissionError):
        run(db.store_document(Document(external_id="d1", content_type="text/plain"), B))
    assert run(db.get_document("d1", A)) is not None  # A keeps the doc
    assert run(db.get_document("d1", B)) is None


def test_store_document_replace_keeps_created_at(db):
    run(db.store_document(Document(external_id="d2", content_type="text/plain"), A))
    first = db._conn.execute("SELECT created_at FROM documents WHERE external_id='d2'").fetchone()[0]
    run(db.store_document(Document(external_id="d2", content_type="application/pdf"), A))
    row = db._conn.execute(
        "SELECT content_type, created_at FROM documents WHERE external_id='d2'").fetchone()
    assert row[0] == "application/pdf"
    assert row[1] == first  # same-tenant replace keeps the creation time


def test_folder_path_collisions_are_tenant_scoped(db):
    fa = run(db.create_folder("reports", A))
    fb = run(db.create_folder("reports", B))
    assert fa["id"] != fb["id"]
    # B deleting its /reports must not delete A's
    assert run(db.delete_folder(fb["id"], B))
    assert run(db.get_folder_by_path("/reports", A)) is not None
    assert run(db.get_folder_by_path("/reports", B)) is None


def test_folder_rename_does_not_touch_other_tenant_subtrees(db):
    run(db.create_folder("x", A))
    run(db.create_folder("sub", A, parent_path="/x"))
    xb = run(db.create_folder("x", B))
    run(db.create_folder("sub", B, parent_path="/x"))
    assert run(db.rename_folder(xb["id"], "y", B))
    # B's subtree moved; A's untouched
    assert run(db.get_folder_by_path("/y/sub", B)) is not None
    assert run(db.get_folder_by_path("/x/sub", A)) is not None
    assert run(db.get_folder_by_path("/x/sub", B)) is None


def test_move_folder_guards(db):
    a = run(db.create_folder("a", A))
    run(db.create_folder("b", A, parent_path="/a"))
    # into its own subtree -> refused, tree intact
    assert not run(db.move_folder(a["id"], "/a/b", A))
    assert run(db.get_folder_by_path("/a/b", A)) is not None
    # onto an existing path -> refused (not an IntegrityError 500)
    run(db.create_folder("c", A))
    run(db.create_folder("a", A, parent_path="/c"))
    assert not run(db.move_folder(a["id"], "/c", A))
    assert run(db.get_folder_by_path("/a", A)) is not None


def test_chat_ownership_enforced(db):
    assert run(db.upsert_chat_history("chat1", "userA", "appA", [{"role": "user", "content": "hi"}]))
    # other app cannot read, clobber, or retitle
    assert run(db.get_chat_history("chat1", "userB", "appB")) is None
    assert not run(db.upsert_chat_history("chat1", "userB", "appB", [{"role": "user", "content": "pwn"}]))
    assert not run(db.update_chat_title("chat1", "pwned", "userB", "appB"))
    hist = run(db.get_chat_history("chat1", "userA", "appA"))
    assert hist == [{"role": "user", "content": "hi"}]
    assert run(db.update_chat_title("chat1", "mine", "userA", "appA"))


def test_folder_depth_levels(db):
    for path, name in ((None, "top"), ("/top", "mid"), ("/top/mid", "deep")):
        run(db.create_folder(name, A, parent_path=path))
    for i, fp in enumerate(("/top", "/top/mid", "/top/mid/deep")):
        run(db.store_document(Document(external_id=f"fd{i}", content_type="text/plain",
                                       folder_path=fp,
                                       system_metadata={"status": "completed"}), A))
    def ids(depth):
        docs = run(db.get_documents(A, filters={}, system_filters={
            "folder_path": "/top", "folder_depth": depth}))
        return sorted(d.external_id for d in docs)

    assert ids(0) == ["fd0"]
    assert ids(1) == ["fd0", "fd1"]
    assert ids(2) == ["fd0", "fd1", "fd2"]
    assert ids(-1) == ["fd0", "fd1", "fd2"]


def test_nan_metadata_value_does_not_crash_filters():
    assert matches_filter({"f": {"$gt": 5}}, {"f": "nan"}) is False
    assert matches_filter({"f": {"$lt": 5}}, {"f": "inf"}) is False
    assert matches_filter({"f": {"$gt": 5}}, {"f": "7"},
                          metadata_types={"f": "number"}) is True


def test_dotted_typed_field_sql_matches_oracle(db):
    """Typed dotted fields must trigger the Python recheck so SQL and
    the oracle agree (hint keys are stored FLAT: 'a.b')."""
    run(db.store_document(Document(
        external_id="dot1", content_type="text/plain",
        metadata={"a": {"b": "9"}}, metadata_types={"a.b": "number"},
        system_metadata={"status": "completed"}), A))
    flt = {"a.b": {"$lt": "abc"}}
    assert matches_filter(flt, {"a": {"b": "9"}}, metadata_types={"a.b": "number"}) is False
    got = run(db.find_authorized_and_filtered_documents(A, flt, {}))
    assert got == []  # SQL path agrees with the oracle
