"""App purge + orphan GC tooling (reference scripts/delete_namespace.py —
there a Turbopuffer ns.delete_all(); here scripts/purge_app.py walks
app -> DB rows -> index namespace -> payload/raw storage objects, and
scripts/check_completeness.py emits an executable GC plan for objects
nothing references anymore)."""

import json
import sqlite3
from pathlib import Path

import numpy as np
from conftest import run_once

from morphik_core_tpu.index.multivector_index import IndexRecord, MultiVectorIndex
from morphik_core_tpu.ops.fde import FDEConfig
from morphik_core_tpu.storage.local_storage import LocalStorage
from morphik_core_tpu.vector_store.tpu_multivector_store import MULTIVECTOR_CHUNKS_BUCKET

from scripts import check_completeness, purge_app

FDE_CFG = FDEConfig(
    dimension=16, num_repetitions=4, num_simhash_projections=3, projection_dimension=8
)


def _write_config(tmp_path: Path) -> Path:
    cfg = tmp_path / "cfg.toml"
    cfg.write_text(
        f"""
[model]
embedding_dim = 16

[database]
path = "{tmp_path / 'db.sqlite'}"

[storage]
provider = "local"
storage_path = "{tmp_path / 'store'}"

[vector_store]
index_path = "{tmp_path / 'index'}"
fde_num_repetitions = 4
fde_num_simhash_projections = 3
fde_projection_dimension = 8
"""
    )
    return cfg


def _seed_app(tmp_path: Path, ns: str, doc_ids, chunks_per_doc=2):
    """One app namespace: index rows + per-chunk payloads + raw uploads +
    DB rows, exactly as ingest lays them out."""
    storage = LocalStorage(tmp_path / "store")
    idx = MultiVectorIndex(FDE_CFG, path=tmp_path / "index" / ns)
    rng = np.random.default_rng(hash(ns) % 2**32)
    mvs, recs = [], []
    for doc_id in doc_ids:
        for c in range(chunks_per_doc):
            key = f"{ns}/{doc_id}/{c}.jpg"
            run_once(storage.upload_file(b"payload-" + key.encode(), key,
                                         bucket=MULTIVECTOR_CHUNKS_BUCKET))
            mvs.append(rng.standard_normal((5, 16)).astype(np.float32))
            recs.append(IndexRecord(document_id=doc_id, chunk_number=c,
                                    metadata={"external_id": doc_id}, content_key=key))
    idx.store(mvs, recs)
    idx.save()

    conn = sqlite3.connect(tmp_path / "db.sqlite")
    app_id = None if ns == "default" else ns
    for doc_id in doc_ids:
        raw_key = f"ingest/{doc_id}/file.pdf"
        run_once(storage.upload_file(b"raw-" + doc_id.encode(), raw_key))
        conn.execute(
            "INSERT OR REPLACE INTO documents (external_id, app_id, status, chunk_ids,"
            " storage_info, content_type) VALUES (?,?,?,?,?,?)",
            (doc_id, app_id, "completed",
             json.dumps([f"{doc_id}-{c}" for c in range(chunks_per_doc)]),
             json.dumps({"bucket": "", "key": raw_key}), "application/pdf"),
        )
    if app_id:
        conn.execute("INSERT OR REPLACE INTO chats (chat_id, app_id) VALUES (?,?)",
                     (f"chat-{ns}", app_id))
        conn.execute(
            "INSERT OR REPLACE INTO storage_usage (app_id, owner_id, bytes) VALUES (?,?,?)",
            (app_id, "u1", 1000),
        )
    conn.commit()
    conn.close()
    return storage


def _init_db(tmp_path: Path):
    from morphik_core_tpu.database.sqlite_database import SQLiteDatabase

    db = SQLiteDatabase(tmp_path / "db.sqlite")
    run_once(db.initialize())
    db.close()


def _register_app(tmp_path: Path, app_id: str, user_id="u1"):
    from morphik_core_tpu.services.user_service import UserService

    us = UserService(path=tmp_path / "store" / "user_limits.db")
    run_once(us.register_app(app_id, app_id, user_id, f"morphik://{app_id}"))
    return us


def test_purge_app_dry_run_then_apply(tmp_path):
    cfg = _write_config(tmp_path)
    _init_db(tmp_path)
    storage = _seed_app(tmp_path, "appA", ["dA0", "dA1"])
    _seed_app(tmp_path, "appB", ["dB0"])
    us = _register_app(tmp_path, "appA")
    us.close() if hasattr(us, "close") else None

    class A:
        config = str(cfg)
        app_id = "appA"

    inv = run_once(purge_app.plan(A()))
    assert inv["db_rows"]["documents"] == 2
    assert inv["db_rows"]["chats"] == 1
    assert inv["db_rows"]["storage_usage"] == 1
    assert len(inv["payload_objects"]) == 4  # 2 docs x 2 chunks
    assert len(inv["raw_objects"]) == 2
    assert inv["index_dirs"] == [str(tmp_path / "index" / "appA")]
    assert inv["registry"]["user_id"] == "u1"
    assert inv["accounted_bytes"] == 1000
    assert not inv["empty"]

    # dry-run via main(): prints the plan, deletes nothing
    rc = purge_app.main(["--config", str(cfg), "--app-id", "appA", "--dry-run"])
    assert rc == 0
    assert (tmp_path / "index" / "appA").exists()
    assert run_once(storage.get_object_size(MULTIVECTOR_CHUNKS_BUCKET, "appA/dA0/0.jpg"))

    # apply
    rc = purge_app.main(["--config", str(cfg), "--app-id", "appA", "--yes"])
    assert rc == 0
    assert not (tmp_path / "index" / "appA").exists()
    assert run_once(storage.get_object_size(MULTIVECTOR_CHUNKS_BUCKET, "appA/dA0/0.jpg")) is None
    assert run_once(storage.get_object_size("", "ingest/dA0/file.pdf")) is None
    conn = sqlite3.connect(tmp_path / "db.sqlite")
    assert conn.execute("SELECT COUNT(*) FROM documents WHERE app_id='appA'").fetchone()[0] == 0
    assert conn.execute("SELECT COUNT(*) FROM chats WHERE app_id='appA'").fetchone()[0] == 0
    conn.close()
    # registry row gone + apps_used refunded
    conn = sqlite3.connect(tmp_path / "store" / "user_limits.db")
    assert conn.execute("SELECT COUNT(*) FROM apps WHERE app_id='appA'").fetchone()[0] == 0
    row = conn.execute("SELECT apps_used FROM user_limits WHERE user_id='u1'").fetchone()
    assert row is None or row[0] == 0  # refunded (row absent when limits unenforced)
    conn.close()

    # appB untouched
    assert (tmp_path / "index" / "appB").exists()
    assert run_once(storage.get_object_size(MULTIVECTOR_CHUNKS_BUCKET, "appB/dB0/0.jpg"))
    conn = sqlite3.connect(tmp_path / "db.sqlite")
    assert conn.execute("SELECT COUNT(*) FROM documents WHERE app_id='appB'").fetchone()[0] == 1
    conn.close()

    # idempotent: a second purge finds an empty namespace
    inv2 = run_once(purge_app.plan(A()))
    assert inv2["empty"]


def test_check_completeness_gc_plan_and_apply(tmp_path):
    cfg = _write_config(tmp_path)
    _init_db(tmp_path)
    storage = _seed_app(tmp_path, "default", ["d0", "d1"])

    # consistent corpus -> empty GC plan, rc 0
    class A:
        config = str(cfg)

    rep = run_once(check_completeness.check(A()))
    assert rep["consistent"]
    assert rep["gc_plan"]["orphan_payload_objects"] == []
    assert rep["gc_plan"]["orphan_raw_objects"] == []

    # orphan a payload (tombstone d1's index rows, as delete_document does)
    idx = MultiVectorIndex(FDE_CFG, path=tmp_path / "index" / "default")
    idx.delete_document("d1")
    idx.save()
    conn = sqlite3.connect(tmp_path / "db.sqlite")
    conn.execute("DELETE FROM documents WHERE external_id='d1'")
    conn.commit()
    conn.close()
    # plus a raw upload whose doc never made it into the DB
    run_once(storage.upload_file(b"zombie", "ingest/ghost-doc/file.pdf"))

    rep = run_once(check_completeness.check(A()))
    orphan_keys = {o["key"] for o in rep["gc_plan"]["orphan_payload_objects"]}
    assert orphan_keys == {"default/d1/0.jpg", "default/d1/1.jpg"}
    raw_keys = {o["key"] for o in rep["gc_plan"]["orphan_raw_objects"]}
    # d1's raw upload orphans too: its DB row (which held storage_info) is gone
    assert raw_keys == {"ingest/ghost-doc/file.pdf", "ingest/d1/file.pdf"}
    assert rep["gc_plan"]["reclaim_bytes"] > 0
    # GC candidates alone don't flip the consistency verdict
    assert rep["consistent"]

    # --gc-apply deletes exactly the plan
    rc = check_completeness.main(["--config", str(cfg), "--gc-apply"])
    assert rc == 0
    assert run_once(storage.get_object_size(MULTIVECTOR_CHUNKS_BUCKET, "default/d1/0.jpg")) is None
    assert run_once(storage.get_object_size("", "ingest/ghost-doc/file.pdf")) is None
    # live objects survive
    assert run_once(storage.get_object_size(MULTIVECTOR_CHUNKS_BUCKET, "default/d0/0.jpg"))
    assert run_once(storage.get_object_size("", "ingest/d0/file.pdf"))

    rep = run_once(check_completeness.check(A()))
    assert rep["gc_plan"]["orphan_payload_objects"] == []
    assert rep["gc_plan"]["orphan_raw_objects"] == []


def test_local_storage_list_objects(tmp_path):
    st = LocalStorage(tmp_path)
    run_once(st.upload_file(b"abc", "x/one.bin", bucket="b"))
    run_once(st.upload_file(b"defg", "x/two.bin", bucket="b"))
    run_once(st.upload_file(b"z", "y/three.bin", bucket="b"))
    assert run_once(st.list_objects("b")) == [
        ("x/one.bin", 3), ("x/two.bin", 4), ("y/three.bin", 1)]
    assert run_once(st.list_objects("b", prefix="x/")) == [("x/one.bin", 3), ("x/two.bin", 4)]
    assert run_once(st.list_objects("nope")) == []
