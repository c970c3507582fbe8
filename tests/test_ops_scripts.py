"""Ops tooling tests: resumable export, completeness check, metadata
scrub (reference scripts/{export_multivector_chunks_resumable,
check_completeness,scrub_metadata}.py)."""

import json
import sqlite3
from pathlib import Path

import numpy as np

from morphik_core_tpu.index.multivector_index import IndexRecord, MultiVectorIndex
from morphik_core_tpu.ops.fde import FDEConfig

from scripts import check_completeness, export_chunks_resumable, scrub_metadata


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


def _fde(tmp_path: Path):
    from morphik_core_tpu.config import load_settings

    return export_chunks_resumable.fde_config_from(load_settings(_write_config(tmp_path)))


def _seed_index(tmp_path: Path, n=25, ns="default"):
    fde_cfg = FDEConfig(
        dimension=16, num_repetitions=4, num_simhash_projections=3, projection_dimension=8
    )
    idx = MultiVectorIndex(fde_cfg, path=tmp_path / "index" / ns)
    rng = np.random.default_rng(0)
    mvs = [rng.standard_normal((rng.integers(4, 10), 16)).astype(np.float32) for _ in range(n)]
    recs = [
        IndexRecord(
            document_id=f"d{i // 5}", chunk_number=i % 5, metadata={"secret": i, "external_id": f"d{i // 5}"}
        )
        for i in range(n)
    ]
    idx.store(mvs, recs)
    idx.save()
    return idx, mvs


def _seed_db(tmp_path: Path, docs):
    """docs: {doc_id: (status, [chunk_ids])}"""
    from conftest import run_once

    from morphik_core_tpu.database.sqlite_database import SQLiteDatabase
    from morphik_core_tpu.models.schemas import Document

    db = SQLiteDatabase(tmp_path / "db.sqlite")
    run_once(db.initialize())

    async def seed():
        for doc_id, (status, chunk_ids) in docs.items():
            d = Document(
                external_id=doc_id,
                content_type="application/pdf",
                metadata={"secret": "x", "external_id": doc_id},
            )
            d.system_metadata["status"] = status
            d.chunk_ids = chunk_ids
            await db.store_document(d)

    run_once(seed())
    db.close()


def test_export_is_resumable_and_complete(tmp_path):
    cfg = _write_config(tmp_path)
    _seed_index(tmp_path)
    out = tmp_path / "export"
    rc = export_chunks_resumable.main(
        ["--config", str(cfg), "--out", str(out), "--batch", "10"]
    )
    assert rc == 0
    ns = out / "default"
    manifest = json.loads((ns / "manifest.json").read_text())
    assert manifest["rows_alive"] == 25 and manifest["shards"] == 3
    lines = []
    for i in range(3):
        lines += (ns / f"shard_{i:05d}.jsonl").read_text().splitlines()
        tokens = np.load(ns / f"shard_{i:05d}.npy")
        n_tok = sum(json.loads(line)["n_tokens"] for line in (ns / f"shard_{i:05d}.jsonl").read_text().splitlines())
        assert tokens.shape == (n_tok, 16)
    assert len(lines) == 25
    # resume: pretend shard 1 onward never ran; rerun completes without
    # touching shard 0 (mtime preserved)
    ckpt = out / "checkpoint.json"
    ckpt.write_text(json.dumps({"default": 10}))
    mtime0 = (ns / "shard_00000.jsonl").stat().st_mtime_ns
    (ns / "shard_00002.jsonl").unlink()
    rc = export_chunks_resumable.main(["--config", str(cfg), "--out", str(out), "--batch", "10"])
    assert rc == 0
    assert (ns / "shard_00002.jsonl").exists()
    assert (ns / "shard_00000.jsonl").stat().st_mtime_ns == mtime0


def test_check_completeness_flags_all_three_ways(tmp_path):
    cfg = _write_config(tmp_path)
    idx, _ = _seed_index(tmp_path)
    # DB: d0..d4 exist; d0 completed + consistent; d9 completed but has a
    # chunk id the index never stored
    docs = {f"d{i}": ("completed", [f"d{i}-{j}" for j in range(5)]) for i in range(5)}
    docs["d9"] = ("completed", ["d9-0"])
    del docs["d3"]  # index rows for d3 become orphans
    _seed_db(tmp_path, docs)
    rc = check_completeness.main(["--config", str(cfg)])
    assert rc == 1
    from conftest import run_once

    class A:
        config = str(cfg)

    rep = run_once(check_completeness.check(A()))
    assert not rep["consistent"]
    assert {m["chunk_id"] for m in rep["missing_index_rows"]} == {"d9-0"}
    assert {o["document_id"] for o in rep["orphan_index_rows"]} == {"d3"}
    assert rep["namespaces"]["default"]["index_rows"] == 25

    # fix the inconsistencies -> consistent, rc 0
    idx2 = MultiVectorIndex(idx.fde_config, path=tmp_path / "index" / "default")
    idx2.delete_document("d3")
    idx2.save()
    conn = sqlite3.connect(tmp_path / "db.sqlite")
    conn.execute("UPDATE documents SET chunk_ids='[]' WHERE external_id='d9'")
    conn.commit()
    conn.close()
    rc = check_completeness.main(["--config", str(cfg)])
    assert rc == 0


def test_scrub_metadata_dry_run_then_apply(tmp_path):
    cfg = _write_config(tmp_path)
    _seed_index(tmp_path)
    _seed_db(tmp_path, {f"d{i}": ("completed", []) for i in range(5)})

    class A:
        config = str(cfg)
        keep = "external_id"
        apply = False
        dry_run_index = True
        batch = 2

    rep = scrub_metadata.scrub(A())
    assert rep == {"documents_scrubbed": 5, "index_records_scrubbed": 25, "applied": False}
    # dry run changed nothing
    conn = sqlite3.connect(tmp_path / "db.sqlite")
    meta = json.loads(conn.execute("SELECT doc_metadata FROM documents WHERE external_id='d0'").fetchone()[0])
    assert "secret" in meta
    conn.close()

    A.apply = True
    rep = scrub_metadata.scrub(A())
    assert rep["applied"] and rep["documents_scrubbed"] == 5
    conn = sqlite3.connect(tmp_path / "db.sqlite")
    meta = json.loads(conn.execute("SELECT doc_metadata FROM documents WHERE external_id='d0'").fetchone()[0])
    assert meta == {"external_id": "d0"}
    conn.close()
    # index copy scrubbed + persisted
    idx = MultiVectorIndex(
        FDEConfig(dimension=16, num_repetitions=4, num_simhash_projections=3, projection_dimension=8),
        path=tmp_path / "index" / "default",
    )
    assert all(set(idx.records[r].metadata) <= {"external_id"} for r in range(idx.count_rows))
    # idempotent second apply
    rep = scrub_metadata.scrub(A())
    assert rep["documents_scrubbed"] == 0 and rep["index_records_scrubbed"] == 0
