"""Regression tests for the round-2 code-review findings: stale device
masks on upsert (multi-block), crash-safe compaction, full FDE-config
header validation, prefix-safe folder path rewrites."""

import shutil
from pathlib import Path

from conftest import run_once

import numpy as np
import pytest

from morphik_core_tpu.index.multivector_index import IndexRecord, MultiVectorIndex
from morphik_core_tpu.ops.fde import FDEConfig

CFG = FDEConfig(dimension=16, num_repetitions=4, num_simhash_projections=3, projection_dimension=8)


def _fill(idx, n, seed=0, doc_prefix="d"):
    rng = np.random.default_rng(seed)
    mvs, recs = [], []
    for i in range(n):
        mv = rng.standard_normal((6, 16)).astype(np.float32)
        mv /= np.linalg.norm(mv, axis=-1, keepdims=True)
        mvs.append(mv)
        recs.append(IndexRecord(document_id=f"{doc_prefix}{i}", chunk_number=0))
    idx.store(mvs, recs)
    return mvs


def test_upsert_dirties_cached_mask_blocks():
    """Regression: with a multi-block index and a warm device mask, an
    upsert into a LOWER block must not keep serving the dead row."""
    idx = MultiVectorIndex(CFG, device_block_rows=16, compact_min_rows=10_000)
    mvs = _fill(idx, 40)
    q = np.asarray(mvs[0][:4])
    first = idx.query(q, k=1)  # builds + caches mask blocks
    assert first[0][0].document_id == "d0"
    # upsert d0 with an orthogonal-ish multivector (old row tombstoned)
    rng = np.random.default_rng(99)
    new = rng.standard_normal((6, 16)).astype(np.float32)
    new /= np.linalg.norm(new, axis=-1, keepdims=True)
    idx.store([new], [IndexRecord(document_id="d0", chunk_number=0)])
    res = idx.query(q, k=40)
    rows = [idx._id_to_row[f"{r.document_id}-{r.chunk_number}"] for r, _ in res]
    assert 0 not in rows  # the tombstoned old row must be gone
    d0 = [s for r, s in res if r.document_id == "d0"]
    assert len(d0) == 1  # exactly the NEW d0 row


def test_fde_header_mismatch_rejected_for_every_field(tmp_path):
    idx = MultiVectorIndex(CFG, path=tmp_path / "ix")
    _fill(idx, 4)
    idx.save()
    for change in (
        {"projection_dimension": 16},
        {"num_simhash_projections": 4},
        {"seed": 7},
        {"num_repetitions": 8},
    ):
        bad = FDEConfig(**{**CFG.__dict__, **change})
        with pytest.raises(ValueError, match="different FDE config"):
            MultiVectorIndex(bad, path=tmp_path / "ix")
    # the matching config still loads everything
    re = MultiVectorIndex(CFG, path=tmp_path / "ix")
    assert len(re) == 4


def test_compaction_is_crash_safe(tmp_path):
    """A crash between the COMMIT marker and the file swap must be
    completed on the next load; an unmarked partial build is discarded."""
    path = tmp_path / "ix"
    idx = MultiVectorIndex(CFG, path=path, compact_min_rows=10_000)
    mvs = _fill(idx, 8)
    idx.delete_document("d1")
    idx.delete_document("d2")
    idx.save()

    # simulate phase-1-complete + marker, then "crash" before the swap:
    # build the side dir exactly like compact() does, but don't swap
    tmp = path.with_name(path.name + ".compact")
    keep = [r for r in range(idx.count_rows) if idx._alive[r]]
    side = MultiVectorIndex(CFG, path=tmp)
    side.store(
        [np.asarray(idx._mv_row(r), np.float32) for r in keep],
        [IndexRecord(document_id=idx.records[r].document_id, chunk_number=0) for r in keep],
    )
    side.save()
    (tmp / "COMMIT").touch()

    re = MultiVectorIndex(CFG, path=path)  # recovery completes the swap
    assert not tmp.exists()
    assert len(re) == 6 and re.dead_fraction == 0.0
    assert re.query(np.asarray(mvs[0][:4]), k=1)

    # unmarked partial build -> discarded, original intact
    tmp.mkdir()
    (tmp / "records.jsonl").write_text("garbage\n")
    re2 = MultiVectorIndex(CFG, path=path)
    assert not tmp.exists() and len(re2) == 6


def test_compaction_persistent_roundtrip(tmp_path):
    """Normal auto-compaction on a persistent index reloads correctly."""
    path = tmp_path / "ix"
    idx = MultiVectorIndex(CFG, path=path, compact_min_rows=4, compact_dead_fraction=0.2)
    mvs = _fill(idx, 10)
    idx.save()
    for d in ("d1", "d2", "d3"):
        idx.delete_document(d)  # crosses the dead-fraction trigger -> compacts
    assert idx.dead_fraction == 0.0 and len(idx) == 7
    assert not path.with_name(path.name + ".compact").exists()
    res = idx.query(np.asarray(mvs[0][:4]), k=1)
    assert res[0][0].document_id == "d0"
    re = MultiVectorIndex(CFG, path=path)
    assert len(re) == 7
    assert re.query(np.asarray(mvs[0][:4]), k=1)[0][0].document_id == "d0"


def test_folder_rename_move_prefix_safety(tmp_path):
    """REPLACE-based path rewrites corrupted sibling-prefixed descendants
    ('/a/ab' -> '/z/zb' on renaming '/a' to '/z'). Regression coverage."""
    from morphik_core_tpu.database.sqlite_database import SQLiteDatabase
    from morphik_core_tpu.models.schemas import AuthContext, Document

    run = run_once
    db = SQLiteDatabase(str(tmp_path / "db.sqlite"))
    run(db.initialize())
    auth = AuthContext(entity_id="t", permissions=["read", "write", "admin"])
    a = run(db.create_folder("a", auth))
    run(db.create_folder("ab", auth, parent_path="/a"))
    doc = Document(external_id="x1", content_type="text/plain", folder_path="/a/ab")
    run(db.store_document(doc, auth))

    assert run(db.rename_folder(a["id"], "z", auth))
    got = run(db.get_document("x1", auth))
    assert got.folder_path == "/z/ab", got.folder_path  # NOT '/z/zb'

    # move: nest '/z' under a new parent; the '/z/ab' doc must follow
    p = run(db.create_folder("parent", auth))
    assert run(db.move_folder(a["id"], "/parent", auth))
    got = run(db.get_document("x1", auth))
    assert got.folder_path == "/parent/z/ab", got.folder_path


def test_compaction_with_zero_survivors(tmp_path):
    """Regression: a compaction where NO row survives must not resurrect
    the deleted document from the stale on-disk WAL (an empty side index
    used to write only header.json, leaving the old records.jsonl)."""
    path = tmp_path / "ix"
    idx = MultiVectorIndex(CFG, path=path, compact_min_rows=4, compact_dead_fraction=0.2)
    rng = np.random.default_rng(0)
    mvs = [rng.standard_normal((6, 16)).astype(np.float32) for _ in range(4)]
    idx.store(mvs, [IndexRecord(document_id="bigdoc", chunk_number=i) for i in range(4)])
    idx.save()
    assert idx.delete_document("bigdoc") == 4  # 4/4 dead -> compacts to zero
    assert len(idx) == 0 and idx.dead_fraction == 0.0
    assert idx.query(np.ones((2, 16), np.float32), k=3) == []
    re = MultiVectorIndex(CFG, path=path)
    assert len(re) == 0  # nothing resurrects on reload
    assert re.query(np.ones((2, 16), np.float32), k=3) == []


def test_streaming_compaction_bounded_rss(tmp_path):
    """A persistent compaction must STREAM rows mmap -> side files, never
    materializing the corpus in host RAM (round-2 verdict: the old
    implementation held every alive multivector + FDE row at once, which
    at the 1M-page north star is hundreds of GB). 50k rows here carry
    ~200 MB of payload; the streaming copy must stay under a small
    multiple of the batch size."""
    import tracemalloc

    cfg = FDEConfig(dimension=32, num_repetitions=4, num_simhash_projections=3,
                    projection_dimension=16)  # fde_dim = 4*8*16 = 512
    path = tmp_path / "big"
    idx = MultiVectorIndex(cfg, path=path, compact_min_rows=10**9)
    rng = np.random.default_rng(0)
    n, tok = 50_000, 32
    chunk = 5_000  # build in slabs so the TEST itself stays bounded
    for lo in range(0, n, chunk):
        mvs = [rng.standard_normal((tok, 32)).astype(np.float32) for _ in range(chunk)]
        recs = [IndexRecord(document_id=f"d{(lo + i) // 10}", chunk_number=(lo + i) % 10)
                for i in range(chunk)]
        fde = rng.standard_normal((chunk, 512)).astype(np.float32)
        idx.store(mvs, recs, fde_vectors=fde)
        idx.save()
    for d in range(0, n // 10, 3):  # kill ~1/3 of documents
        idx.delete_document(f"d{d}")
    assert idx.dead_fraction > 0.25

    tracemalloc.start()
    tracemalloc.reset_peak()
    idx.compact()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    alive_payload = len(idx) * tok * 32 * 2 + len(idx) * 512 * 4  # ~170 MB pre-compact
    budget = 90 * 1024 * 1024  # far below the alive payload; ~2x one 4096-row batch
    assert peak < budget, f"compaction peak RSS {peak/1e6:.0f} MB exceeds budget (alive payload {alive_payload/1e6:.0f} MB)"
    assert idx.dead_fraction == 0.0

    # correctness after the streaming rewrite: reload and spot-check
    re = MultiVectorIndex(cfg, path=path)
    assert len(re) == len(idx)
    assert re.get_multivector("d1", 0) is not None
    assert re.get_multivector("d0", 0) is None  # deleted doc stays gone


def test_compaction_preserves_n_tokens():
    """Regression: compaction must carry n_tokens through (a zero value
    breaks the cache's oversized guard and, when later persisted,
    truncates mv.bin)."""
    idx = MultiVectorIndex(CFG, compact_min_rows=4, compact_dead_fraction=0.2)
    _fill(idx, 8)
    idx.delete_document("d0")
    idx.delete_document("d1")  # triggers compaction
    assert idx.dead_fraction == 0.0
    assert all(r.n_tokens == 6 for r in idx.records), [r.n_tokens for r in idx.records]
    mv = idx.get_multivector("d5", 0)
    assert mv is not None and mv.shape == (6, 16)
