#!/usr/bin/env python3
"""Consistency check across the three places a chunk lives
(reference scripts/check_completeness.py — there Supabase vs
Turbopuffer; here SQLite documents vs index rows vs storage payloads).

Checks, per namespace (app_id or "default"):
  1. every COMPLETED document's multivector chunk_ids exist in the index
  2. every index row's document exists in the DB and is not failed
  3. every index row's content_key (offloaded payload) exists in storage

Also emits a GC PLAN (`gc_plan` in the report): storage objects no
longer referenced by anything — per-chunk payloads in the
multivector-chunks bucket with no alive index row, and raw `ingest/…`
uploads whose document is gone from the DB (document deletion removes
index rows + the raw file but per-chunk payloads can orphan; purge_app
--dry-run shows the same for a whole app). `--gc-apply` deletes exactly
the planned objects.

Prints one JSON report; exit code 1 when any inconsistency is found
(orphaned-but-harmless GC candidates do NOT flip the exit code).

Usage:
    python scripts/check_completeness.py --config morphik_tpu.toml [--gc-apply]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


async def check(args) -> dict:
    from morphik_core_tpu.config import load_settings
    from morphik_core_tpu.database.sqlite_database import SQLiteDatabase
    from morphik_core_tpu.index.multivector_index import MultiVectorIndex
    from morphik_core_tpu.services_init import build_storage
    from morphik_core_tpu.vector_store.tpu_multivector_store import (
        MULTIVECTOR_CHUNKS_BUCKET,
        _DEFAULT_NS,
    )

    from scripts.export_chunks_resumable import fde_config_from

    settings = load_settings(args.config)
    db = SQLiteDatabase(settings.database.path)
    await db.initialize()
    storage = build_storage(settings)
    index_root = Path(settings.vector_store.index_path)
    fde_cfg = fde_config_from(settings)

    # --- DB side: completed documents and their chunk ids, per namespace
    rows = db._conn.execute(
        "SELECT external_id, app_id, status, chunk_ids FROM documents"
    ).fetchall()
    db_docs = {}  # (ns, doc_id) -> (status, [chunk ids])
    for r in rows:
        ns = r["app_id"] or _DEFAULT_NS
        db_docs[(ns, r["external_id"])] = (r["status"], json.loads(r["chunk_ids"] or "[]"))

    report = {
        "namespaces": {},
        "missing_index_rows": [],   # completed doc chunk id absent from index
        "orphan_index_rows": [],    # index row whose document is gone/failed
        "missing_payloads": [],     # content_key absent from storage
    }
    alive_payload_keys = set()  # content_keys referenced by ANY alive index row
    ns_dirs = (
        sorted(d for d in index_root.iterdir() if d.is_dir() and not d.name.endswith(".compact"))
        if index_root.exists()
        else []
    )
    for ns_dir in ns_dirs:
        ns = ns_dir.name
        idx = MultiVectorIndex(fde_cfg, path=ns_dir)
        index_ids = {
            f"{idx.records[r].document_id}-{idx.records[r].chunk_number}"
            for r in range(idx.count_rows)
            if idx._alive[r]
        }
        index_docs = {idx.records[r].document_id for r in range(idx.count_rows) if idx._alive[r]}
        report["namespaces"][ns] = {"index_rows": len(index_ids), "index_docs": len(index_docs)}

        # 1. completed docs -> index rows (only ids shaped like index ids:
        #    the text store owns the "<uuid4>" single-vector chunk ids)
        for (dns, doc_id), (status, chunk_ids) in db_docs.items():
            if dns != ns or status != "completed":
                continue
            for cid in chunk_ids:
                if cid.startswith(f"{doc_id}-") and cid not in index_ids:
                    report["missing_index_rows"].append({"namespace": ns, "chunk_id": cid})

        # 2. index docs -> DB status
        for doc_id in sorted(index_docs):
            status = db_docs.get((ns, doc_id), (None, None))[0]
            if status in (None, "failed"):
                report["orphan_index_rows"].append(
                    {"namespace": ns, "document_id": doc_id, "db_status": status}
                )

        # 3. payload keys -> storage objects
        for r in range(idx.count_rows):
            if not idx._alive[r] or not idx.records[r].content_key:
                continue
            alive_payload_keys.add(idx.records[r].content_key)
            size = await storage.get_object_size(MULTIVECTOR_CHUNKS_BUCKET, idx.records[r].content_key)
            if size is None:
                report["missing_payloads"].append(
                    {"namespace": ns, "content_key": idx.records[r].content_key}
                )
    db.close()

    # --- GC plan: storage objects nothing references anymore. Two classes:
    #   a) per-chunk payloads (multivector-chunks/<ns>/<doc>/<chunk><ext>)
    #      with no alive index row — document deletion tombstones index
    #      rows and removes the raw upload but leaves these behind
    #      (document_service.delete_document), and a crashed purge can too.
    #   b) raw uploads (ingest/<doc_id>/…) whose document no longer exists
    #      in the DB at ANY status (failed docs keep theirs for requeue).
    gc = {"orphan_payload_objects": [], "orphan_raw_objects": [], "reclaim_bytes": 0}
    for key, size in await storage.list_objects(MULTIVECTOR_CHUNKS_BUCKET):
        if key not in alive_payload_keys:
            gc["orphan_payload_objects"].append({"key": key, "bytes": size})
            gc["reclaim_bytes"] += size
    known_doc_ids = {doc_id for (_ns, doc_id) in db_docs}
    for key, size in await storage.list_objects("", prefix="ingest/"):
        parts = key.split("/")
        if len(parts) >= 2 and parts[1] not in known_doc_ids:
            gc["orphan_raw_objects"].append({"key": key, "bytes": size})
            gc["reclaim_bytes"] += size
    report["gc_plan"] = gc

    if getattr(args, "gc_apply", False):
        deleted = 0
        for obj in gc["orphan_payload_objects"]:
            if await storage.delete_file(MULTIVECTOR_CHUNKS_BUCKET, obj["key"]):
                deleted += 1
        for obj in gc["orphan_raw_objects"]:
            if await storage.delete_file("", obj["key"]):
                deleted += 1
        report["gc_applied"] = deleted
    report["consistent"] = not (
        report["missing_index_rows"] or report["orphan_index_rows"] or report["missing_payloads"]
    )
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="morphik_tpu.toml")
    ap.add_argument("--gc-apply", action="store_true",
                    help="delete the objects the GC plan lists as orphaned")
    args = ap.parse_args(argv)
    report = asyncio.run(check(args))
    print(json.dumps(report, indent=1))
    return 0 if report["consistent"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
