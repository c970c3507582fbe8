#!/usr/bin/env python3
"""Consistency check across the three places a chunk lives
(reference scripts/check_completeness.py — there Supabase vs
Turbopuffer; here SQLite documents vs index rows vs storage payloads).

Checks, per namespace (app_id or "default"):
  1. every COMPLETED document's multivector chunk_ids exist in the index
  2. every index row's document exists in the DB and is not failed
  3. every index row's content_key (offloaded payload) exists in storage

Prints one JSON report; exit code 1 when any inconsistency is found.

Usage:
    python scripts/check_completeness.py --config morphik_tpu.toml
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
            size = await storage.get_object_size(MULTIVECTOR_CHUNKS_BUCKET, idx.records[r].content_key)
            if size is None:
                report["missing_payloads"].append(
                    {"namespace": ns, "content_key": idx.records[r].content_key}
                )
    db.close()
    report["consistent"] = not (
        report["missing_index_rows"] or report["orphan_index_rows"] or report["missing_payloads"]
    )
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="morphik_tpu.toml")
    args = ap.parse_args(argv)
    report = asyncio.run(check(args))
    print(json.dumps(report, indent=1))
    return 0 if report["consistent"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
