#!/usr/bin/env python3
"""Scrub user metadata from stored documents (reference
scripts/scrub_metadata.py — keeps only external_id), batched and
dry-run-able. Also scrubs the matching index-record metadata so
filterable state cannot leak through retrieval results.

Usage:
    python scripts/scrub_metadata.py --config morphik_tpu.toml \
        [--keep external_id,title] [--apply] [--batch 100]

Without --apply the script only reports what it WOULD change.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def scrub(args) -> dict:
    import sqlite3

    from morphik_core_tpu.config import load_settings

    settings = load_settings(args.config)
    keep = {k.strip() for k in args.keep.split(",") if k.strip()}
    conn = sqlite3.connect(settings.database.path)
    conn.row_factory = sqlite3.Row
    rows = conn.execute("SELECT external_id, doc_metadata FROM documents").fetchall()
    changed = 0
    batch = []
    for r in rows:
        meta = json.loads(r["doc_metadata"] or "{}")
        scrubbed = {k: v for k, v in meta.items() if k in keep}
        if scrubbed != meta:
            changed += 1
            batch.append((json.dumps(scrubbed), r["external_id"]))
        if args.apply and len(batch) >= args.batch:
            conn.executemany("UPDATE documents SET doc_metadata = ? WHERE external_id = ?", batch)
            conn.commit()
            batch = []
    if args.apply and batch:
        conn.executemany("UPDATE documents SET doc_metadata = ? WHERE external_id = ?", batch)
        conn.commit()
    conn.close()

    # index-record metadata (the retrieval path serves this copy)
    index_changed = 0
    if args.apply or args.dry_run_index:
        from morphik_core_tpu.index.multivector_index import MultiVectorIndex

        from scripts.export_chunks_resumable import fde_config_from

        index_root = Path(settings.vector_store.index_path)
        fde_cfg = fde_config_from(settings)
        ns_dirs = (
            sorted(d for d in index_root.iterdir() if d.is_dir() and not d.name.endswith(".compact"))
            if index_root.exists()
            else []
        )
        for ns_dir in ns_dirs:
            idx = MultiVectorIndex(fde_cfg, path=ns_dir)
            dirty = False
            for r in range(idx.count_rows):
                rec = idx.records[r]
                scrubbed = {k: v for k, v in rec.metadata.items() if k in keep}
                if scrubbed != rec.metadata:
                    index_changed += 1
                    if args.apply:
                        rec.metadata = scrubbed
                        dirty = True
            if dirty:
                # compaction rewrites every WAL line with the live
                # (scrubbed) record metadata
                idx.compact()
                idx.save()
    return {"documents_scrubbed": changed, "index_records_scrubbed": index_changed, "applied": bool(args.apply)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="morphik_tpu.toml")
    ap.add_argument("--keep", default="external_id")
    ap.add_argument("--apply", action="store_true")
    ap.add_argument("--dry-run-index", action="store_true",
                    help="count index-record changes in dry-run mode too")
    ap.add_argument("--batch", type=int, default=100)
    args = ap.parse_args(argv)
    print(json.dumps(scrub(args)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
