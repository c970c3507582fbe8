#!/usr/bin/env python3
"""Resumable multivector-store migration: move every chunk of every
document from one store provider to another (reference
scripts/migrate_postgres_to_turbopuffer.py — resumable with pickled
checkpoints; here the analogue is binary-provider <-> fde-provider).

Usage:
    python scripts/migrate_store_provider.py \
        --config morphik_tpu.toml --from binary --to fde \
        [--checkpoint ./storage/migration.ckpt.json] [--batch 64]

Checkpointing: after each document the set of migrated doc IDs is
written to the checkpoint file; re-running skips them, so the migration
survives interruption (JSON instead of the reference's pickle — the
state is a plain list).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


async def migrate(args: argparse.Namespace) -> int:
    from morphik_core_tpu.config import load_settings
    from morphik_core_tpu.models.schemas import AuthContext, EntityType
    from morphik_core_tpu.ops.fde import FDEConfig
    from morphik_core_tpu.services_init import build_storage
    from morphik_core_tpu.database.sqlite_database import SQLiteDatabase
    from morphik_core_tpu.vector_store.tpu_multivector_store import TPUMultiVectorStore

    settings = load_settings(args.config)
    storage = build_storage(settings)
    db = SQLiteDatabase(settings.database.path)
    await db.initialize()
    fde_cfg = FDEConfig(
        dimension=settings.model.embedding_dim,
        num_repetitions=settings.vector_store.fde_num_repetitions,
        num_simhash_projections=settings.vector_store.fde_num_simhash_projections,
        projection_dimension=settings.vector_store.fde_projection_dimension,
        seed=settings.vector_store.fde_seed,
    )

    def make_store(provider: str) -> TPUMultiVectorStore:
        return TPUMultiVectorStore(
            storage=storage,
            fde_config=fde_cfg,
            index_path=Path(settings.vector_store.index_path) / f"provider_{provider}",
            provider=provider,
        )

    src, dst = make_store(args.src), make_store(args.dst)
    await src.initialize()
    await dst.initialize()

    ckpt_path = Path(args.checkpoint)
    done: set = set()
    if ckpt_path.exists():
        done = set(json.loads(ckpt_path.read_text())["migrated"])
        print(f"resuming: {len(done)} documents already migrated")

    auth = AuthContext(
        entity_type=EntityType.DEVELOPER, entity_id="migration",
        permissions={"read", "write", "admin"},
    )
    docs = await db.get_documents(auth, 0, 1_000_000)
    migrated = errors = 0
    for doc in docs:
        if doc.external_id in done:
            continue
        try:
            ids = [(doc.external_id, n) for n in range(len(doc.chunk_ids) or 0)]
            if not ids:
                done.add(doc.external_id)
                continue
            chunks = await src.get_chunks_by_id(ids, app_id=doc.app_id)
            # re-read raw multivectors from the source index
            index = src._ns(doc.app_id)
            if not hasattr(index, "get_multivector"):
                raise RuntimeError(
                    f"source provider '{args.src}' keeps only quantized bits; "
                    "re-ingest documents to migrate out of it"
                )
            full = []
            for c in chunks:
                mv = index.get_multivector(c.document_id, c.chunk_number)
                if mv is None:
                    continue
                c.embedding = mv
                full.append(c)
            if full:
                ok, _, _ = await dst.store_embeddings(full, app_id=doc.app_id)
                if not ok:
                    raise RuntimeError("store failed")
            migrated += 1
            done.add(doc.external_id)
            ckpt_path.parent.mkdir(parents=True, exist_ok=True)
            ckpt_path.write_text(json.dumps({"migrated": sorted(done)}))
            if migrated % 50 == 0:
                print(f"migrated {migrated} documents...")
        except Exception as e:  # noqa: BLE001
            errors += 1
            print(f"ERROR migrating {doc.external_id}: {e}")
    dst.save()
    print(f"done: migrated={migrated} skipped={len(done) - migrated} errors={errors}")
    return 0 if errors == 0 else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="morphik_tpu.toml")
    # fde keeps full fp32 multivectors (migratable anywhere); the binary
    # provider keeps only packed sign bits, so migrating OUT of it
    # requires re-ingestion.
    ap.add_argument("--from", dest="src", required=True, choices=["fde"])
    ap.add_argument("--to", dest="dst", required=True, choices=["binary", "fde"])
    ap.add_argument("--checkpoint", default="./storage/migration.ckpt.json")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    return asyncio.run(migrate(args))


if __name__ == "__main__":
    raise SystemExit(main())
