#!/usr/bin/env python3
"""Migrate legacy multivector-index snapshots (round-1 layout:
meta.json + fde.npy + multivectors/{row}.npy) to the append-only
format (header.json + records.jsonl WAL + fde.bin + mv.bin), offline.

The engine migrates lazily on load (MultiVectorIndex._load_legacy), but
that defers the one-time O(corpus) cost to the first post-upgrade boot;
this script does it ahead of time and verifies the result. Analogue of
the reference's storage-format migration scripts
(reference scripts/ migrate_multivectors_to_external_storage.py).

Usage:
    python scripts/migrate_index_format.py --index-path ./storage/index \
        [--namespace NS]... [--query-smoke]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def migrate_namespace(ns_dir: Path, fde_cfg, query_smoke: bool) -> str:
    import numpy as np

    from morphik_core_tpu.index.multivector_index import MultiVectorIndex

    if (ns_dir / "records.jsonl").exists():
        return "already append-only"
    if not (ns_dir / "meta.json").exists():
        return "not an index dir (skipped)"
    t0 = time.time()
    idx = MultiVectorIndex(fde_cfg, path=ns_dir)  # _load_legacy ingests the snapshot
    alive = len(idx)
    idx.save()  # writes the append-only layout
    # drop superseded legacy files only after a successful save
    (ns_dir / "meta.json").unlink(missing_ok=True)
    (ns_dir / "fde.npy").unlink(missing_ok=True)
    legacy_dir = ns_dir / "multivectors"
    if legacy_dir.exists():
        import shutil

        shutil.rmtree(legacy_dir, ignore_errors=True)
    # verify: reload from the new layout
    re = MultiVectorIndex(fde_cfg, path=ns_dir)
    assert len(re) == alive, f"row mismatch after migration: {len(re)} != {alive}"
    if query_smoke and alive:
        q = np.ones((4, re.fde_config.dimension), np.float32)
        hits = re.query(q, k=min(3, alive))
        assert hits, "query smoke returned nothing"
    return f"migrated {alive} rows in {time.time() - t0:.1f}s"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-path", required=True)
    ap.add_argument("--namespace", action="append", help="migrate only these namespaces")
    ap.add_argument("--query-smoke", action="store_true", help="run a query after each migration")
    ap.add_argument("--config", help="morphik_tpu.toml to read the FDE config from")
    # legacy snapshots carry no header.json: the FDE config the index
    # was built with must be supplied (or read from the service config)
    ap.add_argument("--dimension", type=int)
    ap.add_argument("--num-repetitions", type=int)
    ap.add_argument("--num-simhash-projections", type=int)
    ap.add_argument("--projection-dimension", type=int)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from morphik_core_tpu.ops.fde import FDEConfig

    if args.config:
        from morphik_core_tpu.config import load_settings

        vs = load_settings(args.config).vector_store
        fde_cfg = FDEConfig(
            dimension=load_settings(args.config).model.embedding_dim,
            num_repetitions=vs.fde_num_repetitions,
            num_simhash_projections=vs.fde_num_simhash_projections,
            projection_dimension=vs.fde_projection_dimension,
        )
    else:
        defaults = FDEConfig()
        fde_cfg = FDEConfig(
            dimension=args.dimension or defaults.dimension,
            num_repetitions=args.num_repetitions or defaults.num_repetitions,
            num_simhash_projections=args.num_simhash_projections
            or defaults.num_simhash_projections,
            projection_dimension=args.projection_dimension or defaults.projection_dimension,
        )

    root = Path(args.index_path)
    if not root.exists():
        print(f"no index at {root}", file=sys.stderr)
        return 1
    ns_dirs = [root / n for n in args.namespace] if args.namespace else sorted(
        p for p in root.iterdir() if p.is_dir()
    )
    for ns_dir in ns_dirs:
        print(f"{ns_dir.name}: {migrate_namespace(ns_dir, fde_cfg, args.query_smoke)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
