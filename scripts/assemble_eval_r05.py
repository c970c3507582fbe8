#!/usr/bin/env python3
"""Assemble EVAL_r05.json from this round's eval runs.

Inputs (first existing wins per section):
  colpali:  /tmp/colpali_r05.json (TPU) | /tmp/colpali_r05_cpu.json (CPU fallback)
  fidelity: /tmp/fid_r05.json (TPU, parts A+B incl. the round-5
            result-set composition gate) | /tmp/fid_r05_cpu.json
Carry-over: EVAL_r04.json sections when no run exists this round
(provenance noted).

Run: python scripts/assemble_eval_r05.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load(p):
    f = Path(p)
    if f.exists():
        try:
            return json.loads(f.read_text())
        except json.JSONDecodeError:
            return None
    return None


def main() -> int:
    colpali = _load("/tmp/colpali_r05.json") or _load("/tmp/colpali_r05_cpu.json")
    fid = _load("/tmp/fid_r05.json") or _load("/tmp/fid_r05_cpu.json")
    r04 = _load(ROOT / "EVAL_r04.json") or {}

    provenance = {}
    fidelity = {}
    if fid and fid.get("part_a_ranking_agreement"):
        fidelity = fid
        provenance["int8_fidelity"] = (
            "measured this round on TPU through the shipped serving path "
            "(static activation scales if default-on) incl. the round-5 "
            "top10_margin_agreement composition gate"
        )
    elif r04.get("int8_fidelity"):
        fidelity = r04["int8_fidelity"]
        provenance["int8_fidelity"] = "carried from EVAL_r04 (no run this round)"

    if colpali is None:
        if r04.get("colpali_visual"):
            colpali = r04["colpali_visual"]
            provenance["colpali_visual"] = "carried from EVAL_r04 (no run this round)"
        else:
            print("no colpali result found", file=sys.stderr)
            return 1
    else:
        provenance["colpali_visual"] = (
            "measured this round with the 32-dim scale-augmented trained "
            "fixture; semantic rows at n=40"
        )

    out = {
        "round": 5,
        "what_this_measures": {
            "int8_fidelity": (
                "bf16<->int8 ranking agreement through the full production "
                "stack (part A, 3B geometry) + FDE/pool recall at scale "
                "(part B) — the gate behind the int8 serving default, now "
                "including top-10 result-set composition at the shipped "
                "pool-300 config (top10_margin_agreement >= 0.90)"
            ),
            "colpali_visual": (
                "page-level retrieval through the FULL ColPali pipeline "
                "(render -> preprocess -> embed -> FDE ANN + pooled tier + "
                "union guard -> exact rerank) with the TRAINED 32-dim tiny "
                "fixture: a 9-rung calibrated perturbation ladder plus "
                "keyword-image / keyword-page / text rows at n=40"
            ),
        },
        "provenance": provenance,
        "int8_fidelity": fidelity,
        "colpali_visual": colpali,
    }
    if r04.get("text_path"):
        out["text_path"] = r04["text_path"]
        provenance["text_path"] = "carried from EVAL_r03/r04 (unchanged harness)"

    dest = ROOT / "EVAL_r05.json"
    dest.write_text(json.dumps(out, indent=1))
    print(f"wrote {dest}")
    for rung, row in (colpali.get("visual_ladder") or {}).items():
        print(f"  {rung:14s} r@1 {row.get('recall_at_1')}")
    for k in ("keyword_image_queries", "keyword_page_queries", "text_queries"):
        if colpali.get(k):
            print(f"  {k}: {colpali[k]}")
    if fidelity.get("gate"):
        print(f"  gate: {fidelity['gate']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
