#!/usr/bin/env python3
"""Assemble EVAL_r04.json from this round's eval runs.

Inputs (first existing wins per section):
  colpali:  /tmp/colpali_r04_fixed.json (TPU)  | /tmp/colpali_r04_cpu.json (CPU fallback)
  fidelity: /tmp/fid_r04.json (TPU, parts A+B) | /tmp/fid_r04_cpu.json (CPU, part B only)
Carry-over: EVAL_r03.json part A when no TPU part-A run exists this
round (the bf16<->int8 serving math is unchanged; provenance noted).

Run: python scripts/assemble_eval_r04.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load(p: str):
    f = Path(p)
    if f.exists():
        try:
            return json.loads(f.read_text())
        except json.JSONDecodeError:
            return None
    return None


def main() -> int:
    colpali = _load("/tmp/colpali_r04_fixed.json") or _load("/tmp/colpali_r04_cpu.json")
    fid = _load("/tmp/fid_r04.json")
    fid_b_cpu = _load("/tmp/fid_r04_cpu.json")
    r03 = _load(ROOT / "EVAL_r03.json") or {}

    if colpali is None:
        print("no colpali result found", file=sys.stderr)
        return 1

    fidelity = {}
    provenance = {}
    if fid and fid.get("part_a_ranking_agreement"):
        fidelity = fid
        provenance["int8_fidelity"] = "measured this round on TPU"
    else:
        if r03.get("int8_fidelity", {}).get("part_a_ranking_agreement"):
            fidelity["part_a_ranking_agreement"] = r03["int8_fidelity"]["part_a_ranking_agreement"]
            provenance["part_a"] = (
                "carried from EVAL_r03 (TPU relay unavailable this round; the "
                "bf16<->int8 serving math it gates is unchanged in round 4 — "
                "attention stays bf16 by default)"
            )
        b = (fid or {}).get("part_b_fde_recall_at_scale") or (
            fid_b_cpu or {}
        ).get("part_b_fde_recall_at_scale")
        if b:
            fidelity["part_b_fde_recall_at_scale"] = b
            provenance["part_b"] = (
                "measured this round" + (" (CPU)" if not fid else " (TPU)")
            )
        elif r03.get("int8_fidelity", {}).get("part_b_fde_recall_at_scale"):
            fidelity["part_b_fde_recall_at_scale"] = r03["int8_fidelity"][
                "part_b_fde_recall_at_scale"
            ]
            provenance["part_b"] = "carried from EVAL_r03"
        if r03.get("int8_fidelity", {}).get("gate"):
            fidelity["gate"] = r03["int8_fidelity"]["gate"]

    out = {
        "round": 4,
        "what_this_measures": {
            "int8_fidelity": (
                "bf16<->int8 ranking agreement through the full production "
                "stack (part A, 3B geometry) + FDE/pool recall at scale "
                "(part B) — the gate behind the int8 serving default"
            ),
            "colpali_visual": (
                "page-level retrieval through the FULL ColPali pipeline "
                "(render -> preprocess -> embed -> FDE ANN + pooled tier + "
                "union guard -> exact rerank) with the TRAINED tiny fixture "
                "(real glyph-level semantics, not random weights): a "
                "9-rung calibrated perturbation ladder plus keyword-image/"
                "text rows that sit measurably above chance"
            ),
        },
        "provenance": provenance,
        "int8_fidelity": fidelity,
        "colpali_visual": colpali,
    }
    if r03.get("text_path"):
        out["text_path"] = r03["text_path"]
        provenance["text_path"] = "carried from EVAL_r03 (unchanged harness)"

    dest = ROOT / "EVAL_r04.json"
    dest.write_text(json.dumps(out, indent=1))
    print(f"wrote {dest}")
    lad = colpali.get("visual_ladder", {})
    for rung, row in lad.items():
        print(f"  {rung:14s} r@1 {row.get('recall_at_1')}")
    for k in ("keyword_image_queries", "keyword_text_queries"):
        if colpali.get(k):
            print(f"  {k}: {colpali[k]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
