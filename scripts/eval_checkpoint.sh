#!/usr/bin/env bash
# Operator runbook: real-weights evaluation, end to end (round-4).
#
# This environment cannot download the released ColQwen2.5 checkpoint
# (zero egress), so the committed eval artifacts run on the trained
# tiny FIXTURE (tests/fixtures/tiny_colqwen.npz). An operator WITH the
# real weights runs THIS script to produce the full semantic numbers
# the reference reports (custom_eval/README.md:113-124 — 95.56%
# visual-doc RAG accuracy).
#
# Usage:
#   scripts/eval_checkpoint.sh [CKPT_DIR]
#
# CKPT_DIR: local HF-format dir (safetensors) for
#   tsystemes/colqwen2.5-v0.2-merged (or any ColQwen2_5 export).
#   Defaults to ./checkpoints/colqwen2.5 — downloaded first if absent
#   and `huggingface-cli` is available.
#
# Stages (each gated on the previous):
#   1. download  — huggingface-cli snapshot of the merged checkpoint
#   2. rehearse  — scripts/rehearse_checkpoint.py --dir CKPT --skip-write:
#                  full-size load through convert.py's host-side
#                  conversion (~30 bulk transfers, no HBM fragmentation;
#                  round-3 lesson), one serving step, REHEARSAL json
#   3. fidelity  — evaluations/fidelity_eval.py: int8-vs-bf16 serving
#                  gate (top-1 match, rerank Pearson, index recall
#                  delta) at the real weights
#   4. colpali   — evaluations/colpali_eval.py --geometry 3b with
#                  model.checkpoint_path set: the FULL pipeline eval;
#                  keyword-image and text rows become real semantic
#                  retrieval metrics
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT="${1:-checkpoints/colqwen2.5}"
REPO="tsystemes/colqwen2.5-v0.2-merged"
OUT="${EVAL_OUT:-EVAL_checkpoint.json}"

if [ ! -d "$CKPT" ] || ! ls "$CKPT"/*.safetensors >/dev/null 2>&1; then
    echo "== 1/4 download: $REPO -> $CKPT"
    command -v huggingface-cli >/dev/null || {
        echo "huggingface-cli not found and no checkpoint at $CKPT" >&2
        echo "Download $REPO (safetensors) there manually, then re-run." >&2
        exit 2
    }
    huggingface-cli download "$REPO" --local-dir "$CKPT"
else
    echo "== 1/4 download: using existing $CKPT"
fi

echo "== 2/4 rehearse: full-size load + one serving step"
python scripts/rehearse_checkpoint.py --dir "$CKPT" --skip-write --keep

echo "== 3/4 fidelity: int8 serving gate (geometry-based, weights-free)"
python evaluations/fidelity_eval.py --out "fidelity_${OUT}"

echo "== 4/4 colpali: full-pipeline semantic eval at real weights"
python evaluations/colpali_eval.py --checkpoint "$CKPT" --out "$OUT"

echo "done: $OUT + fidelity_${OUT}"
