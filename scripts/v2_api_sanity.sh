#!/usr/bin/env bash
# v2 pipeline smoke test against a running server (reference
# scripts/v2_api_sanity.sh). Usage:
#   ./scripts/v2_api_sanity.sh [BASE_URL]     # default http://localhost:8000
set -euo pipefail
BASE="${1:-http://localhost:8000}"

say() { printf '\n== %s ==\n' "$*"; }
fail() { echo "FAIL: $*" >&2; exit 1; }

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
printf 'The v2 pipeline handles page-XML chunks.\nSecond paragraph about turbines.\n' > "$TMP/v2doc.txt"

say "v2 ingest"
DOC=$(curl -sf -X POST "$BASE/v2/documents" \
  -F "file=@$TMP/v2doc.txt" -F 'metadata={"suite": "v2sanity"}')
DOC_ID=$(echo "$DOC" | python3 -c 'import sys,json; d=json.load(sys.stdin); print(d.get("external_id") or d.get("id"))')
[ -n "$DOC_ID" ] && [ "$DOC_ID" != None ] || fail "no document id in: $DOC"
echo "doc: $DOC_ID"

say "v2 retrieve"
HITS=$(curl -sf -X POST "$BASE/v2/retrieve/chunks" -H 'Content-Type: application/json' \
  -d '{"query": "turbines", "k": 3}')
echo "$HITS" | grep -qi "turbines" || fail "v2 retrieve missed the document: $HITS"

say "v2 retrieve with filters"
curl -sf -X POST "$BASE/v2/retrieve/chunks" -H 'Content-Type: application/json' \
  -d '{"query": "turbines", "k": 3, "filters": {"suite": {"$eq": "v2sanity"}}}' \
  | grep -qi "turbines" || fail "filtered v2 retrieve"

say "v2 delete"
curl -sf -X DELETE "$BASE/v2/documents/$DOC_ID" | grep -q '"deleted"' || fail "v2 delete"
AFTER=$(curl -sf -X POST "$BASE/v2/retrieve/chunks" -H 'Content-Type: application/json' \
  -d '{"query": "turbines", "k": 3, "filters": {"suite": {"$eq": "v2sanity"}}}')
echo "$AFTER" | grep -qi "turbines" && fail "deleted doc still retrievable" || true

printf '\nALL V2 SANITY CHECKS PASSED\n'
