#!/usr/bin/env bash
# Curl-level smoke test against a running server (reference
# scripts/sanity_test.sh / v2_api_sanity.sh). Usage:
#   ./scripts/sanity_test.sh [BASE_URL]        # default http://localhost:8000
set -euo pipefail
BASE="${1:-http://localhost:8000}"

say() { printf '\n== %s ==\n' "$*"; }
fail() { echo "FAIL: $*" >&2; exit 1; }

say "ping"
curl -sf "$BASE/ping" | grep -q '"ok"' || fail "ping"

say "health"
curl -sf "$BASE/health" | grep -q '"healthy"' || fail "health"

say "ingest text"
DOC=$(curl -sf -X POST "$BASE/ingest/text" -H 'Content-Type: application/json' \
  -d '{"content": "Sanity: the flux reading is 42 units.", "filename": "sanity.txt"}')
DOC_ID=$(echo "$DOC" | python3 -c 'import sys,json; print(json.load(sys.stdin)["external_id"])')
echo "doc: $DOC_ID"

say "wait for completion"
for _ in $(seq 1 120); do
  STATUS=$(curl -sf "$BASE/documents/$DOC_ID/status" | python3 -c 'import sys,json; print(json.load(sys.stdin)["status"])')
  [ "$STATUS" = completed ] && break
  [ "$STATUS" = failed ] && fail "ingestion failed"
  sleep 0.5
done
[ "$STATUS" = completed ] || fail "timed out waiting for ingestion"

say "retrieve"
curl -sf -X POST "$BASE/retrieve/chunks" -H 'Content-Type: application/json' \
  -d '{"query": "flux reading", "k": 1}' | grep -q "flux reading" || fail "retrieve"

say "query"
curl -sf -X POST "$BASE/query" -H 'Content-Type: application/json' \
  -d '{"query": "What is the flux reading?", "k": 1}' | grep -q '"completion"' || fail "query"

say "metadata filters"
curl -sf -X POST "$BASE/documents" -H 'Content-Type: application/json' \
  -d '{"filters": {"$and": [{"nonexistent": {"$exists": false}}]}}' >/dev/null || fail "filters"

say "folders"
curl -sf -X POST "$BASE/folders" -H 'Content-Type: application/json' \
  -d '{"name": "sanity-folder"}' | grep -q sanity-folder || fail "folders"
curl -sf "$BASE/folders/summary" >/dev/null || fail "folder summary"

say "logs + usage"
curl -sf "$BASE/logs?limit=5" >/dev/null || fail "logs"
curl -sf "$BASE/usage/app-storage" >/dev/null || fail "usage"

say "cleanup"
curl -sf -X DELETE "$BASE/documents/$DOC_ID" >/dev/null || fail "delete"

echo
echo "ALL SANITY CHECKS PASSED"
