#!/usr/bin/env bash
# Metadata filter-language smoke test against a running server
# (reference scripts/test_metadata_filters.sh). Exercises the operator
# set on /documents and /retrieve/chunks. Usage:
#   ./scripts/test_metadata_filters.sh [BASE_URL]
set -euo pipefail
BASE="${1:-http://localhost:8000}"

say() { printf '\n== %s ==\n' "$*"; }
fail() { echo "FAIL: $*" >&2; exit 1; }

ingest() { # $1 content, $2 metadata json, $3 types json (or empty)
  local body
  body=$(python3 - "$1" "$2" "${3:-}" <<'PY'
import json, sys
payload = {"content": sys.argv[1], "metadata": json.loads(sys.argv[2]), "use_colpali": False}
if len(sys.argv) > 3 and sys.argv[3]:
    payload["metadata_types"] = json.loads(sys.argv[3])
print(json.dumps(payload))
PY
)
  curl -sf -X POST "$BASE/ingest/text" -H 'Content-Type: application/json' -d "$body" \
    | python3 -c 'import sys,json; print(json.load(sys.stdin)["external_id"])'
}

count() { # $1 filters json -> number of docs
  curl -sf -X POST "$BASE/documents" -H 'Content-Type: application/json' \
    -d "{\"filters\": $1, \"limit\": 100}" | python3 -c 'import sys,json; print(len(json.load(sys.stdin)))'
}

say "seed documents"
SUITE="mfsuite_$$"
A=$(ingest "alpha report"  "{\"suite\": \"$SUITE\", \"dept\": \"finance\", \"score\": 90, \"tags\": [\"q1\", \"internal\"], \"when\": \"2024-03-01\"}" '{"score": "number", "when": "date"}')
B=$(ingest "bravo report"  "{\"suite\": \"$SUITE\", \"dept\": \"legal\",   \"score\": 40, \"tags\": [\"q2\"]}" '{"score": "number"}')
C=$(ingest "charlie memo"  "{\"suite\": \"$SUITE\", \"dept\": \"finance\", \"score\": 75}" '{"score": "number"}')
echo "docs: $A $B $C"

say "\$eq"
[ "$(count "{\"suite\": \"$SUITE\", \"dept\": {\"\$eq\": \"finance\"}}")" = 2 ] || fail "\$eq"

say "\$ne"
[ "$(count "{\"suite\": \"$SUITE\", \"dept\": {\"\$ne\": \"finance\"}}")" = 1 ] || fail "\$ne"

say "\$gt / \$lte (typed numbers)"
[ "$(count "{\"suite\": \"$SUITE\", \"score\": {\"\$gt\": 70}}")" = 2 ] || fail "\$gt"
[ "$(count "{\"suite\": \"$SUITE\", \"score\": {\"\$lte\": 40}}")" = 1 ] || fail "\$lte"

say "\$in / \$nin"
[ "$(count "{\"suite\": \"$SUITE\", \"dept\": {\"\$in\": [\"finance\", \"hr\"]}}")" = 2 ] || fail "\$in"
[ "$(count "{\"suite\": \"$SUITE\", \"dept\": {\"\$nin\": [\"finance\"]}}")" = 1 ] || fail "\$nin"

say "\$and / \$or / \$not / \$nor"
[ "$(count "{\"\$and\": [{\"suite\": \"$SUITE\"}, {\"dept\": \"finance\"}, {\"score\": {\"\$gte\": 80}}]}")" = 1 ] || fail "\$and"
[ "$(count "{\"\$and\": [{\"suite\": \"$SUITE\"}, {\"\$or\": [{\"dept\": \"legal\"}, {\"score\": {\"\$gt\": 80}}]}]}")" = 2 ] || fail "\$or"
[ "$(count "{\"\$and\": [{\"suite\": \"$SUITE\"}, {\"\$not\": {\"dept\": \"finance\"}}]}")" = 1 ] || fail "\$not"
[ "$(count "{\"\$and\": [{\"suite\": \"$SUITE\"}, {\"\$nor\": [{\"dept\": \"finance\"}, {\"dept\": \"legal\"}]}]}")" = 0 ] || fail "\$nor"

say "\$exists / \$contains / \$regex"
[ "$(count "{\"suite\": \"$SUITE\", \"when\": {\"\$exists\": true}}")" = 1 ] || fail "\$exists"
[ "$(count "{\"suite\": \"$SUITE\", \"tags\": {\"\$contains\": \"q1\"}}")" = 1 ] || fail "\$contains"
[ "$(count "{\"suite\": \"$SUITE\", \"dept\": {\"\$regex\": \"^fin\"}}")" = 2 ] || fail "\$regex"

say "filters on retrieval"
curl -sf -X POST "$BASE/retrieve/chunks" -H 'Content-Type: application/json' \
  -d "{\"query\": \"report\", \"k\": 5, \"use_colpali\": false, \"filters\": {\"suite\": \"$SUITE\", \"dept\": \"legal\"}}" \
  | grep -q "bravo report" || fail "filtered retrieval"

say "cleanup"
for ID in $A $B $C; do curl -sf -X DELETE "$BASE/documents/$ID" >/dev/null; done

printf '\nALL METADATA FILTER CHECKS PASSED\n'
