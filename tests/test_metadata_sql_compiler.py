"""SQL metadata-filter compiler vs the Python evaluator (the oracle).

The compiler must be EXACT for documents without metadata_types hints on
ordered-comparison fields (reference compiles the same tree to Postgres
jsonb SQL, core/database/metadata_filters.py:29-856). Property-tests the
SQL path against matches_filter on randomized documents and a broad
filter corpus, and pins that the DB no longer runs per-row Python for
common operators.
"""

import json
import sqlite3

import numpy as np
import pytest

from morphik_core_tpu.database.metadata_filters import (
    InvalidMetadataFilterError,
    compile_filter_sql,
    matches_filter,
    register_sql_functions,
)

# ---------------------------------------------------------------- harness


def _make_db(docs):
    conn = sqlite3.connect(":memory:")
    conn.row_factory = sqlite3.Row
    register_sql_functions(conn)
    conn.execute(
        "CREATE TABLE documents (id INTEGER PRIMARY KEY, doc_metadata TEXT, "
        "metadata_types TEXT, filename TEXT)"
    )
    for i, (md, mt, fn) in enumerate(docs):
        conn.execute(
            "INSERT INTO documents VALUES (?,?,?,?)",
            (i, json.dumps(md), json.dumps(mt or {}), fn),
        )
    return conn


def _sql_ids(conn, filters):
    compiled = compile_filter_sql(filters)
    if compiled is None:
        return None
    clause, params, needs_py = compiled
    rows = conn.execute(
        f"SELECT id, {needs_py} AS _needs_py, doc_metadata, metadata_types, filename "
        f"FROM documents WHERE ({clause}) OR {needs_py}",
        params,
    ).fetchall()
    ids = set()
    for r in rows:
        if r["_needs_py"]:
            if matches_filter(
                filters,
                json.loads(r["doc_metadata"]),
                json.loads(r["metadata_types"]),
                {"filename": r["filename"]},
            ):
                ids.add(r["id"])
        else:
            ids.add(r["id"])
    return ids


def _oracle_ids(docs, filters):
    out = set()
    for i, (md, mt, fn) in enumerate(docs):
        if matches_filter(filters, md, mt or {}, {"filename": fn}):
            out.add(i)
    return out


def _check(docs, filters, expect_compiled=True):
    conn = _make_db(docs)
    got = _sql_ids(conn, filters)
    if got is None:
        assert not expect_compiled, f"expected {filters} to compile"
        return
    want = _oracle_ids(docs, filters)
    assert got == want, f"filter {filters}: sql={sorted(got)} oracle={sorted(want)}"


# ------------------------------------------------------------ fixed corpus

DOCS = [
    ({"k": 1}, None, "a.pdf"),
    ({"k": 1.0}, None, "b.pdf"),
    ({"k": "1"}, None, "c.txt"),
    ({"k": True}, None, None),
    ({"k": False}, None, "d.txt"),
    ({"k": None}, None, "e.pdf"),
    ({"k": "abc"}, None, "report-2024.pdf"),
    ({"k": [1, 2, 3]}, None, "f.txt"),
    ({"k": ["a", "b"]}, None, "g.pdf"),
    ({"k": {"nested": 5}}, None, "h.pdf"),
    ({"other": 7}, None, "i.pdf"),
    ({}, None, "j.pdf"),
    ({"k": "42"}, None, "k.pdf"),
    ({"k": 42}, None, "l.pdf"),
    ({"k": -3.5}, None, "m.pdf"),
    ({"k": "zebra"}, None, "n.pdf"),
    ({"k": "2024-05-01"}, None, "o.pdf"),
    ({"k": "  7  "}, None, "p.pdf"),
    ({"nested": {"deep": {"x": 9}}}, None, "q.pdf"),
    ({"k": 5, "j": "x"}, {"k": "number"}, "typed.pdf"),  # hinted field
]

FILTERS_COMPILABLE = [
    {"k": 1},
    {"k": "1"},
    {"k": True},
    {"k": False},
    {"k": None},
    {"k": "abc"},
    {"k": {"$eq": 42}},
    {"k": {"$eq": "42"}},
    {"k": {"$ne": 1}},
    {"k": {"$ne": "abc"}},
    {"k": {"$gt": 5}},
    {"k": {"$gte": 42}},
    {"k": {"$lt": 2}},
    {"k": {"$lte": 1.0}},
    {"k": {"$gt": "10"}},     # numeric-string operand
    {"k": {"$gt": "mango"}},  # lexicographic
    {"k": {"$in": [1, "abc", True]}},
    {"k": {"$in": []}},
    {"k": {"$nin": [1, 2]}},
    {"k": {"$nin": []}},
    {"k": {"$exists": True}},
    {"k": {"$exists": False}},
    {"k": {"$contains": "b"}},
    {"k": {"$contains": 2}},
    {"nested.deep.x": 9},
    {"nested.deep.x": {"$gt": 5}},
    {"$and": [{"k": {"$gt": 0}}, {"k": {"$lt": 50}}]},
    {"$or": [{"k": "abc"}, {"other": 7}]},
    {"$nor": [{"k": 1}, {"k": "abc"}]},
    {"$not": {"k": {"$exists": True}}},
    {"k": {"$not": {"$eq": 1}}},
    {"k": {"$gt": 0, "$lt": 2}},
    {"filename": "a.pdf"},
    {"filename": {"$ne": "a.pdf"}},
    {"filename": {"$contains": "2024"}},
    {"filename": {"$in": ["a.pdf", "g.pdf"]}},
    {"filename": {"$exists": False}},
    {"filename": {"$exists": True}},
    {"filename": None},
    {"filename": {"$gt": "m"}},
]

FILTERS_FALLBACK = [
    {"k": {"$regex": "^a"}},
    {"k": {"$type": "number"}},
    {"k": {"$gt": "2024-01-01"}},     # temporal coercion
    {"k": {"$eq": [1, 2, 3]}},        # array operand equality
    {"k": {"$contains": None}},
    {"$or": [{"k": 1}, {"k": {"$regex": "x"}}]},  # one bad leaf poisons all
]


@pytest.mark.parametrize("filters", FILTERS_COMPILABLE)
def test_compiled_filters_match_oracle(filters):
    _check(DOCS, filters, expect_compiled=True)


@pytest.mark.parametrize("filters", FILTERS_FALLBACK)
def test_uncompilable_filters_bail(filters):
    assert compile_filter_sql(filters) is None


def test_invalid_filters_raise():
    with pytest.raises(InvalidMetadataFilterError):
        compile_filter_sql({"$bogus": [{"k": 1}]})
    with pytest.raises(InvalidMetadataFilterError):
        compile_filter_sql({"k": {"$in": "not-a-list"}})
    with pytest.raises(InvalidMetadataFilterError):
        compile_filter_sql({"$and": []})


def test_hinted_rows_route_through_python():
    """Docs with metadata_types hints on ordered fields must be selected
    and re-checked in Python (typed semantics: '7' > 5 numerically)."""
    docs = [
        ({"v": "7"}, {"v": "number"}, "x"),   # hinted numeric string
        ({"v": "7"}, None, "y"),              # unhinted: same SQL result here
        ({"v": "abc"}, {"v": "number"}, "z"), # hinted, not numeric -> no match
    ]
    _check(docs, {"v": {"$gt": 5}})


# --------------------------------------------------------------- property

def _random_value(rng):
    kind = rng.integers(0, 9)
    if kind == 0:
        return int(rng.integers(-50, 50))
    if kind == 1:
        return round(float(rng.normal() * 20), 3)
    if kind == 2:
        return str(int(rng.integers(-50, 50)))  # numeric string
    if kind == 3:
        return rng.choice(["alpha", "beta", "gamma", "", "Zed", "10x"]).item()
    if kind == 4:
        return bool(rng.integers(0, 2))
    if kind == 5:
        return None
    if kind == 6:
        return [_random_value(rng) for _ in range(rng.integers(0, 4))]
    if kind == 7:
        return {"inner": _random_value(rng)}
    return rng.choice(["2024-05-01", "2023-12-31T10:00:00"]).item()


def _random_operand(rng):
    kind = rng.integers(0, 5)
    if kind == 0:
        return int(rng.integers(-50, 50))
    if kind == 1:
        return round(float(rng.normal() * 20), 3)
    if kind == 2:
        return str(int(rng.integers(-50, 50)))
    if kind == 3:
        return rng.choice(["alpha", "beta", "", "Zed", "10x"]).item()
    return bool(rng.integers(0, 2))


def _random_filter(rng, depth=0):
    fields = ["f0", "f1", "f2", "nest.x"]
    r = rng.integers(0, 10 if depth < 2 else 7)
    f = rng.choice(fields).item()
    if r == 0:
        return {f: _random_operand(rng)}
    if r == 1:
        return {f: {"$eq": _random_operand(rng)}}
    if r == 2:
        return {f: {"$ne": _random_operand(rng)}}
    if r == 3:
        op = rng.choice(["$gt", "$gte", "$lt", "$lte"]).item()
        return {f: {op: _random_operand(rng)}}
    if r == 4:
        return {f: {"$in": [_random_operand(rng) for _ in range(rng.integers(0, 4))]}}
    if r == 5:
        return {f: {"$exists": bool(rng.integers(0, 2))}}
    if r == 6:
        return {f: {"$contains": _random_operand(rng)}}
    if r == 7:
        return {"$and": [_random_filter(rng, depth + 1) for _ in range(2)]}
    if r == 8:
        return {"$or": [_random_filter(rng, depth + 1) for _ in range(2)]}
    return {"$nor": [_random_filter(rng, depth + 1) for _ in range(2)]}


def test_property_random_filters_vs_oracle():
    rng = np.random.default_rng(42)
    docs = []
    for _ in range(120):
        md = {}
        for f in ["f0", "f1", "f2"]:
            if rng.integers(0, 4) > 0:
                md[f] = _random_value(rng)
        if rng.integers(0, 3) == 0:
            md["nest"] = {"x": _random_value(rng)}
        docs.append((md, None, None))
    conn = _make_db(docs)
    n_compiled = 0
    for _ in range(400):
        filters = _random_filter(rng)
        got = _sql_ids(conn, filters)
        if got is None:
            continue
        n_compiled += 1
        want = _oracle_ids(docs, filters)
        assert got == want, (
            f"filter {json.dumps(filters)}: sql-only={sorted(got - want)} "
            f"oracle-only={sorted(want - got)}"
        )
    assert n_compiled >= 300  # the corpus is overwhelmingly compilable


def test_database_skips_python_for_common_operators(tmp_path, monkeypatch):
    """find_authorized_and_filtered_documents must not call the Python
    evaluator when the filter compiled and no rows carry hints."""
    import asyncio

    import morphik_core_tpu.database.sqlite_database as dbmod
    from morphik_core_tpu.database.sqlite_database import SQLiteDatabase
    from morphik_core_tpu.models.schemas import AuthContext, Document, EntityType

    loop = asyncio.new_event_loop()
    db = SQLiteDatabase(tmp_path / "t.db")
    loop.run_until_complete(db.initialize())
    auth = AuthContext(entity_type=EntityType.DEVELOPER, entity_id="u", permissions={"read"})
    for i in range(20):
        d = Document(
            external_id=f"d{i}",
            content_type="text/plain",
            metadata={"team": "eng" if i % 2 else "ops", "rank": i},
            system_metadata={"status": "completed"},
        )
        loop.run_until_complete(db.store_document(d, auth))

    calls = []
    real = dbmod.matches_filter

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(dbmod, "matches_filter", spy)
    ids = loop.run_until_complete(
        db.find_authorized_and_filtered_documents(
            auth, {"team": "eng", "rank": {"$gte": 10}}
        )
    )
    assert sorted(ids) == [f"d{i}" for i in range(11, 20, 2)]
    assert calls == []  # zero per-row Python for compiled filters

    # uncompilable filter still works via fallback
    ids = loop.run_until_complete(
        db.find_authorized_and_filtered_documents(auth, {"team": {"$regex": "^e"}})
    )
    assert len(ids) == 10 and len(calls) == 20
    db.close()
