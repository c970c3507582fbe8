"""Metadata filter language tests — the operator contract of
reference core/api.py:356-373 (mirrors the reference's filter test
matrix, SURVEY.md §4)."""

import pytest
from datetime import date, datetime

from morphik_core_tpu.database.metadata_filters import InvalidMetadataFilterError, matches_filter


def m(filters, metadata, types=None, cols=None):
    return matches_filter(filters, metadata, types, cols)


def test_implicit_equality():
    assert m({"department": "engineering"}, {"department": "engineering"})
    assert not m({"department": "engineering"}, {"department": "sales"})
    assert not m({"department": "engineering"}, {})


def test_implicit_equality_array_membership():
    assert m({"tags": "red"}, {"tags": ["red", "blue"]})
    assert not m({"tags": "green"}, {"tags": ["red", "blue"]})
    assert m({"tags": ["red", "blue"]}, {"tags": ["red", "blue"]})


def test_and_or_nor_not():
    md = {"dept": "eng", "active": True, "n": 5}
    assert m({"$and": [{"dept": "eng"}, {"active": True}]}, md)
    assert not m({"$and": [{"dept": "eng"}, {"active": False}]}, md)
    assert m({"$or": [{"dept": "sales"}, {"n": 5}]}, md)
    assert not m({"$or": [{"dept": "sales"}, {"n": 6}]}, md)
    assert m({"$nor": [{"dept": "sales"}, {"n": 6}]}, md)
    assert not m({"$nor": [{"dept": "eng"}]}, md)
    assert m({"$not": {"dept": "sales"}}, md)
    assert not m({"$not": {"dept": "eng"}}, md)


def test_eq_ne():
    assert m({"status": {"$eq": "active"}}, {"status": "active"})
    assert m({"status": {"$ne": "active"}}, {"status": "archived"})
    # $ne matches missing fields
    assert m({"status": {"$ne": "active"}}, {})
    assert not m({"status": {"$ne": "active"}}, {"status": "active"})


def test_in_nin():
    assert m({"status": {"$in": ["active", "pending"]}}, {"status": "pending"})
    assert not m({"status": {"$in": ["active"]}}, {"status": "done"})
    assert not m({"status": {"$in": ["active"]}}, {})
    assert m({"status": {"$nin": ["active"]}}, {"status": "done"})
    assert m({"status": {"$nin": ["active"]}}, {})
    with pytest.raises(InvalidMetadataFilterError):
        m({"status": {"$in": "active"}}, {})


def test_exists():
    assert m({"opt": {"$exists": True}}, {"opt": 0})
    assert m({"opt": {"$exists": False}}, {})
    assert not m({"opt": {"$exists": True}}, {})
    with pytest.raises(InvalidMetadataFilterError):
        m({"opt": {"$exists": "yes"}}, {"opt": 1})


def test_numeric_comparisons():
    md = {"priority": 5}
    assert m({"priority": {"$gt": 3}}, md)
    assert m({"priority": {"$gte": 5}}, md)
    assert not m({"priority": {"$gt": 5}}, md)
    assert m({"priority": {"$lt": 10}}, md)
    assert m({"priority": {"$lte": 5}}, md)
    # numeric strings with type hint compare numerically
    assert m({"price": {"$lte": "99.99"}}, {"price": "50.5"}, {"price": "decimal"})
    assert not m({"price": {"$lte": "9.99"}}, {"price": "50.5"}, {"price": "decimal"})
    # range query
    assert m({"age": {"$gte": 18, "$lt": 65}}, {"age": 30})
    assert not m({"age": {"$gte": 18, "$lt": 65}}, {"age": 70})
    # missing / incomparable -> False
    assert not m({"age": {"$gt": 1}}, {})
    assert not m({"age": {"$gt": 1}}, {"age": "abc"})


def test_datetime_comparisons():
    assert m({"created_at": {"$gt": "2024-01-01T00:00:00"}}, {"created_at": "2024-06-01T10:00:00"})
    assert not m({"created_at": {"$gt": "2024-12-01"}}, {"created_at": "2024-06-01T10:00:00"})
    assert m({"created_at": {"$gte": datetime(2024, 1, 1)}}, {"created_at": "2024-01-01T00:00:00"})
    assert m({"event": {"$lt": date(2024, 7, 1)}}, {"event": "2024-06-15"}, {"event": "date"})
    # Z suffix
    assert m({"t": {"$gt": "2024-01-01T00:00:00Z"}}, {"t": "2024-02-01T00:00:00Z"})


def test_type_operator():
    assert m({"v": {"$type": "number"}}, {"v": 3.5})
    assert m({"v": {"$type": ["string", "number"]}}, {"v": "x"})
    assert not m({"v": {"$type": "array"}}, {"v": "x"})
    assert m({"v": {"$type": "datetime"}}, {"v": "2024-01-01T00:00:00"})
    assert m({"v": {"$type": "boolean"}}, {"v": True})
    with pytest.raises(InvalidMetadataFilterError):
        m({"v": {"$type": "frobnicator"}}, {"v": 1})


def test_regex_and_contains():
    assert m({"name": {"$regex": r"^rep.*\.pdf$"}}, {"name": "report.pdf"})
    assert not m({"name": {"$regex": r"^x"}}, {"name": "report.pdf"})
    assert m({"desc": {"$contains": "quarterly"}}, {"desc": "the quarterly report"})
    assert not m({"desc": {"$contains": "annual"}}, {"desc": "the quarterly report"})
    assert m({"tags": {"$contains": "red"}}, {"tags": ["red", "blue"]})
    with pytest.raises(InvalidMetadataFilterError):
        m({"name": {"$regex": "["}}, {"name": "x"})


def test_field_level_not():
    assert m({"status": {"$not": {"$eq": "active"}}}, {"status": "done"})
    assert not m({"status": {"$not": {"$eq": "active"}}}, {"status": "active"})


def test_nested_field_paths():
    assert m({"a.b.c": 1}, {"a": {"b": {"c": 1}}})
    assert not m({"a.b.c": 1}, {"a": {"b": {}}})


def test_column_fields():
    assert m({"filename": "report.pdf"}, {}, None, {"filename": "report.pdf"})
    assert m(
        {"$or": [{"filename": "x.pdf"}, {"dept": "eng"}]},
        {"dept": "eng"},
        None,
        {"filename": "other.pdf"},
    )


def test_empty_and_invalid():
    assert m(None, {"a": 1})
    assert m({}, {"a": 1})
    with pytest.raises(InvalidMetadataFilterError):
        m(["not", "a", "dict"], {})
    with pytest.raises(InvalidMetadataFilterError):
        m({"$and": []}, {})
    with pytest.raises(InvalidMetadataFilterError):
        m({"$unknown": [{}]}, {})
    with pytest.raises(InvalidMetadataFilterError):
        m({"f": {"$frobnicate": 1}}, {"f": 1})
