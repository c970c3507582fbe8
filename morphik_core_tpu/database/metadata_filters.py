"""Metadata filter language — the retrieval API's filter contract.

Implements the operator set documented at reference core/api.py:356-373
and compiled in reference core/database/metadata_filters.py:29-856:

  logical:  $and, $or, $nor, $not
  field:    $eq, $ne, $gt, $gte, $lt, $lte, $in, $nin,
            $exists, $type, $regex, $contains
  implicit equality: {"field": value}
  typed metadata: per-field type hints {number, decimal, datetime,
            date, string, boolean, array, object} enable typed
            comparisons ($gt on a datetime string compares temporally).

This is an evaluator over document metadata dicts (the index and the
sqlite DB both call it); the reference's Postgres-specific SQL
generation is replaced by flattened-column SQL pre-filters + this
evaluator. Semantics:

  - $ne / $nin match documents where the field is MISSING (Mongo
    semantics, matching the reference's NOT(...) SQL shape).
  - implicit equality on an array-valued field matches if the value
    equals the array OR is an element of it.
  - ordered comparisons on incomparable/missing values are False.
"""

from __future__ import annotations

import re
from datetime import date, datetime
from decimal import Decimal, InvalidOperation
from typing import Any, Dict, Optional

VALID_TYPES = {"string", "number", "decimal", "datetime", "date", "boolean", "array", "object", "null"}

_TYPE_ALIASES = {
    "str": "string",
    "text": "string",
    "int": "number",
    "integer": "number",
    "float": "number",
    "double": "number",
    "bool": "boolean",
    "list": "array",
    "dict": "object",
    "timestamp": "datetime",
}

LOGICAL_OPS = {"$and", "$or", "$nor", "$not"}
FIELD_OPS = {"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin", "$exists", "$type", "$regex", "$contains"}


class InvalidMetadataFilterError(ValueError):
    """Malformed or unsupported metadata filter."""


def canonicalize_type_name(name: str) -> str:
    n = str(name).strip().lower()
    n = _TYPE_ALIASES.get(n, n)
    if n not in VALID_TYPES:
        raise InvalidMetadataFilterError(f"unknown $type: {name!r}")
    return n


def _value_type(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float, Decimal)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (list, tuple)):
        return "array"
    if isinstance(v, dict):
        return "object"
    return "string"


_DT_FORMATS = (
    "%Y-%m-%dT%H:%M:%S.%f%z", "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S", "%Y-%m-%d",
)


def _try_datetime(v: Any) -> Optional[datetime]:
    if isinstance(v, datetime):
        return v
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day)
    if not isinstance(v, str):
        return None
    s = v.replace("Z", "+00:00") if v.endswith("Z") else v
    try:
        return datetime.fromisoformat(s)
    except ValueError:
        pass
    for fmt in _DT_FORMATS:
        try:
            return datetime.strptime(v, fmt)
        except ValueError:
            continue
    return None


def _try_number(v: Any) -> Optional[Decimal]:
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float, Decimal)):
        try:
            return Decimal(str(v))
        except InvalidOperation:
            return None
    if isinstance(v, str):
        try:
            return Decimal(v.strip())
        except InvalidOperation:
            return None
    return None


def _coerce_pair(left: Any, right: Any, type_hint: Optional[str]):
    """Coerce both sides for an ordered comparison. Returns None if not
    comparable."""
    if type_hint in ("number", "decimal"):
        ln, rn = _try_number(left), _try_number(right)
        return (ln, rn) if ln is not None and rn is not None else None
    if type_hint in ("datetime", "date"):
        ld, rd = _try_datetime(left), _try_datetime(right)
        if ld is None or rd is None:
            return None
        if ld.tzinfo is None:
            ld = ld.replace(tzinfo=rd.tzinfo)
        if rd.tzinfo is None:
            rd = rd.replace(tzinfo=ld.tzinfo)
        return ld, rd
    # untyped: numbers if both look numeric; datetimes if both parse and
    # at least one is a date/datetime object or the comparison value is a
    # datetime-ish string; else strings
    ln, rn = _try_number(left), _try_number(right)
    if ln is not None and rn is not None:
        return ln, rn
    ld, rd = _try_datetime(left), _try_datetime(right)
    looks_temporal = isinstance(left, (date, datetime)) or isinstance(right, (date, datetime)) or (
        isinstance(right, str) and re.match(r"^\d{4}-\d{2}-\d{2}", right) is not None
    )
    if ld is not None and rd is not None and looks_temporal:
        if ld.tzinfo is None:
            ld = ld.replace(tzinfo=rd.tzinfo)
        if rd.tzinfo is None:
            rd = rd.replace(tzinfo=ld.tzinfo)
        return ld, rd
    if isinstance(left, str) and isinstance(right, str):
        return left, right
    return None


_MISSING = object()


def _eq(actual: Any, expected: Any) -> bool:
    if actual is _MISSING:
        return False
    if isinstance(actual, bool) or isinstance(expected, bool):
        return actual is expected if isinstance(expected, bool) and isinstance(actual, bool) else actual == expected
    an, en = _try_number(actual), _try_number(expected)
    if an is not None and en is not None and not isinstance(actual, str) and not isinstance(expected, str):
        return an == en
    if actual == expected:
        return True
    # array membership for implicit equality on array-valued fields
    if isinstance(actual, (list, tuple)) and not isinstance(expected, (list, tuple)):
        return expected in actual
    return False


def _apply_field_op(op: str, actual: Any, expected: Any, type_hint: Optional[str]) -> bool:
    if op == "$eq":
        return _eq(actual, expected)
    if op == "$ne":
        return not _eq(actual, expected)
    if op in ("$gt", "$gte", "$lt", "$lte"):
        if actual is _MISSING:
            return False
        pair = _coerce_pair(actual, expected, type_hint)
        if pair is None:
            return False
        a, b = pair
        try:
            if op == "$gt":
                return a > b
            if op == "$gte":
                return a >= b
            if op == "$lt":
                return a < b
            return a <= b
        except TypeError:
            return False
    if op == "$in":
        if not isinstance(expected, (list, tuple)):
            raise InvalidMetadataFilterError("$in expects an array")
        return actual is not _MISSING and any(_eq(actual, e) for e in expected)
    if op == "$nin":
        if not isinstance(expected, (list, tuple)):
            raise InvalidMetadataFilterError("$nin expects an array")
        return actual is _MISSING or not any(_eq(actual, e) for e in expected)
    if op == "$exists":
        if not isinstance(expected, bool):
            raise InvalidMetadataFilterError("$exists expects a boolean")
        return (actual is not _MISSING) == expected
    if op == "$type":
        if actual is _MISSING:
            return False
        types = expected if isinstance(expected, (list, tuple)) else [expected]
        canon = {canonicalize_type_name(t) for t in types}
        vt = _value_type(actual)
        if vt == "number" and ("decimal" in canon or "number" in canon):
            return True
        if vt == "string":
            # typed strings: a string that parses as datetime/date counts
            if ("datetime" in canon or "date" in canon) and _try_datetime(actual) is not None:
                return True
            if ("number" in canon or "decimal" in canon) and _try_number(actual) is not None and re.match(
                r"^-?\d+(\.\d+)?$", actual.strip()
            ):
                return True
        return vt in canon
    if op == "$regex":
        if actual is _MISSING or not isinstance(actual, str):
            return False
        if not isinstance(expected, str):
            raise InvalidMetadataFilterError("$regex expects a string pattern")
        try:
            return re.search(expected, actual) is not None
        except re.error as e:
            raise InvalidMetadataFilterError(f"invalid $regex: {e}") from e
    if op == "$contains":
        if actual is _MISSING:
            return False
        if isinstance(actual, str):
            return isinstance(expected, str) and expected in actual
        if isinstance(actual, (list, tuple)):
            return any(_eq(a, expected) for a in actual)
        return False
    raise InvalidMetadataFilterError(f"unsupported operator: {op}")


def matches_filter(
    filters: Optional[Dict[str, Any]],
    metadata: Dict[str, Any],
    metadata_types: Optional[Dict[str, str]] = None,
    column_values: Optional[Dict[str, Any]] = None,
) -> bool:
    """Evaluate a filter tree against one document.

    `column_values` maps flattened column fields (e.g. filename) that are
    addressed by filters but are not part of user metadata."""
    if not filters:
        return True
    if not isinstance(filters, dict):
        raise InvalidMetadataFilterError("Metadata filters must be a JSON object.")
    metadata_types = metadata_types or {}
    column_values = column_values or {}

    def get_field(name: str) -> Any:
        if name in column_values:
            return column_values[name]
        cur: Any = metadata
        for part in name.split("."):
            if isinstance(cur, dict) and part in cur:
                cur = cur[part]
            else:
                return _MISSING
        return cur

    def eval_expr(expr: Any, context: str) -> bool:
        if not isinstance(expr, dict):
            raise InvalidMetadataFilterError(f"{context}: expected an object")
        results = []
        for key, value in expr.items():
            if key == "$and":
                _require_list(value, "$and")
                results.append(all(eval_expr(e, "$and") for e in value))
            elif key == "$or":
                _require_list(value, "$or")
                results.append(any(eval_expr(e, "$or") for e in value))
            elif key == "$nor":
                _require_list(value, "$nor")
                results.append(not any(eval_expr(e, "$nor") for e in value))
            elif key == "$not":
                results.append(not eval_expr(value, "$not"))
            elif key.startswith("$"):
                raise InvalidMetadataFilterError(f"unknown logical operator: {key}")
            else:
                results.append(eval_field(key, value))
        return all(results) if results else True

    def eval_field(field: str, cond: Any) -> bool:
        actual = get_field(field)
        hint = metadata_types.get(field)
        if isinstance(cond, dict) and any(k.startswith("$") for k in cond):
            out = True
            for op, operand in cond.items():
                if op == "$not":
                    out = out and not eval_field(field, operand)
                    continue
                if op not in FIELD_OPS:
                    raise InvalidMetadataFilterError(f"unsupported field operator: {op}")
                out = out and _apply_field_op(op, actual, operand, hint)
            return out
        return _eq(actual, cond)

    def _require_list(v: Any, op: str) -> None:
        if not isinstance(v, list) or not v:
            raise InvalidMetadataFilterError(f"{op} expects a non-empty array")

    return eval_expr(filters, "metadata filter")
