"""Scalar helper surface (SURVEY.md §2.3) — the reference's tag-access and
parsing semantics as reusable pieces.

The implementations live in rules/dsl.py (they must stay fused with the
dual-target DSL); this module re-exports them as the engine's public scalar
function API, plus standalone Column helpers for use outside the rule
engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..rules.dsl import (  # noqa: F401
    INT32_MAX,
    INT32_MIN,
    INT_SENTINEL,
    NULL_STR,
    PREFIX_FLOAT_RE,
    PREFIX_INT_RE,
    STRICT_INT_RE,
    TRUNC,
)


def tag(tags: Column, key: str) -> Column:
    """taglist.get_value_by_key — null when absent (wayproblems.cpp:198)."""
    return tags.getItem(key)


def has_key(tags: Column, key: str) -> Column:
    return F.coalesce(F.map_contains_key(tags, key), F.lit(False))


def key_value_is_true(tags: Column, key: str) -> Column:
    return F.coalesce(tags.getItem(key).isin("yes", "true", "1"), F.lit(False))


def key_value_is_false(tags: Column, key: str) -> Column:
    return F.coalesce(tags.getItem(key).isin("no", "false", "0"), F.lit(False))


def strict_int(col: Column) -> Column:
    """Full-string int parse → value, null when invalid (cpp:232-245)."""
    tl = col.try_cast("long")
    ok = col.rlike(STRICT_INT_RE) & tl.between(INT32_MIN, INT32_MAX)
    return F.when(F.coalesce(ok, F.lit(False)), tl)


def prefix_float(col: Column) -> Column:
    """std::stof prefix parse → value, null when invalid (cpp:219-226)."""
    return F.regexp_extract(col, PREFIX_FLOAT_RE, 0).try_cast("double")


def prefix_int_ok(col: Column) -> Column:
    """std::stoi prefix parse succeeds (cpp:486; quirk Q4)."""
    return F.coalesce(col.rlike(PREFIX_INT_RE), F.lit(False))


def printf_arg(col: Column) -> Column:
    """%s rendering with glibc (null) for NULL (quirk Q2)."""
    return F.coalesce(col.cast("string"), F.lit(NULL_STR))
