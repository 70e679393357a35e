"""Reusable column-expression helpers shared across operator modules.

All helpers are built-in `pyspark.sql.functions` compositions — JVM-side,
whole-stage-codegen friendly; no Python UDFs here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts(literal: str) -> Column:
    """Timestamp literal (session TZ is pinned to UTC)."""
    return F.lit(literal).cast("timestamp")


def money(col: Column) -> Column:
    """Canonical rounding for DOUBLE money aggregates so order-of-summation
    FP noise cannot flip the DuckDB-oracle value hash (FIXTURES.md
    determinism rules: money columns are DOUBLE; round aggregates)."""
    return F.round(col, 2)


def ratio(col: Column, digits: int = 4) -> Column:
    """Canonical rounding for averages/ratios."""
    return F.round(col, digits)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount) — the revenue expression every
    wrapped warehouse runs on a TPC-H-ish schema (SURVEY.md §2.B scalar
    functions: math [implied])."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def charge() -> Column:
    """disc_price * (1 + l_tax)."""
    return disc_price() * (1 + F.col("l_tax"))
