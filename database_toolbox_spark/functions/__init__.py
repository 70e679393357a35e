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


def canon_round(col: Column, digits: int = 2) -> Column:
    """Engine-portable rounding: floor(x*m + 0.501)/m.

    Two engine-divergence hazards with plain `round`:
    1. Spark's `round` goes through the double's shortest decimal string
       (BigDecimal HALF_UP) while DuckDB rounds the binary value — on
       145784.705 they disagree (.71 vs .70). floor/*/+ are plain IEEE ops,
       identical everywhere.
    2. Money data lives on a 0.01 grid in scaled space, so true sums land
       EXACTLY on the x.5 rounding boundary; engines' sums differ by ulps
       (different add order) and flip the floor. The 0.001 nudge moves the
       boundary to x.499 — off the data grid by 0.001, which is far above
       accumulated FP noise (~1e-4 for 1e6-row sums) — so both engines
       classify every boundary value identically.

    The DuckDB oracle uses the same formula (operators/_oracle.py::R)."""
    m = float(10**digits)
    return F.floor(col * m + F.lit(0.501)) / F.lit(m)


def money(col: Column) -> Column:
    """Canonical rounding for DOUBLE money aggregates so FP noise cannot flip
    the DuckDB-oracle value hash (FIXTURES.md determinism rules)."""
    return canon_round(col, 2)


def ratio(col: Column, digits: int = 4) -> Column:
    """Canonical rounding for averages/ratios."""
    return canon_round(col, digits)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount) — the revenue expression every
    wrapped warehouse runs on a TPC-H-ish schema (SURVEY.md §2.B scalar
    functions: math [implied])."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def charge() -> Column:
    """disc_price * (1 + l_tax)."""
    return disc_price() * (1 + F.col("l_tax"))


def bounded_rank_window(anchor: Column, *order_cols):
    """Window for ranking an already-BOUNDED result (top-k / LIMIT'd /
    dimension-sized input, ≤ a few thousand rows): partitions on a
    row-independent constant derived from `anchor` (pmod(hash(anchor), 1)
    — always 0, but a plain literal or hash*0 is constant-folded back to
    an empty partition spec), so all rows land in ONE intentional
    partition and the
    executor's "No Partition Defined" scale warning never fires. Not for
    unbounded inputs; those use the two-pass exact rank
    (operators/windows.py)."""
    from pyspark.sql import Window

    return Window.partitionBy(F.pmod(F.hash(anchor), F.lit(1))).orderBy(
        *order_cols
    )
