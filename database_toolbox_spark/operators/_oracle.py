"""Helpers for building DuckDB oracle SQL that matches Spark bit-for-bit.

`R(expr)` is the SQL twin of `functions.canon_round`: floor(x*m + 0.5)/m.
Plain `round()` differs between engines on boundary doubles (Spark rounds the
shortest decimal string, DuckDB the binary value), so neither side uses it.
"""

from __future__ import annotations


def R(expr: str, digits: int = 2) -> str:
    """Engine-portable rounding of a double SQL expression. The 0.501 (vs
    0.5) moves the boundary off the money-data grid so ulp-level engine sum
    differences cannot flip the floor — see functions.canon_round."""
    m = 10**digits
    # exponent literals: DOUBLE in both dialects (plain `0.501` would parse
    # as DECIMAL and leak decimal types through integer expressions)
    return f"floor(({expr}) * {m} + 0.501e0) / {m}e0"
