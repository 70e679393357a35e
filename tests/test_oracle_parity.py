"""Every queries() entry with an oracle must hash-match DuckDB on the same
parquet — the same gate the driver runs at sf=0.01 (here at the test sf for
speed). This is the primary correctness suite (SURVEY.md §5 implication)."""

from __future__ import annotations

import pytest

from tests.conftest import compare_with_oracle

import __spark_entry__ as entrymod


def _cases():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing = o.keys() - q.keys()
    assert not missing, f"oracle entries without queries: {missing}"
    return sorted(q.keys())


@pytest.mark.parametrize("name", _cases())
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        # rows-only check (non-SQL-expressible op)
        from tests.conftest import SF_DIR

        assert q(spark, SF_DIR).count() >= 0
        return
    compare_with_oracle(spark, ddb, q, oracle)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_every_query_has_a_strong_oracle():
    """Every queries() entry must have an oracle_sql() twin — the repo's
    standing guarantee (zero weak / rows-only checks). New operators that
    genuinely can't be SQL-expressed need an explicit exemption here."""
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    exempt: set[str] = set()  # none so far
    missing = (q.keys() - o.keys()) - exempt
    assert not missing, f"queries without oracles: {sorted(missing)}"
