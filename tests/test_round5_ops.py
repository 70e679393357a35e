"""Round-5 process hardening (VERDICT r4 "Next round" items 1-4):

- the bench regression gate must flag a genuine 2x slowdown even in a
  contended (high-spread) run — round 4's spread-gated filter masked
  exactly that case;
- `simhash_near_dup_pairs_narrow` is demoted from the registry (measured
  21x super-linear at 10x rows) but keeps cross-engine parity as a
  direct-call test;
- SWEEP_CURRENT.json (maintained by scripts/driver_check.py) must cover
  the whole registry with every entry ok — a query can no longer land
  after the final sweep and ship unchecked.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import compute_regressions
from database_toolbox_spark.operators import all_queries
from tests.conftest import compare_with_oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- bench gate


def test_regression_gate_flags_2x_in_contended_run():
    """The round-4 masking case: a plan regressed to ~2.5x and ALSO got
    noisy; the old `delta > 2*spread` gate stayed silent. The 2x-ceiling
    gate (median-based when spread > prev) must flag it."""
    prev = {"q": 1.0}
    timings = {"q": 2.5}   # min of 3
    medians = {"q": 2.9}
    spreads = {"q": 3.0}   # contended: spread dwarfs prev
    out = compute_regressions(timings, spreads, medians, prev)
    assert "q" in out and out["q"]["gate"] == "2x-ceiling", out


def test_regression_gate_ignores_contention_spike():
    """A single contention spike (min back at prev, median near prev, huge
    spread) is NOT a regression — min-of-3 reached steady state."""
    prev = {"q": 1.0}
    out = compute_regressions(
        {"q": 1.02}, {"q": 9.0}, {"q": 1.9}, prev
    )
    assert out == {}, out


def test_regression_gate_spread_term_is_capped():
    """High spread widens the jitter band only to 1 s: min-of-3 at 1.6x
    prev with +1.2 s absolute delta flags even when 2*spread would have
    demanded +10 s."""
    prev = {"q": 2.0}
    out = compute_regressions(
        {"q": 3.2}, {"q": 5.0}, {"q": 3.4}, prev
    )
    assert "q" in out and out["q"]["gate"] == "jitter", out


def test_regression_gate_quiet_run_small_delta_ok():
    """Sub-quarter-second deltas on a quiet run stay unflagged (local[32]
    run-to-run noise, not plan regressions)."""
    prev = {"q": 0.30}
    out = compute_regressions(
        {"q": 0.52}, {"q": 0.05}, {"q": 0.55}, prev
    )
    assert out == {}, out


# ------------------------------------------------- narrow simhash demotion


def test_simhash_narrow_not_registered():
    import __spark_entry__ as entry

    assert "simhash_near_dup_pairs_narrow" not in all_queries()
    assert "simhash_near_dup_pairs_narrow" not in entry.queries()
    assert "simhash_near_dup_pairs_narrow" not in entry.oracle_sql()


def test_simhash_narrow_parity(spark, ddb):
    """The demoted demo keeps its cross-engine parity pin here (it used to
    live in the registry sweep)."""
    from database_toolbox_spark.operators.dedup import (
        SIMHASH_NARROW_ORACLE,
        simhash_near_dup_pairs_narrow,
    )

    compare_with_oracle(
        spark, ddb, simhash_near_dup_pairs_narrow, SIMHASH_NARROW_ORACLE
    )


# ----------------------------------------------------- sweep-current ledger


def test_sweep_ledger_covers_registry():
    """Every registry query must have a green SWEEP_CURRENT.json entry.

    scripts/driver_check.py updates the ledger on every spot-check and
    rewrites it on full sweeps; adding a query without driver-checking it
    turns this test red, which is the round-4 'sweep-last' failure made
    structurally impossible."""
    with open(os.path.join(REPO, "SWEEP_CURRENT.json")) as f:
        ledger = json.load(f)
    registry = set(all_queries())
    entries = ledger["queries"]
    missing = sorted(registry - set(entries))
    assert not missing, f"registry queries never driver-checked: {missing}"
    bad = sorted(n for n in registry if not entries[n]["ok"])
    assert not bad, f"registry queries with failing driver-check: {bad}"
    assert ledger["n_registry"] == len(registry)


def test_bench_headline_subset_of_registry():
    from bench import HEADLINE

    registry = set(all_queries())
    missing = sorted(set(HEADLINE) - registry)
    assert not missing, missing
