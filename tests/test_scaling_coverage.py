"""Structural gate for the scaling-row discipline (round-11 verdict
item 1): every registry query must carry a measured growth row in one of
the two scaling studies OR an explicit, reviewed exemption entry in
scripts/scaling_coverage.py. Rounds 10 and 11 both shipped tranches
whose docstring scale claims had no measured row; with this test a new
operator cannot land unmeasured silently."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _sets():
    import scaling_coverage
    import scaling_sf1
    import scaling_sf5

    from database_toolbox_spark.operators import all_queries

    covered = {n for n, _ in scaling_sf1.SUSPECTS} | {
        n for n, _ in scaling_sf5.SUSPECTS
    }
    return set(all_queries()), covered, scaling_coverage


def test_every_query_has_scaling_row_or_exemption():
    registry, covered, sc = _sets()
    missing = sorted(registry - covered - set(sc.EXEMPT))
    assert not missing, (
        "registry queries with NEITHER a scaling-study row NOR an "
        f"exemption entry: {missing} — add a SUSPECTS row to "
        "scripts/scaling_sf1.py / scaling_sf5.py, or a reviewed entry "
        "to scripts/scaling_coverage.py EXEMPT"
    )


def test_ledger_has_no_stale_or_double_entries():
    registry, covered, sc = _sets()
    stale = sorted(set(sc.EXEMPT) - registry)
    assert not stale, f"EXEMPT entries no longer in the registry: {stale}"
    both = sorted(set(sc.EXEMPT) & covered)
    assert not both, (
        f"queries both measured and exempted (drop the EXEMPT row): {both}"
    )


def test_every_exemption_reason_resolves():
    registry, covered, sc = _sets()
    bad = []
    for q, code in sc.EXEMPT.items():
        if code.startswith("sibling:"):
            target = code.split(":", 1)[1]
            if target not in covered:
                bad.append(f"{q} -> {code} (target not a measured suspect)")
        elif code not in sc.REASONS:
            bad.append(f"{q} -> {code} (unknown reason code)")
    assert not bad, bad
