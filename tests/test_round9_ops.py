"""Round-9 operator tests: the LSH banding planner's numpy anchor (parity
alone can't prove the S-curve math — both engines could share a wrong
formula) plus its internal consistency invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR, table_path  # noqa: F401


def test_lsh_banding_planner_matches_numpy(spark):
    from database_toolbox_spark.operators.dedup import (
        _PLANNER_GRID,
        JACCARD_THRESHOLD,
        lsh_banding_planner,
        ngram_jaccard_pairs,
    )

    got = {(r.bands, r.rows_per_band): r
           for r in lsh_banding_planner(spark, SF_DIR).collect()}
    assert set(got) == set(_PLANNER_GRID)

    js = np.array(sorted(
        r.jaccard
        for r in ngram_jaccard_pairs(spark, SF_DIR).collect()
    ))
    assert len(js) > 0 and js.min() >= JACCARD_THRESHOLD

    r6 = lambda x: np.floor(x * 1e6 + 0.501) / 1e6  # noqa: E731
    ks = (np.arange(1, 201) - 0.5) / 200
    for b, r in _PLANNER_GRID:
        p = lambda s: 1.0 - (1.0 - s**r) ** b  # noqa: B023,E731
        row = got[(b, r)]
        assert row.est_threshold == r6((1.0 / b) ** (1.0 / r))
        assert row.expected_recall == r6(p(js).sum() / len(js))
        assert row.worst_pair_detect == r6(p(js.min()))
        assert row.fp_area == r6(p(ks[:100]).sum() / 200)
        assert row.fn_area == r6((1.0 - p(ks[100:])).sum() / 200)

    # S-curve structure: single-row bands (b=1) are the strictest filter
    # (lowest fp_area, lowest recall); single-hash rows (r=1) the loosest.
    fp = [got[k].fp_area for k in _PLANNER_GRID]
    rec = [got[k].expected_recall for k in _PLANNER_GRID]
    assert fp == sorted(fp) and rec == sorted(rec)
    # est_threshold decreases as bands grow (more bands -> catches lower J)
    th = [got[k].est_threshold for k in _PLANNER_GRID]
    assert th == sorted(th, reverse=True)
    # every area is a probability mass over a half-unit interval
    for k in _PLANNER_GRID:
        assert 0.0 <= got[k].fp_area <= 0.5
        assert 0.0 <= got[k].fn_area <= 0.5
        assert 0.0 <= got[k].worst_pair_detect <= 1.0


def test_ab_sample_size_planner_matches_numpy(spark):
    """External anchor: recompute required n, achievable MDE, and the
    powered flag from the raw arm assignment in numpy/hashlib."""
    import hashlib

    from database_toolbox_spark.operators.dedup import (  # noqa: F401
        JACCARD_THRESHOLD,
    )
    from database_toolbox_spark.operators.stats import (
        _MDE_GRID,
        Z_ALPHA_2,
        Z_POWER_80,
        ab_sample_size_planner,
    )

    got = {r.effect_size_d: r
           for r in ab_sample_size_planner(spark, SF_DIR).collect()}
    assert sorted(got) == sorted(_MDE_GRID)

    cust = pd.read_parquet(table_path(SF_DIR, "customer"))
    arms = np.array([
        int(hashlib.md5(str(k).encode()).hexdigest()[:4], 16) % 2
        for k in cust["c_custkey"]
    ])
    n0, n1 = int((arms == 0).sum()), int((arms == 1).sum())
    v = cust["c_acctbal"].astype(float).var(ddof=1)
    zsum = Z_ALPHA_2 + Z_POWER_80
    r4 = lambda x: np.floor(x * 1e4 + 0.501) / 1e4  # noqa: E731
    r2 = lambda x: np.floor(x * 1e2 + 0.501) / 1e2  # noqa: E731
    ach = zsum * np.sqrt(2.0 / min(n0, n1))
    for d, row in got.items():
        req = int(np.ceil(2.0 * zsum * zsum / (d * d)))
        assert row.required_n_per_arm == req
        assert (row.n_arm0, row.n_arm1) == (n0, n1)
        assert row.achievable_d == r4(ach)
        assert abs(row.achievable_abs_delta - r2(ach * np.sqrt(v))) <= 0.01
        assert row.powered == int(min(n0, n1) >= req)
    # required n decreases in effect size; the grid must span both powered
    # and underpowered regimes on the fixture (else the flag is untested)
    reqs = [got[d].required_n_per_arm for d in sorted(got)]
    assert reqs == sorted(reqs, reverse=True)
    assert {got[d].powered for d in got} == {0, 1}
