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
