"""Algorithm-quality and robustness tests: LSH/IVF recall against ground
truth, gate fuzzing (hypothesis), result-serialization round-trips, and
error surfacing."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from database_toolbox_spark.executor import execute_sql, rows_as_json
from database_toolbox_spark.gate import ALLOWED_CLASSES, DENIED_CLASSES, classify
from database_toolbox_spark.operators.dedup import (
    DELTA_MOD,
    DELTA_REM,
    minhash_delta_pairs,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
)
from database_toolbox_spark.operators.similarity import (
    cosine_topk,
    ivf_ann_topk,
    lsh_ann_topk,
)
from database_toolbox_spark.server import handle_request
from tests.conftest import SF_DIR

# --- algorithm quality ------------------------------------------------------


def test_minhash_lsh_full_recall_on_planted_dups(spark):
    """LSH candidate generation must find every true near-dup pair (the
    fixtures plant pairs at jaccard ≈ 0.98, far above the 0.5 threshold —
    missing any would mean the banding is broken)."""
    truth = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, SF_DIR).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in minhash_near_dup_pairs(spark, SF_DIR).collect()}
    assert truth, "fixture should contain planted near-dups"
    assert lsh == truth


def test_delta_pairs_equal_full_pairs_restricted(spark):
    """Incremental LSH must find EXACTLY the full run's pairs that touch the
    delta batch — no misses (signatures are corpus-independent) and no
    extras (same bands, same verify threshold)."""
    full = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_near_dup_pairs(spark, SF_DIR).collect()
        if r.doc_a % DELTA_MOD == DELTA_REM or r.doc_b % DELTA_MOD == DELTA_REM
    }
    delta = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_delta_pairs(spark, SF_DIR).collect()
    }
    assert delta == full


def test_ann_recall_vs_brute_force(spark):
    brute = [r.vec_id for r in cosine_topk(spark, SF_DIR).collect()]
    lsh = [r.vec_id for r in lsh_ann_topk(spark, SF_DIR).collect()]
    ivf = [r.vec_id for r in ivf_ann_topk(spark, SF_DIR).collect()]
    lsh_recall = len(set(brute) & set(lsh)) / len(brute)
    ivf_recall = len(set(brute) & set(ivf)) / len(brute)
    # near-orthogonal random vectors are the hard case; these floors catch
    # structural regressions (single-probe LSH scored 0.0 here)
    assert lsh_recall >= 0.5, f"LSH recall@10 degraded: {lsh_recall}"
    assert ivf_recall >= 0.5, f"IVF recall@10 degraded: {ivf_recall}"


# --- gate fuzzing -----------------------------------------------------------

_WRITE_KEYWORDS = ["INSERT", "UPDATE", "DELETE", "DROP", "CREATE", "ALTER",
                   "MERGE", "TRUNCATE", "GRANT", "REVOKE"]


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_gate_never_crashes_and_is_total(sql):
    c = classify(sql)
    assert c.statement_class in ALLOWED_CLASSES | DENIED_CLASSES
    assert c.allowed == (c.statement_class in ALLOWED_CLASSES)


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(_WRITE_KEYWORDS),
    st.sampled_from(["", " ", "\n", "\t", "  \n "]),
    st.sampled_from(["", "-- c\n", "/* c */ "]),
    st.sampled_from([str.lower, str.upper, str.title]),
)
def test_gate_denies_writes_any_casing_whitespace_comments(kw, ws, comment, case):
    sql = f"{comment}{ws}{case(kw)} something"
    assert not classify(sql).allowed


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters="'\\\";"), max_size=50))
def test_gate_allows_select_with_arbitrary_string_literal(payload):
    c = classify(f"SELECT '{payload}' AS s")
    assert c.allowed and c.statement_class == "Select"


# --- serialization round-trips ---------------------------------------------


def test_row_json_types_roundtrip(spark):
    df = execute_sql(
        spark,
        """
        SELECT 1 AS i, 1.5e0 AS d, 'x' AS s, true AS b,
               DATE '2024-01-02' AS dt,
               TIMESTAMP '2024-01-02 03:04:05' AS ts,
               array(1, 2) AS arr,
               named_struct('k', 7) AS st,
               CAST(NULL AS INT) AS n
        """,
    )
    row = json.loads(rows_as_json(df)[0])
    assert row["i"] == 1 and row["d"] == 1.5 and row["s"] == "x" and row["b"] is True
    assert row["dt"] == "2024-01-02"
    assert row["ts"].startswith("2024-01-02T03:04:05")
    assert row["arr"] == [1, 2]
    assert row["st"] == {"k": 7}
    assert "n" not in row or row["n"] is None  # toJSON drops nulls


def test_sql_error_surfaces_as_is_error(spark):
    resp = handle_request(
        spark,
        {
            "jsonrpc": "2.0",
            "id": 9,
            "method": "tools/call",
            "params": {
                "name": "execute_sql",
                "arguments": {"sql": "SELECT * FROM no_such_table_xyz"},
            },
        },
    )
    assert resp["result"]["isError"] is True
    assert "no_such_table_xyz" in resp["result"]["content"][0]["text"]


def test_kmeans_inertia_decreases(spark):
    """Lloyd updates must not increase total inertia (k-means invariant)."""
    from database_toolbox_spark.operators.clustering import DIM, _kmeans_sql
    from database_toolbox_spark.session import load_tables

    load_tables(spark, SF_DIR)
    pos = f"(SELECT explode(sequence(1, {DIM})) AS pos)"
    elem = lambda arr, p: f"element_at({arr}, {p})"  # noqa: E731
    totals = []
    for n in (0, 1, 2):
        rows = spark.sql(_kmeans_sql(pos, elem, n_iters=n)).collect()
        totals.append(sum(r.inertia for r in rows))
    assert totals[1] <= totals[0] + 1e-6
    assert totals[2] <= totals[1] + 1e-6


def test_simhash_near_dup_recall(spark):
    """SimHash banded pairs must recover most planted near-dups (16-bit
    fingerprints of ~99%-overlap docs differ by a few bits at most).
    Uses the narrow corpus-tuned spelling — the wide default saturates on
    this 31-word synthetic vocabulary (see dedup.PAIR_BITS note)."""
    from database_toolbox_spark.operators.dedup import (
        simhash_near_dup_pairs_narrow,
    )

    truth = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, SF_DIR).collect()}
    sim = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_dup_pairs_narrow(spark, SF_DIR).collect()
    }
    recall = len(truth & sim) / max(len(truth), 1)
    assert recall >= 0.8, f"simhash recall degraded: {recall} ({len(sim)} pairs)"


def test_zorder_locality_both_dimensions(spark):
    """Z-order buckets must be local in BOTH dimensions at once (~1/8 of
    the global span each with 3 prefix bits per dim) — the property that
    makes min/max file skipping work for either predicate column."""
    from database_toolbox_spark.operators.partitioning import zorder_bucket_stats

    rows = zorder_bucket_stats(spark, SF_DIR).collect()
    assert len(rows) == 64
    ckey_spans = [r.max_custkey - r.min_custkey for r in rows]
    day_spans = [(r.max_date - r.min_date).days for r in rows]
    g_ckey = max(r.max_custkey for r in rows) - min(r.min_custkey for r in rows)
    g_day = (max(r.max_date for r in rows) - min(r.min_date for r in rows)).days
    assert sum(ckey_spans) / len(rows) < g_ckey / 4
    assert sum(day_spans) / len(rows) < g_day / 4


def test_sq8_recall_vs_exact(spark):
    """8-bit scalar quantization must preserve most of the exact top-10
    (quantization noise is small relative to score gaps even on
    near-orthogonal random vectors)."""
    from database_toolbox_spark.operators.similarity import (
        cosine_topk,
        sq8_ann_topk,
    )

    exact = [r.vec_id for r in cosine_topk(spark, SF_DIR).collect()]
    quant = [r.vec_id for r in sq8_ann_topk(spark, SF_DIR).collect()]
    recall = len(set(exact) & set(quant)) / len(exact)
    assert recall >= 0.8, f"sq8 recall degraded: {recall}"  # observed 1.0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1, max_size=64,
    )
)
def test_canon_round_cross_engine_bit_identical(vals):
    """The portable-rounding formula (floor(x*m + 0.501)/m) must produce
    BIT-IDENTICAL doubles in Spark and DuckDB for arbitrary inputs — the
    invariant every money/ratio oracle comparison in the repo rests on."""
    import duckdb

    from database_toolbox_spark.functions import canon_round
    from database_toolbox_spark.operators._oracle import R
    from database_toolbox_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="dts-tests", cpus="8", shuffle_partitions="8")
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [
        r.y for r in sdf.select(canon_round(F.col("x"), 2).alias("y"))
        .collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {R('CAST(? AS DOUBLE)')}", [v]).fetchone()[0]
        for v in vals
    ]
    assert got_spark == got_duck


def test_hilbert_transform_matches_reference_xy2d(spark):
    """The unrolled SQL CTE chain must be bit-equal to the canonical
    Hilbert xy2d reflect/rotate loop — cross-engine parity alone cannot
    show the curve is actually Hilbert."""
    from database_toolbox_spark.operators.partitioning import (
        HILBERT_N,
        _hilbert_ctes,
    )

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    sql = f"""
        WITH h0 AS (
            SELECT id AS k, CAST((id * 7) % 256 AS BIGINT) AS x,
                   CAST((id * 13) % 256 AS BIGINT) AS y,
                   CAST(0 AS BIGINT) AS d
            FROM range(1000)
        ),
        {_hilbert_ctes("k")}
        SELECT k, d FROM h8
    """
    got = {r.k: r.d for r in spark.sql(sql).collect()}
    assert len(got) == 1000
    for k, d in got.items():
        assert d == xy2d(HILBERT_N, (k * 7) % 256, (k * 13) % 256)


def test_hilbert_beats_zorder_on_nonaligned_splits(spark):
    """Under quadrant-aligned power-of-two prefixes the two curves give
    the SAME partition (renumbered); the Hilbert advantage is
    non-aligned file splits — equal-length curve segments (1365 cells,
    not a power of two) must produce a smaller average bounding-box
    AREA (the 2-D file-skip metric) than the same split of the Morton
    curve."""
    from database_toolbox_spark.operators.partitioning import (
        _hilbert_sql,
        _zorder_sql,
        hilbert_bucket_stats,
        zorder_bucket_stats,
    )
    from database_toolbox_spark.session import load_table

    z_rows = zorder_bucket_stats(spark, SF_DIR).collect()
    h_rows = hilbert_bucket_stats(spark, SF_DIR).collect()
    # aligned prefixes → identical partition of space → identical spans
    z_spans = sorted(r.max_custkey - r.min_custkey for r in z_rows)
    h_spans = sorted(r.max_custkey - r.min_custkey for r in h_rows)
    assert z_spans == h_spans

    load_table(spark, SF_DIR, "orders")
    day = "datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01')"

    def area(sql):
        # non-aligned splits: equal-length curve segments instead of the
        # power-of-two prefix buckets.  Build the rewrite from the live
        # shift constant so a HILBERT_N change can't silently no-op it.
        from database_toolbox_spark.operators.partitioning import (
            _H_BUCKET_SHIFT,
            HILBERT_N,
        )

        # 4/3 of the aligned bucket size (2^shift cells) → a
        # non-power-of-two segment (1365 at the current 10-bit shift)
        seg = (1 << _H_BUCKET_SHIFT) * 4 // 3
        assert HILBERT_N * HILBERT_N % seg != 0  # genuinely non-aligned
        rewritten = sql.replace(f">> {_H_BUCKET_SHIFT}", f"/ {seg}")
        assert rewritten != sql, "bucket-shift rewrite did not match the SQL"
        rows = spark.sql(rewritten).collect()
        boxes = [
            (r.max_custkey - r.min_custkey + 1)
            * ((r.max_date - r.min_date).days + 1)
            for r in rows
        ]
        return sum(boxes) / len(boxes)

    assert area(_hilbert_sql(day)) < area(_zorder_sql(day))
