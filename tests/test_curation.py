"""Semantic invariants for the corpus-curation tier (operators/curation.py)
— properties the DuckDB parity check cannot see on its own: permutation
totality of the shuffle order, conservation laws of segment dedup, and the
argmax contract of keep-best representative selection."""

from __future__ import annotations

from database_toolbox_spark.operators.curation import (
    SEG_TOKENS,
    SHUFFLE_TOP,
    dedup_keep_best,
    global_shuffle_order,
    hash_split_counts,
    quality_classifier_scores,
    segment_dedup_kept,
)
from tests.conftest import SF_DIR

SMALL_SF = "/root/testdata/sf0.001"


def test_segment_dedup_conservation(spark):
    """n_kept + n_dropped == n_segments per doc; corpus-wide kept count
    equals the number of DISTINCT segments (each distinct segment keeps
    exactly one occurrence)."""
    rows = segment_dedup_kept(spark, SMALL_SF).collect()
    assert rows, "empty result"
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_segments
        # fully-duplicated docs legitimately keep nothing
        assert 0 <= r.kept_fraction <= 1.0

    n_distinct = spark.sql(f"""
        WITH t AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
        segs AS (
            SELECT md5(array_join(slice(w, seg_idx * {SEG_TOKENS} + 1,
                                        {SEG_TOKENS}), ' ')) AS seg_hash
            FROM t
            LATERAL VIEW explode(sequence(0,
                greatest(CAST(ceil(size(w) / {SEG_TOKENS}e0) AS INT) - 1, 0)
            )) x AS seg_idx
        )
        SELECT count(DISTINCT seg_hash) AS n FROM segs
    """).collect()[0].n
    assert sum(r.n_kept for r in rows) == n_distinct


def test_global_shuffle_is_permutation_prefix(spark):
    rows = global_shuffle_order(spark, SMALL_SF).collect()
    assert [r.shuffle_pos for r in rows] == list(range(1, SHUFFLE_TOP + 1))
    assert len({r.doc_id for r in rows}) == SHUFFLE_TOP


def test_hash_split_partitions_corpus(spark):
    rows = hash_split_counts(spark, SMALL_SF).collect()
    n_docs = spark.table("documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    splits = {r.split_name for r in rows}
    assert splits <= {"train", "valid", "test"}
    by_split = {}
    for r in rows:
        by_split[r.split_name] = by_split.get(r.split_name, 0) + r.n_docs
    # 90/5/5 in expectation; tolerate sampling noise on the small corpus
    assert by_split["train"] / n_docs > 0.8


def test_quality_classifier_monotone_contract(spark):
    rows = quality_classifier_scores(spark, SMALL_SF).collect()
    for r in rows:
        assert 0.0 <= r.p_keep <= 1.0
        # keep_label thresholds the RAW logit; the emitted logit is
        # canon-rounded, so only assert agreement away from the boundary
        if abs(r.logit) > 1e-5:
            assert (r.keep_label == 1) == (r.logit >= 0)


def test_keep_best_picks_longest_member(spark, ddb):
    """Every cluster's keep_doc must hold the cluster-max token count."""
    rows = dedup_keep_best(spark, SF_DIR).collect()
    assert rows, "no clusters found at sf0.01"
    ntok = {
        doc_id: n
        for doc_id, n in spark.sql(
            "SELECT doc_id, size(split(text, ' ')) AS n FROM documents"
        ).collect()
    }
    for r in rows:
        assert ntok[r.keep_doc] == r.keep_tokens
        assert r.cluster_size == r.n_dropped + 1


def test_zipf_fit_matches_numpy_polyfit(spark):
    """Independent check of the ordered-fold regression: numpy's
    least-squares fit over the same (rank, freq) points must agree."""
    import numpy as np

    from database_toolbox_spark.operators.curation import (
        ZIPF_K,
        zipf_corpus_fit,
    )

    row = zipf_corpus_fit(spark, SMALL_SF).collect()[0]
    assert 0 < row.k_terms <= ZIPF_K
    assert row.slope < 0  # frequency falls with rank, always

    tf = spark.sql("""
        WITH toks AS (SELECT explode(split(text, ' ')) AS term FROM documents)
        SELECT term, count(*) AS freq FROM toks GROUP BY term
        ORDER BY freq DESC, term
    """).collect()[: row.k_terms]
    x = np.log(np.arange(1, len(tf) + 1, dtype=float))
    y = np.log(np.array([r.freq for r in tf], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row.slope - slope) < 1e-4
    assert abs(row.intercept - intercept) < 1e-4


def test_curriculum_stages_are_exact_quartiles(spark):
    from database_toolbox_spark.operators.curation import (
        length_curriculum_stages,
    )

    rows = length_curriculum_stages(spark, SMALL_SF).collect()
    assert [r.stage for r in rows] == [1, 2, 3, 4]
    n = sum(r.n_docs for r in rows)
    # ntile: first n%4 stages get one extra row
    q, rem = divmod(n, 4)
    expected = [q + 1 if i < rem else q for i in range(4)]
    assert [r.n_docs for r in rows] == expected
    # stage boundaries are non-decreasing in length
    for a, b in zip(rows, rows[1:]):
        assert a.max_chars <= b.min_chars


def test_heaps_checkpoints_monotone_and_complete(spark):
    from database_toolbox_spark.operators.curation import (
        HEAPS_CHECKPOINTS,
        heaps_law_checkpoints,
    )

    rows = heaps_law_checkpoints(spark, SMALL_SF).collect()
    assert [r.checkpoint for r in rows] == list(
        range(1, HEAPS_CHECKPOINTS + 1)
    )
    for a, b in zip(rows, rows[1:]):
        assert a.prefix_docs <= b.prefix_docs
        assert a.prefix_tokens <= b.prefix_tokens
        assert a.vocab_size <= b.vocab_size  # vocabulary never shrinks
    last = rows[-1]
    n_docs = spark.table("documents").count()
    total_vocab = spark.sql(
        "SELECT count(DISTINCT term) AS v FROM (SELECT"
        " explode(split(text, ' ')) AS term FROM documents)"
    ).collect()[0].v
    assert last.prefix_docs == n_docs
    assert last.vocab_size == total_vocab
