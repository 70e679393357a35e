"""Unit tests for training-data-prep operators on synthetic rows (the
fixture corpus is clean, so PII scrubbing needs planted matches)."""

from __future__ import annotations

from database_toolbox_spark.operators.pipeline import doc_chunks, pack_documents
from tests.conftest import SF_DIR


def test_pii_scrub_on_planted_rows(spark):
    df = spark.createDataFrame(
        [
            (1, "contact me at alice@example.com or https://x.io/page now"),
            (2, "card 1234567890 and id 999999 plain 123"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("pii_probe")
    out = {
        r.doc_id: r
        for r in spark.sql("""
            SELECT doc_id,
                   CAST(regexp_count(text,
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\\\.[a-zA-Z]{2,}') AS INT)
                       AS n_emails,
                   CAST(regexp_count(text, 'https?://[^\\\\s]+') AS INT) AS n_urls,
                   CAST(regexp_count(text, '\\\\d{6,}') AS INT) AS n_long_digits,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\\\.[a-zA-Z]{2,}',
                       '<EMAIL>'),
                       'https?://[^\\\\s]+', '<URL>'),
                       '\\\\d{6,}', '<NUM>') AS scrubbed
            FROM pii_probe
        """).collect()
    }
    assert out[1].n_emails == 1 and out[1].n_urls == 1
    assert "<EMAIL>" in out[1].scrubbed and "<URL>" in out[1].scrubbed
    assert "alice@" not in out[1].scrubbed
    assert out[2].n_long_digits == 2  # 1234567890 and 999999, not 123
    assert out[2].scrubbed == "card <NUM> and id <NUM> plain 123"
    assert out[3].scrubbed == "clean text only"


def test_chunks_cover_every_token_with_overlap(spark):
    rows = doc_chunks(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = {r.doc_id: r for r in spark.table("documents").collect()}
    for doc_id, chunks in list(by_doc.items())[:25]:
        toks = docs[doc_id].text.split(" ")
        chunks.sort(key=lambda r: r.chunk_idx)
        # first chunk starts at token 0; last chunk reaches the final token
        assert chunks[0].chunk_text.split(" ")[0] == toks[0]
        assert chunks[-1].chunk_text.split(" ")[-1] == toks[-1]
        # stride contract: chunk k starts at token k*24
        for r in chunks:
            assert r.chunk_text.split(" ")[0] == toks[r.chunk_idx * 24]


def test_packing_bins_respect_budget_order(spark):
    rows = pack_documents(spark, SF_DIR).collect()
    # bins are non-decreasing in doc order and offsets stay under budget
    last_bin = 0
    for r in sorted(rows, key=lambda r: r.doc_id):
        assert r.pack_bin >= last_bin
        assert 0 <= r.offset_in_bin < 2048
        last_bin = r.pack_bin
