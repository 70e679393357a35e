"""Registry queries for the Firestore-style document-collection toolset
(document_store.py; reference `--prebuilt firestore`,
images/firestore/entrypoint.sh:51, README.md:149) — each tool's output
oracle-checked against plain SQL over the same tables.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_tables

_GET_PATHS = [
    "orders/1",
    "documents/3",
    "lineitem/201-4",
    "part/1",
    "orders/999999999",
    "nosuch/1",
    "lineitem/malformed",
]


def docstore_query_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`query_collection` over orders: two ANDed structured filters, keyed
    order, limit — the upstream firestore-query-collection shape. The tool
    returns doc_path + typed columns; this wrapper projects a stable
    comparison set (rounded money per FIXTURES.md).

    Scale shape: scan with both filters pushed to parquet → TakeOrdered
    (order_by + limit fuse); no shuffle beyond the top-k gather."""
    from database_toolbox_spark.document_store import (  # noqa: PLC0415
        query_collection,
    )

    load_tables(spark, sf_dir)
    df = query_collection(
        spark,
        "orders",
        json.dumps(
            [
                {"field": "o_orderstatus", "op": "==", "value": "F"},
                {"field": "o_totalprice", "op": ">", "value": 150000},
            ]
        ),
        order_by="o_orderkey",
        direction="ASCENDING",
        limit="100",
    )
    return df.selectExpr(
        "doc_path",
        "o_orderkey",
        "o_custkey",
        f"{R('o_totalprice', 2)} AS total_price",
    )


def docstore_get_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`get_documents` over a fixed path list spanning four collections, a
    composite lineitem id, a certainly-absent key, an unknown collection,
    and a malformed composite id — the found/missing matrix. The JSON
    `data` column is dropped for comparison (engines need not agree on
    JSON key order); tests assert its contents Spark-side."""
    from database_toolbox_spark.document_store import (  # noqa: PLC0415
        get_documents,
    )

    load_tables(spark, sf_dir)
    return get_documents(spark, json.dumps(_GET_PATHS)).select(
        "doc_path", "found"
    )


def docstore_list_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`list_collections` with every fixture table registered — the full
    collection inventory with document-id fields."""
    from database_toolbox_spark.document_store import (  # noqa: PLC0415
        list_collections,
    )

    load_tables(spark, sf_dir)
    return list_collections(spark)


def docstore_aggregate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`aggregate_collection` (upstream Firestore aggregation query):
    count() + sum(o_totalprice) + avg(o_totalprice) over orders filtered
    with an `in` op — exercising both the round-9 aggregation surface and
    the typed-literal path for list filter values.

    Scale shape: pushed filter → one-pass partial-aggregatable reduction
    (map-side combine, three scalars per partition); no document rows move."""
    from database_toolbox_spark.document_store import (  # noqa: PLC0415
        aggregate_collection,
    )

    load_tables(spark, sf_dir)
    df = aggregate_collection(
        spark,
        "orders",
        json.dumps(
            [
                {"op": "count", "alias": "n_docs"},
                {"op": "sum", "field": "o_totalprice", "alias": "sum_raw"},
                {"op": "avg", "field": "o_totalprice", "alias": "avg_raw"},
            ]
        ),
        filters=json.dumps(
            [{"field": "o_orderstatus", "op": "in", "value": ["F", "P"]}]
        ),
    )
    return df.selectExpr(
        "CAST(n_docs AS BIGINT) AS n_docs",
        f"{R('sum_raw', 2)} AS sum_total_price",
        f"{R('avg_raw', 2)} AS avg_total_price",
    )


QUERIES = {
    "docstore_query_orders": docstore_query_orders,
    "docstore_get_documents": docstore_get_documents,
    "docstore_list_collections": docstore_list_collections,
    "docstore_aggregate_orders": docstore_aggregate_orders,
}

_GET_PATHS_SQL = ", ".join(f"('{p}')" for p in _GET_PATHS)

ORACLE = {
    "docstore_query_orders": f"""
        SELECT 'orders/' || CAST(o_orderkey AS VARCHAR) AS doc_path,
               o_orderkey, o_custkey,
               {R('o_totalprice', 2)} AS total_price
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 150000
        ORDER BY o_orderkey LIMIT 100
    """,
    "docstore_get_documents": f"""
        WITH req(doc_path) AS (VALUES {_GET_PATHS_SQL}),
        cand AS (
            SELECT 'orders/' || CAST(o_orderkey AS VARCHAR) AS doc_path
            FROM orders
            UNION ALL
            SELECT 'documents/' || CAST(doc_id AS VARCHAR) FROM documents
            UNION ALL
            -- DISTINCT: the fixture's lineitem key is non-unique and a
            -- path denotes at most one document (document_store collapses)
            SELECT DISTINCT 'lineitem/' || CAST(l_orderkey AS VARCHAR)
                   || '-' || CAST(l_linenumber AS VARCHAR) FROM lineitem
            UNION ALL
            SELECT 'part/' || CAST(p_partkey AS VARCHAR) FROM part
        )
        SELECT r.doc_path, (c.doc_path IS NOT NULL) AS found
        FROM req r LEFT JOIN cand c ON c.doc_path = r.doc_path
        ORDER BY r.doc_path
    """,
    "docstore_aggregate_orders": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               {R('sum(o_totalprice)', 2)} AS sum_total_price,
               {R('avg(o_totalprice)', 2)} AS avg_total_price
        FROM orders
        WHERE o_orderstatus IN ('F', 'P')
    """,
    "docstore_list_collections": """
        SELECT * FROM (VALUES
            ('customer', 'c_custkey'),
            ('documents', 'doc_id'),
            ('embeddings', 'vec_id'),
            ('events', 'event_id'),
            ('lineitem', 'l_orderkey-l_linenumber'),
            ('nation', 'n_nationkey'),
            ('orders', 'o_orderkey'),
            ('part', 'p_partkey'),
            ('region', 'r_regionkey'),
            ('supplier', 's_suppkey')
        ) t(collection_id, id_field)
        ORDER BY collection_id
    """,
}
