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


QUERIES = {
    "docstore_query_orders": docstore_query_orders,
    "docstore_get_documents": docstore_get_documents,
    "docstore_list_collections": docstore_list_collections,
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
