#!/usr/bin/env python
"""Quickstart: the three ways to use database_toolbox_spark.

Run from the repo root (defaults to the smallest fixture):

    python examples/quickstart.py [sf_dir]

1. SQL through the gated tool surface (what an MCP client gets).
2. The operator library (250-ish ready-made analytics/curation queries).
3. Your own DataFrame code on the registered star schema.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_toolbox_spark import registry
from database_toolbox_spark.gate import StatementDenied
from database_toolbox_spark.operators import all_queries
from database_toolbox_spark.session import get_spark, load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="quickstart", cpus="8",
                      shuffle_partitions="8")
    load_tables(spark, SF_DIR)

    # 1 — the gated tool surface (default-deny: only read statements run)
    out = registry.call_tool(spark, "execute_sql", {
        "sql": "SELECT o_orderstatus, count(*) AS n "
               "FROM orders GROUP BY o_orderstatus ORDER BY 1"
    })
    print("execute_sql:", [c["text"] for c in out])
    try:
        registry.call_tool(spark, "execute_sql",
                           {"sql": "DROP TABLE orders"})
    except StatementDenied as exc:
        print("gate denied DROP as expected:", exc)

    # 1b — the Firestore-style document surface over the same tables
    import json as _json

    print("query_collection:", [
        c["text"] for c in registry.call_tool(spark, "query_collection", {
            "collection": "orders",
            "filters": _json.dumps(
                [{"field": "o_orderstatus", "op": "==", "value": "F"}]
            ),
            "order_by": "o_totalprice", "direction": "DESCENDING",
            "limit": "3", "fields": "o_totalprice,o_orderstatus",
        })
    ])
    print("get_documents:", [
        c["text"] for c in registry.call_tool(spark, "get_documents", {
            "document_paths": "orders/1, nosuch/1"
        })
    ])

    # 2 — the operator library (each entry: fn(spark, sf_dir) -> DataFrame)
    queries = all_queries()
    for name in ("pricing_summary", "minhash_near_dup_pairs",
                 "hybrid_rrf_search", "shuffle_skew_profile"):
        df = queries[name](spark, SF_DIR)
        print(f"\n{name}:")
        df.show(5, truncate=False)

    # 3 — plain DataFrame code over the registered views
    spark.sql("""
        SELECT c.c_mktsegment, count(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY n_orders DESC
    """).show()

    spark.stop()


if __name__ == "__main__":
    main()
