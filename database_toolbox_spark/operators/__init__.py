"""Operator inventory (SURVEY.md §2.B + §7).

Each submodule exposes:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLE:  dict[str, str]   # DuckDB-runnable ANSI SQL per query (subset —
                              # non-SQL-expressible ops omit their entry)

`all_queries()` / `all_oracles()` merge them for `__spark_entry__.py`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from database_toolbox_spark.operators import (  # noqa: PLC0415
        arrays,
        asof,
        bucketing,
        catalog_ops,
        clustering,
        curation,
        dedup,
        docstore_ops,
        events,
        finance,
        fingerprints,
        geo,
        graph,
        grouping,
        ivm,
        joins,
        looker_ops,
        market,
        merge_ops,
        multimodal,
        partitioning,
        partsupp,
        pipeline,
        profile,
        pyds,
        scalars,
        semistructured,
        setops,
        similarity,
        sketches,
        skew,
        stats,
        subqueries,
        text,
        tpch,
        tpch2,
        udfs,
        windows,
    )

    return [
        arrays,
        asof,
        bucketing,
        catalog_ops,
        clustering,
        curation,
        dedup,
        docstore_ops,
        events,
        finance,
        fingerprints,
        geo,
        graph,
        grouping,
        ivm,
        joins,
        looker_ops,
        market,
        merge_ops,
        multimodal,
        partitioning,
        partsupp,
        pipeline,
        profile,
        pyds,
        scalars,
        semistructured,
        setops,
        similarity,
        sketches,
        skew,
        stats,
        subqueries,
        text,
        tpch,
        tpch2,
        udfs,
        windows,
    ]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(m.ORACLE)
    return out
