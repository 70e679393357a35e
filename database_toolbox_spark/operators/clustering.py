"""Iterative clustering (k-means) over embeddings — the "iterative
algorithm" representative of the training-data tier.

Lloyd's algorithm with deterministic init (the first K vectors) and a fixed
number of unrolled iterations, expressed entirely in SQL over a LONG-FORM
centroid relation (cell, pos, m) — element-wise centroid means and squared
distances become plain joins + grouped aggregations, no array rebuilds and
no driver-side loop state beyond the SQL text itself. Both dialects share
the same generated skeleton, so even this iterative op is oracle-checked.

Scale notes: per iteration the work is |vectors| × K × dim rows of
multiply-add through whole-stage codegen, shuffled only by (vec, cell) /
(cell, pos) group keys; centroids are K×dim rows (the "model" — broadcast-
sized at any corpus scale). Assignment ranks on a canon-rounded distance so
ulp-level engine noise cannot flip cluster membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_tables

K_CELLS = 8
N_ITERS = 2  # unrolled Lloyd updates after init
DIM = 64  # fixture embedding dimensionality (FIXTURES.md)


def _kmeans_sql(pos_src: str, elem, n_iters: int = N_ITERS) -> str:
    """Shared k-means skeleton. pos_src = dialect's 1..DIM position
    relation; elem(tbl, pos) = dialect's array element access."""
    e = elem("e.embedding", "c.pos")
    e_p = elem("e.embedding", "p.pos")
    parts = [
        f"""cent0 AS (
            SELECT e.vec_id AS cell, p.pos,
                   CAST({elem("e.embedding", "p.pos")} AS DOUBLE) AS m
            FROM embeddings e CROSS JOIN {pos_src} p
            WHERE e.vec_id < {K_CELLS}
        )"""
    ]
    for it in range(n_iters + 1):
        parts.append(f"""dist{it} AS (
            SELECT e.vec_id, c.cell,
                   sum((CAST({e} AS DOUBLE) - c.m) * (CAST({e} AS DOUBLE) - c.m))
                       AS d2
            FROM embeddings e CROSS JOIN cent{it} c
            GROUP BY e.vec_id, c.cell
        )""")
        parts.append(f"""assign{it} AS (
            SELECT vec_id, cell, d2 FROM (
                SELECT vec_id, cell, d2,
                       row_number() OVER (PARTITION BY vec_id
                           ORDER BY floor(d2 * 1000000e0) / 1000000e0, cell)
                           AS rn
                FROM dist{it}
            ) r WHERE rn = 1
        )""")
        if it < n_iters:
            parts.append(f"""cent{it + 1} AS (
                SELECT a.cell, p.pos,
                       avg(CAST({e_p} AS DOUBLE)) AS m
                FROM assign{it} a
                JOIN embeddings e ON e.vec_id = a.vec_id
                CROSS JOIN {pos_src} p
                GROUP BY a.cell, p.pos
            )""")
    body = ",\n        ".join(parts)
    return f"""
        WITH {body}
        SELECT cell, count(*) AS n, {R("sum(d2)")} AS inertia
        FROM assign{n_iters}
        GROUP BY cell ORDER BY cell
    """


def kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means (K=8, 2 Lloyd updates, deterministic init): final cell sizes
    and within-cell inertia."""
    load_tables(spark, sf_dir)
    return spark.sql(
        _kmeans_sql(
            f"(SELECT explode(sequence(1, {DIM})) AS pos)",
            lambda arr, pos: f"element_at({arr}, {pos})",
        )
    )


QUERIES = {"kmeans_cells": kmeans_cells}

ORACLE = {
    "kmeans_cells": _kmeans_sql(
        f"(SELECT unnest(range(1, {DIM} + 1)) AS pos)",
        lambda arr, pos: f"{arr}[{pos}]",
    ),
}
