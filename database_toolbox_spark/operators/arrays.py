"""Array / map / JSON column operators (SURVEY.md §2.B scalar functions:
array split/contains/size [exercised via images/redshift/redshift.yaml:30-31]
and map/json props extraction [implied]; the `embeddings.embedding`
array<float> and `events.props` JSON columns are the fixtures).

Also the lag-gap sessionization pattern — the batch window-function twin of
`session_window`, validated against the same DuckDB sessionization SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from database_toolbox_spark.operators._oracle import R
from database_toolbox_spark.session import load_tables


def array_funcs_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over embedding vectors: size, min/max, mean, L2 norm,
    element access, slice+transform, filter+size, sort head."""
    load_tables(spark, sf_dir)
    return spark.sql(f"""
        WITH v AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                   FROM embeddings)
        SELECT vec_id,
               size(e)                                        AS dim,
               {R("array_min(e)", 6)}                         AS vmin,
               {R("array_max(e)", 6)}                         AS vmax,
               {R("aggregate(e, 0e0, (a, x) -> a + x) / size(e)", 6)} AS vmean,
               {R("sqrt(aggregate(e, 0e0, (a, x) -> a + x * x))", 6)} AS l2,
               {R("element_at(e, 1)", 6)}                     AS first_val,
               size(filter(e, x -> x > 0))                    AS n_positive,
               {R("element_at(array_sort(e), 1)", 6)}         AS sorted_head,
               to_json(transform(slice(e, 1, 3),
                       x -> CAST(floor(x * 1000000 + 0.501e0) AS BIGINT)))
                                                              AS head3
        FROM v ORDER BY vec_id
    """)


def map_json_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON text → map/struct: parse events.props, inspect keys/values."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        WITH p AS (
            SELECT event_id, event_type,
                   from_json(props, 'map<string,int>') AS m
            FROM events
        )
        SELECT event_id, event_type,
               size(map_keys(m))                  AS n_keys,
               array_join(array_sort(map_keys(m)), ',') AS keys_csv,
               m['k']                             AS k_val,
               CAST(m['k'] % 10 AS INT)           AS k_mod10
        FROM p ORDER BY event_id
    """)


def sessionize_lag_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag-gap + running sum (the window-function method;
    semantically identical to F.session_window with a 10-minute gap — both
    validate against the same oracle)."""
    load_tables(spark, sf_dir)
    return spark.sql(f"""
        WITH gaps AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts > lag(ts) OVER w + INTERVAL 10 MINUTES
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sess_id
            FROM gaps
        )
        SELECT user_id,
               min(ts)            AS session_start,
               count(*)           AS n_events,
               {R("sum(value)")}  AS sum_value
        FROM sessions
        GROUP BY user_id, sess_id
        ORDER BY user_id, session_start
    """)


def array_setops_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array SET algebra (union/intersect/except) per document token set —
    all JVM-side built-ins, no explode round-trip. Engines order set results
    differently, so the portable contract compares CARDINALITIES."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        WITH t AS (
            SELECT doc_id, array_distinct(split(text, ' ')) AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(size(toks) AS INT) AS n_toks,
               CAST(size(array_intersect(toks,
                    array('the', 'and', 'of'))) AS INT) AS n_stop_hits,
               CAST(size(array_union(toks,
                    array('zz_pad1', 'zz_pad2'))) AS INT) AS n_union,
               CAST(size(array_except(toks,
                    array('the', 'and', 'of'))) AS INT) AS n_rest
        FROM t
        ORDER BY doc_id
    """)


QUERIES = {
    "array_funcs_battery": array_funcs_battery,
    "array_setops_battery": array_setops_battery,
    "map_json_battery": map_json_battery,
    "sessionize_lag_method": sessionize_lag_method,
}

ORACLE = {
    "array_setops_battery": """
        WITH t AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_toks,
               CAST(len(list_intersect(toks,
                    ['the', 'and', 'of'])) AS INT) AS n_stop_hits,
               CAST(len(list_distinct(list_concat(toks,
                    ['zz_pad1', 'zz_pad2']))) AS INT) AS n_union,
               CAST(len(list_filter(toks, x -> NOT list_contains(
                    ['the', 'and', 'of'], x))) AS INT) AS n_rest
        FROM t
        ORDER BY doc_id
    """,
    "array_funcs_battery": f"""
        WITH v AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                   FROM embeddings)
        SELECT vec_id,
               CAST(len(e) AS INT)                            AS dim,
               {R("list_min(e)", 6)}                          AS vmin,
               {R("list_max(e)", 6)}                          AS vmax,
               {R("list_aggregate(e, 'sum') / len(e)", 6)}    AS vmean,
               {R("sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum'))", 6)}
                                                              AS l2,
               {R("e[1]", 6)}                                 AS first_val,
               CAST(len(list_filter(e, x -> x > 0)) AS INT)   AS n_positive,
               {R("list_sort(e)[1]", 6)}                      AS sorted_head,
               CAST(to_json(list_transform(e[1:3],
                    x -> CAST(floor(x * 1000000 + 0.501e0) AS BIGINT)))
                    AS VARCHAR)                               AS head3
        FROM v ORDER BY vec_id
    """,
    "map_json_battery": """
        SELECT event_id, event_type,
               CAST(len(json_keys(props)) AS INT)        AS n_keys,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
               CAST(props->>'$.k' AS INT)                AS k_val,
               CAST(CAST(props->>'$.k' AS INT) % 10 AS INT) AS k_mod10
        FROM events ORDER BY event_id
    """,
    # same oracle as user_session_windows — both Spark methods must agree
    # with the one ground truth
    "sessionize_lag_method": f"""
        WITH gaps AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL 10 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), sessions AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
            FROM gaps
        )
        SELECT user_id,
               min(ts)            AS session_start,
               count(*)           AS n_events,
               {R("sum(value)")}  AS sum_value
        FROM sessions
        GROUP BY user_id, sess_id
        ORDER BY user_id, session_start
    """,
}
