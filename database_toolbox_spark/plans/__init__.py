"""Plan introspection utilities (the explain-and-iterate loop's toolkit).

Wraps Spark's ExplainMode surface so tests and scripts can assert the
load-bearing physical-plan properties (pushdown, broadcast, bucketing,
pruning, codegen) without touching py4j internals everywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string in any ExplainMode: simple | extended | codegen |
    cost | formatted."""
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(jmode.fromString(mode))


def final_plan_str(df: DataFrame) -> str:
    """The executed (AQE-finalized) plan — only meaningful after an action
    has run on THIS DataFrame's query execution (e.g. collect())."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass(frozen=True)
class PlanFeatures:
    """Presence flags for the plan properties the 100 TB design rests on."""

    pushed_filters: bool
    broadcast_joins: int
    sort_merge_joins: int
    take_ordered: bool
    cartesian: bool
    partial_aggregation: bool
    exchanges: int

    @classmethod
    def of(cls, df: DataFrame) -> "PlanFeatures":
        formatted = explain_str(df, "formatted")
        simple = explain_str(df, "simple")
        return cls(
            pushed_filters="PushedFilters: [" in formatted
            and "PushedFilters: []" not in formatted,
            broadcast_joins=simple.count("BroadcastHashJoin"),
            sort_merge_joins=simple.count("SortMergeJoin"),
            take_ordered="TakeOrderedAndProject" in simple,
            cartesian="CartesianProduct" in simple,
            partial_aggregation="partial_" in simple,
            exchanges=simple.count("Exchange "),
        )


# Node tokens whose COUNTS define a plan fingerprint: the load-bearing
# physical choices (join strategies, shuffle kinds, top-k fusion, Python
# stages) that must not drift silently. Counted on the 'simple' plan text —
# stable across expression ids and partition counts.
FINGERPRINT_TOKENS: tuple[str, ...] = (
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "CartesianProduct",
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "TakeOrderedAndProject",
    "Window",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "BatchEvalPython",
)


def plan_fingerprint(df: DataFrame) -> dict[str, int]:
    """Reduce a physical plan to {token: count} over FINGERPRINT_TOKENS
    (zero-count tokens omitted). A silently lost broadcast, a new
    SinglePartition exchange, or a Python stage sneaking into a codegen
    path all change the fingerprint — scripts/dump_plans.py --fingerprints
    commits the expected values and tests/test_plans.py diffs against them
    (round-7 verdict item 7)."""
    simple = explain_str(df, "simple")
    return {t: c for t in FINGERPRINT_TOKENS
            if (c := simple.count(t))}


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema of the first scan — what actually gets read off disk
    (column pruning check)."""
    formatted = explain_str(df, "formatted")
    for line in formatted.splitlines():
        if "ReadSchema:" in line:
            return line.split("ReadSchema:", 1)[1].strip()
    return ""
