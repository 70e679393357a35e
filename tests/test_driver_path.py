"""Driver-faithful comparator regression tests.

tests/conftest.compare_with_oracle canonicalizes via fetchall + string
rules, which FORGIVES the two failure classes the round driver's
pandas-based comparator does not: DuckDB HUGEINT/DECIMAL narrowing to
float64 ("123" vs "123.0") and unhashable list cells. Round 1 shipped five
driver-red queries that were green locally for exactly this reason. This
suite re-runs the historically-hazardous queries through the SAME pandas
path as the driver (scripts/driver_check._canon), so any reintroduced
un-CAST integer SUM, raw array/struct output, or DECIMAL column fails in
pytest before it fails in the round gate.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from scripts.driver_check import _canon
from tests.conftest import SF_DIR

# every query that ever tripped (or nearly tripped) the pandas path, plus
# the new operators that emit sums/decimals/arrays
HAZARD_QUERIES = [
    "array_funcs_battery",
    "binary_meta_stats",
    "collation_battery",
    "corpus_cleaning_funnel",
    "cumulative_unique_users",
    "decimal_money_totals",
    "event_json_stats",
    "late_shipment_priorities",
    "null_semantics_battery",
    "pack_documents",
    "partsupp_digest",
    "pivot_segment_status",
    "sq8_ann_topk",
    "stratified_sample_counts",
    "temperature_mix_allocation",
    "variant_props_stats",
]


@pytest.mark.parametrize("name", HAZARD_QUERIES)
def test_pandas_path_hash_match(spark, ddb, name):
    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    ddf = ddb.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    s_hash, s_c = _canon(sdf)
    d_hash, d_c = _canon(ddf)
    if s_hash != d_hash:
        diff = next(
            (
                (i, list(s_c.iloc[i].astype(str)), list(d_c.iloc[i].astype(str)))
                for i in range(len(s_c))
                if list(s_c.iloc[i].astype(str)) != list(d_c.iloc[i].astype(str))
            ),
            None,
        )
        pytest.fail(f"pandas-path hash mismatch; first diff row: {diff}")
