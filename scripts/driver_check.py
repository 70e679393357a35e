"""Driver-faithful correctness check: run queries() vs oracle_sql() through
the SAME pandas path the per-round driver uses, so typing hazards the lenient
tests/conftest.py comparator forgives (DuckDB HUGEINT -> float64, unhashable
list cells) show up locally BEFORE the round gate.

Usage:
    python scripts/driver_check.py [query ...]      # default: all queries
    SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python scripts/driver_check.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_toolbox_spark.session import TABLES, get_spark, table_path

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _canon(df):
    """Mimic the driver: sort columns by name, sort rows, stringify, hash."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    cells = df.astype(str).values.tolist()
    blob = "\n".join("|".join(r) for r in cells)
    return hashlib.sha256(blob.encode()).hexdigest(), df


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="driver-check", cpus="8", shuffle_partitions="8")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_DIR, t)}')"
        )
    # session warmup (same rationale as bench.py): parquet footers, codegen,
    # one shuffle, Python-worker forks — one-time session costs that would
    # otherwise be charged to the alphabetically-first queries and show up
    # as phantom 5-8 s outliers in the sweep's slowest-query report
    from database_toolbox_spark.session import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.limit(1).write.mode("overwrite").format("noop").save()

    def _noop_pandas(batches):
        yield from batches

    spark.range(64).repartition(8).mapInPandas(
        _noop_pandas, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(only or queries.keys())
    results, n_bad = {}, 0
    for name in names:
        if name not in queries:
            print(f"{name}: NO SUCH QUERY", flush=True)
            n_bad += 1
            continue
        oracle = oracles.get(name)
        try:
            import time as _time

            _t0 = _time.perf_counter()
            sdf = queries[name](spark, SF_DIR).toPandas()
            elapsed = round(_time.perf_counter() - _t0, 3)
            if oracle is None:
                results[name] = {"rows_only": len(sdf), "sec": elapsed}
                print(f"{name}: rows-only ({len(sdf)}, {elapsed}s)", flush=True)
                continue
            ddf = con.sql(oracle).df()
            s_hash, s_c = _canon(sdf)
            d_hash, d_c = _canon(ddf)
            ok = (
                len(sdf) == len(ddf)
                and sorted(sdf.columns) == sorted(ddf.columns)
                and s_hash == d_hash
            )
            results[name] = {
                "rows_match": len(sdf) == len(ddf),
                "schema_match": sorted(sdf.columns) == sorted(ddf.columns),
                "hash_match": s_hash == d_hash,
            }
            if not ok:
                n_bad += 1
                print(f"{name}: MISMATCH {results[name]}", flush=True)
                if s_hash != d_hash and len(s_c) == len(d_c):
                    for i in range(len(s_c)):
                        sr = list(s_c.iloc[i].astype(str))
                        dr = list(d_c.iloc[i].astype(str))
                        if sr != dr:
                            print(f"  first diff row {i}:")
                            print(f"    spark : {sr}")
                            print(f"    duckdb: {dr}")
                            break
            else:
                print(f"{name}: ok ({len(sdf)} rows, {elapsed}s)", flush=True)
            results[name]["sec"] = elapsed
        except Exception as e:  # noqa: BLE001 - report and continue
            n_bad += 1
            results[name] = {"err": f"{type(e).__name__}: {e}"}
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}", flush=True)
    slow = sorted(
        ((n, r["sec"]) for n, r in results.items() if r.get("sec")),
        key=lambda x: -x[1],
    )[:10]
    print(json.dumps({"checked": len(names), "bad": n_bad, "slowest": slow}))
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
