"""Structured Streaming tests: drive the parquet fixture through each
streaming query (memory sink, processAllAvailable) and compare with the
batch equivalents in operators/events.py."""

from __future__ import annotations

import pytest

from database_toolbox_spark.operators import events as batch_events
from database_toolbox_spark.streaming import (
    read_events_stream,
    stream_dedup,
    stream_hourly_counts,
    stream_session_windows,
    stream_user_running_totals,
)
from tests.conftest import SF_DIR


def _run_to_memory(df, name: str, output_mode: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


@pytest.fixture(scope="module")
def stream(spark):
    return read_events_stream(spark, SF_DIR)


def test_stream_hourly_matches_batch(spark, stream):
    # complete mode: append would hold back windows past the final watermark
    _run_to_memory(stream_hourly_counts(stream), "hourly_out", "complete")
    got = {
        (r.hour_start, r.event_type): (r.n, round(r.sum_value, 2))
        for r in spark.sql("SELECT * FROM hourly_out").collect()
    }
    want = {
        (r.hour_start, r.event_type): (r.n, r.sum_value)
        for r in batch_events.hourly_event_windows(spark, SF_DIR).collect()
    }
    assert got.keys() == want.keys()
    for k, (n, s) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - s) < 0.05


def test_stream_static_enrichment_matches_batch(spark, stream):
    """Stream-static broadcast join: per-segment hourly totals must equal
    the same join+agg run in batch over the identical inputs."""
    from pyspark.sql import functions as F

    from database_toolbox_spark.session import load_table
    from database_toolbox_spark.streaming import stream_enriched_event_counts

    _run_to_memory(
        stream_enriched_event_counts(stream, spark, SF_DIR),
        "enriched_out", "complete",
    )
    got = {
        (r.hour_start, r.segment): (r.n, round(r.sum_value, 2))
        for r in spark.sql("SELECT * FROM enriched_out").collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    dim = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    want = {
        (r.hour_start, r.segment): (r.n, round(r.sum_value, 2))
        for r in ev.join(dim, "user_id", "left")
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.coalesce("segment", F.lit("UNKNOWN")).alias("segment"),
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("hour_start"), "segment", "n", "sum_value")
        .collect()
    }
    assert got.keys() == want.keys()
    for k, (n, s) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - s) < 0.05
    # every segment must be a real market segment (the dim join landed)
    segs = {k[1] for k in got}
    assert segs <= {"AUTOMOBILE", "BUILDING", "FURNITURE",
                    "HOUSEHOLD", "MACHINERY", "UNKNOWN"}


def test_stream_dedup_bounded_state(spark, stream):
    _run_to_memory(stream_dedup(stream), "dedup_out", "append")
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids))
    n_batch = (
        batch_events.event_dedup(spark, SF_DIR)
        .agg({"n": "sum"})
        .collect()[0][0]
    )
    assert len(ids) == n_batch


def test_stream_sessions_match_batch(spark, stream):
    _run_to_memory(stream_session_windows(stream), "sess_out", "complete")
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    want = {
        (r.user_id, r.session_start): r.n_events
        for r in batch_events.user_session_windows(spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_stateful_running_totals(spark, stream):
    _run_to_memory(
        stream_user_running_totals(stream), "totals_out", "update"
    )
    got = {
        r.user_id: r.n_events
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS n_events FROM totals_out "
            "GROUP BY user_id"
        ).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {r.user_id: r.n for r in ev.groupBy("user_id").count()
            .withColumnRenamed("count", "n").collect()}
    assert got == want


def test_foreach_batch_exactly_once(spark, stream, tmp_path):
    """foreachBatch sink: snapshot equals batch truth; restarting from the
    same checkpoint re-offers nothing (no duplicate epochs, no drift)."""
    import os

    from database_toolbox_spark.session import load_table
    from database_toolbox_spark.streaming import (
        read_events_stream,
        read_foreach_batch_snapshot,
        stream_foreach_batch_totals,
    )
    from pyspark.sql import functions as F

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = stream_foreach_batch_totals(stream, sink, ckpt).start()
    q.awaitTermination()

    snap = {
        r.event_type: (r.n, round(r.sum_value, 6))
        for r in read_foreach_batch_snapshot(spark, sink).collect()
    }
    truth = {
        r.event_type: (r.n, round(r.sum_value, 6))
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .collect()
    }
    assert snap == truth

    batches_before = sorted(os.listdir(sink))
    # restart from the same checkpoint: availableNow finds nothing new
    q2 = stream_foreach_batch_totals(
        read_events_stream(spark, SF_DIR), sink, ckpt
    ).start()
    q2.awaitTermination()
    assert sorted(os.listdir(sink)) == batches_before
    assert snap == {
        r.event_type: (r.n, round(r.sum_value, 6))
        for r in read_foreach_batch_snapshot(spark, sink).collect()
    }


def test_stream_cdc_upsert_matches_batch_compaction(spark, stream, tmp_path):
    """CDC materialization: the merged snapshot equals last-writer-wins
    compaction run in batch over the full history, and restarting from the
    same checkpoint changes nothing."""
    import os

    from pyspark.sql import functions as F

    from database_toolbox_spark.session import load_table
    from database_toolbox_spark.streaming import (
        read_cdc_snapshot,
        read_events_stream,
        stream_cdc_upsert,
    )

    sink = str(tmp_path / "cdc_sink")
    ckpt = str(tmp_path / "cdc_ckpt")
    q = stream_cdc_upsert(stream, sink, ckpt).start()
    q.awaitTermination()

    snap = {
        r.user_id: (r.ts, r.event_id, r.event_type, round(r.value, 6))
        for r in read_cdc_snapshot(spark, sink).collect()
    }
    truth = {
        r.user_id: (r.ts, r.event_id, r.event_type, round(r.value, 6))
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.struct("ts", "event_id", "event_type", "value")).alias(
                "s"
            )
        )
        .select(
            "user_id",
            F.col("s.ts").alias("ts"),
            F.col("s.event_id").alias("event_id"),
            F.col("s.event_type").alias("event_type"),
            F.col("s.value").alias("value"),
        )
        .collect()
    }
    assert snap == truth

    batches_before = sorted(os.listdir(sink))
    q2 = stream_cdc_upsert(
        read_events_stream(spark, SF_DIR), sink, ckpt
    ).start()
    q2.awaitTermination()
    assert sorted(os.listdir(sink)) == batches_before
    assert snap == {
        r.user_id: (r.ts, r.event_id, r.event_type, round(r.value, 6))
        for r in read_cdc_snapshot(spark, sink).collect()
    }


def test_stream_stream_join_matches_batch(spark, stream):
    """Stream-stream event-time range join (watermarked both sides) must
    produce exactly the batch join's matches."""
    from database_toolbox_spark.session import load_table
    from database_toolbox_spark.streaming import stream_view_click_join
    from pyspark.sql import functions as F

    _run_to_memory(stream_view_click_join(stream), "ssj_out", "append")
    got = {
        (r.c_user, r.view_id, r.click_id)
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    ev = load_table(spark, SF_DIR, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    want = {
        (r.c_user, r.view_id, r.click_id)
        for r in clicks.join(
            views,
            F.expr(
                "c_user = v_user AND click_ts > view_ts "
                "AND click_ts <= view_ts + INTERVAL 10 MINUTES"
            ),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stateful_timeout_closes_all_groups(spark, stream):
    """Event-time timeout must close EVERY group exactly once (availableNow
    drains the source, the final watermark advance fires all deadlines),
    with closed totals equal to the batch ground truth."""
    from database_toolbox_spark.session import load_table
    from database_toolbox_spark.streaming import stream_user_totals_with_timeout
    from pyspark.sql import functions as F

    _run_to_memory(
        stream_user_totals_with_timeout(stream), "timeout_out", "update"
    )
    closed = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.sql(
            "SELECT * FROM timeout_out WHERE closed_by_timeout"
        ).collect()
    }
    truth = {
        r.user_id: (r.n, round(r.s, 6))
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert closed == truth


def test_transform_with_state_running_totals(spark, stream):
    """Spark 4 transformWithStateInPandas (RocksDB-backed ValueState) must
    reproduce the batch per-user totals, like the applyInPandasWithState
    variant above.

    The TWS wire protocol needs the protobuf runtime. Where it is absent
    (this no-install container), the test still RUNS and asserts the
    capability gate behaves honestly: tws_available() says no, and calling
    the operator raises an ImportError naming the requirement — the
    running-total SEMANTICS stay covered by the applyInPandasWithState
    twin (test_apply_in_pandas_with_state_* above). No silent skip."""
    from database_toolbox_spark.streaming import (
        TWS_REQUIREMENT,
        stream_user_totals_tws,
        tws_available,
    )

    if not tws_available():
        assert "protobuf" in TWS_REQUIREMENT
        with pytest.raises(ImportError, match="protobuf"):
            stream_user_totals_tws(stream)
        return

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        _run_to_memory(stream_user_totals_tws(stream), "tws_out", "update")
        got = {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.sql(
                "SELECT user_id, max(n_events) AS n_events, "
                "max(total_value) AS total_value FROM tws_out GROUP BY user_id"
            ).collect()
        }
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        want = {
            r.user_id: (r.n, r.total)
            for r in ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .collect()
        }
        assert got.keys() == want.keys()
        for uid, (n, total) in want.items():
            assert got[uid][0] == n
            assert got[uid][1] == pytest.approx(total, rel=1e-9)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_stream_minhash_near_dup_matches_batch(spark, tmp_path):
    """Incremental near-dup detection over two micro-batches must emit
    exactly the batch operator's verified pair set: pairs whose members
    arrive in different epochs are caught by the store probe, same-epoch
    pairs by the intra-batch probe, and nothing is emitted twice."""
    from database_toolbox_spark.operators.dedup import minhash_near_dup_pairs
    from database_toolbox_spark.streaming import (
        read_docs_stream,
        read_near_dup_pairs,
        stream_minhash_near_dup,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    src = tmp_path / "docs_src"
    # two slices -> two micro-batches (maxFilesPerTrigger=1); split by id
    # half so cross-slice AND intra-slice duplicate pairs both exist
    docs.where(f"doc_id < {n // 2}").coalesce(1).write.parquet(
        str(src / "slice=0")
    )
    docs.where(f"doc_id >= {n // 2}").coalesce(1).write.parquet(
        str(src / "slice=1")
    )

    q = stream_minhash_near_dup(
        read_docs_stream(spark, f"{src}/slice=*"),
        store_dir=str(tmp_path / "store"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(120)

    streamed = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in read_near_dup_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    batch = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_near_dup_pairs(spark, sf_dir)
        .select("doc_a", "doc_b", "jaccard")
        .collect()
    }
    assert batch, "fixture must contain near-dup pairs"
    assert streamed == batch
    # the signature store accumulated exactly one row per eligible doc
    store = spark.read.option(
        "basePath", str(tmp_path / "store")
    ).parquet(f"{tmp_path}/store/batch_id=*")
    assert store.select("doc_id").distinct().count() == store.count()


def test_stream_minhash_near_dup_restart_continuation(spark, tmp_path):
    """Checkpointed restart: process two slices, stop, land a third slice,
    restart with the SAME checkpoint — only the new slice becomes an
    epoch, the store carries over, and the cumulative pair set equals the
    batch operator over the full corpus. This is the continuous-ingest
    contract: dedup state survives restarts and never double-emits."""
    from database_toolbox_spark.operators.dedup import minhash_near_dup_pairs
    from database_toolbox_spark.streaming import (
        read_docs_stream,
        read_near_dup_pairs,
        stream_minhash_near_dup,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    src = tmp_path / "src"
    cut1, cut2 = n // 3, 2 * n // 3
    docs.where(f"doc_id < {cut1}").coalesce(1).write.parquet(str(src / "s=0"))
    docs.where(f"doc_id >= {cut1} AND doc_id < {cut2}").coalesce(1).write.parquet(
        str(src / "s=1")
    )

    def start():
        return stream_minhash_near_dup(
            read_docs_stream(spark, f"{src}/s=*"),
            store_dir=str(tmp_path / "store"),
            pairs_dir=str(tmp_path / "pairs"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        ).start()

    q = start()
    q.awaitTermination(120)
    import glob

    epochs_before = set(glob.glob(f"{tmp_path}/store/batch_id=*"))
    assert len(epochs_before) == 2

    # third slice arrives after a full stop; restart from the checkpoint
    docs.where(f"doc_id >= {cut2}").coalesce(1).write.parquet(str(src / "s=2"))
    q = start()
    q.awaitTermination(120)
    epochs_after = set(glob.glob(f"{tmp_path}/store/batch_id=*"))
    assert epochs_before < epochs_after and len(epochs_after) == 3

    streamed = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in read_near_dup_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    batch = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_near_dup_pairs(spark, sf_dir)
        .select("doc_a", "doc_b", "jaccard")
        .collect()
    }
    assert streamed == batch
    # no pair was emitted in more than one epoch
    raw = spark.read.option("basePath", str(tmp_path / "pairs")).parquet(
        f"{tmp_path}/pairs/batch_id=*"
    )
    per_pair = raw.groupBy("doc_a", "doc_b").count().collect()
    assert all(r["count"] == 1 for r in per_pair)


def test_stream_value_anomalies_match_pandas_replay(spark, stream):
    """The stateful Welford detector's final counts equal an identical
    pandas replay of the same (ts, event_id)-ordered per-type streams —
    flags judged against PRIOR stats only."""
    import math

    from database_toolbox_spark.streaming import stream_value_anomalies
    from database_toolbox_spark.streaming.stream_ops import (
        ANOM_SIGMA,
        ANOM_WARMUP,
    )

    _run_to_memory(
        stream_value_anomalies(stream), "anom_out", "update"
    )
    got = {
        r.event_type: (r.n_seen, r.n_anomalies)
        for r in spark.sql(
            "SELECT event_type, max(n_seen) AS n_seen, "
            "max(n_anomalies) AS n_anomalies FROM anom_out "
            "GROUP BY event_type"
        ).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
    )
    for etype, grp in ev.groupby("event_type"):
        n, mean, m2, n_anom = 0, 0.0, 0.0, 0
        for v in grp.sort_values(["ts", "event_id"])["value"].astype(
            float
        ):
            if n >= ANOM_WARMUP:
                sd = math.sqrt(m2 / (n - 1))
                if sd > 0 and abs(v - mean) > ANOM_SIGMA * sd:
                    n_anom += 1
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        assert got[etype] == (n, n_anom), etype


def test_stream_heavy_hitters_match_pandas_replay_and_guarantee(
    spark, stream
):
    """The Misra-Gries shard sketches must equal an identical pandas
    replay, respect the undercount bound, and keep every TRUE per-shard
    heavy hitter (count > n_shard/(K+1)) — the 1982 guarantee."""
    from database_toolbox_spark.streaming import stream_heavy_hitters
    from database_toolbox_spark.streaming.stream_ops import MG_K, MG_SHARDS

    _run_to_memory(stream_heavy_hitters(stream), "mg_out", "update")
    got: dict[int, dict[int, int]] = {}
    n_seen: dict[int, int] = {}
    for r in spark.sql(
        "SELECT shard, user_id, mg_count, n_seen FROM mg_out"
    ).collect():
        got.setdefault(r.shard, {})[r.user_id] = r.mg_count
        n_seen[r.shard] = max(n_seen.get(r.shard, 0), r.n_seen)
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("user_id", "ts", "event_id",
                    f"pmod(user_id, {MG_SHARDS}) AS shard")
        .toPandas()
    )
    for shard, grp in ev.groupby("shard"):
        sketch: dict[int, int] = {}
        for uid in grp.sort_values(["ts", "event_id"])["user_id"].astype(
            int
        ):
            if uid in sketch:
                sketch[uid] += 1
            elif len(sketch) < MG_K:
                sketch[uid] = 1
            else:
                sketch = {u: c - 1 for u, c in sketch.items() if c > 1}
        assert got.get(shard, {}) == sketch, shard
        n = len(grp)
        assert n_seen[shard] == n
        true_counts = grp["user_id"].value_counts()
        bound = n // (MG_K + 1)
        for uid, c in true_counts.items():
            if c > bound:
                assert int(uid) in sketch, (shard, uid, c, bound)
                # MG undercount bound
                assert c - sketch[int(uid)] <= bound


def test_stream_ohlc_bars_match_batch(spark, stream):
    """Every streamed bar must equal the batch OHLC operator on the same
    parquet — open/close anchored by the same (ts, event_id) order, high/
    low/count/total identical."""
    from database_toolbox_spark.operators.events import (
        event_value_ohlc_hourly,
    )
    from database_toolbox_spark.streaming import stream_ohlc_bars

    _run_to_memory(stream_ohlc_bars(stream), "ohlc_out", "update")
    got = {}
    for r in spark.sql(
        "SELECT * FROM (SELECT *, row_number() OVER ("
        "PARTITION BY bar_hour ORDER BY n_events DESC) AS rk"
        " FROM ohlc_out) WHERE rk = 1"
    ).collect():
        got[r.bar_hour] = (
            r.n_events, round(r.open_value, 2), round(r.high_value, 2),
            round(r.low_value, 2), round(r.close_value, 2),
            round(r.total_value, 2),
        )
    want = {
        r.bar_hour: (
            r.n_events, r.open_value, r.high_value, r.low_value,
            r.close_value, r.total_value,
        )
        for r in event_value_ohlc_hourly(spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_bot_flags_match_batch_operator(spark, stream):
    """The streaming metronome detector's final per-user stats and flag
    must equal the batch bot_user_flags per-user relation (same
    (ts, event_id) per-user sequencing, same Welford sd, same
    integer-multiplied CV threshold)."""
    import math

    from database_toolbox_spark.streaming import stream_bot_flags
    from database_toolbox_spark.streaming.stream_ops import (
        BOT_STREAM_CV_DEN,
        BOT_STREAM_CV_NUM,
        BOT_STREAM_MIN_GAPS,
    )

    _run_to_memory(stream_bot_flags(stream), "bot_out", "update")
    got = {
        r.user_id: r
        for r in spark.sql(
            "SELECT user_id, max(n_gaps) AS n_gaps, "
            "max(mean_gap_s) AS mean_gap_s, max(sd_gap_s) AS sd_gap_s, "
            "max(too_regular) AS too_regular "
            "FROM bot_out GROUP BY user_id"
        ).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id")
        .toPandas()
    )
    n_flagged = 0
    for uid, grp in ev.groupby("user_id"):
        us = (
            grp.sort_values(["ts", "event_id"])["ts"]
            .astype("datetime64[ns]").astype("int64") // 1000
        )
        gaps = (us.diff().dropna() / 1e6).tolist()
        r = got[uid]
        assert r.n_gaps == len(gaps), uid
        if len(gaps) > 1:
            mean = sum(gaps) / len(gaps)
            var = sum((g - mean) ** 2 for g in gaps) / (len(gaps) - 1)
            assert abs(r.mean_gap_s - mean) < 1e-3, uid
            assert abs(r.sd_gap_s - math.sqrt(var)) < 1e-3, uid
            want = int(
                len(gaps) >= BOT_STREAM_MIN_GAPS
                and math.sqrt(var) * BOT_STREAM_CV_DEN
                < mean * BOT_STREAM_CV_NUM
            )
            assert r.too_regular == want, uid
        n_flagged += r.too_regular
    # corpus-level agreement with the batch operator's flag count
    from database_toolbox_spark.operators.events import bot_user_flags

    batch_row = bot_user_flags(spark, SF_DIR).collect()[0]
    assert n_flagged == batch_row.n_flagged


def test_stream_bottomk_sample_matches_batch(spark, stream):
    """The streaming bottom-k sample's FINAL state must equal the batch
    bottomk_user_sample relation exactly (min-wise property: arrival
    order and micro-batch chopping cannot change the bottom-k)."""
    from database_toolbox_spark.operators.sketches import bottomk_user_sample
    from database_toolbox_spark.streaming import stream_bottomk_sample

    _run_to_memory(stream_bottomk_sample(stream), "bottomk_out", "update")
    # update mode accumulates; the final sample per (type, rank) is the
    # row with the smallest hash ever emitted at that rank
    got = {
        (r.event_type, r.rank): (r.user_id, r.hash_val)
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER ("
            "PARTITION BY event_type, rank ORDER BY hash_val, user_id)"
            " AS rk FROM bottomk_out) WHERE rk = 1"
        ).collect()
    }
    want = {
        (r.event_type, r.rank): (r.user_id, r.hash_val)
        for r in bottomk_user_sample(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0


def test_python_datasource_stream_matches_batch_derivation(spark, tmp_path):
    """Spark 4 SimpleDataSourceStreamReader: the finite custom stream's
    accumulated rows must equal the deterministic batch derivation for
    ids 0..N — the partition-planned Python source run through the
    STREAMING engine with integer offsets and arithmetic replay."""
    import time

    from database_toolbox_spark.operators.pyds import (
        N_STREAM_ROWS,
        read_synthetic_stream,
    )

    df = read_synthetic_stream(spark)
    q = (
        df.writeStream.format("memory")
        .queryName("pyds_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            n = spark.sql(
                "SELECT count(*) AS n FROM pyds_stream_out"
            ).collect()[0].n
            if n >= N_STREAM_ROWS:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = {
        r.id: (r.bucket, round(r.score, 2))
        for r in spark.sql("SELECT * FROM pyds_stream_out").collect()
    }
    assert len(rows) == N_STREAM_ROWS
    for i in range(N_STREAM_ROWS):
        assert rows[i] == (
            f"b{(i * 2654435761) % 97 % 8}",
            round(((i * 1103515245 + 12345) % 65536) / 100.0, 2),
        )


def test_stream_srm_monitor_matches_batch(spark, stream):
    """The streaming SRM guardrail's final per-type counts and chi-square
    equal the batch computation over the same fixture (the statistic is a
    pure function of the counts, so stream == batch exactly)."""
    import hashlib

    from database_toolbox_spark.streaming import stream_srm_monitor
    from database_toolbox_spark.streaming.stream_ops import SRM_CRIT_95

    _run_to_memory(stream_srm_monitor(stream), "srm_out", "update")
    got = {
        r.event_type: r
        for r in spark.sql(
            "SELECT * FROM srm_out WHERE (event_type, n_arm0 + n_arm1) IN "
            "(SELECT event_type, max(n_arm0 + n_arm1) FROM srm_out "
            " GROUP BY event_type)"
        ).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "user_id")
        .toPandas()
    )
    for etype, grp in ev.groupby("event_type"):
        arms = [
            int(hashlib.md5(str(u).encode()).hexdigest()[:4], 16) % 2
            for u in grp["user_id"]
        ]
        n1 = sum(arms)
        n0 = len(arms) - n1
        r = got[etype]
        assert (r.n_arm0, r.n_arm1) == (n0, n1), etype
        chi2 = (n0 - n1) ** 2 / (n0 + n1)
        assert abs(r.srm_chi2 - chi2) < 1e-6
        assert r.srm_flag == int(chi2 > SRM_CRIT_95)


def test_stream_pattern_alerts_match_batch_census(spark, stream):
    """The streaming CEP twin's finalized (user, day) rows must equal a
    pandas replay, and — with each user's still-open last day folded in —
    its pattern totals must equal the oracle-checked batch census."""
    import re as _re

    from database_toolbox_spark.operators.events import (
        _CEP_PATTERNS,
        event_pattern_matches,
    )
    from database_toolbox_spark.streaming import stream_pattern_alerts

    _run_to_memory(stream_pattern_alerts(stream), "cep_out", "update")
    got = {
        (r.user_id, r.day): (
            r.m_view_to_purchase,
            r.m_error_burst,
            r.m_signup_then_click,
            r.m_click_abandoned,
        )
        for r in spark.sql("SELECT * FROM cep_out").collect()
    }

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "user_id",
            # nanos fixtures read ts as LONG: normalize via load-free cast
            "CAST(CAST(ts AS TIMESTAMP) AS STRING) AS tss",
            "event_id",
            "event_type",
        )
        .toPandas()
    )
    ev["day"] = ev["tss"].str[:10]
    seqs: dict[tuple, str] = {}
    for r in ev.sort_values(["user_id", "tss", "event_id"]).itertuples():
        seqs[(r.user_id, r.day)] = (
            seqs.get((r.user_id, r.day), "") + r.event_type[0]
        )
    last_day = {}
    for uid, day in seqs:
        last_day[uid] = max(last_day.get(uid, ""), day)

    expected_done = {
        k: tuple(len(_re.findall(p, s)) for _, p in _CEP_PATTERNS)
        for k, s in seqs.items()
        if k[1] != last_day[k[0]]
    }
    assert got == expected_done

    # stream totals + finalized open days == batch census
    batch = {
        r.pattern: (r.n_streams_matched, r.total_matches)
        for r in event_pattern_matches(spark, SF_DIR).collect()
    }
    for i, (name, pat) in enumerate(_CEP_PATTERNS):
        n_matched = sum(1 for c in expected_done.values() if c[i] > 0)
        total = sum(c[i] for c in expected_done.values())
        for k, s in seqs.items():
            if k[1] == last_day[k[0]]:
                c = len(_re.findall(pat, s))
                n_matched += 1 if c > 0 else 0
                total += c
        assert batch[name] == (n_matched, total), name


def test_cep_late_event_guard():
    """A late cross-batch event (day < cur_day) must be DROPPED: it must
    not finalize/emit the open day early, and it must not re-open the
    already-finalized old day (ADVICE r9: premature finalization broke
    the claimed batch byte-equality under out-of-order delivery)."""
    import pandas as pd

    from database_toolbox_spark.operators.events import _CEP_PATTERNS
    from database_toolbox_spark.streaming.stream_ops import _cep_alerts_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists, self._v = True, v

    fn = _cep_alerts_fn(tuple(_CEP_PATTERNS))
    st = FakeState()

    def batch(rows):
        return iter(
            [
                pd.DataFrame(
                    {
                        "ts": pd.to_datetime([r[0] for r in rows]),
                        "event_id": range(len(rows)),
                        "event_type": [r[1] for r in rows],
                    }
                )
            ]
        )

    # batch 1: day1 closes (view, purchase), day2 opens (click)
    out1 = list(
        fn((7,), batch([
            ("2024-01-01 01:00", "view"),
            ("2024-01-01 02:00", "purchase"),
            ("2024-01-02 01:00", "click"),
        ]), st)
    )
    assert len(out1) == 1 and list(out1[0]["day"]) == ["2024-01-01"]
    assert out1[0].iloc[0]["m_view_to_purchase"] == 1
    assert st.get == ("2024-01-02", "c")

    # batch 2: a LATE day-1 event arrives -> dropped; day2 stays open
    out2 = list(fn((7,), batch([("2024-01-01 03:00", "error")]), st))
    assert out2 == []  # nothing emitted: day2 not finalized early
    assert st.get == ("2024-01-02", "c")  # day1 not re-opened

    # batch 3: day3 opens -> day2 finalizes with ONLY its own events
    out3 = list(fn((7,), batch([("2024-01-03 01:00", "view")]), st))
    assert len(out3) == 1 and list(out3[0]["day"]) == ["2024-01-02"]
    assert st.get == ("2024-01-03", "v")


def test_stream_count_min_matches_batch_cells(spark, stream):
    """The streaming CMS's final cells must equal a Python-computed batch
    sketch over the same fixture — CMS cells are plain sums, so the
    mergeable-state claim is exact equality, not tolerance."""
    import hashlib

    import numpy as np

    from database_toolbox_spark.operators.sketches import CMS_D, CMS_W
    from database_toolbox_spark.streaming import stream_count_min

    _run_to_memory(stream_count_min(stream), "cms_out", "update")
    # update mode: counts are monotone, so the max per (r, bucket) is the
    # final state
    got = {
        (r.r, r.bucket): r.cell
        for r in spark.sql(
            "SELECT r, bucket, max(cell) AS cell FROM cms_out "
            "GROUP BY r, bucket"
        ).collect()
    }

    items = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type")
        .toPandas()["event_type"]
    )
    cms = np.zeros((CMS_D, CMS_W), dtype="int64")
    for item, n in items.value_counts().items():
        for r in range(CMS_D):
            b = int(hashlib.md5(f"{item}#{r}".encode()).hexdigest()[:8],
                    16) % CMS_W
            cms[r, b] += int(n)
    expected = {
        (r, b): int(cms[r, b])
        for r in range(CMS_D)
        for b in range(CMS_W)
        if cms[r, b]
    }
    assert got == expected


def test_stream_decontamination_matches_batch(spark, tmp_path):
    """The ingest-time leakage screen over two micro-batches must flag
    exactly the docs the batch operator flags, with identical counts and
    fractions — the static eval-gram broadcast makes every doc's verdict
    independent of arrival order."""
    from database_toolbox_spark.operators.dedup import (
        DECON_EVAL_SOURCE,
        ngram_decontamination,
    )
    from database_toolbox_spark.streaming import (
        decon_eval_grams,
        read_decon_flags,
        read_docs_source_stream,
        stream_decontamination,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    n = docs.count()
    src = tmp_path / "docs_src"
    docs.where(f"doc_id < {n // 2}").coalesce(1).write.parquet(
        str(src / "slice=0")
    )
    docs.where(f"doc_id >= {n // 2}").coalesce(1).write.parquet(
        str(src / "slice=1")
    )
    ev = decon_eval_grams(docs)
    assert ev.count() > 0

    q = stream_decontamination(
        read_docs_source_stream(spark, f"{src}/slice=*"),
        eval_grams=ev,
        flags_dir=str(tmp_path / "flags"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(120)

    streamed = {
        (r.doc_id, r.source, r.n_hit, r.n_eval_docs, r.n_grams,
         r.contaminated_frac)
        for r in read_decon_flags(spark, str(tmp_path / "flags")).collect()
    }
    batch = {
        tuple(r)
        for r in ngram_decontamination(spark, sf_dir).collect()
    }
    assert batch, "fixture must contain contaminated docs"
    # the batch op truncates to ORDER BY n_hit LIMIT DECON_TOP while the
    # stream flags every contaminated doc; the set-equality below is only
    # meaningful while the fixture's contaminated count fits under the
    # head — guard it explicitly so fixture growth fails LOUDLY here
    # instead of as a spurious set diff (round-11 ADVICE item 4)
    from database_toolbox_spark.operators.dedup import DECON_TOP

    assert len(batch) < DECON_TOP, (
        f"fixture now has >= DECON_TOP ({DECON_TOP}) contaminated docs; "
        "compare the stream against an un-limited batch query instead"
    )
    assert streamed == batch
    # and no eval doc was ever flagged as training
    assert not any(s == DECON_EVAL_SOURCE for _d, s, *_rest in streamed)


def test_stream_doremi_matches_batch(spark, tmp_path):
    """The two-phase streaming DoReMi twin — micro-batch integer
    gradient partials, frozen weight vector, micro-batch per-domain loss
    partials, shared closed-form tail — must reproduce the batch op's
    rows byte-for-byte: integer folds are order-free and the weight
    doubles follow the identical IEEE sequence."""
    from database_toolbox_spark.operators.curation import (
        doremi_domain_weights,
    )
    from database_toolbox_spark.streaming import (
        doremi_stream_final,
        doremi_stream_weights,
        read_docs_lang_stream,
        stream_doremi_gradient,
        stream_doremi_losses,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "lang", "text"
    )
    n = docs.count()
    src = tmp_path / "docs_src"
    docs.where(f"doc_id < {n // 2}").coalesce(1).write.parquet(
        str(src / "slice=0")
    )
    docs.where(f"doc_id >= {n // 2}").coalesce(1).write.parquet(
        str(src / "slice=1")
    )

    q = stream_doremi_gradient(
        read_docs_lang_stream(spark, f"{src}/slice=*"),
        grad_dir=str(tmp_path / "grad"),
        checkpoint_dir=str(tmp_path / "ckpt_g"),
    ).start()
    q.awaitTermination(120)
    weights = doremi_stream_weights(spark, str(tmp_path / "grad"))
    assert len(weights) == 4

    q = stream_doremi_losses(
        read_docs_lang_stream(spark, f"{src}/slice=*"),
        weights,
        loss_dir=str(tmp_path / "loss"),
        checkpoint_dir=str(tmp_path / "ckpt_l"),
    ).start()
    q.awaitTermination(120)

    streamed = [
        tuple(r)
        for r in doremi_stream_final(
            spark, str(tmp_path / "loss")
        ).collect()
    ]
    batch = [
        tuple(r) for r in doremi_domain_weights(spark, sf_dir).collect()
    ]
    assert batch and streamed == batch
