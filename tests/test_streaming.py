"""Streaming/batch parity: the incremental rollup and stateful
sessionizer must equal their batch equivalents on the same input,
delivered across multiple micro-batches with a restart in between."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from judyst_web_crawler_spark.sources.catalog import SnapshotCatalog
from judyst_web_crawler_spark.streaming import rollup as R


def _events(spark, start_id: int, n: int):
    base_epoch = 1546300800
    return spark.range(start_id, start_id + n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            # monotonic in id, with a >30min jump every 50 ids so the
            # sessionizer sees real gaps at user-dependent positions
            F.lit(base_epoch) + F.col("id") * 137 + F.floor(F.col("id") / 50) * 25000
        ).alias("ts"),
        F.pmod(F.col("id"), 7).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("buy")),
            (F.pmod(F.col("id"), 3) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("id"), 100) / 10.0).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )


def _batch_rollup(df):
    return (
        df.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def test_stream_rollup_equals_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    cat = SnapshotCatalog(spark, str(tmp_path / "cat"))

    # micro-batch 1
    _events(spark, 0, 400).write.mode("append").parquet(src)
    stream = R.hourly_rollup_stream(R.stream_events(spark, src))
    R.run_to_catalog(stream, cat, "rollup", ckpt)

    # micro-batch 2 arrives later; restart the query from the checkpoint
    _events(spark, 400, 300).write.mode("append").parquet(src)
    stream = R.hourly_rollup_stream(R.stream_events(spark, src))
    R.run_to_catalog(stream, cat, "rollup", ckpt)

    got = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in cat.read("rollup").collect()
    }
    want_df = _batch_rollup(spark.read.parquet(src))
    want = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in want_df.collect()
    }
    # append-mode emits only watermark-finalized windows; every emitted
    # window must match the batch result exactly and be emitted once
    assert got
    assert len(got) == cat.read("rollup").count()  # no duplicate windows
    for k, v in got.items():
        assert want[k] == v


def test_stream_sessionize_equals_batch(spark, tmp_path):
    src = str(tmp_path / "events2")
    ckpt = str(tmp_path / "ckpt2")
    cat = SnapshotCatalog(spark, str(tmp_path / "cat2"))

    _events(spark, 0, 300).write.mode("append").parquet(src)
    R.run_to_catalog(
        R.sessionize_stream(R.stream_events(spark, src)), cat, "sessions", ckpt, mode="update"
    )
    _events(spark, 300, 300).write.mode("append").parquet(src)
    R.run_to_catalog(
        R.sessionize_stream(R.stream_events(spark, src)), cat, "sessions", ckpt, mode="update"
    )

    # last update per user wins
    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    final = (
        cat.read("sessions")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in final.collect()}

    all_events = spark.read.parquet(src)
    wb = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("long")
    marked = all_events.withColumn(
        "new_session",
        F.when(
            (epoch - F.lag(epoch).over(wb)).isNull()
            | ((epoch - F.lag(epoch).over(wb)) > 1800),
            1,
        ).otherwise(0),
    )
    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in marked.groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .collect()
    }
    assert got == want


def test_stream_sessionize_tws_equals_batch(spark, tmp_path):
    """Spark-4 transformWithState variant: same sessions as the
    applyInPandasWithState path and the batch window oracle, across two
    micro-batch rounds with a restart. Needs the RocksDB state store."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState needs the protobuf state-server protocol "
        "(not shipped in this container; applyInPandasWithState path covers "
        "stateful streaming here)",
    )
    src = str(tmp_path / "events3")
    ckpt = str(tmp_path / "ckpt3")
    cat = SnapshotCatalog(spark, str(tmp_path / "cat3"))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _events(spark, 0, 300).write.mode("append").parquet(src)
        R.run_to_catalog(
            R.sessionize_stream_tws(R.stream_events(spark, src)),
            cat, "sessions_tws", ckpt, mode="update",
        )
        _events(spark, 300, 300).write.mode("append").parquet(src)
        R.run_to_catalog(
            R.sessionize_stream_tws(R.stream_events(spark, src)),
            cat, "sessions_tws", ckpt, mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    final = (
        cat.read("sessions_tws")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in final.collect()}

    all_events = spark.read.parquet(src)
    wb = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("long")
    marked = all_events.withColumn(
        "new_session",
        F.when(
            (epoch - F.lag(epoch).over(wb)).isNull()
            | ((epoch - F.lag(epoch).over(wb)) > 1800),
            1,
        ).otherwise(0),
    )
    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in marked.groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .collect()
    }
    assert got == want
