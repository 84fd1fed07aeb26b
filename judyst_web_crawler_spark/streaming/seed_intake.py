"""Streaming seed intake: a continuous crawl fed by arriving seed files.

The reference crawls a fixed seed list in one sequential pass
(ksrf.py:163-200). At production scale seeds arrive continuously
(sitemap diffs, discovered-link feeds, recrawl schedules), so the engine
exposes the same wave machinery behind a Structured-Streaming source:

    seeds dir (files arriving)  →  readStream
        →  foreachBatch: FrontierEngine.enqueue + drain waves
        →  snapshot tables (documents / seen / done / metrics)

Exactly-once per URL across batches falls out of the engine's own state,
not the stream: every wave's seen-filter (bloom + exact anti-join)
drops URLs any earlier batch already scheduled, so re-delivered or
duplicated seeds are no-ops. A crash between the engine's snapshot
commits and the streaming checkpoint replays the batch; the replay's
enqueue appends already-seen URLs that the next wave filters out —
at-least-once delivery collapses to exactly-once effects (same argument
as the rollup sink's batch_id dedup in streaming/rollup.py).

One foreachBatch = enqueue + FULL drain (waves until pending is empty),
so politeness budgets still bound per-host fetch rates inside every
micro-batch.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from judyst_web_crawler_spark.operators.frontier import FRONTIER_TABLE

SEEDS_SCHEMA = "url string, page_seq int, intra_page_seq int"


def stream_seeds(
    spark: SparkSession, path: str, glob: str | None = None, schema: str = SEEDS_SCHEMA
) -> DataFrame:
    """File-source stream of seed rows (FIXTURES.md §2 shape)."""
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(path)


def run_streaming_crawl(
    seeds_stream: DataFrame,
    engine: Any,
    pages: DataFrame,
    checkpoint_dir: str,
    budget: int = 50,
    n_salts: int = 1,
    max_waves: int = 100,
) -> list[dict]:
    """Drain all available seed files through the frontier engine.

    Returns the concatenated per-wave stats across micro-batches
    (availableNow trigger → returns when the backlog is consumed; a
    production deployment uses a processing-time trigger instead).
    """
    all_stats: list[dict] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # the shared constant, not a string literal: a drifted name here
        # would make exists() False every batch and bootstrap() would
        # OVERWRITE the frontier, silently dropping pending urls
        if engine.catalog.exists(FRONTIER_TABLE):
            engine.enqueue(batch_df, depth=0)
        else:
            engine.bootstrap(batch_df)
        stats = engine.run(pages, budget=budget, n_salts=n_salts, max_waves=max_waves)
        for s in stats:
            s["batch_id"] = batch_id
        all_stats.extend(stats)

    q = (
        seeds_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return all_stats
