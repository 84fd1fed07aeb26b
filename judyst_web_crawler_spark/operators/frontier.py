"""The frontier engine: priority waves over snapshot tables, resumable.

End-to-end slice per wave (SURVEY §7 minimum slice; flagship entry):

    frontier(pending) ──anti-join──► new-vs-seen (bloom prefilter + exact)
        │
        ├─ robots filter (broadcast politeness table)
        ├─ per-host budget top-k, priority (depth, page_seq, intra_seq)
        ▼
    fetch stand-in: join selected urls to the pages table (html BINARY)
        ▼
    extract_text_udf (byte-identical reference pipeline, P5+P7+P9)
        ▼
    commit: documents += wave output, seen += scheduled keys,
            frontier statuses updated, per-partition metrics appended
            (all snapshot commits — crash-safe resume, law_codes.py:752-776
            checkpoint semantics re-hosted on snapshots)

Scale notes: the frontier and seen tables are written hash-partitioned by
``key_hash`` buckets; every per-wave join below is either broadcast
(politeness) or key-hash equi-join (seen, pages) so Catalyst/AQE handle
physical strategy; nothing in the loop collects rows to the driver except
scalar counts and the OR-merged bloom shards.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from judyst_web_crawler_spark.functions import canonical as C
from judyst_web_crawler_spark.functions.extraction import extract_text_udf
from judyst_web_crawler_spark.operators.politeness import apply_robots, budget_topk
from judyst_web_crawler_spark.operators.seen import SeenFilter, filter_new_exact
from judyst_web_crawler_spark.sources.catalog import SnapshotCatalog

FRONTIER_TABLE = "frontier_state"
SEEN_TABLE = "seen"
DOCS_TABLE = "documents"
METRICS_TABLE = "metrics"


class FrontierEngine:
    def __init__(self, spark: SparkSession, catalog: SnapshotCatalog, politeness: DataFrame | None = None, use_bloom: bool = True):
        self.spark = spark
        self.catalog = catalog
        self.politeness = politeness
        self.use_bloom = use_bloom

    # -- bootstrap ---------------------------------------------------------

    def bootstrap(self, seeds: DataFrame) -> None:
        """Seed the frontier. ``seeds``: url, page_seq, intra_page_seq
        (FIXTURES.md §2); host/depth/priority_band derived here."""
        frontier = (
            seeds.withColumn("host", C.url_host("url"))
            .withColumn("depth", F.lit(0))
            .withColumn("canonical_url", C.canonical_key("url"))
            .withColumn("key_hash", C.key_hash(C.canonical_key("url")))
            .withColumn("priority_band", F.least(F.col("page_seq"), F.lit(9)))
            .withColumn("status", F.lit("pending"))
            .select(
                "url", "host", "depth", "page_seq", "intra_page_seq",
                "priority_band", "status", "canonical_url", "key_hash",
            )
        )
        self.catalog.overwrite(FRONTIER_TABLE, frontier)

    # -- wave --------------------------------------------------------------

    def pending(self) -> DataFrame:
        return self.catalog.read(FRONTIER_TABLE).filter(F.col("status") == "pending")

    def next_wave_id(self) -> int:
        if not self.catalog.exists(METRICS_TABLE):
            return 0
        row = self.catalog.read(METRICS_TABLE).agg(F.max("wave").alias("w")).collect()[0]
        return (row["w"] if row["w"] is not None else -1) + 1

    def run_wave(
        self,
        pages: DataFrame,
        budget: int = 2,
        n_salts: int = 1,
        wave: int | None = None,
    ) -> dict:
        """One politeness-respecting fetch+extract wave. Returns metrics."""
        t0 = time.monotonic()
        wave = self.next_wave_id() if wave is None else wave
        frontier = self.pending()

        # 1. seen filter (exact; bloom prefilter when the table is big)
        if self.catalog.exists(SEEN_TABLE):
            seen = self.catalog.read(SEEN_TABLE)
            if self.use_bloom:
                new = SeenFilter(self.spark, seen, "key_hash").filter_new(frontier)
            else:
                new = filter_new_exact(frontier, seen, "key_hash")
        else:
            new = frontier
        dedup_input = frontier.count()

        # first-wins WITHIN the wave too (reference D1 is first-wins over
        # the whole discovery stream): one row per canonical key, best
        # priority survives
        w_key = Window.partitionBy("key_hash").orderBy(
            F.col("depth").asc(), F.col("page_seq").asc(), F.col("intra_page_seq").asc()
        )
        new = (
            new.withColumn("_kr", F.row_number().over(w_key))
            .filter(F.col("_kr") == 1)
            .drop("_kr")
        )
        new = new.localCheckpoint(eager=True)  # cut lineage across wave loop
        new_count = new.count()

        # 2. politeness: robots + budget top-k per host
        selected = new
        if self.politeness is not None:
            selected = apply_robots(selected, self.politeness)
        selected = budget_topk(selected, self.politeness, default_budget=budget, n_salts=n_salts)
        selected = selected.localCheckpoint(eager=True)

        # 3. fetch stand-in + extract (SURVEY §2.1 S3: html column IS the payload)
        fetched = selected.join(pages.select("url", "html"), on="url", how="left")
        docs = fetched.select(
            "url", "host", "depth", "page_seq", "intra_page_seq", "key_hash",
            extract_text_udf(F.col("html")).alias("text"),
        ).withColumn("wave", F.lit(wave))
        # materialize once; every commit below reuses it (extract UDF
        # runs exactly one pass per wave)
        docs = docs.localCheckpoint(eager=True)

        # 4. per-partition lineage metrics (FIXTURES.md §6)
        part_metrics = docs.groupBy(F.spark_partition_id().alias("partition_id")).agg(
            F.count(F.lit(1)).alias("fetch_count"), F.max("depth").alias("depth")
        ).withColumn("wave", F.lit(wave))

        # 5. commits (each an atomic snapshot)
        self.catalog.append(DOCS_TABLE, docs)
        scheduled_keys = docs.select(
            "key_hash", F.col("url").alias("url"), F.lit(wave).alias("first_seen_wave")
        )
        if self.catalog.exists(SEEN_TABLE):
            self.catalog.append(SEEN_TABLE, scheduled_keys)
        else:
            self.catalog.overwrite(SEEN_TABLE, scheduled_keys)

        fetched_urls = docs.select("url")
        frontier_all = self.catalog.read(FRONTIER_TABLE)
        updated = (
            frontier_all.join(fetched_urls.withColumn("_done", F.lit(True)), on="url", how="left")
            .withColumn(
                "status",
                F.when(F.col("_done") & (F.col("status") == "pending"), F.lit("fetched")).otherwise(F.col("status")),
            )
            .drop("_done")
        )
        self.catalog.overwrite(FRONTIER_TABLE, updated)

        scheduled = docs.count()
        elapsed = time.monotonic() - t0
        dedup_hits = dedup_input - new_count
        metrics_df = part_metrics.select(
            "wave", "partition_id", "depth", "fetch_count",
            F.lit(dedup_hits).alias("dedup_hits"),
            F.lit(dedup_hits / dedup_input if dedup_input else 0.0).alias("dedup_hit_rate"),
            F.lit(elapsed).alias("elapsed_s"),
        )
        if self.catalog.exists(METRICS_TABLE):
            self.catalog.append(METRICS_TABLE, metrics_df)
        else:
            self.catalog.overwrite(METRICS_TABLE, metrics_df)
        return {
            "wave": wave,
            "frontier_pending": dedup_input,
            "new_after_seen": new_count,
            "scheduled": scheduled,
            "dedup_hits": dedup_hits,
            "elapsed_s": elapsed,
        }

    def run(self, pages: DataFrame, budget: int = 2, n_salts: int = 1, max_waves: int = 100) -> list[dict]:
        """Wave loop until the frontier drains (reference's page loop
        ksrf.py:107 re-expressed as batch waves)."""
        stats = []
        for _ in range(max_waves):
            if self.pending().limit(1).count() == 0:
                break
            m = self.run_wave(pages, budget=budget, n_salts=n_salts)
            stats.append(m)
            if m["scheduled"] == 0:
                # pending urls remain but none are schedulable (robots-denied
                # or seen) — mark them skipped to drain
                frontier_all = self.catalog.read(FRONTIER_TABLE)
                self.catalog.overwrite(
                    FRONTIER_TABLE,
                    frontier_all.withColumn(
                        "status",
                        F.when(F.col("status") == "pending", F.lit("skipped")).otherwise(F.col("status")),
                    ),
                )
                break
        return stats
