"""Bloom prefilter must never change results vs the exact anti-join
(SURVEY §7 build step 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from judyst_web_crawler_spark.functions import canonical as C
from judyst_web_crawler_spark.operators.seen import (
    SeenFilter,
    ShardedBloom,
    filter_new_exact,
)


def _urls(spark, start, n, prefix="http://h.ru/doc"):
    return spark.range(start, start + n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string"), F.lit(".pdf")).alias("url")
    ).withColumn("key_hash", C.key_hash(C.canonical_key("url")))


def test_bloom_equals_exact(spark):
    seen = _urls(spark, 0, 5000)
    candidates = _urls(spark, 2500, 5000)  # half overlap
    sf = SeenFilter(spark, seen, "key_hash")
    got = {r["url"] for r in sf.filter_new(candidates).collect()}
    want = {r["url"] for r in filter_new_exact(candidates, seen, "key_hash").collect()}
    assert got == want
    assert len(want) == 2500


def test_bloom_prefilter_prunes(spark):
    """Sanity: the bloom actually classifies most non-members as
    definitely-new (prune effectiveness, not just correctness)."""
    seen = _urls(spark, 0, 4000)
    fresh = _urls(spark, 100000, 4000)
    sf = SeenFilter(spark, seen, "key_hash")
    mc = sf.might_contain_udf()
    fp = fresh.select(mc(F.col("key_hash")).alias("m")).filter(F.col("m")).count()
    assert fp < 4000 * 0.05  # fpp well under 5% at 12 bits/item
    members = seen.select(mc(F.col("key_hash")).alias("m")).filter(~F.col("m")).count()
    assert members == 0  # no false negatives, ever


def test_sharded_bloom_equals_exact(spark):
    seen = spark.range(500).select((F.xxhash64("id")).alias("key_hash"))
    cands = spark.range(300, 900).select((F.xxhash64("id")).alias("key_hash"))
    sb = ShardedBloom(n_shards=8, bits_per_shard=1 << 16)
    sb.add_df(seen)
    got = {r["key_hash"] for r in sb.filter_new(cands, seen).collect()}
    want = {r["key_hash"] for r in filter_new_exact(cands, seen).collect()}
    assert got == want  # bloom FPs routed through the exact anti-join


def test_sharded_bloom_incremental_add(spark):
    batch1 = spark.range(200).select(F.xxhash64("id").alias("key_hash"))
    batch2 = spark.range(200, 400).select(F.xxhash64("id").alias("key_hash"))
    sb = ShardedBloom(n_shards=4, bits_per_shard=1 << 15)
    sb.add_df(batch1)
    sb.add_df(batch2)
    all_seen = batch1.unionByName(batch2)
    # every added key must test positive (no false negatives, ever)
    mc = sb.might_contain_udf(spark)
    hits = all_seen.select(mc(F.col("key_hash")).alias("h")).collect()
    assert all(r["h"] for r in hits)
    # shards actually spread across the range
    import numpy as np

    ks = np.array([r["key_hash"] for r in all_seen.collect()], dtype=np.int64)
    assert len(set(sb.shard_of(ks).tolist())) >= 3


def test_engine_with_sharded_bloom(spark, tmp_path):
    from judyst_web_crawler_spark.datagen import pages_df
    from judyst_web_crawler_spark.operators.frontier import DOCS_TABLE, FrontierEngine
    from judyst_web_crawler_spark.sources.catalog import SnapshotCatalog
    from pyspark.sql import Window

    pages = pages_df(spark, n_rows=40, n_hosts=3, seed=21).cache()
    seeds = (
        pages.select("url")
        .withColumn("_rn", F.row_number().over(Window.orderBy("url")))
        .select("url", F.lit(2).alias("page_seq"), F.col("_rn").cast("int").alias("intra_page_seq"))
    )
    # duplicate tail exercises the sharded seen filter across waves
    seeds = seeds.unionByName(seeds.limit(15))
    cat = SnapshotCatalog(spark, str(tmp_path / "cat"))
    eng = FrontierEngine(spark, cat, use_bloom=True, bloom_shards=8)
    eng.bootstrap(seeds)
    eng.run(pages, budget=9, max_waves=30)
    docs = cat.read(DOCS_TABLE)
    assert docs.count() == 40
    assert docs.select("url").distinct().count() == 40
    pages.unpersist()
