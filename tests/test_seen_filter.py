"""Bloom prefilter must never change results vs the exact anti-join
(SURVEY §7 build step 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from judyst_web_crawler_spark.functions import canonical as C
from judyst_web_crawler_spark.operators.seen import SeenFilter, filter_new_exact


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
