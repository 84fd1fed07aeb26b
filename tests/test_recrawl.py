"""Recrawl scheduling: stale-first ranking from warc_ts and its mapping
onto the frontier's (page_seq, intra_page_seq) priority vocabulary."""

from __future__ import annotations

from pyspark.sql import functions as F

from judyst_web_crawler_spark.operators import recrawl as RC
from judyst_web_crawler_spark.operators.politeness import budget_topk

NOW = 1_000_000


def _pages(spark):
    rows = [
        ("http://a.example/1", "a.example", 100),     # oldest on a
        ("http://a.example/2", "a.example", 5_000),
        ("http://a.example/3", "a.example", 900_000),  # too fresh at gate
        ("http://b.example/1", "b.example", 200),
        ("http://b.example/2", "b.example", 199),      # oldest on b
    ]
    return spark.createDataFrame(
        [(u, h, t) for u, h, t in rows], "url string, host string, epoch long"
    ).select("url", "host", F.timestamp_seconds("epoch").alias("warc_ts"))


def test_stale_rank_oldest_first_with_gate(spark):
    got = {
        r["url"]: (r["stale_rank"], r["age_s"])
        for r in RC.stale_rank(_pages(spark), NOW, min_age_s=500_000).collect()
    }
    assert got["http://a.example/1"][0] == 1
    assert got["http://a.example/2"][0] == 2
    assert "http://a.example/3" not in got          # age 100k < gate
    assert got["http://b.example/2"][0] == 1        # 199 < 200 → older
    assert got["http://a.example/1"][1] == NOW - 100


def test_per_host_k_bounds_candidates(spark):
    out = RC.stale_rank(_pages(spark), NOW, per_host_k=1).collect()
    assert {r["url"] for r in out} == {"http://a.example/1", "http://b.example/2"}


def test_recrawl_seeds_drive_budget_topk_oldest_first(spark):
    seeds = (
        RC.recrawl_seeds(_pages(spark), NOW)
        .withColumn("depth", F.lit(0))
        .withColumn("host", F.expr("parse_url(url, 'HOST')"))
    )
    sel = budget_topk(seeds, default_budget=1)
    got = {r["host"]: r["url"] for r in sel.collect()}
    assert got["a.example"] == "http://a.example/1"
    assert got["b.example"] == "http://b.example/2"


def test_host_derived_when_absent(spark):
    pages = _pages(spark).drop("host")
    out = RC.stale_rank(pages, NOW).collect()
    assert {r["host"] for r in out} == {"a.example", "b.example"}
