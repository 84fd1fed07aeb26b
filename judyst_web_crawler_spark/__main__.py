"""CLI entry point — ``python -m judyst_web_crawler_spark``.

The reference boots its crawler from ``__main__`` (web_crawler
__main__.py:1-19: build sources, wrap in WebCrawler). The Spark engine's
equivalent bootstraps a SparkSession + catalog-backed WebCrawler and
runs a demo crawl wave over synthetic pages, printing per-wave metrics —
the same end-to-end path the verify flow drives.

Usage:
    python -m judyst_web_crawler_spark [--catalog DIR] [--pages N]
        [--hosts N] [--budget N] [--master local[8]]
"""

from __future__ import annotations

import argparse
import sys
import tempfile


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="judyst_web_crawler_spark")
    ap.add_argument("--catalog", default=None, help="catalog root dir (default: temp)")
    ap.add_argument("--pages", type=int, default=300)
    ap.add_argument("--hosts", type=int, default=6)
    ap.add_argument("--budget", type=int, default=50)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args(argv)

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from judyst_web_crawler_spark import api
    from judyst_web_crawler_spark.datagen import pages_df
    from judyst_web_crawler_spark.operators.frontier import DOCS_TABLE, FrontierEngine
    from judyst_web_crawler_spark.session import get_spark

    spark = get_spark("jwcs-cli", master=args.master)
    root = args.catalog or tempfile.mkdtemp(prefix="jwcs-cli-")
    crawler = api.init(spark, root)
    source = crawler.get_data_source("CatalogSource")
    if source is None:
        print(f"error: catalog source failed to prepare (root: {root})", file=sys.stderr)
        return 1
    print(f"catalog: {root}; prepared sources: {sorted(crawler.available_sources)}")

    pages = pages_df(spark, n_rows=args.pages, n_hosts=args.hosts).cache()
    seeds = (
        pages.select("url")
        .withColumn("_rn", F.row_number().over(Window.orderBy("url")))
        .select("url", F.lit(0).alias("page_seq"), F.col("_rn").cast("int").alias("intra_page_seq"))
    )
    eng = FrontierEngine(spark, source.catalog)
    eng.bootstrap(seeds)
    for stats in eng.run(pages, budget=args.budget):
        print(f"wave {stats['wave']}: scheduled={stats['scheduled']}")
    docs = source.catalog.read(DOCS_TABLE)
    print(f"documents: {docs.count()} rows; distinct urls: {docs.select('url').distinct().count()}")
    pages.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
