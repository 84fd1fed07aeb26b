"""Benchmark entry point (driver-run, per-round).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
     "frontier": {...}}

- headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  on local[$SPARK_GRAFT_CPUS];
- the frontier benchmark (the north-rule metric: URLs scheduled+deduped/sec)
  runs over a deterministic synthetic pages table of the BASELINE.json:15
  shape, sized by the sf of the input dir, written to parquet first so the
  engine benchmarks real scans;
- ``--scaling`` additionally re-runs the frontier job at two parallelism
  levels (local[8] vs local[32] — the sandbox stand-in for N vs 4N
  executors, BASELINE.json:2) in fresh subprocesses and reports throughput
  at both plus scaling efficiency.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "events_hourly_rollup",
    "events_sessionize",
    "events_json_props",
    "dedup_first_wins",
    "budget_topk",
    "seen_anti_join",
    "text_quality",
    "text_fingerprint",
    "minhash_near_dup",
    "simhash_near_dup",
    "similarity_topk",
    "ann_topk",
]


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def _force(df) -> int:
    """Execute a plan end-to-end without driver-side row transfer."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_frontier(spark, sf: float, n_salts: int = 4) -> dict:
    """North-rule metric: URLs scheduled+deduped per second, end-to-end
    (seen-filter + first-wins dedup + politeness top-k + extract UDF +
    snapshot commits), over a parquet pages table with skewed hosts and
    ~25% duplicate seeds."""
    from pyspark.sql import functions as F

    from judyst_web_crawler_spark import datagen
    from judyst_web_crawler_spark.operators.frontier import FrontierEngine
    from judyst_web_crawler_spark.sources.catalog import SnapshotCatalog

    n_urls = max(2000, int(1_500_000 * sf))
    work = tempfile.mkdtemp(prefix="jwcs-bench-")
    try:
        pages_path = os.path.join(work, "pages")
        datagen.pages_df(spark, n_rows=n_urls, n_hosts=200, with_oracle_text=False).write.parquet(pages_path)
        pages = spark.read.parquet(pages_path)

        # seed stream = every page once + a 25% duplicate tail (dedup work)
        base = pages.select(
            "url",
            (F.xxhash64("url") % 50).cast("int").alias("page_seq"),
            (F.xxhash64("url", F.lit(1)) % 100).cast("int").alias("intra_page_seq"),
        )
        dups = base.filter(F.pmod(F.xxhash64("url", F.lit(2)), F.lit(4)) == 0).withColumn(
            "page_seq", F.col("page_seq") + 50
        )
        seeds = base.unionByName(dups)
        n_seeds = seeds.count()

        cat = SnapshotCatalog(spark, os.path.join(work, "cat"))
        eng = FrontierEngine(spark, cat, use_bloom=True)
        t0 = time.monotonic()
        eng.bootstrap(seeds)
        # the skewed giant host holds ~17% of urls; budget n/10 drains it
        # in ~2 politeness waves without degenerating to one mega-wave
        budget = max(1, n_urls // 10)
        stats = eng.run(pages, budget=budget, n_salts=n_salts, max_waves=12)
        elapsed = time.monotonic() - t0
        scheduled = sum(s["scheduled"] for s in stats)
        return {
            "n_seed_urls": n_seeds,
            "scheduled": scheduled,
            "waves": len(stats),
            "elapsed_s": round(elapsed, 2),
            "urls_per_sec": round(n_seeds / elapsed, 1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        _force(fn(spark, SF_DIR))
        out[name] = round(time.monotonic() - t0, 3)
    return out


def run_scaling() -> dict:
    """Same frontier job, same input size, at local[8] vs local[32]
    (N vs 4N cores). Fresh subprocess per level so JVM state is clean."""
    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=SF_DIR)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--frontier-only"],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)["frontier"]
    t8 = results["8"]["urls_per_sec"]
    t32 = results["32"]["urls_per_sec"]
    return {
        "local8_urls_per_sec": t8,
        "local32_urls_per_sec": t32,
        "speedup": round(t32 / t8, 3),
        "efficiency_vs_4x_cores": round((t32 / t8) / 4.0, 3),
    }


def main() -> None:
    frontier_only = "--frontier-only" in sys.argv
    scaling = "--scaling" in sys.argv

    if scaling:
        res = run_scaling()
        print(json.dumps({"scaling": res, "sf": _sf_of(SF_DIR)}))
        return

    from judyst_web_crawler_spark.session import get_spark

    spark = get_spark("jwcs-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = _sf_of(SF_DIR)

    frontier = bench_frontier(spark, sf)
    if frontier_only:
        print(json.dumps({"frontier": frontier, "sf": sf}))
        return

    queries = run_queries(spark)
    total = round(sum(queries.values()) + frontier["elapsed_s"], 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_frontier_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "frontier": frontier,
            }
        )
    )


if __name__ == "__main__":
    main()
