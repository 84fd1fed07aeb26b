"""Bucketed (co-located) join support for the seen-set anti-join.

The per-wave seen filter is `pending LEFT ANTI JOIN seen ON key_hash`
(frontier.py). With plain parquet both sides shuffle on key_hash every
wave — at 10¹⁰ seen keys that shuffle IS the wave cost. Spark's
bucketed tables fix this structurally: writing both sides bucketed by
the SAME column into the SAME bucket count lets the join execute with
ZERO exchanges (each task reads bucket i of both sides — the hash-range
partitioning of the seen-set the north star names). Plan-asserted in
tests/test_plans.py: the bucketed anti-join has no shuffle.

Bucketed writes require a catalog table (`saveAsTable`) rather than a
path — Spark records the bucket spec in table metadata, which is what
lets the planner drop the exchanges. The SnapshotCatalog stays the
source of truth for snapshots/time travel; this module is the
join-locality layer you materialize the CURRENT seen snapshot into when
the crawl is long enough for the per-wave shuffle to dominate (the
break-even is roughly when |seen| >> per-wave pending).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "key_hash",
    n_buckets: int = 64,
) -> None:
    """Overwrite ``table`` bucketed+sorted by ``bucket_col``. Pick
    ``n_buckets`` ≈ cluster cores at the target scale — it fixes join
    parallelism for every consumer."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def colocated_anti_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str = "key_hash",
) -> DataFrame:
    """LEFT ANTI join of two identically-bucketed tables — zero
    exchanges when both were written with :func:`write_bucketed` using
    the same column and bucket count."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right.select(on), on=on, how="left_anti")
