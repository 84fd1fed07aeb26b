"""Deterministic cache release for operators that persist intermediates.

Near-dup / similarity operators persist signature and bucket tables that
their self-joins consume twice; on a long-lived driver, repeated
invocations must not accumulate cached blocks until LRU-eviction
pressure. The shared protocol: materialize the (small) result, then
unpersist every intermediate handle — one implementation, so the release
discipline cannot drift between modules (it previously existed twice,
in dedup_fuzzy and inlined in similarity).

Trade-off, stated once: ``localCheckpoint`` truncates lineage, so the
returned result is NOT recomputable after executor loss (blocks live on
executors only). That is the right default for pair/id-sized results
consumed promptly; callers on long-lived dynamic-allocation clusters who
need recompute resilience — or who want to compose/inspect the lazy
plan — should call the operators with ``materialize=False``, which skips
both the persist and the checkpoint entirely (nothing to leak, full
lineage, at the cost of recomputing shared subplans per action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_and_release(df: DataFrame, handles: list[DataFrame]) -> DataFrame:
    """Materialize ``df`` via an eager ``localCheckpoint``, then unpersist
    every DataFrame in ``handles`` (same pattern as ``dsir.dsir_weights``).
    The checkpoint runs BEFORE the release so the cached intermediates are
    read exactly once more, never recomputed."""
    try:
        return df.localCheckpoint(eager=True)
    finally:
        for h in handles:
            h.unpersist()
