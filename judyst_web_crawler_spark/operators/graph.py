"""Distributed connected components — duplicate-cluster assembly.

Near-dup detection (MinHash/SimHash/embedding paths in dedup_fuzzy.py /
similarity.py) emits PAIRS; a training-data pipeline needs CLUSTERS: one
representative per transitive group ("A~B, B~C ⇒ keep one of {A,B,C}").
The reference's analogue is the in-memory dup-group accumulation of its
listing dedup (ksrf.py:106-142) — this is the at-scale generalization.

Algorithm: iterative min-label propagation over the symmetrized edge
set. Each round every node takes the minimum label among itself and its
neighbors; convergence in O(graph diameter) rounds. Near-dup clusters
are short chains/cliques (diameter ≲ 8), so the round count is small and
each round is ONE shuffle join + ONE aggregation — all JVM-side. Labels
are ``localCheckpoint``-ed per round to truncate the lineage (otherwise
the plan doubles every iteration). For adversarial long-chain graphs the
literature's large-star/small-star contraction halves diameter per round;
the hook is the ``max_iters`` guard raising instead of silently emitting
a non-converged labeling.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    edge_cols: tuple[str, str] = ("id_a", "id_b"),
    node_col: str = "node",
    max_iters: int = 50,
) -> DataFrame:
    """(node, cluster_id) — cluster_id = min node id reachable from node.

    ``edges`` is undirected input (each pair once, either orientation).
    ``nodes`` optionally supplies the full node universe so ISOLATED
    nodes appear as singleton clusters (pass the corpus ids for dedup:
    un-paired documents are their own cluster). Deterministic: min-label
    over a deterministic edge set.
    """
    a, b = edge_cols
    sym = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionByName(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    if nodes is None:
        universe = sym.select(F.col("src").alias(node_col)).distinct()
    else:
        universe = nodes.select(F.col(nodes.columns[0]).alias(node_col)).distinct()
    labels = universe.select(node_col, F.col(node_col).alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)

    for it in range(max_iters):
        neigh = (
            sym.join(labels, sym["dst"] == labels[node_col])
            .groupBy(F.col("src").alias(node_col))
            .agg(F.min("cluster_id").alias("_nmin"))
        )
        updated = (
            labels.join(neigh, on=node_col, how="left")
            .select(
                node_col,
                F.least(F.col("cluster_id"), F.coalesce("_nmin", F.col("cluster_id"))).alias(
                    "cluster_id"
                ),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), on=node_col)
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = updated
        if changed == 0:
            log.info("connected_components converged after %d rounds", it + 1)
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "graph diameter exceeds the guard; raise max_iters or pre-contract"
    )


def duplicate_clusters(
    pairs: DataFrame,
    corpus_ids: DataFrame,
    edge_cols: tuple[str, str] = ("id_a", "id_b"),
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs + corpus → (doc_id, cluster_id, cluster_size,
    is_representative). The canonical keep-policy: representative = min
    id per cluster (the reference's first-wins choice, ksrf.py:115-119,
    generalized transitively)."""
    comp = connected_components(
        pairs, nodes=corpus_ids.select(id_col), edge_cols=edge_cols, node_col=id_col
    )
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, on="cluster_id")
        .select(
            id_col,
            "cluster_id",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            (F.col(id_col) == F.col("cluster_id")).alias("is_representative"),
        )
    )
