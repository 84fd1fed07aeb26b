"""Distributed connected components — duplicate-cluster assembly.

Near-dup detection (MinHash/SimHash/embedding paths in dedup_fuzzy.py /
similarity.py) emits PAIRS; a training-data pipeline needs CLUSTERS: one
representative per transitive group ("A~B, B~C ⇒ keep one of {A,B,C}").
The reference's analogue is the in-memory dup-group accumulation of its
listing dedup (ksrf.py:106-142) — this is the at-scale generalization.

Two algorithms, picked by graph shape:

- **min-label propagation** — each round every node takes the minimum
  label among itself and its neighbors; O(diameter) rounds, one shuffle
  join + one aggregation per round. Near-dup clusters are short
  chains/cliques (diameter ≲ 8), so this is the fast path.
- **large-star / small-star contraction** (Kiveris et al., "Connected
  Components in MapReduce and Beyond", 2014 — public) — alternating
  rounds rewire every node to its neighborhood minimum, halving
  component diameter per pair of rounds: O(log n) rounds on adversarial
  long chains where label propagation needs O(n).

``connected_components`` defaults to the label path and FALLS BACK to
star contraction if the diameter guard trips, so callers never receive
a non-converged labeling. All rounds are JVM-side joins/aggregations;
per-round ``localCheckpoint`` truncates the lineage (otherwise the plan
doubles every iteration).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(row count, order-insensitive hash) — cheap convergence check for
    the star rounds. A collision (two DIFFERENT consecutive edge sets
    with equal count and xor-of-hashes, ~2⁻⁶⁴ per round since xor lets
    equal-hash edge pairs cancel) would terminate the loop early with a
    non-converged labeling; accepted odds for a per-round check — the
    alternative, exceptAll().isEmpty(), costs a full extra join per
    round."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to the minimum of u's
    neighborhood (incl. u)."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
    mins = mins.select("src", F.least(F.col("_mn"), F.col("src")).alias("m"))
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward the smaller endpoint; connect every smaller
    neighbor (and u itself) to the minimum."""
    orient = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    mins = orient.groupBy("src").agg(F.min("dst").alias("m"))
    rewired = (
        orient.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(mins.select("src", F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return rewired


def connected_components_star(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    edge_cols: tuple[str, str] = ("id_a", "id_b"),
    node_col: str = "node",
    max_rounds: int = 60,
) -> DataFrame:
    """(node, cluster_id) via large-star/small-star contraction —
    O(log n) rounds on any graph shape. Same output contract as
    ``connected_components``."""
    a, b = edge_cols
    cur = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    if nodes is not None:
        # contract ONLY edges whose both endpoints are in the universe —
        # the label-propagation path never propagates through unlabeled
        # (foreign) endpoints, so the fallback must not either, or the
        # two algorithms return different clusterings for the same call
        uni = nodes.select(F.col(nodes.columns[0]).alias("_u")).distinct()
        cur = (
            cur.join(uni, cur["src"] == F.col("_u"), "left_semi")
            .join(uni, cur["dst"] == F.col("_u"), "left_semi")
        )
    cur = (
        cur.filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_fp = _edge_fingerprint(cur)
    for rnd in range(max_rounds):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        fp = _edge_fingerprint(cur)
        if fp == prev_fp:
            log.info("connected_components_star converged after %d rounds", rnd + 1)
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds"
        )
    # fixpoint edges are stars (node → component min)
    labels = cur.select(F.col("src").alias(node_col), F.col("dst").alias("cluster_id"))
    roots = cur.select(F.col("dst").alias(node_col)).distinct().select(
        node_col, F.col(node_col).alias("cluster_id")
    )
    labels = labels.unionByName(roots)
    if nodes is not None:
        universe = nodes.select(F.col(nodes.columns[0]).alias(node_col)).distinct()
    else:
        # derive the universe from the RAW edge endpoints: the star
        # rounds drop self-loops, so a node appearing only as (u, u)
        # would otherwise vanish (label propagation keeps it)
        universe = (
            edges.select(F.col(a).alias(node_col))
            .unionByName(edges.select(F.col(b).alias(node_col)))
            .distinct()
        )
    singletons = universe.join(labels.select(node_col), on=node_col, how="left_anti")
    labels = labels.unionByName(
        singletons.select(node_col, F.col(node_col).alias("cluster_id"))
    )
    return labels.dropDuplicates([node_col])


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    edge_cols: tuple[str, str] = ("id_a", "id_b"),
    node_col: str = "node",
    max_iters: int = 50,
    fallback: bool = True,
) -> DataFrame:
    """(node, cluster_id) — cluster_id = min node id reachable from node.

    ``edges`` is undirected input (each pair once, either orientation).
    ``nodes`` optionally supplies the full node universe so ISOLATED
    nodes appear as singleton clusters (pass the corpus ids for dedup:
    un-paired documents are their own cluster). Deterministic: min-label
    over a deterministic edge set.

    If the diameter guard trips (graph has a chain longer than
    ``max_iters``) and ``fallback`` is True, re-runs the computation with
    :func:`connected_components_star` (O(log n) rounds on any shape)
    instead of raising — callers always receive a converged labeling.
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
    if fallback:
        log.warning(
            "connected_components hit the %d-round diameter guard; "
            "falling back to large-star/small-star contraction",
            max_iters,
        )
        return connected_components_star(
            edges, nodes=nodes, edge_cols=edge_cols, node_col=node_col
        )
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "graph diameter exceeds the guard; raise max_iters or pre-contract"
    )


def duplicate_clusters(
    pairs: DataFrame,
    corpus_ids: DataFrame,
    edge_cols: tuple[str, str] = ("id_a", "id_b"),
    id_col: str = "doc_id",
    strategy: str = "label",
) -> DataFrame:
    """Near-dup pairs + corpus → (doc_id, cluster_id, cluster_size,
    is_representative). The canonical keep-policy: representative = min
    id per cluster (the reference's first-wins choice, ksrf.py:115-119,
    generalized transitively). ``strategy``: "label" (O(diameter)
    rounds, fast for shallow near-dup clusters, auto-falls-back) or
    "star" (large-star/small-star, O(log n) rounds on any shape)."""
    cc = connected_components_star if strategy == "star" else connected_components
    comp = cc(
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


def co_citation_pairs(
    edges: DataFrame,
    min_common: int = 2,
    max_citer_out_degree: int | None = None,
    edge_cols: tuple[str, str] = ("doc_id_from", "doc_id_to"),
) -> DataFrame:
    """(doc_a, doc_b, common_citers) — pairs of documents cited by at
    least ``min_common`` common citers (self-join on the citing side;
    the 2-hop pattern over the reference's link records,
    DatabaseWrapper.py:17,33-37).

    The self-join emits O(d²) pairs per citer of out-degree d, so one
    hub citer (a "cites everything" index page at 100 TB) dominates the
    shuffle. ``max_citer_out_degree`` drops citers above the cap BEFORE
    the join and logs how many were dropped — the standard hub-removal
    move in co-citation analysis (a hub's co-citations carry no signal
    anyway: it co-cites every pair). ``None`` = exact. Same policy as
    the LSH hot-bucket caps in dedup_fuzzy: bounded work, no silent
    drops.
    """
    src, dst = edge_cols
    e = edges.select(F.col(src).alias("citer"), F.col(dst).alias("cited"))
    if max_citer_out_degree is not None:
        deg = e.groupBy("citer").agg(F.count(F.lit(1)).alias("_deg"))
        # materialize the (small) hub set once: counting it AND feeding
        # the anti-join from the live plan would run the full degree
        # aggregation twice
        hubs = (
            deg.filter(F.col("_deg") > max_citer_out_degree)
            .select("citer")
            .localCheckpoint(eager=True)
        )
        n_hubs = hubs.count()
        if n_hubs:
            log.warning(
                "co_citation_pairs: dropping %d hub citer(s) with "
                "out-degree > %d before the pair join",
                n_hubs, max_citer_out_degree,
            )
        e = e.join(F.broadcast(hubs), on="citer", how="left_anti")
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.citer") == F.col("b.citer"))
            & (F.col("a.cited") < F.col("b.cited")),
        )
        .groupBy(F.col("a.cited").alias("doc_a"), F.col("b.cited").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("common_citers"))
        .filter(F.col("common_citers") >= min_common)
    )
