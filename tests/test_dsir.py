"""DSIR importance resampling: weights vs a pure-Python oracle,
target-affinity monotonicity, deterministic Gumbel top-k."""

from __future__ import annotations

import collections
import math

import pytest
from pyspark.sql import functions as F

from judyst_web_crawler_spark.operators import dsir as D

B = 32
ALPHA = 1.0


def _py_bucket(g: str) -> int:
    return (len(g) * 31 + ord(g[0]) * 17 + ord(g[-1]) * 7) % B


def _col_bucket(gram, n_buckets):
    return F.pmod(
        F.length(gram) * 31
        + F.ascii(gram) * 17
        + F.ascii(F.substring(gram, -1, 1)) * 7,
        F.lit(n_buckets),
    )


def _py_weights(docs, target_ids):
    feats, t, r = {}, collections.Counter(), collections.Counter()
    for did, text in docs:
        toks = [x for x in text.lower().split() if x]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        c = collections.Counter(_py_bucket(g) for g in grams)
        if c:
            feats[did] = c
    for did, c in feats.items():
        r.update(c)
        if did in target_ids:
            t.update(c)
    tt, rt = sum(t.values()), sum(r.values())
    lr = {
        b: math.log((t[b] + ALPHA) / (tt + ALPHA * B))
        - math.log((r[b] + ALPHA) / (rt + ALPHA * B))
        for b in range(B)
    }
    return {did: sum(cnt * lr[b] for b, cnt in c.items()) for did, c in feats.items()}


CORPUS = [
    (1, "the court ruled on the appeal and the court affirmed"),
    (2, "court appeal ruling affirmed by the court again today"),
    (3, "Court Ruled The Appeal  affirmed the ruling"),  # case + double space
    (10, "mountains rivers hiking tents lakes trails forests peaks"),
    (11, "hiking trails over mountains and rivers near lakes"),
    (12, "x"),  # single token: no bigrams
]
TARGETS = {1, 2}


def test_weights_match_python_oracle(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in D.dsir_weights(
            docs, F.col("doc_id").isin(*TARGETS), n_buckets=B,
            alpha=ALPHA, bucket_fn=_col_bucket,
        ).collect()
    }
    want = _py_weights(CORPUS, TARGETS)
    assert set(got) == set(want)
    for did in want:
        assert got[did] == pytest.approx(want[did], abs=1e-9), did


def test_target_affinity_orders_weights(spark):
    """With the production hasher: legal-vocab docs must outweigh
    outdoor-vocab docs when the target is legal."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    w = {
        r["doc_id"]: r["log_weight"]
        for r in D.dsir_weights(docs, F.col("doc_id").isin(1, 2), n_buckets=256).collect()
    }
    assert min(w[1], w[2], w[3]) > max(w[10], w[11])


def test_empty_text_is_omitted(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    out = D.dsir_weights(docs, F.col("doc_id") == 1, n_buckets=16).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_gumbel_top_k_deterministic(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    w = D.dsir_weights(docs, F.col("doc_id").isin(1, 2), n_buckets=256)
    a = [r["doc_id"] for r in D.gumbel_top_k(w, k=3, seed=7).collect()]
    b = [r["doc_id"] for r in D.gumbel_top_k(w, k=3, seed=7).collect()]
    assert a == b and len(a) == 3
    assert set(a) <= {1, 2, 3, 10, 11, 12}
    # temperature=0 → plain top-k by weight (computed, not hardcoded:
    # weights are UNNORMALIZED sums, so a 1-gram doc can outrank a long
    # mildly-negative doc when alpha*n_buckets >> corpus gram count)
    by_weight = sorted(w.collect(), key=lambda r: -r["log_weight"])
    expect = {r["doc_id"] for r in by_weight[:3]}
    top = {r["doc_id"] for r in D.gumbel_top_k(w, k=3, seed=7, temperature=0).collect()}
    assert top == expect
