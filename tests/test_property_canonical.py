"""Hypothesis property tests for the parity-critical canonicalization
(P2): idempotence and dedup-key stability under the url variations a
crawl actually sees. One Spark job per example batch — hypothesis
generates the corpus, Spark evaluates the Column expressions."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from judyst_web_crawler_spark.functions import canonical as C

_path_chars = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x4FF),
    min_size=0, max_size=12,
)
_urls = st.builds(
    lambda host_n, path, q, frag, up: (
        f"http://court{host_n:03d}.example.ru/{path}"
        + (f"?{q}=1" if q else "")
        + (f"#{frag}" if frag else "")
    ),
    host_n=st.integers(0, 30),
    path=_path_chars,
    q=st.sampled_from(["", "utm_source", "sid", "page"]),
    frag=st.sampled_from(["", "top", "s2"]),
    up=st.booleans(),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_urls, min_size=1, max_size=40))
def _check_canonical_url_idempotent_and_key_stable(urls):
    spark = _check_canonical_url_idempotent_and_key_stable._spark
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        C.canonical_url(F.col("url")).alias("c1"),
        C.canonical_url(C.canonical_url(F.col("url"))).alias("c2"),
        C.key_hash(C.canonical_url(F.col("url"))).alias("k1"),
        C.key_hash(C.canonical_url(C.canonical_url(F.col("url")))).alias("k2"),
        C.url_host(F.col("url")).alias("h"),
    ).collect()
    for r in out:
        assert r["c1"] == r["c2"]          # canonicalization is idempotent
        assert r["k1"] == r["k2"]          # → dedup keys are stable
        assert r["h"].startswith("court") and r["h"].endswith(".example.ru")


def test_property_suite_runs(spark):
    """Bind the shared session for the hypothesis-driven test above
    (hypothesis functions can't take pytest fixtures directly)."""
    _check_canonical_url_idempotent_and_key_stable._spark = spark
    _check_canonical_url_idempotent_and_key_stable()
