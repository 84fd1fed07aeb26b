"""URL-seen & dedup parity (SURVEY §5.2): the engine's distributed D1/D2
window algebra vs the sequential oracle re-implementing ksrf.py:106-142,
on engineered branch fixtures AND on the synthetic listing generator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from judyst_web_crawler_spark.datagen import listing_df
from judyst_web_crawler_spark.functions import canonical as C
from judyst_web_crawler_spark.operators.dedup import dedup_listing, dedup_oracle

# FIXTURES.md §7 dup/*: the four branches of ksrf.py:120-142
BRANCH_ROWS = [
    # (key, url) in discovery order
    ("КСРФ/1-О/2018", "http://h/doca1.pdf"),   # first occurrence, stays unique
    ("КСРФ/2-О/2018", "http://h/docb2.pdf"),   # first occurrence of key 2
    ("КСРФ/2-О/2018", "http://h/docb2.pdf"),   # same key + SAME url -> rekey orig, drop this
    ("КСРФ/3-О/2018", "http://h/docc31.pdf"),  # first occurrence of key 3
    ("КСРФ/3-О/2018", "http://h/docc32.pdf"),  # same key + NEW url -> both -DUP
    ("КСРФ/3-О/2018", "http://h/docc33.pdf"),  # third distinct url -> third -DUP
    ("КСРФ/3-О/2018", "http://h/docc32.pdf"),  # repeat of known url -> dropped
    ("КСРФ/4-О/2018", "http://h/docx7.pdf"),   # pdfnum collision pair:
    ("КСРФ/4-О/2018", "http://h/docy7.pdf"),   #   same pdfnum 7 -> later wins
]


def _run_engine(spark, rows):
    df = spark.createDataFrame(
        [(i, k, u) for i, (k, u) in enumerate(rows)], "seq long, decision_id string, url string"
    )
    out = dedup_listing(df, key_col="decision_id", url_col="url", seq_col="seq")
    return {r["doc_id"]: r["url"] for r in out.collect()}


def test_branch_fixture_parity(spark):
    got = _run_engine(spark, BRANCH_ROWS)
    oracle = dedup_oracle([{"decision_id": k, "url": u} for k, u in BRANCH_ROWS])
    want = {doc_id: row["url"] for doc_id, row in oracle.items()}
    assert got == want
    # spot-check the semantics we claim:
    assert "КСРФ/1-О/2018" in got                       # unique key keeps plain id
    assert "КСРФ/2-О/2018" not in got                    # dup key retires plain id
    assert got["КСРФ/2-О/2018/2-DUP"].endswith("docb2.pdf")
    assert {k for k in got if k.startswith("КСРФ/3-О/2018/")} == {
        "КСРФ/3-О/2018/31-DUP", "КСРФ/3-О/2018/32-DUP", "КСРФ/3-О/2018/33-DUP",
    }
    assert got["КСРФ/4-О/2018/7-DUP"].endswith("docy7.pdf")  # later url wins collision


def test_generated_listing_parity(spark):
    listing = listing_df(spark, n_rows=3000, per_page=20, n_keys=900, seed=11)
    listing = listing.withColumn(
        "decision_id", C.decision_id(C.canonical_key("raw_key"))
    ).withColumn("seq", F.col("page_seq").cast("long") * 1000000 + F.col("intra_page_seq"))

    engine = {
        r["doc_id"]: r["url"]
        for r in dedup_listing(listing, "decision_id", "url", "seq").collect()
    }
    ordered = listing.orderBy("seq").select("decision_id", "url").collect()
    oracle = dedup_oracle([{"decision_id": r["decision_id"], "url": r["url"]} for r in ordered])
    want = {doc_id: row["url"] for doc_id, row in oracle.items()}
    assert engine == want
    # the generator must actually exercise duplicates
    assert any(k.endswith("-DUP") for k in want)
    assert len(want) < 3000
