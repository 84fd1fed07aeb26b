"""First-wins URL-seen dedup + duplicate re-keying (SURVEY.md §2.3 D1/D2).

Reference semantics (ksrf.py:106-142), derived by analysis of the loop:

Rows arrive in discovery order ``seq`` = (page_seq, intra_page_seq).
Per canonical ``decision_id`` key:

1. A key that occurs exactly ONCE keeps its plain id (first-wins insert).
2. As soon as a key occurs a SECOND time (even with the same URL), the
   plain id is retired: every *distinct* URL of that key is re-keyed to
   ``key/<pdfnum(url)>-DUP`` and carries the header of the FIRST row that
   introduced that URL; later repeats of an already-seen URL are dropped.
3. If two distinct URLs of one key share a pdf number, their -DUP ids
   collide; the reference dict assignment makes the LATER url win
   (ksrf.py:140-142 overwrites) — we keep max(first_seq).

The closed-form above is exactly what the sequential loop computes, which
lets the distributed plan be pure window algebra: ONE shuffle on ``key``
(both the per-(key,url) first row and the per-key occurrence count come
from key-partitioned windows), plus a cheap aggregation for the rare
-DUP-id collisions. A verbatim sequential oracle (``dedup_oracle``) backs
the parity tests (tests/test_dedup_parity.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from judyst_web_crawler_spark.functions.canonical import dup_doc_id

_PDF_NUM_RE = re.compile(r"(?<=[A-Za-z])\d+")  # ksrf.py:92, oracle side


def dedup_listing(df: DataFrame, key_col: str = "decision_id", url_col: str = "url", seq_col: str = "seq") -> DataFrame:
    """Distributed D1/D2. Input: one row per discovered listing entry with
    a total discovery order ``seq``. Output: final (doc_id, url, first_seq)
    plus all other input columns of the surviving row.

    Plan shape (at 10^10 rows): single hash shuffle on ``key`` — windows
    below share the ``partitionBy(key)`` exchange; AQE handles skew.
    """
    w_key = Window.partitionBy(key_col)
    w_url_order = Window.partitionBy(key_col).orderBy(url_col, seq_col)

    annotated = (
        df.withColumn("_key_cnt", F.count(F.lit(1)).over(w_key))
        .withColumn("_prev_url", F.lag(url_col).over(w_url_order))
        .withColumn(
            "_is_first_of_url",
            F.col("_prev_url").isNull() | (F.col("_prev_url") != F.col(url_col)),
        )
        # within equal (key,url) runs the orderBy(url, seq) makes the
        # first row the min-seq one
        .filter(F.col("_is_first_of_url"))
    )

    plain = annotated.filter(F.col("_key_cnt") == 1).withColumn("doc_id", F.col(key_col))

    dups = annotated.filter(F.col("_key_cnt") >= 2).withColumn(
        "doc_id", dup_doc_id(key_col, url_col)
    )
    # -DUP id collisions (shared pdfnum): later-introduced URL wins
    w_collision = Window.partitionBy(key_col, "doc_id").orderBy(F.col(seq_col).desc())
    dups = dups.withColumn("_rn", F.row_number().over(w_collision)).filter(F.col("_rn") == 1).drop("_rn")

    out_cols = [c for c in df.columns] + ["doc_id"]
    return plain.select(*out_cols).unionByName(dups.select(*out_cols))


def dedup_oracle(rows: list[dict]) -> dict[str, dict]:
    """Sequential oracle: reference loop semantics (ksrf.py:106-142),
    re-implemented for parity testing. ``rows`` are dicts with at least
    ``decision_id`` and ``url``, already in discovery order.

    Returns the final ``{doc_id: row}`` mapping the reference would build.
    """
    content: dict[str, dict] = {}
    dup_urls: dict[str, list[str]] = {}
    for row in rows:
        key = row["decision_id"]
        url = row["url"]
        if key not in content and key not in dup_urls:
            content[key] = row
            continue
        if key not in dup_urls:
            original = content.pop(key)
            orig_dup_id = f"{key}/{_PDF_NUM_RE.search(original['url'])[0]}-DUP"
            content[orig_dup_id] = original
            dup_urls[key] = [original["url"]]
        if url in dup_urls[key]:
            continue
        dup_urls[key].append(url)
        content[f"{key}/{_PDF_NUM_RE.search(url)[0]}-DUP"] = row
    return content
