"""Seeded fuzz parity: the distributed operators must equal their
sequential oracles on randomized inputs (fixed seed — deterministic).

- D1/D2 dedup_listing vs the reference-loop oracle on 300 random
  discovery streams with engineered key/url collision rates.
- P5 page-number strip UDF vs the compiled-regex oracle on random texts
  salted with every \\x0c pattern branch.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from judyst_web_crawler_spark.functions.extraction import (
    del_np_and_page_nums,
    strip_page_numbers_udf,
)
from judyst_web_crawler_spark.operators.dedup import dedup_listing, dedup_oracle


def _random_listing(rng: random.Random, n_rows: int):
    """Discovery stream with heavy key collisions and url variants —
    hits every branch of ksrf.py:106-142."""
    rows = []
    for seq in range(n_rows):
        key = f"К/{rng.randint(0, max(2, n_rows // 4))}-О"
        variant = rng.randint(0, 2)
        url = f"http://h/doc{abs(hash(key)) % 97}v{variant}.pdf"
        rows.append({"decision_id": key, "url": url, "seq": seq})
    return rows


def test_dedup_fuzz_parity(spark):
    rng = random.Random(20260817)
    for trial in range(12):
        n = rng.randint(5, 60)
        rows = _random_listing(rng, n)
        want = dedup_oracle(rows)
        df = spark.createDataFrame(rows, "decision_id string, url string, seq long")
        got_rows = dedup_listing(df).collect()
        got = {r["doc_id"]: r["url"] for r in got_rows}
        assert set(got) == set(want), f"trial {trial}: id sets differ"
        for doc_id, row in want.items():
            assert got[doc_id] == row["url"], f"trial {trial}: {doc_id} url"


_FF_SNIPPETS = [
    "\x0c 12\n", "\x0c\n", "\x0c  ", "\x0cслово", "\x0c\t3", "обычный текст ",
    "\x0c9", " страница \x0c 4 конец", "\x0c", "многоточие... \x0c   7\n",
]


def test_page_number_strip_fuzz_parity(spark):
    rng = random.Random(99)
    texts = []
    for _ in range(400):
        parts = [rng.choice(_FF_SNIPPETS) for _ in range(rng.randint(1, 12))]
        texts.append("".join(parts))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r["i"]: r["s"] for r in df.select("i", strip_page_numbers_udf("t").alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == del_np_and_page_nums(t), f"text {i!r} diverged"
