"""Deterministic synthetic-data generators (FIXTURES.md §1-§6).

Everything is seeded and derived from ``spark.range`` row ids — no
wall-clock, no RNG state (SURVEY.md §7 "No Date.now in tests"). Columns
are built with JVM-side expressions wherever possible so generation
itself scales; only the oracle ``text`` column (reference extraction
pipeline run at generation time, FIXTURES.md §1) and the few
windows-1251 payload rows go through pandas UDFs.

Tables produced:

- ``listing_df``   — synthetic KSRF listing rows in discovery order
                     (page_seq, intra_page_seq) with engineered duplicate
                     patterns covering every branch of ksrf.py:106-142.
- ``pages_df``     — the authoritative input shape (BASELINE.json:15):
                     (url STRING, warc_ts TIMESTAMP, html BINARY,
                      text STRING, lang STRING), skewed host distribution.
- ``politeness_df``— per-host budgets + robots rules (FIXTURES.md §5).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from judyst_web_crawler_spark.functions.extraction import extract_text_udf

BASE_EPOCH = 1546300800  # 2019-01-01T00:00:00Z, fixed


def _host_expr(n_hosts: int, seed: int):
    """Skewed host index: a few giant hosts + long tail (zipf-ish).

    u in [0,1) from a hash; host = floor(n_hosts * u^3) concentrates
    ~58%% of rows on the first 20%% of hosts — enough skew to make
    unsalted groupBy(host) visibly lopsided in tests/bench.
    """
    u = (F.pmod(F.xxhash64(F.col("id") + F.lit(seed * 131)), F.lit(100000)) / 100000.0)
    idx = F.floor(F.lit(n_hosts) * F.pow(u, F.lit(3.0))).cast("int")
    return F.concat(F.lit("court"), F.format_string("%03d", idx), F.lit(".example.ru"))


def listing_df(
    spark: SparkSession,
    n_rows: int = 2000,
    per_page: int = 20,
    n_keys: int | None = None,
    n_hosts: int = 7,
    seed: int = 42,
) -> DataFrame:
    """Discovery-ordered listing rows (the input to D1/D2 dedup).

    ``n_keys < n_rows`` forces key collisions; ``url_variant`` makes some
    collisions share a URL (same-key-same-url branch) and others not
    (same-key-new-url / third-distinct-url branches) — the four branches
    of ksrf.py:120-142. ``raw_key`` carries spaces + lowercase so P2
    canonicalization has real work.
    """
    if n_keys is None:
        n_keys = max(1, int(n_rows * 0.8))
    df = spark.range(n_rows).select(
        F.col("id"),
        (F.floor(F.col("id") / per_page) + 2).cast("int").alias("page_seq"),
        F.pmod(F.col("id"), per_page).cast("int").alias("intra_page_seq"),
    )
    doc_num = F.pmod(F.xxhash64(F.col("id") + F.lit(seed)), F.lit(n_keys))
    # suffix letter + year make keys look like '2483-О/2018'
    kind = F.element_at(
        F.array(F.lit("О"), F.lit("П"), F.lit("Р")), (F.pmod(doc_num, 3) + 1).cast("int")
    )
    year = (F.lit(2015) + F.pmod(doc_num, 5)).cast("string")
    clean_key = F.concat(doc_num.cast("string"), F.lit("-"), kind, F.lit("/"), year)
    # inject spaces / lowercase on some rows to exercise canonicalization
    raw_key = (
        F.when(F.pmod(F.col("id"), 7) == 0, F.concat(doc_num.cast("string"), F.lit(" -"), F.lower(kind), F.lit("/ "), year))
        .when(F.pmod(F.col("id"), 11) == 0, F.lower(clean_key))
        .otherwise(clean_key)
    )
    # url variant: 0 for ~70% of rows; same key+variant -> same url (dup
    # same-url branch); different variants -> -DUP re-keying branches.
    variant = F.when(F.pmod(F.xxhash64(F.col("id") + F.lit(seed * 7)), 10) < 7, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(F.col("id") + F.lit(seed * 13)), 3).cast("int")
    )
    host = _host_expr(n_hosts, seed)
    url = F.concat(
        F.lit("http://"),
        host,
        F.lit("/ru/Decision/Pages/doc"),
        (doc_num * 10 + variant).cast("string"),
        F.lit(".pdf"),
    )
    return (
        df.withColumn("raw_key", raw_key)
        .withColumn("url", url)
        .withColumn("host", host)
        .withColumn("release_date", F.format_string("%02d.%02d.2018", (F.pmod(doc_num, 28) + 1).cast("int"), (F.pmod(doc_num, 12) + 1).cast("int")))
        .withColumn("title", F.concat(F.lit("Определение № "), clean_key))
    )


def _body_expr(seed: int, body_repeats: int = 3):
    """Deterministic page body with \\x0c page markers + an HTML entity.

    Every branch of pageNumberPattern (ksrf.py:154-159) occurs: \\x0c
    followed by digits, \\x0c before whitespace, \\x0c at end-of-text,
    and a \\x0c that must SURVIVE (followed by a non-space letter).
    ``body_repeats`` scales the filler: 3 ≈ 0.5 KB pages for unit tests,
    tens-to-hundreds ≈ the realistic court-page sizes the scaling bench
    uses so per-URL work matches production. Filler words are derived
    from (doc id, position) hashes, so text is DIVERSE within a document
    — shingle/fingerprint loads behave like real prose, not like a
    60:1-compressible repeat loop.
    """
    n_words = max(1, body_repeats * 6)
    filler = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_words)),
            lambda i: F.concat(
                F.lit("слово"),
                F.pmod(F.xxhash64(F.col("id") + F.lit(seed * 3), i), F.lit(99999)).cast("string"),
            ),
        ),
        " ",
    )
    b = F.concat(
        F.lit("Постановление &quot;дело&quot; N "),
        F.col("id").cast("string"),
        F.lit(".\n"),
        filler,
        F.lit("\x0c 2\nстраница вторая\n"),
        filler,
        F.lit("\x0c\nтретья страница"),
        F.when(F.pmod(F.col("id"), 5) == 0, F.lit("\x0cконец-без-пробела")).otherwise(F.lit("")),
        F.lit("\x0c  "),
    )
    return b


@F.pandas_udf(BinaryType())
def _encode_mixed_charset_udf(html: pd.Series, use_cp1251: pd.Series) -> pd.Series:
    """utf-8 payloads, with a deterministic sliver of windows-1251 ones
    (exercises the P9 charset-fallback decode)."""
    out = []
    for markup, cp in zip(html, use_cp1251):
        if markup is None:
            out.append(None)
        elif cp:
            out.append(markup.encode("windows-1251", errors="replace"))
        else:
            out.append(markup.encode("utf-8"))
    return pd.Series(out)


def pages_df(
    spark: SparkSession,
    n_rows: int = 5000,
    n_hosts: int = 50,
    seed: int = 42,
    with_oracle_text: bool = True,
    body_repeats: int = 3,
) -> DataFrame:
    """The engine input table — exact BASELINE.json:15 shape.

    ``text`` is the oracle column: the reference extraction pipeline
    (html→text_content→pageNumberPattern.sub) run at generation time.
    """
    df = spark.range(n_rows)
    host = _host_expr(n_hosts, seed)
    url = F.concat(
        F.lit("http://"), host, F.lit("/ru/Decision/Pages/doc"), F.col("id").cast("string"), F.lit(".pdf")
    )
    body = _body_expr(seed, body_repeats)
    markup = F.concat(
        F.lit("<html><head><title>doc</title></head><body><div class=\"decision\"><p>"),
        body,
        F.lit("</p></div></body></html>"),
    )
    use_cp1251 = F.pmod(F.col("id"), 97) == 0
    out = (
        df.withColumn("url", url)
        .withColumn("warc_ts", F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id") * 7))
        .withColumn("html", _encode_mixed_charset_udf(markup, use_cp1251))
        .withColumn("lang", F.when(F.pmod(F.col("id"), 13) == 0, F.lit("en")).otherwise(F.lit("ru")))
    )
    if with_oracle_text:
        out = out.withColumn("text", extract_text_udf(F.col("html")))
    else:
        out = out.withColumn("text", F.lit(None).cast("string"))
    return out.select("url", "warc_ts", "html", "text", "lang")


def linked_pages_df(
    spark: SparkSession,
    n_rows: int = 100,
    n_hosts: int = 4,
    fanout: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Pages whose html contains ``href`` links to other pages of the same
    table (deterministic ring-ish topology: page i links to pages
    (i*3+k) mod n). Feeds the multi-depth crawl tests: seeds reach the
    rest of the graph only through link discovery."""
    df = spark.range(n_rows)
    host = _host_expr(n_hosts, seed)

    def url_of(idx):
        # same shape for every page so links resolve within the table
        h = F.concat(
            F.lit("court"),
            F.format_string("%03d", F.floor(F.lit(n_hosts) * F.pow(F.pmod(F.xxhash64(idx + F.lit(seed * 131)), F.lit(100000)) / 100000.0, F.lit(3.0))).cast("int")),
            F.lit(".example.ru"),
        )
        return F.concat(F.lit("http://"), h, F.lit("/ru/Decision/Pages/doc"), idx.cast("string"), F.lit(".pdf"))

    links = F.concat_ws(
        "\n",
        *[
            F.concat(F.lit('<a href="'), url_of(F.pmod(F.col("id") * 3 + F.lit(k + 1), F.lit(n_rows))), F.lit('">l</a>'))
            for k in range(fanout)
        ],
    )
    body = _body_expr(seed)
    markup = F.concat(
        F.lit("<html><body><p>"), body, F.lit("</p>"), links, F.lit("</body></html>")
    )
    out = (
        df.withColumn("url", url_of(F.col("id")))
        .withColumn("warc_ts", F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id") * 7))
        .withColumn("html", F.encode(markup, "utf-8").cast("binary"))
        .withColumn("lang", F.lit("ru"))
    )
    out = out.withColumn("text", extract_text_udf(F.col("html")))
    return out.select("url", "warc_ts", "html", "text", "lang")


def politeness_df(spark: SparkSession, hosts: list[str], budget: int = 2) -> DataFrame:
    rows = [
        (h, budget, ["/ru/"], ["/private/"], 1.0)
        for h in hosts
    ]
    return spark.createDataFrame(
        rows, "host string, budget int, robots_allow array<string>, robots_deny array<string>, crawl_delay_s double"
    )
