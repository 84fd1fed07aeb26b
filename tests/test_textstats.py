"""Text-analysis operators over the driver documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from judyst_web_crawler_spark.functions import textstats as T

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_token_count_matches_python(spark):
    rows = _docs(spark).select(
        "doc_id", "text", T.token_count("text").alias("n")
    ).collect()
    assert rows
    for r in rows:
        assert r["n"] == len(r["text"].split()), r["doc_id"]


def test_lang_id_sane(spark):
    got = _docs(spark).select("lang", T.lang_id("text").alias("guess")).collect()
    # heuristic must be deterministic and only emit known tags
    assert {r["guess"] for r in got} <= {"ru", "en", "und"}


def test_quality_score_bounds(spark):
    got = _docs(spark).select(T.quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in got)


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "Foo  Bar"), (2, "foo bar"), (3, "bar foo")], "doc_id long, text string"
    )
    fp = df.select("doc_id", T.normalized_fingerprint("text").alias("f")).collect()
    by_id = {r["doc_id"]: r["f"] for r in fp}
    assert by_id[1] == by_id[2]  # case+whitespace-insensitive
    assert by_id[1] != by_id[3]  # order-sensitive
    rh = df.select("doc_id", T.rolling_fingerprint_udf(F.col("text")).alias("h")).collect()
    by_id_h = {r["doc_id"]: r["h"] for r in rh}
    for r in df.collect():
        assert by_id_h[r["doc_id"]] == T.rolling_hash_py(r["text"])


def test_gopher_quality_flags(spark):
    from pyspark.sql import functions as F

    from judyst_web_crawler_spark.functions.textstats import gopher_quality_flags

    good = ("суд рассмотрел жалобу гражданина на решение нижестоящей инстанции "
            "и установил что доводы заявителя подлежат проверке в полном объёме ") * 5
    bullets = "\n".join(f"- пункт {i}" for i in range(20))
    short = "слишком коротко"
    numbers = " ".join(str(i) for i in range(120))  # words without letters
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, short), (4, numbers)],
        "doc_id long, text string",
    )
    flags = gopher_quality_flags("text")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[c.alias(n) for n, c in flags.items()]).collect()}
    assert out[1]["gopher_pass"]
    assert not out[2]["gopher_pass"] and out[2]["bullet_line_ratio"] == 1.0
    assert not out[3]["gopher_pass"] and out[3]["n_words"] == 2
    assert not out[4]["gopher_pass"] and out[4]["alpha_word_ratio"] == 0.0


def test_c4_clean_lines(spark):
    from pyspark.sql import functions as F

    from judyst_web_crawler_spark.functions.textstats import c4_clean_lines

    text = (
        "Первая строка завершается точкой и длинная.\n"
        "function f() { return 1; }\n"
        "коротко.\n"                     # terminal punct but <3 words
        "строка без терминальной пунктуации\n"
        "включите javascript чтобы продолжить.\n"
        "Вторая хорошая строка тоже остаётся!\n"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    flags = c4_clean_lines("text")
    r = df.select(*[c.alias(n) for n, c in flags.items()]).collect()[0]
    assert r["clean_text"] == (
        "Первая строка завершается точкой и длинная.\n"
        "Вторая хорошая строка тоже остаётся!"
    )
    assert r["n_lines_kept"] == 2 and r["n_lines_dropped"] == 4


def test_rolling_fingerprint_col_order_sensitive(spark):
    from judyst_web_crawler_spark.functions import textstats as T

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "delta gamma beta alpha"),   # same multiset, other order
            (3, "Alpha  Beta gamma delta"),  # case + runs of spaces
            (4, ""),
        ],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fp"] for r in docs.select(
        "doc_id", T.rolling_fingerprint_col("text").alias("fp")).collect()}
    assert fp[1] != fp[2]        # order matters (MinHash/SimHash can't see this)
    assert fp[1] == fp[3]        # whitespace/case normalization
    assert fp[4] == 0
    # python mirror of the fold
    import pyspark.sql.functions as F
    h = [r["h"] for r in docs.filter("doc_id = 1").select(
        F.transform(
            F.split(F.lower(F.col("text")), r"\s+"),
            lambda t: F.pmod(F.xxhash64(t), F.lit(T.ROLL_JVM_MOD)),
        ).alias("h")).collect()][0]
    acc = 0
    for x in h:
        acc = (acc * T.ROLL_JVM_BASE + x + 1) % T.ROLL_JVM_MOD
    assert acc == fp[1]


def test_trigram_profiles_are_valid():
    from judyst_web_crawler_spark.functions import textstats as T

    for lang, tgs in T.TRIGRAM_PROFILES.items():
        assert all(len(tg) == 3 for tg in tgs), lang          # trigrams only
        assert len(set(tgs)) == len(tgs), lang                # no double votes
    assert T.TRIGRAM_LANG_ORDER == list(T.TRIGRAM_PROFILES)


def test_lang_id_trigram_identifies_languages(spark):
    from judyst_web_crawler_spark.functions import textstats as T

    docs = spark.createDataFrame(
        [
            (1, "The court found that the application of the law to the "
                "facts is a question for the jury and the judge in the case."),
            (2, "Суд установил что жалоба гражданина подлежит рассмотрению "
                "в установленном порядке при наличии оснований по делу."),
            (3, "Das Gericht hat entschieden dass die Beschwerde des "
                "Antragstellers nach den geltenden Vorschriften zu prüfen ist."),
            (4, "Le tribunal a décidé que les recours des parties seraient "
                "examinés selon une procédure établie pour un tel cas."),
            (5, "El tribunal decidió que la queja de una parte sería "
                "examinada según el procedimiento establecido para el caso."),
            (6, "123 456 789 ---"),      # no evidence, no script → und
            (7, "кот"),                  # no trigram evidence, cyrillic → ru
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", T.lang_id_trigram("text").alias("lang")
        ).collect()
    }
    assert got == {1: "en", 2: "ru", 3: "de", 4: "fr", 5: "es",
                   6: "und", 7: "ru"}


def test_lang_id_trigram_beats_script_heuristic_on_latin_langs(spark):
    """The upgrade the script heuristic can't make: de/fr/es are all
    'en' to a latin-script ratio test."""
    from judyst_web_crawler_spark.functions import textstats as T

    docs = spark.createDataFrame(
        [(1, "Das Gericht hat entschieden dass die Beschwerde des "
             "Antragstellers nach den geltenden Vorschriften zu prüfen ist.")],
        "doc_id long, text string",
    )
    row = docs.select(
        T.lang_id("text").alias("script"),
        T.lang_id_trigram("text").alias("tri"),
    ).first()
    assert row["script"] == "en" and row["tri"] == "de"
