"""Law-codes splitting pipeline (SURVEY §2.7): the Spark path must equal
the plain-Python state machine on every document; range expansion, DFS
tree order, and the J4/J5 join semantics are pinned exactly."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from judyst_web_crawler_spark.operators import lawcodes as L

DOC = """Раздел I. Общие положения

Глава 1. Основные начала

Статья 1. Основные права
1. Каждый имеет право на защиту.
2. Права охраняются законом.
вводные положения сохраняются.

Статья 2. Утратившая сила статья
Статья утратила силу с 01.01.2020.

Примечание. Примечание к статье 2.
Дополнительная строка примечания.

Статьи 3 - 5. Зарезервированные статьи

§ 1. Специальный параграф

Статья 6. Заключительные положения
Текст заключительной статьи без частей.
"""


def _docs_df(spark, n=8):
    rows = [(i, DOC.replace("Статья 1.", f"Статья {i * 10 + 1}.")) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_matches_oracle(spark):
    df = _docs_df(spark)
    got = {}
    for r in L.split_documents(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["par_num"], r["title"], r["kind"], list(r["lines"]))
        )
    for doc_id, text in [(r["doc_id"], r["text"]) for r in df.collect()]:
        want = [
            (e["par_num"], e["title"], e["kind"], e["lines"])
            for e in L.split_document(text)
        ]
        assert sorted(got[doc_id]) == sorted(want)


def test_split_block_classification(spark):
    entries = L.split_document(DOC)
    kinds = [(e["kind"], e["title"].split(".")[0]) for e in entries]
    assert ("раздел", "Раздел I") in kinds
    assert ("глава", "Глава 1") in kinds
    assert ("параграф", "§ 1") in kinds
    # note split off into its own ПРМ entry (X2)
    prm = [e for e in entries if e["kind"] == "примечание"]
    assert len(prm) == 1 and prm[0]["title"].endswith("/ПРМ")
    assert prm[0]["lines"][0].startswith("Примечание.")


def test_article_children_parts_and_notes(spark):
    df = _docs_df(spark, n=3)
    kids = L.article_children(L.split_documents(df))
    one = {r["child_id"]: r for r in kids.filter(F.col("doc_id") == 0).collect()}
    # multi-part article → Ч-n children with inherited parent identity
    assert "Статья 1. Основные права/Ч-1" in one
    assert "Статья 1. Основные права/Ч-2" in one
    assert one["Статья 1. Основные права/Ч-2"]["text"].startswith("2. Права")
    # continuation block text lands in the last part
    assert "вводные положения" in one["Статья 1. Основные права/Ч-2"]["text"]
    # single-part article keeps its own id
    assert one["Статья 6. Заключительные положения"]["part_num"] == 0
    # lost-force flag derived from text (law_codes.py:770 semantics)
    assert one["Статья 2. Утратившая сила статья"]["lost_force"] is True
    # note child
    assert one["Статья 2. Утратившая сила статья/ПРМ"]["kind"] == "примечание"


def test_expand_article_range(spark):
    df = spark.createDataFrame(
        [("Статьи 3 - 5. Зарезервированные статьи",), ("Статья 7. Обычная",)],
        "title string",
    )
    out = L.expand_article_range(df).select("title", "article_num").collect()
    nums = sorted(r["article_num"] for r in out)
    assert nums == ["3", "4", "5", "7"]


def test_walk_contents_tree_dfs_order(spark):
    tree = {
        "title": "Кодекс",
        "children": [
            {"title": "Раздел I", "children": [
                {"title": "Глава 1", "children": [{"title": "Статья 1"}, {"title": "Статья 2"}]},
                {"title": "Глава 2", "children": [{"title": "Статья 3"}]},
            ]},
            {"title": "Раздел II", "children": [{"title": "Статья 4"}]},
        ],
    }
    df = spark.createDataFrame([(1, json.dumps(tree))], "doc_id long, tree_json string")
    rows = L.walk_contents_trees(df).orderBy("seq").collect()
    titles = [r["title"] for r in rows]
    assert titles == ["Кодекс", "Раздел I", "Глава 1", "Статья 1", "Статья 2",
                      "Глава 2", "Статья 3", "Раздел II", "Статья 4"]
    assert [r["depth"] for r in rows] == [0, 1, 2, 3, 3, 2, 3, 1, 2]
    assert rows[3]["path"] == "Кодекс/Раздел I/Глава 1/Статья 1"
    # DFS order matches the plain-Python oracle exactly
    assert titles == [r["title"] for r in L.walk_tree(tree)]


def test_attach_titles_first_wins(spark):
    items = spark.createDataFrame([("Статья 1", 1), ("Статья 9", 2)], "title string, x int")
    meta = spark.createDataFrame(
        [("Статья 1", "a"), ("Статья 1", "b"), ("Статья 2", "c")], "title string, m string"
    )
    out = L.attach_titles(items, meta).collect()
    # inner-join: unmatched item dropped (KeyError → skip, law_codes.py:337-340)
    assert len(out) == 1 and out[0]["title"] == "Статья 1"


def test_join_blocks_quarantines_broken(spark):
    tree_items = spark.createDataFrame(
        [(1, "Статья 1"), (1, "Статья 2"), (2, "Статья 1")],
        "doc_id long, title string",
    )
    blocks = spark.createDataFrame(
        [(1, "Статья 1", "текст"), (2, "Статья 1", "текст")],
        "doc_id long, title string, body string",
    )
    good, broken = L.join_blocks(tree_items, blocks)
    # doc 1 misses a block for Статья 2 → whole doc quarantined (J5)
    assert [r["doc_id"] for r in broken.collect()] == [1]
    assert {(r["doc_id"], r["title"]) for r in good.collect()} == {(2, "Статья 1")}
