"""Round-3 review findings, pinned:

- ETL facade: duplicate keys in a jsonlines file collapse last-wins
  before the merge (the reference's per-record put_data loop semantics);
  a headers-only source (no texts table) backfills via fetch_fn instead
  of crashing.
- Near-dup operators: ``materialize=False`` returns a lazy,
  lineage-preserving plan with NOTHING left persisted, and agrees with
  the eager path; the eager path releases every Dataset-level cache.
- Plan inspection: brackets/commas inside string literals don't derail
  the balanced-bracket scan.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from judyst_web_crawler_spark import api
from judyst_web_crawler_spark.operators import dedup_fuzzy as D
from judyst_web_crawler_spark.operators import similarity as S
from judyst_web_crawler_spark.sources.catalog import SnapshotCatalog

RU = (
    "Настоящим постановлением суд установил что жалоба гражданина "
    "подлежит рассмотрению в установленном законом порядке по делу "
)
MISC = (
    "Совершенно иной документ про погоду природу и путешествия по горам "
    "рекам и озёрам с фотографиями и картами маршрутов для туристов "
)


# ------------------------------------------------------------ ETL facade


def test_fill_data_source_last_record_wins_on_duplicate_keys(spark, tmp_path):
    lines = [
        json.dumps({"D9": {"title": "first"}}, ensure_ascii=False),
        json.dumps({"D8": {"title": "other"}}, ensure_ascii=False),
        json.dumps({"D9": {"title": "second"}}, ensure_ascii=False),
    ]
    f = tmp_path / "headers.jsonl"
    f.write_text("\n".join(lines), encoding="utf-8")
    db = api.CatalogSource("db", SnapshotCatalog(spark, str(tmp_path / "cat")))
    n = api.fill_data_source_from_file(spark, str(f), db)
    assert n == 2  # D8 + one D9, not three rows
    headers = db.get_all_data(api.DataType.DOCUMENT_HEADER)
    assert headers.count() == 2  # the table holds ONE row per key
    got = {r["doc_id"]: r["title"] for r in headers.collect()}
    # last record in the file wins, matching the reference's put_data loop
    assert got == {"D8": "other", "D9": "second"}


def test_update_database_from_source_headers_only_source(spark, tmp_path):
    """The canonical flow: headers arrive from a jsonl fill, the source
    has NO texts table at all, every text comes via fetch_fn — must not
    crash on the absent table (reference tools.py fetches per-uid)."""
    db = api.CatalogSource("db", SnapshotCatalog(spark, str(tmp_path / "db")))
    src = api.CatalogSource("src", SnapshotCatalog(spark, str(tmp_path / "src")))
    src.put_data_df(
        spark.createDataFrame(
            [(f"D{i}", f"T{i}") for i in range(4)], "doc_id string, title string"
        ),
        api.DataType.DOCUMENT_HEADER,
    )

    def fetch(missing):
        return missing.select(
            "doc_id", F.concat(F.lit("F-"), F.col("doc_id")).alias("text")
        )

    stats = api.update_database_from_source(db, src, fetch_fn=fetch)
    assert stats == {"headers": 4, "texts_backfilled": 4}
    texts = db.get_all_data_dict(api.DataType.DOCUMENT_TEXT)
    assert texts == {f"D{i}": f"F-D{i}" for i in range(4)}


# --------------------------------------------- materialize=False contract


def _docs(spark):
    rows = [
        (1, RU * 3),
        (2, RU * 3 + " дополнительное предложение суда."),
        (3, MISC * 3),
        (4, MISC * 3 + " ещё абзац о снаряжении."),
        (5, "уникальный короткий текст о кошках и собаках"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def test_minhash_near_dup_lazy_matches_eager_and_leaks_nothing(spark):
    docs = _docs(spark)
    cm = _cache_manager(spark)
    cm.clearCache()
    lazy = D.minhash_near_duplicates(docs, threshold=0.5, materialize=False)
    # building the plan persisted nothing and ran nothing
    assert cm.isEmpty()
    got = {(r["id_a"], r["id_b"]) for r in lazy.collect()}
    assert cm.isEmpty()  # collecting the lazy plan persisted nothing either
    want = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_near_duplicates(docs, threshold=0.5).collect()
    }
    assert got == want and (1, 2) in got and (3, 4) in got
    assert cm.isEmpty()  # the eager path released its Dataset caches too


def test_minhash_near_dup_lazy_with_bucket_cap(spark):
    docs = _docs(spark)
    cm = _cache_manager(spark)
    cm.clearCache()
    lazy = D.minhash_near_duplicates(
        docs, threshold=0.5, bucket_cap=8, materialize=False
    )
    assert cm.isEmpty()  # the capped path must not eagerly persist+count
    got = {(r["id_a"], r["id_b"]) for r in lazy.collect()}
    assert (1, 2) in got and (3, 4) in got
    assert cm.isEmpty()


def test_simhash_near_dup_lazy_matches_eager(spark):
    docs = _docs(spark)
    cm = _cache_manager(spark)
    cm.clearCache()
    lazy = D.simhash_near_duplicates(docs, max_hamming=10, materialize=False)
    assert cm.isEmpty()
    got = {(r["id_a"], r["id_b"]) for r in lazy.collect()}
    want = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_near_duplicates(docs, max_hamming=10).collect()
    }
    assert got == want
    assert cm.isEmpty()


def test_embedding_near_dup_lazy_matches_eager(spark):
    rows = [(i, [1.0 if j == i % 4 else 0.01 * i for j in range(8)]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cm = _cache_manager(spark)
    cm.clearCache()
    lazy = S.embedding_near_duplicates(emb, dim=8, threshold=0.9, materialize=False)
    assert cm.isEmpty()
    got = {(r["id_a"], r["id_b"]) for r in lazy.collect()}
    want = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_duplicates(emb, dim=8, threshold=0.9).collect()
    }
    assert got == want and got  # non-vacuous: planted same-axis near-dups
    assert cm.isEmpty()


def test_ann_topk_jvm_uses_ann_candidates(spark):
    """ann_topk_jvm ≡ brute-force over ann_candidates — the decomposition
    the driver's ann_recall query relies on for probe-rule parity."""
    rows = [(i, [((i * 7 + j * 3) % 11 - 5) / 5.0 for j in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [0.5, -0.2, 0.8, 0.1, -0.6, 0.3, 0.0, 0.9]
    planes = S.arith_hyperplanes(8, 4, 6)
    cands = S.ann_candidates(emb, q, planes)
    via_cands = {r["vec_id"] for r in S.brute_force_topk(cands, q, k=5).collect()}
    direct = {r["vec_id"] for r in S.ann_topk_jvm(emb, q, planes, k=5).collect()}
    assert via_cands == direct


# ------------------------------------------------------- plan inspection


def test_bracket_scan_ignores_quoted_brackets():
    from judyst_web_crawler_spark.plans.inspect import (
        _bracket_bodies,
        _split_predicates,
    )

    plan = (
        'Scan parquet\n'
        'PushedFilters: [EqualTo(text, "a[b,c"), In(cell, [0,1,2])]\n'
        'ReadSchema: struct<cell:int>'
    )
    bodies = _bracket_bodies(plan, "PushedFilters")
    assert bodies == ['EqualTo(text, "a[b,c"), In(cell, [0,1,2])']
    assert _split_predicates(bodies[0]) == [
        'EqualTo(text, "a[b,c")',
        "In(cell, [0,1,2])",
    ]
