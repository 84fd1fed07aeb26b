"""JSON header sources/sinks re-expressing the reference's file protocols.

Reference protocols (SURVEY §2.1):

- S6  single-object headers file ``DecisionHeaders.json``:
      ``{doc_id: header, ...}`` in ONE json object (ksrf.py:311,416-420).
- S7  jsonlines ingest: one ``{doc_id: header}`` (or link record) per
      line (tools.py:20-43, law_codes.py:919-924).
- S9  headers JSON sink (``ensure_ascii=False`` dump, ksrf.py:416-420).
- P8  duplicate-marker filter: drop headers carrying a ``'not unique'``
      key (ksrf.py:194, :326-328).

Spark shapes: jsonlines is the native ``spark.read.json`` format and the
scalable sink. The single-object format has row identity in its KEYS, so
it cannot be a columnar scan; it is parsed inside a ``mapInPandas`` over
``wholetext`` rows — acceptable because that file is a bootstrap artifact
(one small file), while all at-scale paths use jsonlines/parquet.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DatabaseWrapper.py:13-16 / tools.py:10-13 — the reference header schema
DOCUMENT_FIELDS = [
    "supertype", "doc_type", "title", "release_date", "text_source_url",
    "effective_date", "absolute_path", "interredaction_id", "cons_selected_info",
]

HEADER_SCHEMA = (
    "doc_id string, "
    + ", ".join(f"{f} string" for f in DOCUMENT_FIELDS)
    + ", not_unique boolean"
)

# DatabaseWrapper.py:17 / tools.py:15
LINK_FIELDS = ["doc_id_from", "doc_id_to", "positions_list", "citations_number"]


def _header_rows(obj: dict) -> dict:
    """One ``{doc_id: header}`` mapping → flat row dicts (P9/P13 edges:
    nested values JSON-stringified exactly like DatabaseWrapper.py:39-41)."""
    rows = []
    for doc_id, header in obj.items():
        row = {"doc_id": doc_id}
        for f in DOCUMENT_FIELDS:
            v = header.get(f)
            if isinstance(v, (dict, list)):
                v = json.dumps(v, ensure_ascii=False)
            row[f] = None if v is None else str(v)
        row["not_unique"] = "not unique" in header
        rows.append(row)
    return rows


def read_headers_object(spark: SparkSession, path: str) -> DataFrame:
    """S6: single-object ``{doc_id: header}`` file(s) → header DataFrame.

    ``wholetext`` keeps one file per row; the json parse runs in executors
    (mapInPandas), so a directory of such files still scales out.
    """
    raw = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["value"]:
                rows.extend(_header_rows(json.loads(blob)))
            if rows:
                yield pd.DataFrame(rows)

    return raw.mapInPandas(parse, HEADER_SCHEMA)


def read_headers_jsonlines(spark: SparkSession, path: str) -> DataFrame:
    """S7: one ``{doc_id: header}`` object per line → header DataFrame."""
    raw = spark.read.text(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                line = line.strip()
                if line:
                    rows.extend(_header_rows(json.loads(line)))
            if rows:
                yield pd.DataFrame(rows)

    return raw.mapInPandas(parse, HEADER_SCHEMA)


def filter_unique_headers(df: DataFrame) -> DataFrame:
    """P8: drop rows whose source header carried a ``'not unique'`` key
    (ksrf.py:326-328 prepare-time filter)."""
    return df.filter(~F.coalesce(F.col("not_unique"), F.lit(False)))


def write_headers_jsonlines(df: DataFrame, path: str) -> None:
    """S9/S10 at scale: headers as jsonlines (``ensure_ascii=False`` ≡
    Spark's default non-escaping json writer), one object per row."""
    df.write.mode("overwrite").json(path)


def read_links_jsonlines(spark: SparkSession, path: str) -> DataFrame:
    """S7 link records: citation edges with derived ``citations_number =
    size(positions_list)`` (A2, DatabaseWrapper.py:33-37 — the stored
    count is always recomputed from the list)."""
    df = spark.read.json(path)
    return df.select(
        "doc_id_from",
        "doc_id_to",
        F.col("positions_list").cast("array<string>").alias("positions_list"),
        F.size("positions_list").alias("citations_number"),
    )
