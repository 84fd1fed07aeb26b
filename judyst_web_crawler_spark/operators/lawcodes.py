"""Deep-document parsing: the law-codes splitting pipeline, Spark-first.

Re-expresses the reference's consultant.ru code-crawler extraction stages
(SURVEY §2.7) over DataFrames. The normative line-scanning semantics live
in plain-Python functions (the oracle AND the UDF body — one
implementation, zero drift), wrapped in Arrow ``mapInPandas`` /
``applyInPandas`` for the distributed path:

- X1  ``split_document``       — blank-line-delimited block scanner that
      classifies headings vs article bodies (reference
      ``split_saved_htm`` law_codes.py:467-514; line classes :55-70).
- X2  note extraction fused into the same pass (law_codes.py:526-565).
- X3/A4/X4  ``article_children`` — per-article part (``Ч-n``) and note
      (``ПРМ``) subheaders with inherited metadata
      (law_codes.py:568-698; ids :284-300).
- O2  ``expand_article_range``  — "Статьи N - M" → one row per article
      number via ``explode(sequence(...))`` (law_codes.py:383-392).
- O3  ``walk_contents_tree``    — depth-first contents-tree walk emitting
      ordered header rows (law_codes.py:262-441); tree depth ≤ 6, so the
      recursion runs verbatim inside one ``applyInPandas`` group per
      document, preserving exact DFS order trivially.
- J4  ``attach_titles``         — title → attached-titles inner join with
      first-wins rekey (law_codes.py:337-340, :891-894).
- J5  ``join_blocks``           — title → split-block inner join; a tree
      item with no block marks the whole document broken and quarantines
      it (law_codes.py:291-296, :341-349).

Scale shape: every stage is a per-document group op (group key =
``doc_id``) — one shuffle into doc groups, then embarrassingly parallel;
joins J4/J5 are equi-joins Catalyst plans (broadcast when the title maps
are small). No driver-side loops.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# line-classification patterns (semantics of law_codes.py:55-70)
_HEADING_LEVELS = [
    ("раздел", re.compile(r"^\s*Раздел\s+([IVXLC]+|\d+)\.?\s*(.*)$")),
    ("глава", re.compile(r"^\s*Глава\s+(\d+)\.?\s*(.*)$")),
    ("параграф", re.compile(r"^\s*§\s*(\d+)\.?\s*(.*)$")),
]
_ARTICLE_RE = re.compile(r"^\s*Статья\s+(\d+(?:\.\d+)?)\.\s*(.*)$")
_ARTICLE_RANGE_RE = re.compile(r"^\s*Статьи\s+(\d+)\s*-\s*(\d+)\b")
_PART_RE = re.compile(r"^\s*(\d+)\.\s+\S")
_NOTE_RE = re.compile(r"^\s*Примечани[ея]\b")
_LOST_FORCE_RE = re.compile(r"утратил[аи]?\s+силу", re.IGNORECASE)


# ------------------------------------------------------------------ X1/X2


def split_document(text: str) -> list[dict]:
    """Line-scanning state machine: blank-line-delimited blocks classified
    into heading / article / note entries. This IS the oracle; the UDF
    below runs the same function per document."""
    if text is None:
        return []
    entries: list[dict] = []
    block: list[str] = []
    par_num = 0
    last_article: str | None = None

    def flush(block: list[str]) -> None:
        nonlocal par_num, last_article
        if not block:
            return
        par_num += 1
        head = block[0]
        # X2: a note-led block becomes a ПРМ entry of the last article
        if _NOTE_RE.match(head) and last_article is not None:
            entries.append(
                {
                    "title": last_article + "/ПРМ",
                    "par_num": par_num,
                    "kind": "примечание",
                    "lines": [ln.strip() for ln in block if ln.strip()],
                }
            )
            return
        for kind, rx in _HEADING_LEVELS:
            m = rx.match(head)
            if m:
                entries.append(
                    {
                        "title": head.strip(),
                        "par_num": par_num,
                        "kind": kind,
                        "lines": [ln.strip() for ln in block[1:] if ln.strip()],
                    }
                )
                return
        m = _ARTICLE_RE.match(head)
        if m or _ARTICLE_RANGE_RE.match(head):
            last_article = head.strip()
            body = [ln.strip() for ln in block[1:]]
            # X2: note lines split off into their own entry
            note_idx = next(
                (i for i, ln in enumerate(body) if _NOTE_RE.match(ln)), None
            )
            notes: list[str] = []
            if note_idx is not None:
                notes = body[note_idx:]
                body = body[:note_idx]
            entries.append(
                {
                    "title": head.strip(),
                    "par_num": par_num,
                    "kind": "статья",
                    "lines": [ln for ln in body if ln],
                }
            )
            if notes:
                entries.append(
                    {
                        "title": head.strip() + "/ПРМ",
                        "par_num": par_num,
                        "kind": "примечание",
                        "lines": [ln for ln in notes if ln],
                    }
                )
            return
        # unclassified block: continuation text appended to previous entry
        if entries:
            entries[-1]["lines"] = entries[-1]["lines"] + [
                ln.strip() for ln in block if ln.strip()
            ]

    for line in text.split("\n"):
        if line.strip() == "":
            flush(block)
            block = []
        else:
            block.append(line)
    flush(block)
    return entries


_SPLIT_SCHEMA = (
    "doc_id long, title string, par_num int, kind string, lines array<string>"
)


def split_documents(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """X1/X2 distributed: one exploded row per block entry per document."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "title": [], "par_num": [], "kind": [], "lines": []}
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for e in split_document(text):
                    rows["doc_id"].append(doc_id)
                    rows["title"].append(e["title"])
                    rows["par_num"].append(e["par_num"])
                    rows["kind"].append(e["kind"])
                    rows["lines"].append(e["lines"])
            yield pd.DataFrame(rows)

    return df.select(id_col, text_col).mapInPandas(run, _SPLIT_SCHEMA)


# --------------------------------------------------------------- X3/A4/X4


def article_parts(lines: list[str]) -> list[dict]:
    """Group an article's lines into numbered parts (``Ч-n``); lines
    before the first numbered part form part 0 (the article lead). The
    oracle AND the UDF body (law_codes.py:613-698 semantics)."""
    parts: list[dict] = []
    current_num = 0
    current: list[str] = []
    for ln in lines:
        m = _PART_RE.match(ln)
        if m:
            if current:
                parts.append({"part_num": current_num, "lines": current})
            current_num = int(m.group(1))
            current = [ln]
        else:
            current.append(ln)
    if current:
        parts.append({"part_num": current_num, "lines": current})
    return parts


_CHILD_SCHEMA = (
    "doc_id long, parent_title string, child_id string, kind string, "
    "part_num int, text string, lost_force boolean"
)


def article_children(split_df: DataFrame) -> DataFrame:
    """X3/X4: per-article child subheaders — ``<title>/Ч-n`` part rows and
    ``<title>/ПРМ`` note rows — with inherited identity and a derived
    lost-force flag. Group key = (doc_id): one shuffle, then pandas."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = {
            "doc_id": [], "parent_title": [], "child_id": [], "kind": [],
            "part_num": [], "text": [], "lost_force": [],
        }

        def emit(doc_id, parent, child, kind, num, lines):
            text = "\n".join(lines)
            rows["doc_id"].append(doc_id)
            rows["parent_title"].append(parent)
            rows["child_id"].append(child)
            rows["kind"].append(kind)
            rows["part_num"].append(num)
            rows["text"].append(text)
            rows["lost_force"].append(bool(_LOST_FORCE_RE.search(text)))

        for _, r in pdf.iterrows():
            if r["kind"] == "статья":
                parts = article_parts(list(r["lines"]))
                if len(parts) <= 1:
                    lines = parts[0]["lines"] if parts else []
                    emit(r["doc_id"], r["title"], r["title"], "статья", 0, lines)
                else:
                    for p in parts:
                        emit(
                            r["doc_id"], r["title"],
                            f"{r['title']}/Ч-{p['part_num']}", "часть",
                            p["part_num"], p["lines"],
                        )
            elif r["kind"] == "примечание":
                emit(r["doc_id"], r["title"], r["title"], "примечание", 0, list(r["lines"]))

        return pd.DataFrame(rows)

    return split_df.groupBy("doc_id").applyInPandas(run, _CHILD_SCHEMA)


# --------------------------------------------------------------------- O2


def expand_article_range(df: DataFrame, title_col: str = "title") -> DataFrame:
    """O2: titles like "Статьи 10 - 13. ..." expand to one row per number
    ("Статья 10", ..., "Статья 13") via explode(sequence) — JVM-side."""
    # try_cast: no-match extracts yield '' which must become NULL, not an
    # ANSI cast error
    lo = F.regexp_extract(F.col(title_col), r"Статьи\s+(\d+)\s*-\s*(\d+)", 1).try_cast("int")
    hi = F.regexp_extract(F.col(title_col), r"Статьи\s+(\d+)\s*-\s*(\d+)", 2).try_cast("int")
    ranged = df.filter(lo.isNotNull() & hi.isNotNull() & (hi >= lo))
    single = df.filter(lo.isNull() | hi.isNull() | (hi < lo)).withColumn(
        "article_num",
        F.regexp_extract(F.col(title_col), r"Статья\s+(\d+(?:\.\d+)?)", 1),
    )
    expanded = ranged.withColumn(
        "article_num",
        F.explode(F.transform(F.sequence(lo, hi), lambda x: x.cast("string"))),
    )
    return single.unionByName(expanded)


# --------------------------------------------------------------------- O3


def walk_tree(tree: dict, path: str = "", depth: int = 0) -> list[dict]:
    """Depth-first walk of one contents tree (dict with ``title`` and
    ``children``), emitting rows in exact DFS order. Plain Python: the
    oracle and the UDF body (tree depth ≤ 6, law_codes.py:262-441)."""
    title = tree.get("title", "")
    here = f"{path}/{title}" if path else title
    rows = [{"path": here, "title": title, "depth": depth}]
    for child in tree.get("children", []) or []:
        rows.extend(walk_tree(child, here, depth + 1))
    return rows


_TREE_SCHEMA = "doc_id long, seq int, path string, title string, depth int"


def walk_contents_trees(df: DataFrame, id_col: str = "doc_id", tree_col: str = "tree_json") -> DataFrame:
    """O3 distributed: per-document DFS over a JSON contents tree with a
    dense ``seq`` capturing the exact reference recursion order."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "seq": [], "path": [], "title": [], "depth": []}
            for doc_id, blob in zip(pdf[id_col], pdf[tree_col]):
                if blob is None:
                    continue
                for i, r in enumerate(walk_tree(json.loads(blob))):
                    rows["doc_id"].append(doc_id)
                    rows["seq"].append(i)
                    rows["path"].append(r["path"])
                    rows["title"].append(r["title"])
                    rows["depth"].append(r["depth"])
            yield pd.DataFrame(rows)

    return df.select(id_col, tree_col).mapInPandas(run, _TREE_SCHEMA)


# --------------------------------------------------------------------- P15


def derived_redaction_links(
    df: DataFrame,
    base: str = "http://www.consultant.ru",
    doc_col: str = "rd_doc_number",
    prev_col: str = "prev_doc_number",
) -> DataFrame:
    """P15 (law_codes.py:844-890): synthesize the per-redaction derived
    URLs (document page, comparison link, additional-info link) from doc
    numbers — pure ``format_string`` projections, JVM-side."""
    doc = F.col(doc_col).cast("string")
    prev = F.col(prev_col).cast("string")
    return df.withColumns(
        {
            "rd_doc_link": F.format_string(base + "/document/cons_doc_LAW_%s/", doc),
            "redaction_comparison_link": F.when(
                prev.isNotNull(),
                F.format_string(base + "/compare/?doc1=%s&doc2=%s", prev, doc),
            ),
            "addit_info_link": F.format_string(base + "/document/cons_doc_LAW_%s/add-info/", doc),
        }
    )


# ------------------------------------------------------------------ J4/J5


def attach_titles(items: DataFrame, attached: DataFrame, title_col: str = "title") -> DataFrame:
    """J4: inner-join tooltip metadata by title; duplicate metadata titles
    collapse first-wins (law_codes.py:891-894 rekey = dict last write —
    the reference builds the dict in reverse, net effect first-wins)."""
    meta = attached.dropDuplicates([title_col])
    return items.join(meta, on=title_col, how="inner")


def join_blocks(tree_items: DataFrame, blocks: DataFrame, id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """J5: attach split blocks to tree items by (doc_id, title); any tree
    item without a block marks the WHOLE document broken → quarantined.

    Returns (good_joined, broken_doc_ids). Plan: one left join + a
    per-doc any() aggregation — two shuffles on doc_id, AQE-coalesced.
    """
    joined = tree_items.join(
        blocks.withColumn("_has_block", F.lit(True)),
        on=[id_col, "title"],
        how="left",
    )
    broken = (
        joined.groupBy(id_col)
        .agg(F.max(F.col("_has_block").isNull().cast("int")).alias("_broken"))
        .filter(F.col("_broken") == 1)
        .select(id_col)
    )
    good = joined.join(broken, on=id_col, how="left_anti").drop("_has_block")
    return good, broken
