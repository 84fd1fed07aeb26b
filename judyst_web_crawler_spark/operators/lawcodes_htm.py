"""Reference-faithful saved-HTM splitting (X1/X2/X3) + header build (X4).

The reference's law-codes crawler does NOT split plain text: it classifies
*HTML lines* of a consultant.ru "saved HTM" export by CSS-class prefixes
and a handful of structural regexes (law_codes.py:55-70), then scans the
file with a two-cursor state machine (split_saved_htm, law_codes.py:
467-514), cleans each block of tables / cons-notes / redaction notes
(clear_splitted_htm_and_get_plus_add_cons_notes, :526-565), and splits
article blocks into part (Ч-n) and note (ПРМ) subheaders
(build_article_subheaders_treeItem, :567-698).

This module reproduces those semantics exactly — same prefixes, same
regexes, same control flow, including the reference's quirks (last-wins
on duplicate titles; ``kept[i-1]`` negative-index wrap when probing for a
preceding cons-note) — as plain-Python normative functions wrapped in
Arrow ``mapInPandas`` for the distributed path. Parity is pinned
NON-circularly: tests/test_lawcodes_htm.py executes the reference's own
functions (they are pure regex/string code) on synthetic HTM and asserts
equal output.

Deviations (documented, all crash→skip hardening for untrusted input):
- a heading whose Par id is missing from the contents map is skipped
  (the reference raises KeyError and abandons the document);
- a contents line whose title regex finds nothing is skipped (reference
  raises TypeError);
- the outer scan is bounded at len(lines) iterations (the reference can
  loop forever on pathological input).

Scale shape: one Arrow crossing per document for the split; subheader
derivation is per-block pure Python inside the same pass. No shuffles
beyond the caller's.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from judyst_web_crawler_spark.functions.extraction import (
    NEVER_EFFECTIVE,
    html_text_content,
)

ARTICLE_SIGN = "СТ"       # law_codes.py:120
NOTE_SIGN = "ПРМ"         # law_codes.py:121
PART_SIGN = "Ч"           # law_codes.py:122
NOTE_NAME_PREFIX = "Примечание"   # law_codes.py:127
PART_NAME_PREFIX = "Часть "       # law_codes.py:128

# --- line classes of the saved-HTM export (law_codes.py:55-70) ----------
# The class strings (s2B aJ bH …) are consultant.ru's generated CSS; the
# reference matches them as literal prefixes. Re-stated here because they
# ARE the classification semantics.
EMPTY_LINE_RE = re.compile(
    r'<div class="(?:\w+\s+){2}\w+"(?:\s*?style=".*?")*?></div>'
)
NOT_ARTICLE_PREFIX = '<div class="s2B aC bH'
ARTICLE_PREFIX = '<div class="s2B aJ bH'
TABLE_PREFIX = "<table border"
TR_PREFIX = "<tr style"
CONS_NOTE_PREFIX = '<td class="bD'
REDACTION_NOTE_RE = re.compile(
    r'<div class="(?:\w+\s+){2}\w+"(?:\s*?style=".*?")*?>\('
)
ARTICLE_TEXT_PREFIX = '<div class="s0 aJ bG'

# contents section = everything before the first <table (law_codes.py:59)
CONTENTS_RE = re.compile(r"\<div[\w\W]*?\<table")
# "#Par123"' in a contents link (law_codes.py:56)
PAR_LABEL_IN_CONTENTS_RE = re.compile(r'(?<=#Par)\d+(?=")')
# title text inside a contents line (law_codes.py:57-58; the Latin 'E' in
# the class is a reference quirk, preserved)
TITLE_IN_CONTENTS_RE = re.compile(
    r"(?:(?<=>◦).*?(?=<)|(?<=>)(?:[А-Яа-яEё§\d]|&sect;|&quot;).*?(?=<))"
)
# 'id="Par123"' on a body heading line (law_codes.py:60)
PAR_IN_LINE_RE = re.compile(r'(?<=id="Par)\d+(?=")')

# --- part/note boundary patterns (law_codes.py:152-171) ------------------
PART_NUM_RE = re.compile(r"\d+(?:\.[-–—\d]+)*(?=\.)")
PART_RANGE_RE = re.compile(
    r"\d+(?:\.[-–—\d]+\.*?)*\s*?[-–—]\s*?\d+(?:\.[-–—\d]+\.*?)*(?=\.)"
)
NOTE_CHECK_RE = re.compile(
    r"(?:Примечание.(?!\s[Уу]тратило силу\.)|"
    r"Примечания(?:\.|:))(?!\s[Уу]тратили силу\.)"
)
NOTE_WORD_DEL_RE = re.compile(
    r"(?:Примечание.\s+|Примечания:\s+|Примечания.\s+)"
)

_DIV_RE = re.compile(r"<div\b[^>]*>[\s\S]*?</div>")


def cons_note_text(line: str) -> str:
    """text of every <div> in a cons-note cell, newline-joined
    (get_cons_note_from_str, law_codes.py:516-523; xpath('//div') +
    text_content + strip). Non-nested divs only — the saved-HTM note
    cells the reference consumes are flat."""
    return "\n".join(
        html_text_content(m.group(0)).strip() for m in _DIV_RE.finditer(line)
    )


def contents_titles(htm: str) -> dict[str, str]:
    """Par label → raw title from the saved-HTM contents section
    (get_paras_and_titles_from_saved_htm, law_codes.py:453-464)."""
    m = CONTENTS_RE.search(htm)
    if m is None:
        return {}
    result: dict[str, str] = {}
    for line in m[0].splitlines():
        pm = PAR_LABEL_IN_CONTENTS_RE.search(line)
        if pm is None:
            continue
        tm = TITLE_IN_CONTENTS_RE.search(line)
        if tm is None:  # reference raises TypeError here; we skip
            continue
        result[pm[0]] = tm[0]
    return result


def split_saved_htm(htm: str) -> dict[str, dict]:
    """Two-cursor block scan over saved-HTM lines (split_saved_htm,
    law_codes.py:467-514), control flow reproduced exactly:

    - phase A advances ``start`` past every empty line until a heading
      line (article or non-article prefix) with an ``id="ParN"`` whose N
      appears in the contents map; the title comes from the contents map
      with ``&sect;``/``&quot;`` unescaped (law_codes.py:489-491);
    - phase B walks from the first empty line after the heading to the
      next heading (or EOF), tracking the last empty line as ``end``;
    - the block is ``lines[start:end]`` (heading line included), keyed by
      title — duplicate titles overwrite (reference dict last-wins).
    """
    lines = htm.splitlines()
    titles = contents_titles(htm)
    result: dict[str, dict] = {}
    start = end = cont = nxt = 0
    title: str | None = None
    par: str | None = None
    mtype: str | None = None
    done = False
    prev_state: tuple | None = None
    guard = 0
    while not done:
        guard += 1
        if guard > len(lines) + 1:  # belt-and-braces iteration bound
            break
        for i in range(nxt, len(lines)):
            if EMPTY_LINE_RE.match(lines[i]) is not None:
                start = i + 1
                continue
            if lines[i].startswith(NOT_ARTICLE_PREFIX):
                mtype = "not " + ARTICLE_SIGN
            elif lines[i].startswith(ARTICLE_PREFIX):
                mtype = ARTICLE_SIGN
            else:
                continue
            pm = PAR_IN_LINE_RE.search(lines[i])
            if pm is None:
                continue
            if pm[0] not in titles:  # deviation: reference raises KeyError
                continue
            par = pm[0]
            title = titles[par].replace("&sect;", "§").replace("&quot;", '"')
            for z in range(i + 1, len(lines)):
                if EMPTY_LINE_RE.match(lines[z]) is not None:
                    cont = z
                    break
            break
        for j in range(cont, len(lines)):
            if EMPTY_LINE_RE.match(lines[j]) is not None:
                end = j
                continue
            if (
                lines[j].startswith(NOT_ARTICLE_PREFIX)
                or lines[j].startswith(ARTICLE_PREFIX)
                or j == len(lines) - 1
            ):
                nxt = end
                if j == len(lines) - 1:
                    done = True
                else:
                    break
        if title is not None:
            result[title] = {
                "htm_par_num": par,
                "type": mtype,
                "lines": lines[start:end],
            }
        # deviation (termination hardening): when a document's LAST line
        # matches the empty-line class, phase B's `end = j; continue`
        # branch skips the j == len-1 check and the reference re-scans the
        # same block forever (O(n²) under the plain iteration bound above,
        # measured quadratic). A repeated cursor state can only reproduce
        # the identical record, so break on no progress — O(n) worst case.
        state = (start, end, cont, nxt, title)
        if state == prev_state:
            break
        prev_state = state
    return result


def clean_block(lines: list[str]) -> tuple[list[str], str | None, str | None]:
    """Pre-body cleanup of one block
    (clear_splitted_htm_and_get_plus_add_cons_notes, law_codes.py:526-565):
    walk lines until the first real article-text line; along the way
    delete empty lines / table rows, harvest the redaction note (a
    paren-opened div) and cons-notes (``<td class="bD`` cells). Returns
    (cleaned lines, cons_note, redaction_note).

    The empty-line branch mirrors the reference exactly: an empty line
    normally ENDS the scan unless it introduces a 4-line table block
    (``lines[i+1]`` is a table and ``lines[i+4]`` empty) or sits at the
    very end (IndexError → continue).
    """
    lines = list(lines)
    notes: list[str] = []
    rd_note = ""
    to_del: list[int] = []
    i = -1
    for i in range(len(lines)):
        if (
            lines[i].startswith(ARTICLE_TEXT_PREFIX)
            and REDACTION_NOTE_RE.match(lines[i]) is None
        ):
            break
        elif EMPTY_LINE_RE.match(lines[i]) is not None:
            to_del.append(i)
            try:
                if (
                    lines[i + 1].startswith(TABLE_PREFIX)
                    and EMPTY_LINE_RE.match(lines[i + 4]) is not None
                ):
                    continue
                else:
                    break
            except IndexError:
                continue
        elif lines[i].startswith(TABLE_PREFIX) or lines[i].startswith(TR_PREFIX):
            to_del.append(i)
        elif REDACTION_NOTE_RE.match(lines[i]) is not None:
            rd_note = html_text_content(lines[i])
            to_del.append(i)
        elif lines[i].startswith(CONS_NOTE_PREFIX):
            to_del.append(i)
            notes.append(cons_note_text(lines[i]))
    for off, idx in enumerate(to_del):
        del lines[idx - off]
    return (
        lines,
        "\n\n".join(notes) if notes else None,
        rd_note if rd_note else None,
    )


def article_entries(lines: list[str]) -> list[dict]:
    """Article block lines → ordered text entries with adjacent notes
    (build_article_subheaders_treeItem first half, law_codes.py:570-608):
    keep only cons-note and article-text lines; every non-redaction
    article-text line yields {text, cons_note?, redaction_note?} from its
    neighbors. ``kept[i-1]`` at i==0 wraps to the LAST line — that is the
    reference's negative-index behavior, reproduced for parity."""
    kept = [
        ln
        for ln in lines
        if ln.startswith(CONS_NOTE_PREFIX) or ln.startswith(ARTICLE_TEXT_PREFIX)
    ]
    out: list[dict] = []
    for i in range(len(kept)):
        if (
            kept[i].startswith(ARTICLE_TEXT_PREFIX)
            and REDACTION_NOTE_RE.match(kept[i]) is None
        ):
            entry: dict = {"text": html_text_content(kept[i])}
            if kept and kept[i - 1].startswith(CONS_NOTE_PREFIX):
                entry["cons_note"] = cons_note_text(kept[i - 1])
            if i + 1 < len(kept) and REDACTION_NOTE_RE.match(kept[i + 1]) is not None:
                entry["redaction_note"] = html_text_content(kept[i + 1])
            out.append(entry)
    return out


def split_article_children(
    entries: list[dict], part_name_prefix: str = PART_NAME_PREFIX
) -> tuple[dict | None, list[dict]]:
    """Article entries → (note subheader | None, part subheaders)
    (build_article_subheaders_treeItem second half, law_codes.py:613-698):

    - single-entry articles produce no subheaders (reference ``if not
      len(...) > 1: continue``);
    - a ``Примечание``-led entry becomes the ПРМ subheader carrying ALL
      remaining text, and truncates the entry list;
    - entries whose text starts with a part number (``N.``, not a range)
      become Ч-N subheaders spanning to the next part start.
    """
    entries = list(entries)
    if not len(entries) > 1:
        return None, []
    note: dict | None = None
    indexes: list[int] = []
    for i in range(len(entries)):
        if (
            PART_NUM_RE.match(entries[i]["text"]) is not None
            and PART_RANGE_RE.match(entries[i]["text"]) is None
        ):
            indexes.append(i)
        if NOTE_CHECK_RE.match(entries[i]["text"]) is not None:
            note = {
                "sign": NOTE_SIGN,
                "num": None,
                "title": NOTE_NAME_PREFIX,
                "text": "\n".join(e["text"] for e in entries[i:]),
                "cons_note": entries[i].get("cons_note"),
                "redaction_note": entries[i].get("redaction_note"),
            }
            del entries[i:]
            break
    parts: list[dict] = []
    for j in range(len(indexes)):
        i = indexes[j]
        if i >= len(entries):  # part start swallowed by the note truncation
            continue
        num = PART_NUM_RE.match(entries[i]["text"])[0]
        i2 = indexes[j + 1] if j + 1 < len(indexes) else len(entries)
        i2 = min(i2, len(entries))
        parts.append(
            {
                "sign": f"{PART_SIGN}-{num}",
                "num": num,
                "title": part_name_prefix + str(num),
                "text": "\n".join(e["text"] for e in entries[i:i2]),
                "cons_note": entries[i].get("cons_note"),
                "redaction_note": entries[i].get("redaction_note"),
            }
        )
    return note, parts


# ------------------------------------------------------------- Spark path


_SPLIT_SCHEMA = (
    "doc_id long, title string, htm_par_num string, block_type string, "
    "lines array<string>, cons_note string, redaction_note string"
)


def split_saved_htm_df(
    df: DataFrame, id_col: str = "doc_id", htm_col: str = "htm"
) -> DataFrame:
    """Distributed X1+X2: one row per split block per document, already
    cleaned (tables deleted, notes harvested). ONE Arrow crossing; block
    emission order = the reference's dict insertion order."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "title": [], "htm_par_num": [],
                "block_type": [], "lines": [], "cons_note": [],
                "redaction_note": [],
            }
            for doc_id, htm in zip(pdf[id_col], pdf[htm_col]):
                if htm is None:
                    continue
                for title, block in split_saved_htm(htm).items():
                    lines, cons, rd = clean_block(block["lines"])
                    rows["doc_id"].append(doc_id)
                    rows["title"].append(title)
                    rows["htm_par_num"].append(block["htm_par_num"])
                    rows["block_type"].append(block["type"])
                    rows["lines"].append(lines)
                    rows["cons_note"].append(cons)
                    rows["redaction_note"].append(rd)
            yield pd.DataFrame(rows)

    return df.select(id_col, htm_col).mapInPandas(run, _SPLIT_SCHEMA)


_CHILD_SCHEMA = (
    "doc_id long, parent_title string, sign string, child_num string, "
    "child_title string, text string, cons_note string, redaction_note string"
)


def article_children_htm(
    split_df: DataFrame, part_name_prefix: str = PART_NAME_PREFIX
) -> DataFrame:
    """Distributed X3/X4 subheader derivation over split blocks: article
    blocks (block_type = СТ) expand to their Ч-n / ПРМ children. Pure
    per-row work — mapInPandas, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "parent_title": [], "sign": [], "child_num": [],
                "child_title": [], "text": [], "cons_note": [],
                "redaction_note": [],
            }

            def emit(doc_id, parent, child):
                rows["doc_id"].append(doc_id)
                rows["parent_title"].append(parent)
                rows["sign"].append(child["sign"])
                rows["child_num"].append(child["num"])
                rows["child_title"].append(child["title"])
                rows["text"].append(child["text"])
                rows["cons_note"].append(child["cons_note"])
                rows["redaction_note"].append(child["redaction_note"])

            for doc_id, title, btype, lines in zip(
                pdf["doc_id"], pdf["title"], pdf["block_type"], pdf["lines"]
            ):
                if btype != ARTICLE_SIGN:
                    continue
                note, parts = split_article_children(
                    article_entries(list(lines)), part_name_prefix
                )
                if note is not None:
                    emit(doc_id, title, note)
                for p in parts:
                    emit(doc_id, title, p)
            yield pd.DataFrame(rows)

    return split_df.mapInPandas(run, _CHILD_SCHEMA)


# --------------------------------------------------------------------- X4


def effective_date_cols(raw: Column | str) -> tuple[Column, Column]:
    """The reference stores the literal sentinel 'не_действовала' when a
    redaction has no effective date (law_codes.py:766-770). SQL NULLs +
    a typed flag are the Spark-native spelling: returns
    (effective_date, never_effective)."""
    c = F.col(raw) if isinstance(raw, str) else raw
    never = c == F.lit(NEVER_EFFECTIVE)
    return F.when(~never, c), never


def redaction_header_cols(
    df: DataFrame,
    code_part_key: str = "code_part_key",
    supertype: str = "supertype",
    title: str = "title",
    release_date: str = "release_date",
    effective_raw: str = "effective_date_raw",
    rd_doc_number: str = "rd_doc_number",
    rd_number: str = "rd_number",
    rd_type: str = "rd_type",
    prev_rd_doc_num: str = "prev_rd_doc_num",
    host: str = "www.consultant.ru",
) -> DataFrame:
    """X4 redaction-header build (law_codes.py:759-890), all JVM-side:

    - doc_id / absolute_path = ``{part_key}/РЕД-N{number}-{effective}``
      (the path embeds the SENTINEL, exactly like the reference :772-774);
    - effective_date → NULL + never_effective flag for 'не_действовала';
    - derived consultant links: doc page, unicode text, changes review,
      additional info, and the comparison link whose n/diff parameter
      order flips on rd_type == 'n' (law_codes.py:844-857).
    """
    eff, never = effective_date_cols(effective_raw)
    base = f"http://{host}/cons/cgi/online.cgi"
    docn = F.col(rd_doc_number).cast("string")
    prevn = F.col(prev_rd_doc_num).cast("string")
    doc_id = F.format_string(
        "%s/РЕД-N%s-%s",
        F.col(code_part_key),
        F.col(rd_number).cast("string"),
        F.col(effective_raw),
    )
    comparison = F.when(
        F.col(rd_type) == "n",
        F.format_string(base + "?req=doc&base=LAW&div=LAW&n=%s&diff=%s", docn, prevn),
    ).otherwise(
        F.format_string(base + "?req=doc&base=LAW&div=LAW&n=%s&diff=%s", prevn, docn)
    )
    return df.withColumns(
        {
            "doc_id": doc_id,
            "absolute_path": doc_id,
            "doc_type": F.format_string("%s/ЧАСТЬ/РЕД", F.col(supertype)),
            "effective_date": eff,
            "never_effective": never,
            "rd_doc_link": F.format_string(base + "?req=doc&base=LAW&n=%s", docn),
            "unicode_text_link": F.format_string(
                base + "?req=export&type=utxt&base=LAW&n=%s", docn
            ),
            "changes_review_link": F.format_string(
                base + "?req=query&REFDOC=%s&REFBASE=LAW&mode=chgreview&content=instant",
                docn,
            ),
            "addit_info_link": F.format_string(
                base + "?req=query&div=LAW&REFDOC=%s&REFBASE=LAW"
                "&REFTYPE=CDLT_DOC_I_BACKREFS&mode=backrefs",
                docn,
            ),
            "redaction_comparison_link": comparison,
        }
    )


def subheader_cols(
    children: DataFrame,
    parents: DataFrame,
    sign_col: str = "sign",
    on: tuple[str, str] = ("doc_id", "parent_title"),
) -> DataFrame:
    """X4 subheader inheritance (create_subheader, law_codes.py:228-260):
    children take the parent's supertype/release/effective dates and
    text_source_url; ``doc_type = parent/SIGN``; ``attached_titles`` =
    child title PREPENDED to the parent's list (reference ``insert(0,
    title)``). One equi-join — broadcast when the parent header set is
    dim-sized."""
    pcols = parents.select(
        F.col(on[0]),
        F.col("title").alias(on[1]),
        F.col("supertype"),
        F.col("doc_type").alias("_parent_doc_type"),
        F.col("absolute_path").alias("_parent_path"),
        F.col("release_date"),
        F.col("effective_date"),
        F.col("never_effective"),
        F.col("text_source_url"),
        F.col("attached_titles").alias("_parent_attached"),
    )
    joined = children.join(pcols, on=list(on), how="inner")
    return joined.withColumns(
        {
            "doc_type": F.format_string(
                "%s/%s",
                F.col("_parent_doc_type"),
                F.split(F.col(sign_col), "-").getItem(0),
            ),
            "absolute_path": F.format_string(
                "%s/%s", F.col("_parent_path"), F.col(sign_col)
            ),
            "attached_titles": F.concat(
                F.array(F.col("child_title")), F.col("_parent_attached")
            ),
        }
    ).drop("_parent_doc_type", "_parent_path", "_parent_attached")


def header_struct(df: DataFrame) -> Column:
    """The reference's 9-field header as ONE typed struct column
    (create_header, law_codes.py:200-226) — to_json only at sinks
    (SURVEY §1.4)."""
    return F.struct(
        F.col("supertype"),
        F.col("doc_type"),
        F.col("absolute_path"),
        F.col("title"),
        F.col("release_date"),
        F.col("effective_date"),
        F.col("never_effective"),
        F.col("text_source_url"),
        F.struct(
            F.col("rd_doc_link"),
            F.col("redaction_comparison_link"),
            F.col("addit_info_link"),
            F.col("attached_titles"),
        ).alias("cons_selected_info"),
    )
