"""D1/D2 — KWIC concordance lines and match highlighting.

Reference: ``/root/reference/java/alix/lucene/search/Doc.java:452-542``
(kwic at 452-491: left/right char context, default 50 max 500 chars,
adjacent hits grouped into one line with a gap parameter; hilite at
493-542: ``<mark>`` inserts around matched offsets).

Spark shape: a mapInPandas kernel over (doc text + match offsets). Match
offsets come from the analysis chain (token start/end); matching itself
is a term-set membership test over the token table — the automaton of
``DocHiliter`` collapses to a semi-join.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_CONTEXT = 50
MAX_CONTEXT = 500  # Doc.java kwic bounds


def kwic_lines(
    text: str,
    offsets: list[tuple[int, int]],
    context: int = DEFAULT_CONTEXT,
    gap: int = 0,
) -> list[tuple[int, str, str, str]]:
    """One doc's matches → [(start, left, hit, right)].

    Adjacent hits whose gap (in chars) is within ``gap`` merge into one
    line (``Doc.java:468-480`` expression grouping).
    """
    context = min(max(context, 0), MAX_CONTEXT)
    if not offsets:
        return []
    offsets = sorted(offsets)
    merged: list[list[int]] = [list(offsets[0])]
    for s, e in offsets[1:]:
        if gap and s - merged[-1][1] <= gap:
            merged[-1][1] = e
        else:
            merged.append([s, e])
    out = []
    for s, e in merged:
        left = text[max(0, s - context) : s]
        right = text[e : e + context]
        out.append((s, left, text[s:e], right))
    return out


def hilite(text: str, offsets: list[tuple[int, int]], tag: str = "mark") -> str:
    """Insert ``<tag id=N>`` markers around matched offsets
    (``Doc.java:493-542``)."""
    out = []
    prev = 0
    for i, (s, e) in enumerate(sorted(offsets)):
        if s < prev:
            continue
        out.append(text[prev:s])
        out.append(f'<{tag} id="{i}">{text[s:e]}</{tag}>')
        prev = e
    out.append(text[prev:])
    return "".join(out)


KWIC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("start", IntegerType()),
        StructField("left", StringType()),
        StructField("hit", StringType()),
        StructField("right", StringType()),
    ]
)


def kwic(
    docs: DataFrame,
    token_table: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    context: int = DEFAULT_CONTEXT,
    gap: int = 0,
) -> DataFrame:
    """Distributed KWIC: match offsets from the token table, lines from a
    cogrouped kernel over (docs, matches) → (doc_id, start, left, hit,
    right)."""
    matches = token_table.filter(F.col("term").isin(terms)).select(
        "doc_id", "start", "end"
    )
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    # only docs that actually contain a match enter the cogroup: a KWIC
    # request must not shuffle the whole corpus' text — the semi-join
    # keeps the doc-side proportional to the hit set (at 100 TB the
    # difference between a concordance and a full-corpus pass)
    d = d.join(matches.select("doc_id").distinct(), "doc_id", "left_semi")

    def run(key, ddf: pd.DataFrame, mdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if ddf.empty or mdf.empty:
            return pd.DataFrame(
                {c.name: [] for c in KWIC_SCHEMA.fields}
            ).astype({"doc_id": "int64", "start": "int32"}, errors="ignore")
        text = ddf["_text"].iloc[0]
        doc_id = int(ddf["doc_id"].iloc[0])
        offs = list(zip(mdf["start"].tolist(), mdf["end"].tolist()))
        for s, left, hit, right in kwic_lines(text, offs, context, gap):
            rows.append((doc_id, s, left, hit, right))
        return pd.DataFrame(rows, columns=[c.name for c in KWIC_SCHEMA.fields])

    return (
        d.groupby("doc_id")
        .cogroup(matches.groupby("doc_id"))
        .applyInPandas(run, KWIC_SCHEMA)
    )
