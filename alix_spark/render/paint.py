"""D3/D4/D5 — full-text painting, two-doc contrast, light marker.

Reference: ``/root/reference/java/alix/lucene/search/Doc.java:251-288``
(paint: every non-stop token marked with a CSS level by tf bucket),
``Doc.java:354-439`` (contrast: shared vs specific vocabulary of two
docs, levels by relative frequency), ``Marker.java:40-145`` (light
analyzer-match marker for short texts).

Distributed forms: :func:`paint_docs` renders EVERY document in one
cogrouped Arrow pass (docs ⋈ token offsets by doc_id — the same shape as
the KWIC kernel, ``alix_spark/render/kwic.py``); :func:`contrast_docs`
contrasts every document against one reference doc whose (small,
one-doc) tf map is broadcast into the kernel.
"""

from __future__ import annotations

import re


def tf_level(tf: int, max_tf: int, levels: int = 6) -> int:
    """CSS class level for a token frequency (log-bucketed).

    Computed in EXACT integer arithmetic: floor((levels-1)·ln(1+tf) /
    ln(1+max_tf)) equals the largest k with (1+max_tf)^k ≤
    (1+tf)^(levels-1) — so the level is float-free, bit-stable across
    engines and architectures, and the DuckDB oracle reproduces it
    exactly (a float log at a bucket boundary is not)."""
    if max_tf <= 1:
        return 1
    target = (1 + tf) ** (levels - 1)
    base = 1 + max_tf
    k = 0
    acc = base
    while k < levels - 1 and acc <= target:
        k += 1
        acc *= base
    return 1 + min(levels - 1, k)


def paint(
    text: str,
    token_offsets: list[tuple[int, int, str]],
    tfs: dict[str, int],
    stop: set[str] | None = None,
    levels: int = 6,
) -> str:
    """Mark every non-stop token with its tf level
    → ``<mark class="lvlN">`` wrapped text (``Doc.java:251-288``)."""
    stop = stop or set()
    max_tf = max(tfs.values(), default=1)
    out, prev = [], 0
    for s, e, term in sorted(token_offsets):
        if s < prev or not term or term in stop:
            continue
        lvl = tf_level(tfs.get(term, 1), max_tf, levels)
        out.append(text[prev:s])
        out.append(f'<mark class="lvl{lvl}">{text[s:e]}</mark>')
        prev = e
    out.append(text[prev:])
    return "".join(out)


def contrast(
    text: str,
    token_offsets: list[tuple[int, int, str]],
    tf_self: dict[str, int],
    tf_other: dict[str, int],
    len_self: int,
    len_other: int,
) -> str:
    """Two-doc comparative hilite (``Doc.java:354-439``): shared terms
    get class ``shared`` with a level by relative-frequency ratio;
    self-specific terms get ``specific``."""
    out, prev = [], 0
    for s, e, term in sorted(token_offsets):
        if s < prev or not term or term not in tf_self:
            continue
        out.append(text[prev:s])
        if term in tf_other:
            # ratio = r_self/(r_self+r_other) with r = tf/len; cleared
            # of denominators this is a/(a+b) with a = tf_self·len_other
            # and b = tf_other·len_self, so the bucket floor(5·ratio) is
            # exact integer division — float-free like tf_level
            a = tf_self[term] * max(len_other, 1)
            b = tf_other[term] * max(len_self, 1)
            lvl = 1 + min(4, (5 * a) // (a + b))
            out.append(
                f'<mark class="shared lvl{lvl}">{text[s:e]}</mark>'
            )
        else:
            out.append(f'<mark class="specific">{text[s:e]}</mark>')
        prev = e
    out.append(text[prev:])
    return "".join(out)


PAINT_SCHEMA = None  # built lazily to keep pyspark imports out of unit tests


def _paint_schema():
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [StructField("doc_id", LongType()), StructField("html", StringType())]
    )


def paint_docs(
    docs,
    token_table,
    stop: set[str] | None = None,
    levels: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """D3 as a distributed operator: every doc painted in one cogrouped
    pass → (doc_id, html). Per-doc tf comes from the doc's own tokens
    (the reference reads the doc's term vector, ``Doc.java:251-288``)."""
    import pandas as pd
    from pyspark.sql import functions as F

    stop = stop or set()
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    toks = token_table.select("doc_id", "start", "end", "term")

    def run(key, ddf: pd.DataFrame, tdf: pd.DataFrame) -> pd.DataFrame:
        if ddf.empty:
            return pd.DataFrame({"doc_id": [], "html": []}).astype(
                {"doc_id": "int64"}, errors="ignore"
            )
        text = ddf["_text"].iloc[0]
        doc_id = int(ddf["doc_id"].iloc[0])
        offs = list(zip(tdf["start"], tdf["end"], tdf["term"]))
        tfs = tdf[tdf["term"] != ""]["term"].value_counts().to_dict()
        html = paint(text, offs, tfs, stop=stop, levels=levels)
        return pd.DataFrame([(doc_id, html)], columns=["doc_id", "html"])

    return (
        d.groupby("doc_id")
        .cogroup(toks.groupby("doc_id"))
        .applyInPandas(run, _paint_schema())
    )


def contrast_docs(
    docs,
    token_table,
    other_doc_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """D4 as a distributed operator: contrast EVERY doc against one
    reference doc → (doc_id, html). The reference doc's tf map (one doc's
    vocabulary — small) is collected once and shipped in the kernel
    closure; everything else stays a cogrouped per-doc pass."""
    import pandas as pd
    from pyspark.sql import functions as F

    other = (
        token_table.filter(
            (F.col("doc_id") == other_doc_id) & (F.col("term") != "")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    )
    tf_other = {r["term"]: int(r["tf"]) for r in other}
    len_other = sum(tf_other.values())

    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    toks = token_table.select("doc_id", "start", "end", "term")

    def run(key, ddf: pd.DataFrame, tdf: pd.DataFrame) -> pd.DataFrame:
        if ddf.empty:
            return pd.DataFrame({"doc_id": [], "html": []}).astype(
                {"doc_id": "int64"}, errors="ignore"
            )
        text = ddf["_text"].iloc[0]
        doc_id = int(ddf["doc_id"].iloc[0])
        offs = list(zip(tdf["start"], tdf["end"], tdf["term"]))
        nz = tdf[tdf["term"] != ""]["term"]
        tf_self = nz.value_counts().to_dict()
        html = contrast(
            text, offs, tf_self, tf_other, int(nz.size), len_other
        )
        return pd.DataFrame([(doc_id, html)], columns=["doc_id", "html"])

    return (
        d.groupby("doc_id")
        .cogroup(toks.groupby("doc_id"))
        .applyInPandas(run, _paint_schema())
    )


def mark_terms(text: str, terms: list[str], tag: str = "mark") -> str:
    """D5 — light regex marker for short texts (titles)
    (``Marker.java:40-145``): case-insensitive whole-word matches."""
    if not terms:
        return text
    pat = re.compile(
        r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b", re.IGNORECASE
    )
    return pat.sub(lambda m: f"<{tag}>{m.group(0)}</{tag}>", text)
