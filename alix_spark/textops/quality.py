"""Text analysis: token counting, quality scoring, language ID,
fingerprinting — all as JVM-side column expressions (no Python in the hot
path) except where a hash kernel genuinely needs numpy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alix_spark.analysis.simple import tokens_array

# Per-language stopword marker sets for the stopword-vote language
# identifier. Public knowledge (most frequent function words), restricted
# to pure-ASCII forms because the simple tokenizer splits on non-[a-z0-9]
# (an accented marker would never match a token). 16 Latin-script
# languages; closely related pairs (da/no, es/pt) disambiguate on their
# distinctive function words, remaining ties break to the alphabetically
# first code — a deterministic heuristic, not a fastText replacement
# (non-Latin scripts tokenize to nothing here and fall to the tie rule).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "en", "un", "por"],
    "it": ["il", "di", "che", "la", "per", "con", "del", "una", "sono", "non"],
    "pt": ["de", "que", "em", "para", "com", "uma", "os", "dos", "das", "pelo"],
    "nl": ["de", "het", "een", "van", "en", "dat", "niet", "met", "voor", "zijn"],
    "sv": ["och", "att", "det", "som", "en", "av", "den", "med", "har", "inte"],
    "da": ["og", "det", "at", "en", "den", "til", "er", "som", "med", "ikke"],
    "no": ["og", "det", "som", "en", "av", "til", "med", "har", "ikke", "skal"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "dari", "ini", "akan"],
    "pl": ["nie", "jest", "to", "na", "w", "z", "do", "czy", "ale", "co"],
    "ro": ["si", "de", "la", "cu", "pentru", "este", "care", "din", "nu", "mai"],
    "fi": ["ja", "on", "ei", "mutta", "kun", "niin", "se", "joka", "ovat", "ole"],
    "tr": ["ve", "bir", "bu", "da", "de", "ne", "ama", "gibi", "daha", "sonra"],
    "la": ["et", "in", "est", "non", "ad", "cum", "sed", "ut", "quod", "qui"],
}


def token_count(text: Column) -> Column:
    """Whitespace/punct token count — JVM-side."""
    return F.size(tokens_array(text))


def text_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, n_types, ttr, n_chars_raw) quality metrics.

    ttr = type/token ratio, the classic lexical-diversity quality signal.
    """
    toks = tokens_array(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_raw"),
    ).withColumn(
        "ttr",
        F.round(
            F.col("n_types").cast("double")
            / F.greatest(F.col("n_tokens").cast("double"), F.lit(1.0)),
            4,
        ),
    )


def quality_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, mean_token_len, digit_ratio, punct_ratio, quality).

    A simple, deterministic composite: longer-than-noise tokens, few
    digits, moderate punctuation → higher score. All in codegen.
    """
    text = F.col(text_col)
    n_chars = F.length(text).cast("double")
    n_digits = n_chars - F.length(F.regexp_replace(text, "[0-9]", ""))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    toks = tokens_array(text)
    n_tokens = F.greatest(F.size(toks).cast("double"), F.lit(1.0))
    mean_tok = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", "")) / n_tokens
    digit_ratio = n_digits / F.greatest(n_chars, F.lit(1.0))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1.0))
    quality = (
        F.least(mean_tok / 8.0, F.lit(1.0))
        * (1.0 - digit_ratio)
        * (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0)))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(mean_tok, 4).alias("mean_token_len"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, lang_pred, lang_hits) — stopword-marker vote.

    Counts marker-word hits per language over the token array (JVM-side
    ``array_intersect``-free: size of filtered array per language) and
    takes the argmax, ties broken by language code ascending.
    """
    toks = tokens_array(F.col(text_col))

    def marker_filter(lang: str):
        markers = LANG_MARKERS[lang]
        return lambda t: t.isin(markers)

    hit_cols = [
        F.struct(
            F.size(F.filter(toks, marker_filter(lang))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(LANG_MARKERS)
    ]
    # argmax via array_max over (hits, -lang) structs: struct compare is
    # lexicographic, ties must fall to the ascending lang ⇒ compare on
    # (hits, reversed-lang) is messy; instead sort desc by hits then asc
    # lang via sort_array of (negated hits, lang).
    ranked = F.sort_array(
        F.array(
            *[
                F.struct(
                    (-s.getField("hits")).alias("neg"), s.getField("lang").alias("lang"),
                    s.getField("hits").alias("hits"),
                )
                for s in hit_cols
            ]
        )
    )
    best = ranked.getItem(0)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        best.getField("lang").alias("lang_pred"),
        best.getField("hits").cast("long").alias("lang_hits"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_lines, dup_line_ratio, top_bigram_ratio) — the classic
    repetition quality filters of large-scale training-data pipelines
    (duplicate-line fraction and most-frequent-2-gram mass, the
    Gopher-rules family). Line stats are pure codegen array ops; the
    bigram mode is one positional equi-join + two aggregations.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.round(
            1.0
            - F.size(F.array_distinct(lines)).cast("double")
            / F.greatest(F.size(lines).cast("double"), F.lit(1.0)),
            4,
        ).alias("dup_line_ratio"),
    )
    # bigrams as a slice-array transform (tokens are space-free, so
    # "w1 w2" is a bijection with the pair): one explode + one
    # aggregation exchange instead of two explodes + a positional
    # self-join — row-identical (r7 exceptAll cross-check, incl.
    # null/empty/single-token docs)
    toks = tokens_array(F.col(text_col))
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    bi = F.when(
        F.size(toks) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )
    grams = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(bi).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.max("c").cast("double") / F.sum("c").cast("double"), 4
            ).alias("top_bigram_ratio")
        )
    )
    return base.join(grams, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        "dup_line_ratio",
        F.coalesce("top_bigram_ratio", F.lit(0.0)).alias("top_bigram_ratio"),
    )


def fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "xxhash64",
) -> DataFrame:
    """(doc_id, fp) — document fingerprint of the normalized token stream
    (rolling-hash analogue, deterministic).

    ``method``: 'xxhash64' (default, int64) or 'md5' (hex string —
    reproducible in DuckDB SQL for oracle checks). Both are JVM-side.
    """
    toks = tokens_array(F.col(text_col))
    joined = F.array_join(toks, " ")
    if method == "xxhash64":
        fp = F.xxhash64(joined)
    elif method == "md5":
        fp = F.md5(joined)
    else:
        raise ValueError(f"unknown method {method!r}")
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fp"))
