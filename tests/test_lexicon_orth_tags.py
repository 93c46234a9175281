"""Full-size lexicon loading (T3), the ``_orth`` twin postings (T7), and
TagFilter'd term statistics (F5).

Reference: 130k-type lexicon ``FrDics.java:82-83``; twin field
``FrAnalyzer.java:56,67``; TagFilter ``Tag.java:305-395`` applied at
``FieldText.java:608-610``.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from alix_spark import Corpus
from alix_spark.analysis import fr_dicts as D
from alix_spark.analysis.pipeline import analyze_documents
from alix_spark.stats.fieldtext import (
    forms_with_tags,
    term_stats_tag_filtered,
)

TAG_NAMES = {D.VERB: "VERB", D.SUB: "SUB", D.ADJ: "ADJ", D.ADV: "ADV"}


def _write_big_lexicon(tmp_path, n_bases: int = 26000) -> str:
    """Deterministic synthetic 130k-entry lexicon CSV (5 inflections per
    base), in the reference word.csv shape GRAPH,TAG,ORTH,LEM."""
    p = tmp_path / "word_full.csv"
    tags = ["VERB", "SUB", "ADJ", "ADV"]
    with open(p, "w", encoding="utf-8") as f:
        f.write("#GRAPH,TAG,ORTH,LEM\n")
        for i in range(n_bases):
            base = f"zz{i:05d}"
            tag = tags[i % 4]
            for suffix in ("", "e", "s", "es", "ait"):
                f.write(f"{base}{suffix},{tag},,{base}\n")
    return str(p)


def test_load_and_broadcast_full_lexicon(spark, tmp_path):
    path = _write_big_lexicon(tmp_path)
    t0 = time.time()
    big = D.load_lexicon_csv(path)
    load_s = time.time() - t0
    assert len(big) == 130_000
    big.update(D.WORDS)  # keep the built-in function words

    # corpus whose vocabulary lives in the big lexicon
    words = [f"zz{(i * 37) % 26000:05d}{s}" for i in range(200)
             for s in ("", "s", "ait")]
    text = " ".join(words)
    docs = spark.createDataFrame(
        [(i, text) for i in range(64)], "doc_id long, text string"
    )
    t0 = time.time()
    tok = analyze_documents(docs, lexicon=big)
    n_tokens = tok.count()
    wall = time.time() - t0
    assert n_tokens == 64 * 600
    rate = n_tokens / wall
    print(f"\nfull-lexicon chain: load {load_s:.2f}s, "
          f"{n_tokens} tokens in {wall:.2f}s = {rate:,.0f} tok/s")
    assert rate > 5_000  # broadcast + lookup must not collapse throughput

    # lemma folding through the injected lexicon
    lemmas = {
        r["term"]
        for r in tok.filter(F.col("graph") == "zz00037s").limit(1).collect()
    }
    assert lemmas == {"zz00037"}


@pytest.fixture(scope="module")
def fr_corpus(spark):
    docs = spark.createDataFrame(
        [
            (0, "Le petit chat dort sur le fleuve ."),
            (1, "La petite femme est tranquille ."),
            (2, "Les petits chats sont grands ."),
        ],
        "doc_id long, text string",
    )
    return Corpus(docs, analyzer="french")


def test_orth_twin_exact_spelling_search(fr_corpus):
    """An inflected query on the _orth channel hits only its exact
    spelling; the lemma channel folds the whole inflection class."""
    orth_hits = {r["doc_id"] for r in fr_corpus.search_orth("petite", k=10).collect()}
    assert orth_hits == {1}
    lemma_hits = {r["doc_id"] for r in fr_corpus.search("petite", k=10).collect()}
    assert lemma_hits == {0, 1, 2}
    # orth postings carry the surface forms, lemma postings the classes
    orth_terms = {
        r["term"]
        for r in fr_corpus.orth_postings.select("term").distinct().collect()
    }
    assert {"petit", "petite", "petits"} <= orth_terms
    lemma_terms = {
        r["term"]
        for r in fr_corpus.postings.select("term").distinct().collect()
    }
    assert "petite" not in lemma_terms and "petit" in lemma_terms


def test_orth_channel_requires_french(spark):
    docs = spark.createDataFrame([(0, "plain text")], "doc_id long, text string")
    c = Corpus(docs)
    with pytest.raises(ValueError, match="french"):
        _ = c.orth_postings


def test_tag_filtered_term_stats(fr_corpus):
    forms = forms_with_tags(fr_corpus.token_table)
    # default 'significant words' view: no stopwords, no punctuation
    sig = {
        r["term"]
        for r in term_stats_tag_filtered(
            forms, exclude_groups=[D.PUN, D.NUM]
        ).collect()
    }
    assert "le" not in sig and "." not in sig
    assert {"chat", "petit", "femme"} <= sig
    # include only substantives
    subs = {
        r["term"]
        for r in term_stats_tag_filtered(forms, include_groups=[D.SUB]).collect()
    }
    assert "chat" in subs and "femme" in subs
    assert "petit" not in subs  # ADJ
    # counts are the plain A1 stats (chat: docs 0 and 2 via lemma folding)
    chat = forms.filter(F.col("term") == "chat").collect()[0]
    assert chat["occs"] == 2 and chat["docs"] == 2
