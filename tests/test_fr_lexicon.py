"""Generated full-size French lexicon: morphology goldens on real
inflected forms, CSV round-trip through the reference-shaped loader, and
the analysis chain running end-to-end with the broadcast lexicon.

Reference scale anchor: FrDics.java:82-83 loads ~130k types; this
generated lexicon ships ~33k real inflected forms from ~1,800 curated
lemmas expanded by textbook French inflection rules."""

from __future__ import annotations

import pytest

from alix_spark.analysis import fr_dicts as D
from alix_spark.analysis.french import analyze
from alix_spark.analysis.fr_lexicon import (
    build_lexicon,
    merged_lexicon,
    write_lexicon_csv,
)


@pytest.fixture(scope="module")
def lex():
    return build_lexicon()


def test_size_and_shape(lex):
    assert len(lex) > 20_000  # a real lexicon, not a sample
    for graph, (tag, orth, lemma) in list(lex.items())[:50]:
        assert graph and isinstance(tag, int) and lemma


GOLDENS = [
    # (inflected form, lemma, tag) — textbook conjugation/inflection
    ("chanteraient", "chanter", D.VERB),     # conditionnel 3pl
    ("mangeons", "manger", D.VERB),          # -ger: e before o
    ("lançait", "lancer", D.VERB),           # -cer: ç before a
    ("nettoiera", "nettoyer", D.VERB),       # -yer: y→i + futur
    ("achètera", "acheter", D.VERB),         # e→è + futur
    ("appellerons", "appeler", D.VERB),      # doubling + futur
    ("préfère", "préférer", D.VERB),         # é→è (mute e only)
    ("préférera", "préférer", D.VERB),       # é kept in futur
    ("finissions", "finir", D.VERB),         # 2nd group -iss-
    ("réussirent", "réussir", D.VERB),       # 2nd group passé simple
    ("vendrait", "vendre", D.VERB),          # 3rd group regular -re
    ("attendu", "attendre", D.VERB),
    ("comprendront", "comprendre", D.VERB),  # prefix paradigm
    ("reviendrons", "revenir", D.VERB),
    ("découvert", "découvrir", D.VERB),      # ouvrir-type pp
    ("offert", "offrir", D.VERB),
    ("décrivait", "décrire", D.VERB),        # écrire-type
    ("sourit", "sourire", D.VERB),
    ("chevaux", "cheval", D.SUB),            # -al → -aux
    ("journaux", "journal", D.SUB),
    ("oiseaux", "oiseau", D.SUB),            # -eau → -eaux
    ("heureuses", "heureux", D.ADJ),         # -eux → -euses
    ("première", "premier", D.ADJ),          # -er → -ère
    ("complète", "complet", D.ADJ),          # -et → -ète exception
    ("muette", "muet", D.ADJ),               # -et → -ette default
    ("menteuse", "menteur", D.ADJ),          # -eur → -euse
    ("créatrice", "créateur", D.ADJ),        # -ateur → -atrice
    ("blanche", "blanc", D.ADJ),             # irregular feminine
    ("vieille", "vieux", D.ADJ),
    ("lentement", "lentement", D.ADV),       # fem + ment
    ("prudemment", "prudemment", D.ADV),     # -ent → -emment
    ("vraiment", "vraiment", D.ADV),         # vowel + ment
]


@pytest.mark.parametrize("graph,lemma,tag", GOLDENS)
def test_inflection_goldens(lex, graph, lemma, tag):
    got = lex.get(graph)
    assert got is not None, f"{graph} missing"
    assert got[2] == lemma and got[0] == tag, (graph, got)


def test_no_marker_leakage(lex):
    # the internal disambiguation digits never reach a graph or lemma
    assert not any(any(ch.isdigit() for ch in g) for g in lex)
    assert not any(
        lemma and any(ch.isdigit() for ch in lemma)
        for _, _, lemma in lex.values()
    )


def test_csv_roundtrip(tmp_path, lex):
    """write_lexicon_csv → load_lexicon_csv is the identity on
    (graph, tag, lemma) — the word.csv loader path (FrDics.java:187-230)
    exercised with the full generated content."""
    path = str(tmp_path / "word.csv")
    n = write_lexicon_csv(path)
    assert n == len(lex)
    loaded = D.load_lexicon_csv(path)
    assert len(loaded) == len(lex)
    for g in ("chanteraient", "chevaux", "heureuses", "prudemment"):
        assert loaded[g][0] == lex[g][0] and loaded[g][2] == lex[g][2]


def test_analysis_chain_with_full_lexicon():
    """Real French sentence through the full chain with the merged
    lexicon: inflected open-class words lemmatize correctly while the
    curated function words keep priority."""
    words = merged_lexicon()
    toks = analyze(
        "Les chevaux mangeons... les oiseaux chanteraient prudemment "
        "dans les journaux qu'elle achètera.",
        words=words,
    )
    lemmas = [t.indexed for t in toks if t.indexed]
    assert "cheval" in lemmas
    assert "oiseau" in lemmas
    assert "chanter" in lemmas
    assert "prudemment" in lemmas
    assert "journal" in lemmas
    assert "acheter" in lemmas
    # function words from the curated list still win the merge
    le = [t for t in toks if t.graph.lower() == "les"][0]
    assert le.tag == D.DET
