"""Pure-Python unit tests: paint/contrast/marker levels + French
collation keys."""

from __future__ import annotations

from alix_spark.render.paint import contrast, mark_terms, paint, tf_level
from alix_spark.stats.collation import fr_sort_key


def test_tf_levels_monotone():
    levels = [tf_level(tf, 100) for tf in (1, 2, 5, 20, 100)]
    assert levels == sorted(levels)
    assert levels[0] == 1 and levels[-1] == 6


def test_paint_skips_stopwords():
    text = "le chat dort"
    offs = [(0, 2, "le"), (3, 7, "chat"), (8, 12, "dort")]
    out = paint(text, offs, {"chat": 5, "dort": 1}, stop={"le"})
    assert "le <mark" in out
    assert out.count("<mark") == 2


def test_contrast_classes():
    text = "a b"
    offs = [(0, 1, "a"), (2, 3, "b")]
    out = contrast(text, offs, {"a": 2, "b": 1}, {"a": 1}, 3, 10)
    assert 'class="shared' in out  # a shared
    assert 'class="specific"' in out  # b specific


def test_mark_terms_word_boundary():
    out = mark_terms("Fast faster fast.", ["fast"])
    assert out == "<mark>Fast</mark> faster <mark>fast</mark>."


def test_fr_sort_key_order():
    # accent-insensitive primary: côte sorts with cote, before coteau
    words = ["coteau", "côte", "cote", "zèbre", "État", "etat"]
    ordered = sorted(words, key=fr_sort_key)
    assert ordered.index("cote") < ordered.index("coteau")
    assert ordered.index("côte") < ordered.index("coteau")
    assert ordered[-1] == "zèbre"
    # accent-sensitive tiebreak keeps cote before côte (NFD combining)
    assert ordered.index("cote") < ordered.index("côte")


def test_fr_backwards_secondary_accents():
    """FRANCE-locale accent ordering compares accents from the END of the
    word: cote < côte < coté < côté (a forward comparison would swap the
    middle two). Lowercase sorts before uppercase at tertiary level."""
    assert sorted(["côté", "coté", "côte", "cote"], key=fr_sort_key) == [
        "cote", "côte", "coté", "côté"
    ]
    assert sorted(["Zola", "zola"], key=fr_sort_key) == ["zola", "Zola"]
    # accents/case never outrank a primary letter difference
    assert sorted(["côtz", "cota"], key=fr_sort_key) == ["cota", "côtz"]
