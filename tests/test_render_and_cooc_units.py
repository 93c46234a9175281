"""Pure-Python unit tests: KWIC line construction, hilite insertion.
(The Spark wrappers are covered by the oracle-parity suite.)"""

from __future__ import annotations

from alix_spark.render.kwic import hilite, kwic_lines


def test_kwic_basic():
    text = "aaaa target bbbb"
    lines = kwic_lines(text, [(5, 11)], context=4)
    assert lines == [(5, "aaa ", "target", " bbb")]


def test_kwic_text_edges():
    text = "hit at start"
    lines = kwic_lines(text, [(0, 3)], context=10)
    assert lines == [(0, "", "hit", " at start")]


def test_kwic_gap_merging():
    text = "one two three four"
    # "two" (4,7) and "three" (8,13) merge with gap >= 1
    lines = kwic_lines(text, [(4, 7), (8, 13)], context=3, gap=1)
    assert len(lines) == 1
    assert lines[0][2] == "two three"
    # without gap: two separate lines
    assert len(kwic_lines(text, [(4, 7), (8, 13)], context=3, gap=0)) == 2


def test_kwic_context_cap():
    text = "x" * 2000
    lines = kwic_lines(text, [(1000, 1001)], context=9999)
    assert len(lines[0][1]) == 500  # MAX_CONTEXT


def test_hilite():
    text = "le chat dort"
    out = hilite(text, [(3, 7)])
    assert out == 'le <mark id="0">chat</mark> dort'


def test_hilite_multiple_and_overlap_skip():
    text = "a b c"
    out = hilite(text, [(0, 1), (0, 1), (4, 5)])
    # the overlapping duplicate is skipped, ids stay sequential by input
    assert out.count("<mark") == 2
    assert out.startswith('<mark id="0">a</mark>')
