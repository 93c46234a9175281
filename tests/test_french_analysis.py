"""Golden unit tests for the French analysis chain — one per rule family
(SURVEY.md §7.2.2: elision, hyphen enclitics, abbreviation dots, roman
numerals, locutions, person names, punctuation holes). Pure Python, no
Spark session."""

from __future__ import annotations

from alix_spark.analysis import fr_dicts as D
from alix_spark.analysis.french import analyze, tokenize_fr


def graphs(text):
    return [t.graph for t in tokenize_fr(text)]


def indexed(text):
    return [t.indexed for t in analyze(text)]


def test_basic_sentence_with_holes():
    # FlagCloudFilter.java:114-117 — punctuation keeps its position
    toks = analyze("Le petit chat est mort.")
    assert [t.indexed for t in toks] == ["le", "petit", "chat", "être", "mourir", ""]
    assert [t.pos for t in toks] == [0, 1, 2, 3, 4, 5]


def test_elision_split():
    # FrTokenizer.java:431-437: the elided prefix is REPLACED by its
    # dictionary value and sent (l' → le), offsets covering "l'"
    toks = analyze("l'homme")
    assert [t.graph for t in toks] == ["le", "homme"]
    assert [t.indexed for t in toks] == ["le", "homme"]
    assert (toks[0].start, toks[0].end) == (0, 2)


def test_hyphen_enclitic_split():
    # FrTokenizer.java:462-475: dis-moi → dis + moi
    assert graphs("dis-moi") == ["dis", "moi"]
    assert indexed("dis-moi") == ["dire", "moi"]


def test_euphonic_t_removed():
    # va-t-il → va + il (the euphonic t disappears)
    g = graphs("va-t-il")
    assert g == ["va", "il"], g


def test_hyphen_kept_in_compound_words():
    # hyphen NOT followed by an enclitic stays inside the token
    assert graphs("porte-monnaie") == ["porte-monnaie"]


def test_abbrev_dot_vs_sentence_dot():
    # FrTokenizer.java:342-401: M. keeps its dot; sentence dot is punct
    toks = tokenize_fr("M. Dupont est mort.")
    assert [t.graph for t in toks] == ["M.", "Dupont", "est", "mort", "."]


def test_roman_numeral_to_num():
    toks = analyze("chapitre XII")
    assert [t.indexed for t in toks] == ["chapitre", "NUM"]


def test_decimal_number():
    toks = analyze("il a 3,14 ans")
    assert "NUM" in [t.indexed for t in toks]


def test_locution_compounding():
    # LocutionFilter.java:101-226: parce que folds to one token
    toks = analyze("mort parce que la vie")
    assert [t.indexed for t in toks] == ["mourir", "parce que", "le", "vie"]
    # positions renumbered sequentially
    assert [t.pos for t in toks] == [0, 1, 2, 3]


def test_locution_longest_match():
    toks = analyze("tout à coup il dort")
    assert toks[0].indexed == "tout à coup"


def test_persname_join():
    # FrPersnameFilter.java:104-177
    toks = analyze("Victor Hugo est mort")
    assert toks[0].indexed == "Victor Hugo"
    assert [t.indexed for t in toks] == ["Victor Hugo", "être", "mourir"]


def test_persname_with_particle():
    toks = analyze("Jean de La Salle")
    assert [t.indexed for t in toks] == ["Jean de La Salle"]


def test_unknown_capitalized_is_name():
    # FrLemFilter.java:175-179
    toks = analyze("Xyzzy parle")
    assert D.group(toks[0].tag) == D.NAME


def test_graphic_normalization():
    toks = analyze("l'Etat")
    assert toks[1].orth == "État"


def test_offsets_preserved():
    text = "Le chat. Bon!"
    toks = tokenize_fr(text)
    for t in toks:
        assert text[t.start : t.end].replace("’", "'") == t.graph


def test_token_cap():
    # the reference tests the cap BEFORE appending (FrTokenizer.java:207,
    # 439), so a capped token carries MAX+1 chars — parity-pinned
    toks = tokenize_fr("a" * 1000)
    assert len(toks[0].graph) == 257


def test_xml_skipped():
    # <p> emits a structural PUNdiv pseudo-token that KEEPS its position
    # as a hole (FrTokenizer.java:135-148); other tags vanish
    toks = analyze("<p>Le chat</p>")
    assert [t.indexed for t in toks] == ["", "le", "chat"]
    assert D.group(toks[0].tag) == D.PUN and toks[0].tag == D.PUN_DIV


def test_xml_entities_and_skipped_content():
    # NAMED entities decode inline to one char; numeric &#...; forms
    # stay raw (parity with ML.forChar's table); note content skipped.
    # An entity-decoded apostrophe bypasses the elision check (the
    # reference appends entity chars directly to the term, probe-
    # verified vs FrChainOracle), so l&apos;homme stays ONE token.
    text = "<note>pas moi</note>l&apos;homme &amp; le chat"
    toks = analyze(text)
    assert [t.indexed for t in toks] == ["l'homme", "&", "le", "chat"]
    # offsets still point into the ORIGINAL string, spanning entities
    assert text[toks[0].start:toks[0].end] == "l&apos;homme"
    assert text[toks[1].start:toks[1].end] == "&amp;"
    # numeric entities are appended raw, as the reference does
    raw = analyze("M&#233;moire vive")
    assert raw[0].graph == "M&#233;moire"


def test_deterministic():
    text = "M. Victor Hugo, parce que l'homme est mort, dis-moi XII fois."
    assert [t.indexed for t in analyze(text)] == [
        t.indexed for t in analyze(text)
    ]


def test_literal_section_sign_is_not_pundiv():
    # a literal '§' in document text is NOT structural: PUNdiv is
    # emitted ONLY for structural tags. The reference's char table
    # classes '§' as plain punctuation, which the tokenizer silently
    # consumes (no token) — parity-pinned behavior
    toks = analyze("voir § 12 <p>la suite")
    div = [t for t in toks if t.tag == D.PUN_DIV]
    assert len(div) == 1  # only the <p>
    assert div[0].graph == "<p>"
    assert not any(t.graph == "§" for t in toks)
