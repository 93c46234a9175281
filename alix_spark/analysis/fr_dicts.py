"""Built-in French dictionaries for the analysis chain.

The reference loads ~130k-type CSV lexicons
(``/root/reference/java/alix/lucene/analysis/FrDics.java:97-170``; the
big ``word.csv`` is stripped from its snapshot). This module ships a
compact lexicon with the same SHAPES — (graph → tag, orth, lemma), name
lists, stopwords, elisions, abbreviation dots, multi-word locutions — big
enough to exercise every rule family; a production deployment would load
the full CSVs through :func:`load_lexicon_csv` and broadcast them.

All content here is common-knowledge French function words / sample
vocabulary, written for this project. Chain-semantics parity with the
reference's own Java analyzers (running THESE dictionaries, exported to
its CSV formats by tools/fr_oracle/export_dicts.py) is golden-asserted
in tests/test_fr_chain_parity.py.
"""

from __future__ import annotations

# POS tag flags — numeric values match the reference's Tag enum
# (``/root/reference/java/alix/fr/Tag.java:47-220``) so parity goldens
# compare flags directly. High nibble = category group (Tag.sameParent).
UNKNOWN = 0x00
VERB = 0x10
SUB = 0x20  # substantive (noun)
NAME = 0x30  # proper name
NAME_PERS = 0x31  # person (Tag.NAMEpers)
NAME_PERS_M = 0x32  # masculine forename (Tag.NAMEpersm)
NAME_PERS_F = 0x33  # feminine forename (Tag.NAMEpersf)
NAME_PLACE = 0x34  # place (Tag.NAMEplace)
NAME_AUTHOR = 0x38  # author (Tag.NAMEauthor)
ADJ = 0x50
ADV = 0x51  # same group nibble as ADJ, as in the reference
DET = 0x60
PRO = 0x70
CONJ = 0x82  # CONJsub in the reference's naming
PREP = 0x88  # same group nibble as CONJ (connectors)
NUM = 0xA0
PUN = 0xC0
PUN_DIV = 0xC1  # structural break (paragraph/section)
PUN_SENT = 0xC2  # sentence punctuation . … ? !
PUN_CL = 0xC3  # clause punctuation , ; : ( ) — – « »
ABBR = 0xF1  # abbreviation with kept dot (M., etc.)
EXCL = 0xF2

GROUP_MASK = 0xF0

# group aliases used by filters: the connector group covers CONJ+PREP,
# the ADJ group covers ADJ+ADV (reference nibble layout)
CONN = 0x80

def group(tag: int) -> int:
    return tag & GROUP_MASK


def roman2int(s: str) -> int:
    """Roman numeral value, or <= 0 if not one. Mirrors the reference's
    subtractive scan (``/root/reference/java/alix/maths/Calcul.java:181-205``):
    uppercase I V X L C D M only, any other char -> -1; no strictness
    about repetition, so e.g. 'MIDI' parses — deterministic quirk shared
    with the reference."""
    vals = {"I": 1, "V": 5, "X": 10, "L": 50, "C": 100, "D": 500, "M": 1000}
    value = 0
    i, n = 0, len(s)
    while i < n:
        v1 = vals.get(s[i], -1)
        if v1 < 0:
            return -1
        if i + 1 < n:
            v2 = vals.get(s[i + 1], -1)
            if v1 < v2:
                value = value - v1 + v2
                i += 2
                continue
        value += v1
        i += 1
    return value


# graph → (tag, orth, lemma); orth/lemma None = same as graph
WORDS: dict[str, tuple[int, str | None, str | None]] = {
    # determiners / pronouns / function words (stop-tagged below)
    "le": (DET, None, "le"), "la": (DET, None, "le"), "les": (DET, None, "le"),
    "un": (DET, None, "un"), "une": (DET, None, "un"), "des": (DET, None, "un"),
    "de": (PREP, None, "de"), "du": (DET, None, "du"), "au": (DET, None, "au"),
    "ce": (PRO, None, "ce"), "cette": (DET, None, "ce"), "ces": (DET, None, "ce"),
    "je": (PRO, None, "je"), "tu": (PRO, None, "tu"), "il": (PRO, None, "il"),
    "elle": (PRO, None, "il"), "nous": (PRO, None, "nous"),
    "vous": (PRO, None, "vous"), "ils": (PRO, None, "il"),
    "moi": (PRO, None, "moi"), "toi": (PRO, None, "toi"),
    "qui": (PRO, None, "qui"), "que": (CONJ, None, "que"),
    "et": (CONJ, None, "et"), "ou": (CONJ, None, "ou"),
    "ne": (ADV, None, "ne"), "pas": (ADV, None, "pas"),
    "plus": (ADV, None, "plus"), "très": (ADV, None, "très"),
    "dans": (PREP, None, "dans"), "sur": (PREP, None, "sur"),
    "avec": (PREP, None, "avec"), "pour": (PREP, None, "pour"),
    "en": (PREP, None, "en"), "par": (PREP, None, "par"),
    "si": (CONJ, None, "si"), "mais": (CONJ, None, "mais"),
    "parce": (CONJ, None, "parce"),
    # verbs
    "est": (VERB, None, "être"), "sont": (VERB, None, "être"),
    "était": (VERB, None, "être"), "être": (VERB, None, "être"),
    "a": (VERB, None, "avoir"), "ont": (VERB, None, "avoir"),
    "avoir": (VERB, None, "avoir"), "avait": (VERB, None, "avoir"),
    "fait": (VERB, None, "faire"), "faire": (VERB, None, "faire"),
    "dis": (VERB, None, "dire"), "dit": (VERB, None, "dire"),
    "va": (VERB, None, "aller"), "vont": (VERB, None, "aller"),
    "mort": (VERB, None, "mourir"),
    # nouns
    "chat": (SUB, None, "chat"), "chats": (SUB, None, "chat"),
    "homme": (SUB, None, "homme"), "hommes": (SUB, None, "homme"),
    "femme": (SUB, None, "femme"), "vie": (SUB, None, "vie"),
    "fleuve": (SUB, None, "fleuve"), "matin": (SUB, None, "matin"),
    "jour": (SUB, None, "jour"), "jours": (SUB, None, "jour"),
    "coup": (SUB, None, "coup"), "air": (SUB, None, "air"),
    "chapitre": (SUB, None, "chapitre"), "livre": (SUB, None, "livre"),
    "roi": (SUB, None, "roi"), "temps": (SUB, None, "temps"),
    "monsieur": (SUB, None, "monsieur"), "madame": (SUB, None, "madame"),
    # adjectives / adverbs
    "petit": (ADJ, None, "petit"), "petite": (ADJ, None, "petit"),
    "petits": (ADJ, None, "petit"), "grand": (ADJ, None, "grand"),
    "grande": (ADJ, None, "grand"), "long": (ADJ, None, "long"),
    "longue": (ADJ, None, "long"), "tranquille": (ADJ, None, "tranquille"),
    "bon": (ADJ, None, "bon"), "alors": (ADV, None, "alors"),
    "bien": (ADV, None, "bien"), "tout": (ADV, None, "tout"),
}

# graphic normalizations (caps/orth.csv analogue): graph → orth
NORM: dict[str, str] = {
    "Etat": "État",
    "Etats": "États",
    "oeuvre": "œuvre",
    "Etre": "Être",
}

# compact proper names: graph → (tag, orth); merged below with the
# full curated lists of fr_names.py (compact entries win)
_NAMES_COMPACT: dict[str, tuple[int, str | None]] = {
    "Victor": (NAME, None),
    "Hugo": (NAME, None),
    "Jean": (NAME, None),
    "Paris": (NAME, None),
    "France": (NAME, None),
    "Dupont": (NAME, None),
    "Zola": (NAME, None),
    "La": (NAME, None),  # as in "La Salle" (particle-capitalized)
    "Salle": (NAME, None),
}

# elision prefixes (ellision.csv analogue). The reference tokenizer
# REPLACES the accumulated term on match (FrTokenizer.java:431-437), so
# keys are case-sensitive apostrophe forms and values are the emitted
# token. Our editorial choice maps every prefix to its full form
# (l' → le), so elided articles merge with their plain forms in stats
# and search; apostrophe locutions are therefore expressed with
# expanded keys in LOCUTIONS (n'importe quel → ne importe quel).
_ELISION_BASE: dict[str, str] = {
    "l'": "le", "d'": "de", "j'": "je", "n'": "ne", "s'": "se", "c'": "ce",
    "t'": "te", "m'": "me", "qu'": "que", "jusqu'": "jusque",
    "lorsqu'": "lorsque", "puisqu'": "puisque", "quoiqu'": "quoique",
}
ELISION: dict[str, str] = {}
for _k, _v in _ELISION_BASE.items():
    ELISION[_k] = _v
    ELISION[_k[0].upper() + _k[1:]] = _v

# words a hyphen breaks before (enclitic pronouns etc.) — the closed
# grammatical class hardcoded by the reference (FrTokenizer.java:126-133)
HYPHEN_POST: set[str] = {
    "ce", "ci", "elle", "elles", "en", "eux", "il", "ils", "je", "la",
    "là", "le", "les", "leur", "lui", "me", "moi", "nous", "on", "t",
    "te", "toi", "tu", "vous", "y",
}

# abbreviations whose final dot belongs to the token (brevidot.csv
# analogue): dot-included graph → replacement term (FrDics.java:385-391
# copies the value into the term; FrTokenizer.java:342-348 keeps
# scanning with the ABBR flag)
BREVIDOT: dict[str, str] = {
    "M.": "M.", "MM.": "MM.", "Mme.": "Mme", "Mlle.": "Mlle", "Dr.": "Dr",
    "St.": "St", "cf.": "cf.", "etc.": "etc.", "p.": "p.", "t.": "t.",
}

# compact multi-word locutions (locutions.csv analogue):
# token-key tuple → (orth, tag, lemma). Keys are the per-token compound
# keys the LocutionFilter walk produces — verb tokens keyed by LEMMA,
# NUM tokens by "NUM", names and nouns by graph, the rest by orth
# (LocutionFilter.java:145-172) — with elisions expanded (l' → le).
# Merged below with the ~1,400 compiled entries of fr_locutions.py
# (compact entries win).
_LOCUTIONS_COMPACT: dict[tuple[str, ...], tuple[str, int, str | None]] = {
    ("parce", "que"): ("parce que", CONJ, None),
    ("avoir", "le", "air"): ("avoir l'air", VERB, None),
    ("tout", "à", "coup"): ("tout à coup", ADV, None),
    ("au", "fur", "et", "à", "mesure"): ("au fur et à mesure", ADV, None),
    ("grand", "chose"): ("grand-chose", PRO, None),
    ("ne", "importe", "quel"): ("n'importe quel", DET, None),
}

# particles joinable inside person names — the closed class hardcoded by
# the reference (FrPersnameFilter.java:63-68), matched case-sensitively
# on the token term
PARTICLES: set[str] = {
    "d'", "D'", "de", "De", "du", "Du", "l'", "L'", "le", "Le", "la",
    "La", "von", "Von",
}


# -- merge the full-size generated/curated dictionaries --------------- #
# STOP / NAMES / LOCUTIONS are built LAZILY on first access (PEP 562):
# fr_stop and fr_locutions pull the generated lexicon, whose module
# imports this one for the tag constants — a module-level build here
# would close an import cycle whenever fr_lexicon is imported first.
# The first attribute access happens after every module in the cycle
# has finished initializing, and the result is cached in globals().


def __getattr__(name: str):
    if name == "STOP":
        from alix_spark.analysis.fr_stop import build_stop

        globals()["STOP"] = build_stop()
        return globals()["STOP"]
    if name == "NAMES":
        from alix_spark.analysis.fr_names import build_names

        globals()["NAMES"] = {**build_names(), **_NAMES_COMPACT}
        return globals()["NAMES"]
    if name == "LOCUTIONS":
        from alix_spark.analysis.fr_locutions import build_locutions

        globals()["LOCUTIONS"] = {
            **build_locutions(),
            **_LOCUTIONS_COMPACT,
        }
        return globals()["LOCUTIONS"]
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def build_locution_trie() -> dict:
    """LOCUTIONS as a nested-dict prefix trie: the TREELOC analogue
    (``FrDics.java:323-343``). Leaf marker key: '$' → (orth, tag, lem)."""
    import sys

    # attribute access (not a bare global) so the lazy __getattr__ fires
    locutions = sys.modules[__name__].LOCUTIONS
    trie: dict = {}
    for toks, payload in locutions.items():
        node = trie
        for t in toks:
            node = node.setdefault(t, {})
        node["$"] = payload
    return trie


def load_lexicon_csv(path: str) -> dict[str, tuple[int, str | None, str | None]]:
    """Load a full-size lexicon CSV (GRAPH,TAG,ORTH,LEM) — the shape of
    the reference's word.csv (``FrDics.java:187-230``)."""
    import csv

    tag_names = {
        "VERB": VERB, "SUB": SUB, "NAME": NAME, "ADJ": ADJ, "ADV": ADV,
        "DET": DET, "PRO": PRO, "CONJ": CONJ, "PREP": PREP, "NUM": NUM,
        "EXCL": EXCL,
    }
    out: dict[str, tuple[int, str | None, str | None]] = {}
    with open(path, newline="", encoding="utf-8") as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            graph = row[0]
            tag = tag_names.get(row[1] if len(row) > 1 else "", UNKNOWN)
            orth = row[2] or None if len(row) > 2 else None
            lem = row[3] or None if len(row) > 3 else None
            out[graph] = (tag, orth, lem)
    return out
