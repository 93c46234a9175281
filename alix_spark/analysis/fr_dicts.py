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

# the remaining closed-class function words (complete paradigms the
# generated lexicon doesn't cover: possessives, demonstratives, the
# full pronoun inventory, prepositions, conjunctions, core adverbs) —
# textbook closed classes, tagged and lemmatized
_FUNCTION_WORDS: dict[str, tuple[int, str | None, str | None]] = {
    # tout paradigm + determiners
    "toute": (DET, None, "tout"), "tous": (DET, None, "tout"),
    "toutes": (DET, None, "tout"),
    "aux": (DET, None, "au"), "cet": (DET, None, "ce"),
    "quel": (DET, None, "quel"), "quelle": (DET, None, "quel"),
    "quels": (DET, None, "quel"), "quelles": (DET, None, "quel"),
    "quelque": (DET, None, "quelque"), "quelques": (DET, None, "quelque"),
    "chaque": (DET, None, "chaque"), "plusieurs": (DET, None, "plusieurs"),
    "aucun": (DET, None, "aucun"), "aucune": (DET, None, "aucun"),
    "certains": (DET, None, "certain"), "certaines": (DET, None, "certain"),
    # possessives
    "mon": (DET, None, "mon"), "ma": (DET, None, "mon"),
    "mes": (DET, None, "mon"), "ton": (DET, None, "ton"),
    "ta": (DET, None, "ton"), "tes": (DET, None, "ton"),
    "son": (DET, None, "son"), "sa": (DET, None, "son"),
    "ses": (DET, None, "son"), "notre": (DET, None, "notre"),
    "nos": (DET, None, "notre"), "votre": (DET, None, "votre"),
    "vos": (DET, None, "votre"), "leurs": (DET, None, "leur"),
    # pronouns
    "elles": (PRO, None, "il"), "on": (PRO, None, "on"),
    "me": (PRO, None, "me"), "te": (PRO, None, "te"),
    "se": (PRO, None, "se"), "soi": (PRO, None, "soi"),
    "lui": (PRO, None, "lui"), "eux": (PRO, None, "eux"),
    "y": (PRO, None, "y"),
    "celui": (PRO, None, "celui"), "celle": (PRO, None, "celui"),
    "ceux": (PRO, None, "celui"), "celles": (PRO, None, "celui"),
    "ceci": (PRO, None, "ceci"), "cela": (PRO, None, "cela"),
    "ça": (PRO, None, "cela"), "rien": (PRO, None, "rien"),
    "personne": (PRO, None, "personne"), "chacun": (PRO, None, "chacun"),
    "chacune": (PRO, None, "chacun"), "quoi": (PRO, None, "quoi"),
    "dont": (PRO, None, "dont"), "où": (PRO, None, "où"),
    "lequel": (PRO, None, "lequel"), "laquelle": (PRO, None, "lequel"),
    "lesquels": (PRO, None, "lequel"), "lesquelles": (PRO, None, "lequel"),
    # prepositions
    "à": (PREP, None, "à"), "vers": (PREP, None, "vers"),
    "sous": (PREP, None, "sous"), "sans": (PREP, None, "sans"),
    "chez": (PREP, None, "chez"), "entre": (PREP, None, "entre"),
    "derrière": (PREP, None, "derrière"), "devant": (PREP, None, "devant"),
    "depuis": (PREP, None, "depuis"), "pendant": (PREP, None, "pendant"),
    "durant": (PREP, None, "durant"), "avant": (PREP, None, "avant"),
    "après": (ADV, None, "après"), "contre": (PREP, None, "contre"),
    "dès": (PREP, None, "dès"), "envers": (PREP, None, "envers"),
    "malgré": (PREP, None, "malgré"), "parmi": (PREP, None, "parmi"),
    "sauf": (PREP, None, "sauf"), "selon": (PREP, None, "selon"),
    "hors": (PREP, None, "hors"), "jusque": (PREP, None, "jusque"),
    # conjunctions
    "donc": (CONJ, None, "donc"), "or": (CONJ, None, "or"),
    "ni": (CONJ, None, "ni"), "car": (CONJ, None, "car"),
    "comme": (CONJ, None, "comme"), "quand": (CONJ, None, "quand"),
    "lorsque": (CONJ, None, "lorsque"), "puisque": (CONJ, None, "puisque"),
    "quoique": (CONJ, None, "quoique"),
    # adverbs
    "point": (ADV, None, "point"), "moins": (ADV, None, "moins"),
    "trop": (ADV, None, "trop"), "peu": (ADV, None, "peu"),
    "assez": (ADV, None, "assez"), "tant": (ADV, None, "tant"),
    "tellement": (ADV, None, "tellement"), "autant": (ADV, None, "autant"),
    "mal": (ADV, None, "mal"), "mieux": (ADV, None, "mieux"),
    "beaucoup": (ADV, None, "beaucoup"), "encore": (ADV, None, "encore"),
    "toujours": (ADV, None, "toujours"), "jamais": (ADV, None, "jamais"),
    "souvent": (ADV, None, "souvent"), "parfois": (ADV, None, "parfois"),
    "déjà": (ADV, None, "déjà"), "aussi": (ADV, None, "aussi"),
    "ainsi": (ADV, None, "ainsi"), "presque": (ADV, None, "presque"),
    "seulement": (ADV, None, "seulement"), "surtout": (ADV, None, "surtout"),
    "vraiment": (ADV, None, "vraiment"),
    "maintenant": (ADV, None, "maintenant"), "hier": (ADV, None, "hier"),
    "demain": (ADV, None, "demain"), "bientôt": (ADV, None, "bientôt"),
    "tôt": (ADV, None, "tôt"), "tard": (ADV, None, "tard"),
    "longtemps": (ADV, None, "longtemps"), "ensuite": (ADV, None, "ensuite"),
    "enfin": (ADV, None, "enfin"), "puis": (ADV, None, "puis"),
    "ici": (ADV, None, "ici"), "là": (ADV, None, "là"),
    "ailleurs": (ADV, None, "ailleurs"), "partout": (ADV, None, "partout"),
    "dedans": (ADV, None, "dedans"), "dehors": (ADV, None, "dehors"),
    "dessus": (ADV, None, "dessus"), "dessous": (ADV, None, "dessous"),
    "loin": (ADV, None, "loin"), "près": (ADV, None, "près"),
    "ensemble": (ADV, None, "ensemble"), "plutôt": (ADV, None, "plutôt"),
    "également": (ADV, None, "également"), "oui": (ADV, None, "oui"),
    "non": (ADV, None, "non"), "voilà": (ADV, None, "voilà"),
    "voici": (ADV, None, "voici"), "pourquoi": (ADV, None, "pourquoi"),
    "comment": (ADV, None, "comment"), "combien": (ADV, None, "combien"),
    "cependant": (ADV, None, "cependant"),
    "pourtant": (ADV, None, "pourtant"),
    "toutefois": (ADV, None, "toutefois"),
    "néanmoins": (ADV, None, "néanmoins"),
}
WORDS.update(_FUNCTION_WORDS)

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

# past participles never keyed as their verb lemma in the locution walk
# — the reference's "parti pris" guard (LocutionFilter.java:73-77);
# shared by the match-time key function (french._loc_key) and the
# compile-time one (fr_locutions._token_key) so they can never disagree
ORTH_NOT_VERB: set[str] = {"pris", "prise'", "prises"}

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
