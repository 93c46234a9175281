"""French analysis chain — the Alix analyzer re-derived as a pure,
deterministic Python kernel (vectorized over documents via mapInPandas in
:mod:`alix_spark.analysis.pipeline`).

Chain (mirrors ``/root/reference/java/alix/lucene/analysis/FrAnalyzer.java:52-70``):

    tokenize → lemmatize → locutions → person names → final selection

Semantics are CHAIN-PARITY-TESTED against the reference's own Java
analyzers compiled from ``/root/reference/java`` and run with these same
dictionaries (tools/fr_oracle, tests/test_fr_chain_parity.py). Rule
families (each cited to the reference behavior):

* a very light XML parser: unknown tags are transparent to a token in
  progress, SKIP elements drop their content, TAGS elements emit a
  PUNdiv pseudo-token (``FrTokenizer.java:150-165,228-299``)
* named character entities decode to one char; unknown/numeric entities
  are appended raw (``FrTokenizer.java:302-318``, ``ML.forChar``)
* digits absorb inner AND one trailing ``.,`` (``FrTokenizer.java:321-326``)
* clause punctuation ``, ; : ( ) — – « »`` emits one PUNcl token each;
  sentence punctuation ``. … ? !`` accumulates one PUNsent token per run
  (``Char.java:123-124``, ``FrTokenizer.java:329-341``)
* the final-dot cascade: abbreviation dots kept with term replacement
  (brevidot), lowercase-before-dot → sentence end, uppercase-before-dot
  → keep scanning (J.-P., U.S.A., III.) (``FrTokenizer.java:342-401``)
* elision: the accumulated apostrophe prefix is REPLACED by its
  dictionary value (l' → le) and the token flushed
  (``FrTokenizer.java:431-437``)
* hyphen: split at the LAST hyphen only, when the tail is an enclitic
  (HYPHEN_POST); euphonic ``-t`` dropped from the term but not the
  offset (``FrTokenizer.java:128-133,453-467``)
* lemmatization: dictionary lookup, no disambiguation; capitalized
  unknown → NAME; capitalized roman numeral → NUM with the value
  appended to orth (``FrLemFilter.java:112-199``)
* locutions: compound-key walk of the locution trie, verbs keyed by
  lemma, negation-transparent ("ne fait pas l'affaire")
  (``LocutionFilter.java:101-226``)
* person names: NAME run + particles + any capitalized token, trailing
  particles trimmed, orth/lemma emptied (``FrPersnameFilter.java:104-177``)
* final selection: PUN → "" hole, NUM → "NUM", else lemma | orth | term
  (``FlagCloudFilter.java:101-129``); the orth twin keeps punctuation
  marks , . § (``FlagOrthFilter.java:87-110``)
"""

from __future__ import annotations

import html.entities
from dataclasses import dataclass

from alix_spark.analysis import fr_dicts as D

MAX_TOKEN_LEN = 256  # FrTokenizer.java:120,439

# clause + sentence punctuation classes (Char.java:123-124)
_PUNCL = set(",;:()—–⁂»«")
_PUNSENT = set(".…?!")

# structural elements → PUNdiv pseudo-token (FrTokenizer.java:135-148)
_TAGS = {
    "p": "<p>", "h1": "<p>", "h2": "<p>", "h3": "<p>", "h4": "<p>",
    "h5": "<p>", "h6": "<p>", "section": "<section>",
    "/section": "</section>", "article": "<section>",
    "/article": "</section>",
}
# elements whose content is skipped, mapped to their closing tagname
# (FrTokenizer.java:150-159)
_SKIP = {
    "note": "/note", "bibl": "/bibl", "head": "/head",
    "?index_off?": "?index_on?", "script": "/script", "style": "/style",
    "teiHeader": "/teiHeader",
}

# named entities → single char, built from the standard HTML entity
# tables shipped with Python (the reference loads the same standard set
# from its htmlent.csv; numeric &#...; forms are NOT decoded — parity)
_ENTITIES: dict[str, str] = {}
for _name, _ch in html.entities.entitydefs.items():
    if len(_ch) == 1:
        _ENTITIES["&" + _name + ";"] = _ch
for _name, _ch in html.entities.html5.items():
    if _name.endswith(";") and len(_ch) == 1:
        _ENTITIES["&" + _name] = _ch


def _is_token_char(c: str) -> bool:
    """Char.isToken (Char.java:79-126): letters, decimal digits, and the
    in-word specials. '&' is a letter-class char in the table; in XML
    mode the entity branch intercepts it first."""
    return (
        c.isalpha()
        or c.isdecimal()
        or c in "-\xad'’_�°&"
    )


@dataclass
class Token:
    graph: str  # the term as tokenized (elisions/brevidots replaced)
    orth: str  # normalized orthography
    lemma: str | None
    tag: int
    pos: int  # token position (sequence index)
    start: int  # char offset
    end: int

    @property
    def indexed(self) -> str:
        """FlagCloudFilter final selection (``FlagCloudFilter.java:101-129``)."""
        if D.group(self.tag) == D.PUN:
            return ""  # position-holding hole
        if D.group(self.tag) == D.NUM:
            return "NUM"
        if self.lemma:
            return self.lemma
        if self.orth:
            return self.orth
        return self.graph

    @property
    def indexed_orth(self) -> str:
        """FlagOrthFilter selection for the ``_orth`` twin field
        (``FlagOrthFilter.java:87-110``)."""
        if self.tag == D.PUN_CL:
            return ","
        if self.tag == D.PUN_SENT:
            return "."
        if self.tag == D.PUN_DIV:
            return "§"
        g = D.group(self.tag)
        if g == D.PUN:
            return ""
        if g == D.NUM:
            return "NUM"
        return self.orth or self.graph


# ---------------------------------------------------------------------- #
# stage 1: char-level tokenizer (FrTokenizer.java:185-475 semantics)
# ---------------------------------------------------------------------- #


def tokenize_fr(text: str, skip_xml: bool = True) -> list[Token]:
    """Char scanner → raw tokens. One pass over the source with exact
    reference offset arithmetic: a token's end offset is the position
    where its scan broke (so it extends across transparent XML tags,
    like the reference's)."""
    if text is None:
        return []
    tokens: list[Token] = []
    n = len(text)
    i = 0
    # per-token state
    term: list[str] = []
    flags = D.UNKNOWN
    start = -1
    hyph = -1  # source pos just after the last in-word hyphen
    tail: list[str] = []  # chars after the last hyphen
    last = "\0"
    # xml state. NOTE: the reference reuses ONE buffer (its `test`
    # CharsAtt) for both tagname capture and the hyphen tail — our
    # `tail` mirrors that shared lifecycle exactly: cleared at '<' and
    # after non-skip tags, RETAINED through skip open/close tags (so a
    # skip element between a hyphen and an enclitic poisons the tail
    # and prevents the split, as in the reference).
    intag = False
    tagname = False
    lt = -1
    skip_until: str | None = None
    in_ent = False
    ent: list[str] = []

    def emit(graph: str, tag: int, s: int, e: int) -> None:
        tokens.append(Token(graph, graph, None, tag, len(tokens), s, e))

    def flush(end: int) -> None:
        # post-loop send logic incl. the last-hyphen enclitic split
        # (FrTokenizer.java:453-467: term minus tail minus hyphen, the
        # euphonic -t dropped from the term but not the offsets)
        nonlocal term, flags, start, hyph, tail, last
        t = "".join(term)
        tl = "".join(tail)
        if hyph > 0 and tl in D.HYPHEN_POST:
            part1 = t[: len(t) - len(tl) - 1]
            if part1.endswith("-t"):
                part1 = part1[:-2]
            emit(part1, flags, start, hyph - 1)
            emit(tl, flags, hyph, end)
        else:
            emit(t, flags, start, end)
        term, tail = [], []
        flags = D.UNKNOWN
        start, hyph = -1, -1
        last = "\0"

    while i < n:
        c = text[i]
        if skip_xml:
            if c == "<":
                lt = i
                intag, tagname = True, True
                tail = []  # the shared test buffer resets at every '<'
                i += 1
                continue
            if intag:
                if tagname:
                    if tail and c in " >/":
                        tagname = False
                    else:
                        tail.append(c)
                if c == ">":
                    intag = False
                    name = "".join(tail)
                    if skip_until is not None:
                        # skip open/close keep the buffer (reference:
                        # the skip branches return before setEmpty)
                        if name == skip_until:
                            skip_until = None
                        i += 1
                        continue
                    if name in _SKIP:
                        skip_until = _SKIP[name]
                        i += 1
                        continue
                    el = _TAGS.get(name)
                    tail = []  # non-skip tags clear it (test.setEmpty)
                    if el is None:  # unknown tag: transparent
                        i += 1
                        continue
                    if term:
                        # a word was pending: send it first, its end
                        # offset bleeding to the tag end (reference
                        # offset arithmetic, FrTokenizer.java:272-287)
                        flush(i + 1)
                    emit(el, D.PUN_DIV, lt, i + 1)
                    i += 1
                    continue
                i += 1
                continue
            if skip_until is not None:
                i += 1
                continue
            if c == "&":
                if not term:
                    start = i
                in_ent = True
                ent = ["&"]
                i += 1
                continue
            if in_ent:
                ent.append(c)
                if c == ";":
                    in_ent = False
                    s = "".join(ent)
                    dec = _ENTITIES.get(s)
                    term.extend(dec if dec is not None else s)
                i += 1
                continue

        # decimals: digits absorb . and , (FrTokenizer.java:321-326);
        # one trailing punct stays in the term when no digit follows
        if last.isdecimal() and c in ".,":
            term.append(c)
            last = c
            i += 1
            continue

        if c in _PUNCL:
            if term:
                flush(i)  # push back: c reprocessed as its own token
            else:
                emit(c, D.PUN_CL, i, i + 1)
                i += 1
            continue

        if c in _PUNSENT:
            if not term:
                flags = D.PUN_SENT
                start = i
                term.append(c)
                last = c
                i += 1
                continue
            if flags == D.PUN_SENT:
                # a run of sentence punctuation extends the token's
                # offsets without growing its term ("?!" → "?")
                i += 1
                continue
            if c == "…" and flags == D.ABBR:
                term.append(".")  # O.N… keeps a final dot
            if c == ".":
                # the final-dot cascade (FrTokenizer.java:349-401)
                term.append(".")
                t = "".join(term)
                rep = D.BREVIDOT.get(t)
                if rep is not None:
                    flags = D.ABBR
                    term = list(rep)
                    i += 1
                    continue
                elif last.islower():
                    term.pop()  # sentence end: dot is punctuation
                    flush(i)
                    continue
                elif last.isupper():
                    i += 1  # J.-P., U.S.A., III. — keep dot, keep going
                    continue
                elif D.roman2int(t[:-1]) > 0:
                    flags = D.NUM
                    flush(i)
                    continue
                elif len(t) > 2 and t[0].isupper() and t[1].isupper():
                    term.pop()
                    flush(i)
                    continue
                elif len(t) < 3:
                    i += 1
                    continue
                elif t[-3] == ".":
                    i += 1
                    continue
                else:
                    term.pop()
                    flush(i)
                    continue
            else:
                flush(i)  # push back the ? ! …
                continue

        if c == "-":
            if term:
                hyph = i + 1
                tail = []
            else:
                i += 1  # leading hyphen: OCR artifact, dropped
                continue
            # falls through: '-' is a token char

        if _is_token_char(c):
            if not term:
                if c.isdecimal():
                    flags = D.NUM
                start = i
            if c == "\xad":  # soft hyphen never joins the term
                i += 1
                continue
            cc = "'" if c == "’" else c
            term.append(cc)
            if hyph > 0 and cc != "-":
                tail.append(cc)
            if cc == "'":
                rep = D.ELISION.get("".join(term))
                if rep is not None:
                    # elision: replace the term and send (l' → le)
                    term = list(rep)
                    hyph = -1  # replacement, no split
                    flush(i + 1)
                    i += 1
                    continue
            if len(term) > MAX_TOKEN_LEN:
                # the reference tests the length BEFORE this append
                # (FrTokenizer.java:207,439), so a capped token carries
                # MAX_TOKEN_LEN+1 chars — parity-pinned off-by-one
                flush(i + 1)
                i += 1
                continue
            last = c
            i += 1
            continue

        # any other char breaks a pending token (and is consumed)
        if term:
            flush(i)
            i += 1
            continue
        last = c
        i += 1

    if term:
        flush(n)
    return tokens


# ---------------------------------------------------------------------- #
# stage 2: lemmatizer (FrLemFilter.java:112-199 semantics)
# ---------------------------------------------------------------------- #


def lemmatize(
    tokens: list[Token],
    words: dict[str, tuple[int, str | None, str | None]] | None = None,
) -> list[Token]:
    """``words`` overrides the built-in compact lexicon — the injection
    point for a full-size (~130k-type) lexicon loaded with
    :func:`alix_spark.analysis.fr_dicts.load_lexicon_csv` and shipped to
    executors as a broadcast (``FrDics.java:82-83`` scale)."""
    w = words if words is not None else D.WORDS
    for t in tokens:
        if t.tag in (D.PUN_DIV, D.PUN_SENT):
            continue
        g = t.orth  # starts as a copy of the term
        if not g or not _is_token_char(g[0]):
            continue  # clause punctuation etc.
        c1 = g[0]
        if c1.isupper():
            if t.tag == D.NUM:
                continue  # digits already flagged by the tokenizer
            rn = D.roman2int(g)
            if rn > 0:
                t.tag = D.NUM
                t.orth = g + str(rn)  # XVIII → orth "XVIII18"
                continue
            if t.orth in D.NORM:
                t.orth = D.NORM[t.orth]  # Etat → État
            copy = t.orth
            ne = D.NAMES.get(t.orth)
            if ne is not None:
                t.tag = ne[0]
                if ne[1]:
                    t.orth = ne[1]
                continue
            low = t.orth.lower()
            e = w.get(low)
            if e is not None:
                t.tag = e[0]
                if e[2]:
                    t.lemma = e[2]
                t.orth = e[1] if e[1] else low  # known word: lowercased
                continue
            t.tag = D.NAME  # unknown capitalized → inferred name
            t.orth = copy
        else:
            if t.orth in D.NORM:
                t.orth = D.NORM[t.orth]  # oeuvre → œuvre
            e = w.get(t.orth)
            if e is not None:
                t.tag = e[0]
                if e[2]:
                    t.lemma = e[2]
                if e[1]:
                    t.orth = e[1]
    return tokens


# ---------------------------------------------------------------------- #
# stage 3: locution compounding (LocutionFilter.java:101-226 semantics)
# ---------------------------------------------------------------------- #

_TRIE = D.build_locution_trie()


def _loc_key(t: Token) -> str:
    """The compound key contributed by one token
    (LocutionFilter.java:145-172): NUM → "NUM", verbs by lemma, names
    and nouns by the term, the rest by orth."""
    g = D.group(t.tag)
    if g == D.NUM:
        return "NUM"
    if t.orth and t.orth in D.ORTH_NOT_VERB:
        return t.orth
    if t.lemma and g == D.VERB:
        return t.lemma
    if g in (D.NAME, D.SUB):
        return t.graph
    if t.orth:
        return t.orth
    return t.graph


def compound_locutions(tokens: list[Token]) -> list[Token]:
    """Longest-match walk of the locution trie; matched runs collapse
    into one token carrying the locution entry; a "pas" right after a
    verb is transparent (negation inside verb locutions,
    LocutionFilter.java:161-164); positions renumbered."""
    out: list[Token] = []
    i = 0
    ntok = len(tokens)
    while i < ntok:
        node = _TRIE
        j = i
        maybe_verb = False
        best: tuple[int, tuple[str, int, str | None]] | None = None
        while j < ntok:
            t = tokens[j]
            if D.group(t.tag) == D.PUN or not t.graph:
                break
            if maybe_verb and j > i and t.orth == "pas":
                j += 1  # swallowed by the compound candidate
                continue
            key = _loc_key(t)
            if t.lemma and D.group(t.tag) == D.VERB:
                maybe_verb = True
            if key not in node:
                break
            node = node[key]
            if "$" in node:
                best = (j, node["$"])
            j += 1
        if best is not None:
            end_i, (orth, tag, lem) = best
            parts = tokens[i : end_i + 1]
            graph = ""
            for p in parts:
                if graph and not graph.endswith("'"):
                    graph += " "
                graph += p.graph
            out.append(
                Token(graph, orth or "", lem, tag, 0, parts[0].start,
                      parts[-1].end)
            )
            i = end_i + 1
        else:
            out.append(tokens[i])
            i += 1
    for p, t in enumerate(out):
        t.pos = p
    return out


# ---------------------------------------------------------------------- #
# stage 4: person names (FrPersnameFilter.java:104-177 semantics)
# ---------------------------------------------------------------------- #


def join_persnames(tokens: list[Token]) -> list[Token]:
    """A NAME-tagged capitalized token starts a run; particles and ANY
    capitalized token continue it; trailing particles are trimmed; the
    joined token keeps the terms, empties orth/lemma, tags NAME."""
    out: list[Token] = []
    i = 0
    ntok = len(tokens)
    while i < ntok:
        t = tokens[i]
        if (
            D.group(t.tag) == D.NAME
            and t.graph
            and t.graph[0].isupper()
        ):
            parts = [t]
            last_keep = 1
            j = i + 1
            while j < ntok:
                tj = tokens[j]
                if tj.graph in D.PARTICLES:
                    parts.append(tj)
                    j += 1
                    continue
                if tj.graph and tj.graph[0].isupper():
                    parts.append(tj)
                    last_keep = len(parts)
                    j += 1
                    continue
                break
            if last_keep > 1:
                kept = parts[:last_keep]
                name = ""
                for p in kept:
                    if name and not name.endswith("'"):
                        name += " "
                    name += p.graph
                out.append(
                    Token(name, "", None, D.NAME, 0, kept[0].start,
                          kept[-1].end)
                )
                i += last_keep
                continue
        out.append(t)
        i += 1
    for p, t in enumerate(out):
        t.pos = p
    return out


# ---------------------------------------------------------------------- #
# full chain
# ---------------------------------------------------------------------- #


def analyze(
    text: str,
    skip_xml: bool = True,
    words: dict[str, tuple[int, str | None, str | None]] | None = None,
) -> list[Token]:
    """The full French chain (FrAnalyzer's default text field); the
    returned tokens expose ``indexed`` (lemma channel with punctuation
    holes) and ``indexed_orth``. ``words`` optionally replaces the
    built-in lexicon (see :func:`lemmatize`)."""
    toks = tokenize_fr(text, skip_xml=skip_xml)
    toks = lemmatize(toks, words=words)
    toks = compound_locutions(toks)
    toks = join_persnames(toks)
    return toks


def analyze_orth(
    text: str,
    skip_xml: bool = True,
    words: dict[str, tuple[int, str | None, str | None]] | None = None,
) -> list[Token]:
    """The ``_orth`` twin-field chain (FrAnalyzer.java:56,67): tokenizer
    + lemmatizer only — no locutions, no person names — selected through
    ``indexed_orth``."""
    return lemmatize(tokenize_fr(text, skip_xml=skip_xml), words=words)


def is_stop(token: Token) -> bool:
    return (
        token.orth.lower() in D.STOP
        or (token.lemma or "") in D.STOP
        or D.group(token.tag) == D.PUN
    )
