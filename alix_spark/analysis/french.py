"""French analysis chain — the Alix analyzer re-derived as a pure,
deterministic Python kernel (vectorized over documents via mapInPandas in
:mod:`alix_spark.analysis.pipeline`).

Chain (mirrors ``/root/reference/java/alix/lucene/analysis/FrAnalyzer.java:52-70``):

    tokenize → lemmatize → locutions → person names → final selection

Rule families reproduced (each cited to the reference behavior):

* elision split on apostrophe via dictionary — ``FrTokenizer.java:431-437``
* hyphen split before enclitic pronouns, euphonic ``-t`` dropped —
  ``FrTokenizer.java:128-133,462-475``
* abbreviation dot kept on known abbreviations (``M.``), sentence dot
  emitted as punctuation otherwise — ``FrTokenizer.java:342-401``
* roman numerals and decimal numbers → NUM — ``FrTokenizer.java:322-326``,
  ``FrLemFilter.java:143-147``
* punctuation kept as a position-holding token — the "holes" of
  ``FlagCloudFilter.java:114-117`` (term == "")
* dictionary lemmatization with NO disambiguation ("errors are completely
  deterministic", ``FrLemFilter.java:66-72``)
* longest-match locution compounding via a prefix trie —
  ``LocutionFilter.java:101-226``
* capitalized-run person-name joining with particles —
  ``FrPersnameFilter.java:104-177``
* final indexed form = lemma, else orth, else graph; numbers unified to
  literal ``NUM`` — ``FlagCloudFilter.java:119-129``

The soft-hyphen removal and ``’`` → ``'`` normalizations of
``FrTokenizer.java:424-425`` are applied up front; XML handling is gated
behind ``skip_xml`` since this engine's corpus is code/plain text.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from alix_spark.analysis import fr_dicts as D

MAX_TOKEN_LEN = 256  # FrTokenizer.java:120,439

_ROMAN_RE = re.compile(r"^[IVXLCDM]+$")
_NUM_RE = re.compile(r"^\d+([.,]\d+)?$")
_WORD_CHAR = re.compile(r"[\wÀ-ɏ]")  # letters incl. accents
_XML_TAG = re.compile(r"<[^>]*>")
_SENT_PUNCT = {".", "!", "?", "…"}

# XML elements whose CONTENT is skipped entirely (FrTokenizer.java:150-159:
# script, style, teiHeader, note, and the like)
_SKIP_ELEMENTS = ("script", "style", "teiheader", "note")
_SKIP_RE = re.compile(
    r"<(script|style|teiHeader|note)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
# structural elements that emit a PUNdiv pseudo-token (paragraph/section
# breaks — FrTokenizer.java:135-148, tagged PUNdiv at 272-294)
_DIV_RE = re.compile(r"<(p|section|div|lb?)\b[^>]*/?>", re.IGNORECASE)
# In-band structural-break sentinel: ASCII GS (group separator). Chosen
# non-printable so a literal '§' (or &#167;) in document text can never
# be mis-tagged PUN_DIV.
_DIV_MARK = "\x1d"
# character entities the reference decodes inline (FrTokenizer.java:302-318)
_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "eacute": "é", "egrave": "è", "agrave": "à",
    "ccedil": "ç", "ocirc": "ô", "ucirc": "û", "icirc": "î",
    "ecirc": "ê", "acirc": "â", "ugrave": "ù", "euml": "ë",
    "iuml": "ï", "oelig": "œ", "laquo": "«", "raquo": "»",
    "hellip": "…", "rsquo": "'", "lsquo": "'",
}
_ENTITY_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z]+);")


def _decode_entity(body: str) -> str | None:
    if body.startswith("#x") or body.startswith("#X"):
        try:
            return chr(int(body[2:], 16))
        except ValueError:
            return None
    if body.startswith("#"):
        try:
            return chr(int(body[1:]))
        except ValueError:
            return None
    return _ENTITIES.get(body.lower())


def _prepare(text: str, skip_xml: bool) -> tuple[str, list[int], list[int]]:
    """Offset-preserving normalization pre-pass → (chars, starts, ends):
    per prepared char, its original [start, end) span. Handles soft
    hyphens, curly apostrophes, skipped-element contents, structural
    PUNdiv pseudo-tokens (as the non-printable sentinel ``\\x1d``, so a
    literal '§' in document text stays ordinary punctuation), tag
    blanking, and entity decoding —
    so every downstream token keeps EXACT source offsets even through
    multi-char entities (``FrTokenizer`` keeps offsets the same way).
    """
    if skip_xml and "<" in text:
        # blank skipped-element contents and tags, preserving length;
        # structural tags leave one non-printable GS marker (\x1d) at
        # their position — in-band but unreachable from document text
        # (entities decode printable chars only), unlike the printable
        # '§' this used to use
        def _blank(m: re.Match) -> str:
            return " " * len(m.group())

        text = _SKIP_RE.sub(_blank, text)
        text = _DIV_RE.sub(lambda m: _DIV_MARK + " " * (len(m.group()) - 1), text)
        text = _XML_TAG.sub(_blank, text)

    chars: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "­":  # soft hyphen: dropped
            i += 1
            continue
        if c == "’":
            chars.append("'")
            starts.append(i)
            ends.append(i + 1)
            i += 1
            continue
        if c == "&":
            m = _ENTITY_RE.match(text, i)
            if m:
                decoded = _decode_entity(m.group(1))
                if decoded is not None:
                    chars.append(decoded)
                    starts.append(i)
                    ends.append(m.end())
                    i = m.end()
                    continue
        chars.append(c)
        starts.append(i)
        ends.append(i + 1)
        i += 1
    return "".join(chars), starts, ends


@dataclass
class Token:
    graph: str  # original graphic form
    orth: str  # normalized orthography
    lemma: str | None
    tag: int
    pos: int  # token position (sequence index)
    start: int  # char offset
    end: int

    @property
    def indexed(self) -> str:
        """FlagCloudFilter final selection (``FlagCloudFilter.java:119-129``)."""
        if D.group(self.tag) == D.PUN:
            return ""  # position-holding hole
        if D.group(self.tag) == D.NUM:
            return "NUM"
        return self.lemma or self.orth or self.graph

    @property
    def indexed_orth(self) -> str:
        """FlagOrthFilter selection for the ``_orth`` twin field
        (``FlagOrthFilter.java:73-110``)."""
        g = D.group(self.tag)
        if g == D.PUN:
            return ""
        if g == D.NUM:
            return "NUM"
        return self.orth or self.graph


def _is_roman(s: str) -> bool:
    return bool(_ROMAN_RE.match(s)) and len(s) > 0


# ---------------------------------------------------------------------- #
# stage 1: char-level tokenizer
# ---------------------------------------------------------------------- #


def tokenize_fr(text: str, skip_xml: bool = True) -> list[Token]:
    """Char scanner → raw tokens (graph/pos/offsets; tags only for
    punctuation & numbers at this stage)."""
    if text is None:
        return []
    # FrTokenizer.java:424-425 normalizations + XML/entity pre-pass with
    # exact source-offset preservation
    norm, c_start, c_end = _prepare(text, skip_xml)

    tokens: list[Token] = []
    i, n = 0, len(norm)
    pos = 0

    def emit(graph: str, start: int, end: int, tag: int = D.UNKNOWN):
        # start/end are PREPARED-string indices; map back to the source
        nonlocal pos
        if len(graph) > MAX_TOKEN_LEN:
            graph = graph[:MAX_TOKEN_LEN]
        src_start = c_start[start] if start < n else (c_end[-1] if n else 0)
        src_end = c_end[end - 1] if end - 1 < n and end > 0 else src_start
        tokens.append(Token(graph, graph, None, tag, pos, src_start, src_end))
        pos += 1

    while i < n:
        c = norm[i]
        # _DIV_MARK (\x1d) is the structural paragraph/section break
        # sentinel from the XML pre-pass; check it BEFORE isspace() —
        # Python classifies \x1c-\x1f as whitespace
        if c == _DIV_MARK:
            emit(c, i, i + 1, D.PUN_DIV)
            i += 1
            continue
        if c.isspace():
            i += 1
            continue
        if c.isdigit():
            j = i + 1
            while j < n and (norm[j].isdigit() or (
                norm[j] in ".," and j + 1 < n and norm[j + 1].isdigit()
            )):
                j += 1
            emit(norm[i:j], i, j, D.NUM)
            i = j
            continue
        if _WORD_CHAR.match(c):
            j = i + 1
            while j < n and (_WORD_CHAR.match(norm[j]) or norm[j] in "'-."):
                # apostrophe: cut AFTER it when the prefix is an elision
                if norm[j] == "'":
                    prefix = norm[i : j + 1]
                    if prefix.lower() in D.ELISION:
                        j += 1
                        break
                    j += 1
                    continue
                if norm[j] == "-":
                    # hyphen split before enclitic pronoun (dis-moi)
                    k = j + 1
                    # euphonic -t- : dis-t-il → drop the t
                    rest = norm[k:]
                    if rest[:2].lower() in ("t-",) and len(rest) > 2:
                        after = re.match(r"t-(\w+)", rest)
                        if after and after.group(1).lower() in D.HYPHEN_POST:
                            break
                    m = re.match(r"([\wÀ-ɏ]+)", rest)
                    if m and m.group(1).lower() in D.HYPHEN_POST:
                        break
                    j += 1
                    continue
                if norm[j] == ".":
                    # abbreviation dot stays if known (M. / etc.), else the
                    # dot is sentence punctuation
                    word = norm[i:j]
                    if word in D.BREVIDOT:
                        j += 1
                    break
                j += 1
            graph = norm[i:j].rstrip("-")
            if graph:
                emit(graph, i, i + len(graph))
            i = j if j > i else i + 1
            # euphonic -t- removal: skip "-t-" before an enclitic
            if i < n and norm[i] == "-":
                m = re.match(r"-t-([\wÀ-ɏ]+)", norm[i:])
                if m and m.group(1).lower() in D.HYPHEN_POST:
                    i += 3  # skip "-t-"; next loop sees the pronoun
                    continue
                if re.match(r"-([\wÀ-ɏ]+)", norm[i:]) and re.match(
                    r"-([\wÀ-ɏ]+)", norm[i:]
                ).group(1).lower() in D.HYPHEN_POST:
                    i += 1  # skip the hyphen, emit the pronoun next
                    continue
            continue
        # punctuation; the reference emits PUNdiv only for structural
        # tags (handled above via _DIV_MARK), never for any printable
        # character such as a literal '§'
        if c in _SENT_PUNCT:
            tag = D.PUN_SENT
        else:
            tag = D.PUN
        emit(c, i, i + 1, tag)
        i += 1
    return tokens


# ---------------------------------------------------------------------- #
# stage 2: lemmatizer (FrLemFilter semantics)
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
        if D.group(t.tag) in (D.PUN, D.NUM):
            continue
        graph = t.graph
        if graph and graph[0].isupper():
            # FrLemFilter.java:143-179
            if _is_roman(graph):
                t.tag = D.NUM
                continue
            if graph in D.NORM:
                t.orth = D.NORM[graph]
            if graph in D.NAMES:
                tag, orth = D.NAMES[graph]
                t.tag = tag
                if orth:
                    t.orth = orth
                continue
            low = graph.lower()
            if low in w:
                tag, orth, lem = w[low]
                t.tag, t.orth, t.lemma = tag, orth or low, lem
                continue
            if graph in D.BREVIDOT or graph.rstrip(".") in D.BREVIDOT:
                t.tag = D.SUB
                t.orth = D.BREVIDOT.get(graph.rstrip("."), graph)
                continue
            t.tag = D.NAME  # unknown capitalized → inferred name
        else:
            if graph in D.NORM:
                t.orth = D.NORM[graph]
            low = t.orth.lower()
            # elision prefix normalizes to its full form (l' → le)
            if low in D.ELISION:
                full = D.ELISION[low]
                t.orth = full
                entry = w.get(full)
                if entry:
                    t.tag, _, t.lemma = entry[0], entry[1], entry[2]
                continue
            if low in w:
                tag, orth, lem = w[low]
                t.tag, t.orth, t.lemma = tag, orth or low, lem
    return tokens


# ---------------------------------------------------------------------- #
# stage 3: locution compounding (LocutionFilter semantics)
# ---------------------------------------------------------------------- #

_TRIE = D.build_locution_trie()


def compound_locutions(tokens: list[Token]) -> list[Token]:
    """Longest-match walk of the locution trie over orth forms
    (``LocutionFilter.java:101-226``); matched runs collapse into one
    token carrying the locution orth + tag; positions renumbered."""
    out: list[Token] = []
    i = 0
    while i < len(tokens):
        node = _TRIE
        j = i
        best: tuple[int, tuple[str, int]] | None = None
        while j < len(tokens):
            key = tokens[j].orth.lower() if tokens[j].orth else tokens[j].graph
            # verbs are keyed by lemma (LocutionFilter note)
            if tokens[j].lemma and D.group(tokens[j].tag) == D.VERB:
                key = tokens[j].lemma
            if key not in node:
                break
            node = node[key]
            if "$" in node:
                best = (j, node["$"])
            j += 1
        if best is not None:
            end_i, (orth, tag) = best
            first, last = tokens[i], tokens[end_i]
            out.append(
                Token(
                    norm_graph := " ".join(
                        t.graph for t in tokens[i : end_i + 1]
                    ),
                    orth,
                    orth,
                    tag,
                    0,
                    first.start,
                    last.end,
                )
            )
            i = end_i + 1
        else:
            out.append(tokens[i])
            i += 1
    for p, t in enumerate(out):
        t.pos = p
    return out


# ---------------------------------------------------------------------- #
# stage 4: person names (FrPersnameFilter semantics)
# ---------------------------------------------------------------------- #


def join_persnames(tokens: list[Token]) -> list[Token]:
    """Join runs of NAME tokens (with optional particles between) into one
    name token: ``Victor Hugo``, ``Jean de La Salle``
    (``FrPersnameFilter.java:104-177``)."""
    out: list[Token] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if D.group(t.tag) == D.NAME:
            j = i + 1
            last_name = i
            while j < len(tokens):
                tj = tokens[j]
                if D.group(tj.tag) == D.NAME:
                    last_name = j
                    j += 1
                elif (
                    tj.orth.lower() in D.PARTICLES
                    and j + 1 < len(tokens)
                    and D.group(tokens[j + 1].tag) == D.NAME
                ):
                    j += 1
                else:
                    break
            if last_name > i:
                parts = tokens[i : last_name + 1]
                joined = " ".join(p.orth for p in parts)
                out.append(
                    Token(
                        " ".join(p.graph for p in parts),
                        joined,
                        joined,
                        D.NAME,
                        0,
                        parts[0].start,
                        parts[-1].end,
                    )
                )
                i = last_name + 1
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
    """The full French chain; the returned tokens expose ``indexed``
    (lemma channel with punctuation holes) and ``indexed_orth``.
    ``words`` optionally replaces the built-in lexicon (see
    :func:`lemmatize`)."""
    toks = tokenize_fr(text, skip_xml=skip_xml)
    toks = lemmatize(toks, words=words)
    toks = compound_locutions(toks)
    toks = join_persnames(toks)
    return toks


def is_stop(token: Token) -> bool:
    return (
        token.orth.lower() in D.STOP
        or (token.lemma or "") in D.STOP
        or D.group(token.tag) == D.PUN
    )
