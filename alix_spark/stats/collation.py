"""K3 — alphabetic sort with French collation.

Reference: ``/root/reference/java/alix/lucene/search/FormEnum.java:363-388``
(Collator FRANCE, TERTIARY strength, canonical decomposition). Vocab
lists are small relative to the corpus, so the sort key is computed with
``locale``/unicodedata on the driver or in a lightweight UDF — never in
the hot path.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_LIGATURES = {"œ": "oe", "æ": "ae"}
_SEPARATORS = {" ": "1", "-": "2"}  # no-separator < space < hyphen

# Secondary weights of combining marks in the JDK's collation table,
# derived empirically from java.text.Collator FRANCE (probe in
# tests/test_fr_collation_golden.py): acute < grave < breve < circumflex
# < caron < ring < diaeresis < dot < macron < tilde < cedilla < ogonek.
# NOT codepoint order (grave 0x300 < acute 0x301 would invert
# précédent/précèdent).
_ACCENT_WEIGHT = {
    0x301: 1, 0x300: 2, 0x306: 3, 0x302: 4, 0x30C: 5, 0x30A: 6,
    0x308: 7, 0x307: 8, 0x304: 9, 0x303: 10, 0x327: 11, 0x328: 12,
}


def _accent_key(mark: str) -> str:
    # +1 keeps every weight above the \x01 group separator, so an
    # accentless group still compares below any accented one
    w = _ACCENT_WEIGHT.get(ord(mark))
    return chr(w + 1) if w is not None else "\x1f" + mark


def fr_sort_key(s: str) -> str:
    """TERTIARY French collation key without PyICU, four levels joined
    by NUL separators, golden-tested against ``java.text.Collator``
    FRANCE/TERTIARY/CANONICAL (the exact collator of
    ``FormEnum.java:363-388``) via ``tools/lucene_oracle/
    FrCollatorOracle.java`` — EXACT order parity on the full ~33k-word
    generated lexicon (tests/test_fr_collation_golden.py):

    * primary   — base letters, canonical decomposition, casefolded,
      ligatures expanded (œ→oe, æ→ae), apostrophe kept (the JDK table
      makes ' a primary difference before letters: d'abord < dab),
      space/hyphen dropped;
    * secondary — accent marks compared **backwards** (from the end of
      the word), the defining FRANCE-locale behaviour: it orders
      cote < côte < coté < côté, where a forward comparison would put
      coté before côte;
    * tertiary  — case (lowercase first) and ligature flags (oeuvre
      before œuvre);
    * quaternary — separator positions/kinds (grandpère < grand père <
      grand-père). Documented divergence vs the JDK: java.text ranks
      space/hyphen as secondary differences interleaved with accents;
      here they only break full tertiary ties — orderings differ only
      for pairs that are equal up to accents/case except for a
      separator AND also differ in accents (rare in real vocabularies;
      see tests/test_fr_collation_golden.py::test_separator_semantics).
    """
    if s is None:
        return ""
    nfd = unicodedata.normalize("NFD", s)
    primary: list[str] = []
    accents: list[str] = []
    tertiary: list[str] = []
    quaternary: list[str] = []
    for c in nfd:
        if unicodedata.combining(c):
            if accents:
                accents[-1] += _accent_key(c)
            continue
        if c in _SEPARATORS:
            quaternary.append(f"{len(primary)}:{_SEPARATORS[c]}")
            continue
        low = c.casefold()
        case_flag = "1" if c != low else "0"
        exp = _LIGATURES.get(low)
        if exp:
            for ch in exp:
                primary.append(ch)
                accents.append("")
                tertiary.append("3" if case_flag == "1" else "2")
        else:
            for ch in low:  # casefold may expand (ß → ss)
                primary.append(ch)
                accents.append("")
                tertiary.append(case_flag)
    return "\x00".join(
        (
            "".join(primary),
            "\x01".join(reversed(accents)),
            "".join(tertiary),
            ",".join(quaternary),
        )
    )


def sort_forms_fr(forms: DataFrame, term_col: str = "term") -> DataFrame:
    """Alphabetic French ordering of a forms table."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def key_udf(s: pd.Series) -> pd.Series:
        return s.map(fr_sort_key)

    return (
        forms.withColumn("_k", key_udf(F.col(term_col)))
        .orderBy("_k")
        .drop("_k")
    )
