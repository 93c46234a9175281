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


def fr_sort_key(s: str) -> str:
    """TERTIARY French collation key without PyICU, three levels joined
    by NUL separators:

    * primary   — base letters, canonical decomposition, casefolded
      (accent- and case-insensitive);
    * secondary — accent marks compared **backwards** (from the end of
      the word), the defining FRANCE-locale behaviour: it orders
      cote < côte < coté < côté, where a forward comparison would put
      coté before côte;
    * tertiary  — case, lowercase before uppercase.
    """
    if s is None:
        return ""
    nfd = unicodedata.normalize("NFD", s.casefold())
    primary_chars: list[str] = []
    accent_groups: list[str] = []
    for c in nfd:
        if unicodedata.combining(c):
            if accent_groups:
                accent_groups[-1] += c
        else:
            primary_chars.append(c)
            accent_groups.append("")
    primary = "".join(primary_chars)
    secondary = "\x01".join(reversed(accent_groups))
    nfd_orig = unicodedata.normalize("NFD", s)
    tertiary = "".join(
        "1" if c.isupper() else "0"
        for c in nfd_orig
        if not unicodedata.combining(c)
    )
    return primary + "\x00" + secondary + "\x00" + tertiary


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
