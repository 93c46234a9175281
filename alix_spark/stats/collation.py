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
    """Accent-insensitive primary key + accent-sensitive tiebreak — the
    practical equivalent of a TERTIARY French collator without PyICU:
    primary = casefolded, accents stripped (canonical decomposition);
    secondary = the original casefolded string."""
    if s is None:
        return ""
    nfd = unicodedata.normalize("NFD", s.casefold())
    primary = "".join(c for c in nfd if not unicodedata.combining(c))
    return primary + "\x00" + nfd


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
