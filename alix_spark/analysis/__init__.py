"""Analysis chains: text → token streams.

Two paths:

* :mod:`alix_spark.analysis.simple` — pure JVM-side tokenization
  (``split`` + ``posexplode`` inside whole-stage codegen). This is the hot
  path for plain text / source code and the oracle-parity path (DuckDB can
  reproduce it exactly in SQL).
* :mod:`alix_spark.analysis.french` — the full Alix-equivalent French chain
  (elision, hyphen enclitics, abbreviation dots, lexicon lemmatization,
  locution compounding, person-name joining) as an Arrow-vectorized
  ``mapInPandas`` kernel with broadcast dictionaries.
"""
