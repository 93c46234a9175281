"""Corpus statistics — the reference's FieldText/FieldFacet/FieldInt/Scale
family re-expressed as DataFrame aggregation plans (SURVEY.md §2.5)."""
