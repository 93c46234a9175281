"""Positional / co-occurrence operators — the FieldRail family
(SURVEY.md §2.6), built on the rails table ``(doc_id, rail: array<int>)``
or the exploded token table."""
