"""Stopword-vote language ID over 16 Latin-script languages: each
sample sentence (ASCII-safe function words) classifies to its language;
ties are deterministic."""

from __future__ import annotations

import pytest

from alix_spark.textops.quality import LANG_MARKERS, language_id

SAMPLES = {
    "en": "the cat sat on the mat and it is that simple for everyone with time",
    "fr": "le chat est sur la table et les souris sont dans un coin que des",
    "de": "der hund ist nicht mit der katze und das haus zu den leuten ein",
    "es": "el perro es grande y los gatos que viven en la casa por un lado",
    "it": "il cane che corre per la strada con una borsa del padrone non sono",
    "pt": "os livros que estao em cima para ler com uma amiga dos pais pelo",
    "nl": "de hond het huis een kat van de straat en dat niet met voor zijn",
    "sv": "och det som en katt av den med har inte att springa i huset",
    "da": "og det at en hund den til er som med ikke at lobe i huset",
    "no": "og det som en katt av til med har ikke skal lope i huset",
    "id": "yang dan di itu dengan untuk tidak dari ini akan pergi ke pasar",
    "pl": "nie jest to na w z do czy ale co robi kot w domu",
    "ro": "si de la cu pentru este care din nu mai vine la noi acasa",
    "fi": "ja on ei mutta kun niin se joka ovat ole koira talossa",
    "tr": "ve bir bu da de ne ama gibi daha sonra geldi eve kedi",
    "la": "et in est non ad cum sed ut quod qui venit ad urbem",
}


def test_sixteen_languages(spark):
    docs = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(sorted(SAMPLES.items()))],
        "doc_id long, expected string, text string",
    )
    got = {
        r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()
    }
    expected = {i: lang for i, (lang, _) in enumerate(sorted(SAMPLES.items()))}
    mism = {i: (expected[i], got[i]) for i in expected if got[i] != expected[i]}
    assert not mism, mism


def test_markers_are_tokenizer_safe():
    # every marker must survive the simple tokenizer unchanged (pure
    # ascii [a-z0-9]) — an accented marker would never match a token
    import re

    for lang, markers in LANG_MARKERS.items():
        for m in markers:
            assert re.fullmatch(r"[a-z0-9]+", m), (lang, m)
