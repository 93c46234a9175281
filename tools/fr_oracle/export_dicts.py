#!/usr/bin/env python3
"""Export alix_spark's French dictionaries into the reference's CSV
resource formats, so the reference's own analysis chain (compiled from
``/root/reference/java``) runs with OUR dictionary content.

Why: the reference snapshot ships no ``word.csv`` (stripped), so its
chain cannot run with its own full lexicon anyway; and our dictionaries
must stay public-knowledge-generated (no copying of reference data).
Feeding BOTH engines the SAME (our) dictionaries isolates what the
parity goldens actually prove: CHAIN-SEMANTICS equality — tokenizer
rules, lemma lookup, locution compounding, person-name joining, final
flag selection — independent of dictionary content.

Formats (from /root/reference/java/alix/lucene/analysis/FrDics.java):
  stop.csv      1 col   GRAPH                      (FrDics.java:104-117)
  word.csv      cells GRAPH,CAT,LEM                (FrDics.java:121-132)
  name.csv      cells GRAPH,CAT,ORTH               (FrDics.java:134-155)
  orth.csv      2 cols GRAPH;ORTH      -> NORM     (FrDics.java:159-160)
  ellision.csv  2 cols APOS;NORM       -> ELISION  (FrDics.java:161)
  brevidot.csv  2 cols GRAPH;ORTH      -> BREVIDOT (FrDics.java:162)
  locutions.csv 4 cols GRAPH,CAT,ORTH,LEM          (FrDics.java:163,278-320)
  num.csv       4 cols GRAPH,CAT,ORTH,LEM          (FrDics.java:164)
The name-list files commune/france/forename/place/author also load into
NAMES (FrDics.java:134); we emit header-only stubs for those and put all
names in name.csv.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from alix_spark.analysis import fr_dicts as D  # noqa: E402

# our tag int -> reference Tag enum name (Tag.java:47-220); the reverse
# (ref flag int -> our tag group) lives in tests/test_fr_chain_parity.py
TAG_NAME = {
    D.UNKNOWN: "UNKNOWN",
    D.VERB: "VERB",
    D.SUB: "SUB",
    D.NAME: "NAME",
    D.NAME_PERS: "NAMEpers",
    D.NAME_PERS_M: "NAMEpersm",
    D.NAME_PERS_F: "NAMEpersf",
    D.NAME_PLACE: "NAMEplace",
    D.NAME_AUTHOR: "NAMEauthor",
    D.ADJ: "ADJ",
    D.ADV: "ADV",
    D.DET: "DET",
    D.PRO: "PRO",
    D.CONJ: "CONJsub",
    D.PREP: "PREP",
    D.NUM: "NUM",
    D.EXCL: "EXCL",
}


def merged_words() -> dict:
    from alix_spark.analysis.fr_lexicon import merged_lexicon

    return merged_lexicon()


def export(outdir: str | Path) -> None:
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)

    # stop.csv: single GRAPH column
    lines = ["GRAPH"] + sorted(D.STOP)
    (out / "stop.csv").write_text("\n".join(lines) + "\n", encoding="utf-8")

    # word.csv: GRAPH,CAT,LEM (the static loader reads lemma at cell 2,
    # FrDics.java:121-132). Multi-word graphs (locutions already in
    # WORDS) are skipped here; they go through locutions.csv.
    rows = ["GRAPH,CAT,LEM"]
    for graph, (tag, orth, lem) in sorted(merged_words().items()):
        if " " in graph or "," in graph:
            continue
        rows.append(f"{graph},{TAG_NAME.get(tag, 'UNKNOWN')},{lem or ''}")
    (out / "word.csv").write_text("\n".join(rows) + "\n", encoding="utf-8")

    # name.csv: GRAPH,CAT,ORTH -> NAMES
    rows = ["GRAPH,CAT,ORTH"]
    for graph, (tag, orth) in sorted(D.NAMES.items()):
        rows.append(f"{graph},{TAG_NAME.get(tag, 'NAME')},{orth or ''}")
    (out / "name.csv").write_text("\n".join(rows) + "\n", encoding="utf-8")
    for stub in ("commune.csv", "france.csv", "forename.csv",
                 "place.csv", "author.csv"):
        (out / stub).write_text("GRAPH,CAT,ORTH\n", encoding="utf-8")

    # orth.csv (graphic normalization) + header-only caps.csv
    rows = ["GRAPH;ORTH"]
    for graph, orth in sorted(D.NORM.items()):
        rows.append(f"{graph};{orth}")
    (out / "orth.csv").write_text("\n".join(rows) + "\n", encoding="utf-8")
    (out / "caps.csv").write_text("GRAPH;ORTH\n", encoding="utf-8")

    # ellision.csv: apostrophe form -> replacement term. The reference
    # tokenizer REPLACES the term on match (FrTokenizer.java:433-437),
    # so both case variants are keys, both mapping to the lowercase full
    # form (the editorial choice our chain uses: l' -> le).
    rows = ["APOS;NORM"]
    for apos, full in sorted(D.ELISION.items()):
        rows.append(f"{apos};{full}")
        rows.append(f"{apos[0].upper() + apos[1:]};{full}")
    (out / "ellision.csv").write_text(
        "\n".join(rows) + "\n", encoding="utf-8"
    )

    # brevidot.csv: dot-included GRAPH -> replacement (FrDics.brevidot
    # copies the value into the term when non-empty, FrDics.java:385-391)
    rows = ["GRAPH;ORTH"]
    for graph, orth in sorted(D.BREVIDOT.items()):
        rows.append(f"{graph};{orth}")
    (out / "brevidot.csv").write_text(
        "\n".join(rows) + "\n", encoding="utf-8"
    )

    # locutions.csv: GRAPH,CAT,ORTH,LEM; graph = space-joined tokens
    # exactly as the compound tree expects (FrDics.compound splits on
    # space and apostrophe, FrDics.java:323-343)
    rows = ["GRAPH,CAT,ORTH,LEM"]
    for toks, (orth, tag, lem) in sorted(D.LOCUTIONS.items()):
        graph = ""
        for t in toks:
            if graph and not graph.endswith("'"):
                graph += " "
            graph += t
        rows.append(
            f"{graph},{TAG_NAME.get(tag, 'UNKNOWN')},{orth},{lem or ''}"
        )
    (out / "locutions.csv").write_text(
        "\n".join(rows) + "\n", encoding="utf-8"
    )

    (out / "num.csv").write_text("GRAPH,CAT,ORTH,LEM\n", encoding="utf-8")


if __name__ == "__main__":
    export(sys.argv[1] if len(sys.argv) > 1 else
           Path(__file__).parent / "res" / "alix" / "fr")
    print("exported")
