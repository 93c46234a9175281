#!/usr/bin/env python3
"""Diff the Python chain (alix_spark.analysis) against the reference
chain's dump (FrChainOracle TSV) on the sample corpus. Used during
development; the checked-in parity goldens are asserted by
tests/test_fr_chain_parity.py."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from alix_spark.analysis import fr_dicts as D  # noqa: E402
from alix_spark.analysis.french import analyze  # noqa: E402
from alix_spark.analysis.fr_lexicon import merged_lexicon  # noqa: E402

# fr_dicts tag ints are the reference's Tag enum values — direct compare
REF_FLAG = {t: t for t in range(0x100)}


def py_rows(path: Path, words) -> list[tuple]:
    text = path.read_text(encoding="utf-8")
    rows = []
    for t in analyze(text, skip_xml=True, words=words):
        rows.append(
            (
                t.pos,
                t.indexed,
                t.orth,
                t.lemma or "",
                REF_FLAG.get(t.tag, t.tag),
                t.start,
                t.end,
            )
        )
    return rows


def ref_rows(tsv: Path, chain: str) -> dict[str, list[tuple]]:
    out: dict[str, list[tuple]] = {}
    for line in tsv.read_text(encoding="utf-8").splitlines():
        f, ch, pos, term, orth, lem, flags, start, end = line.split("\t")
        if ch != chain:
            continue
        out.setdefault(f, []).append(
            (int(pos), term, orth, lem, int(flags), int(start), int(end))
        )
    return out


def main() -> None:
    tsv = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/fr_chain_ref.tsv")
    samples = Path(__file__).parent / "samples"
    ref = ref_rows(tsv, "cloud")
    words = merged_lexicon()
    total = mismatches = 0
    only = sys.argv[2] if len(sys.argv) > 2 else None
    for f in sorted(samples.glob("*.txt")):
        fid = f.stem
        if only and only not in fid:
            continue
        mine = py_rows(f, words)
        theirs = ref.get(fid, [])
        n = max(len(mine), len(theirs))
        for i in range(n):
            m = mine[i] if i < len(mine) else None
            r = theirs[i] if i < len(theirs) else None
            total += 1
            if m != r:
                mismatches += 1
                print(f"{fid}[{i}]  py={m}\n{' ' * len(fid)}   ref={r}")
    print(f"\n{mismatches}/{total} token mismatches")


if __name__ == "__main__":
    main()
