"""Token-stream parity vs the REFERENCE's own French analysis chain.

The golden file tests/golden/fr_chain_parity.tsv was produced by running
the reference's Java analyzers — FrTokenizer → FrLemFilter →
LocutionFilter → FrPersnameFilter → FlagCloudFilter (the default text
field of ``/root/reference/java/alix/lucene/analysis/FrAnalyzer.java:52-70``)
and the FlagOrthFilter twin — compiled unmodified from
``/root/reference/java`` against the checked-in Lucene 8.8.1 jars, over
the varied sample corpus in tools/fr_oracle/samples (elisions, hyphen
enclitics, abbreviation dots, roman numerals, numbers, clause/sentence
punctuation, locutions, person names, capitalization, XML tags and
entities).

Both engines run the SAME dictionaries (ours, exported to the
reference's CSV resource formats by tools/fr_oracle/export_dicts.py —
the reference snapshot ships no word.csv, so its own full lexicon
cannot be used), which makes this a CHAIN-SEMANTICS proof: every
tokenizer rule, the lemma lookup discipline, locution compounding,
person-name joining, flag selection, and every character offset must
match the reference implementation exactly, independent of dictionary
content.

Asserted channels per token: term (post-selection), orth, lemma, flags
(fr_dicts tag ints == the reference Tag enum values), startOffset,
endOffset — for BOTH the cloud chain and the orth twin chain.

Regenerate after dictionary/sample changes:
    cd tools/fr_oracle && python3 export_dicts.py && \
    javac -sourcepath /root/reference/java -cp <lucene jars> \
        -d classes FrChainOracle.java && \
    java -cp classes:res:/root/reference/java:<jars> \
        FrChainOracle samples ../../tests/golden/fr_chain_parity.tsv
"""

from __future__ import annotations

from pathlib import Path

import pytest

from alix_spark.analysis.french import analyze, analyze_orth

GOLDEN = Path(__file__).parent / "golden" / "fr_chain_parity.tsv"
SAMPLES = Path(__file__).resolve().parents[1] / "tools" / "fr_oracle" / "samples"


def _ref_rows() -> dict[tuple[str, str], list[tuple]]:
    out: dict[tuple[str, str], list[tuple]] = {}
    for line in GOLDEN.read_text(encoding="utf-8").splitlines():
        fid, chain, pos, term, orth, lem, flags, start, end = line.split("\t")
        out.setdefault((fid, chain), []).append(
            (int(pos), term, orth, lem, int(flags), int(start), int(end))
        )
    return out


@pytest.fixture(scope="module")
def ref():
    return _ref_rows()


@pytest.fixture(scope="module")
def lexicon():
    from alix_spark.analysis.fr_lexicon import merged_lexicon

    return merged_lexicon()


def _tok_rows(toks, channel_attr):
    return [
        (
            t.pos,
            getattr(t, channel_attr),
            t.orth,
            t.lemma or "",
            t.tag,
            t.start,
            t.end,
        )
        for t in toks
    ]


@pytest.mark.parametrize(
    "sample", sorted(p.stem for p in SAMPLES.glob("*.txt"))
)
def test_cloud_chain_parity(sample, ref, lexicon):
    text = (SAMPLES / f"{sample}.txt").read_text(encoding="utf-8")
    mine = _tok_rows(analyze(text, words=lexicon), "indexed")
    assert mine == ref[(sample, "cloud")]


@pytest.mark.parametrize(
    "sample", sorted(p.stem for p in SAMPLES.glob("*.txt"))
)
def test_orth_chain_parity(sample, ref, lexicon):
    text = (SAMPLES / f"{sample}.txt").read_text(encoding="utf-8")
    mine = _tok_rows(analyze_orth(text, words=lexicon), "indexed_orth")
    assert mine == ref[(sample, "orth")]
