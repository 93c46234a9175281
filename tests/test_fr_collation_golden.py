"""K3 collation parity vs the reference's exact collator.

The reference sorts forms with ``java.text.Collator`` FRANCE, TERTIARY
strength, canonical decomposition
(``/root/reference/java/alix/lucene/search/FormEnum.java:363-388``).
``tools/lucene_oracle/FrCollatorOracle.java`` (compiled .class checked
in) sorts a stdin vocabulary with that exact collator; these tests
assert ``fr_sort_key`` reproduces its order on the full ~33k-word
generated lexicon and document the one known divergence class
(separator secondaries)."""

from __future__ import annotations

import re
import shutil
import subprocess
from pathlib import Path

import pytest

from alix_spark.analysis.fr_lexicon import build_lexicon
from alix_spark.stats.collation import fr_sort_key

TOOL_DIR = str(Path(__file__).resolve().parents[1] / "tools" / "lucene_oracle")

pytestmark = pytest.mark.skipif(
    shutil.which("java") is None, reason="no JVM available"
)


def java_order(words: list[str]) -> list[str]:
    out = subprocess.run(
        ["java", "-cp", TOOL_DIR, "FrCollatorOracle"],
        input=("\n".join(words) + "\n").encode("utf-8"),
        capture_output=True,
        check=True,
    )
    return out.stdout.decode("utf-8").splitlines()


ACCENT_STRESS = [
    "cote", "côte", "coté", "côté", "Zola", "zola", "être", "Etre",
    "Être", "œuvre", "oeuvre", "noël", "Noël", "garçon", "garcon",
    "élève", "élevé", "mère", "mur", "mûr", "ou", "où", "a", "à",
    "pêche", "pèche", "péché", "maïs", "mais",
]


def test_full_lexicon_order_parity():
    """EXACT order parity with java.text.Collator FRANCE/TERTIARY on
    every separator-free word of the generated lexicon (~33k) plus the
    accent/case/ligature stress set."""
    vocab = sorted(
        w
        for w in set(build_lexicon().keys()) | set(ACCENT_STRESS)
        if not re.search(r"[ \-]", w)
    )
    golden = java_order(vocab)
    mine = sorted(vocab, key=fr_sort_key)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(golden, mine)) if a != b
    ]
    assert not mismatches, mismatches[:10]


def test_apostrophe_is_primary():
    """The JDK table ranks the apostrophe as a primary difference before
    letters: d'abord < dab < dabord."""
    vocab = ["dabord", "dab", "d'abord", "aujourd'hui", "aujourdhui"]
    assert java_order(vocab) == sorted(vocab, key=fr_sort_key)


def test_separator_semantics():
    """Space/hyphen: same relative order as the JDK on same-letter
    words (grandpère < grand père < grand-père — wait: the JDK ranks
    separators as SECONDARY differences below accents, so the accented
    no-separator word sorts between them; our key ranks separators
    quaternary, below case). Assert our documented ordering AND the
    JDK's, so any silent change to either side fails here."""
    vocab = ["grandpere", "grandpère", "grand père", "grand-père"]
    assert java_order(vocab) == [
        "grandpere", "grandpère", "grand père", "grand-père"
    ]
    # our key agrees on this real-vocabulary case
    assert sorted(vocab, key=fr_sort_key) == [
        "grandpere", "grandpère", "grand père", "grand-père"
    ]
    # the documented divergence: a separator vs accent interleave —
    # JDK: ab < a b < àb < a-b (space/hyphen secondaries straddle the
    # accent secondary); ours keeps accentless-with-separator together
    synthetic = ["ab", "a b", "àb", "a-b"]
    assert java_order(synthetic) == ["ab", "a b", "àb", "a-b"]
    assert sorted(synthetic, key=fr_sort_key) == ["ab", "a b", "a-b", "àb"]
