"""D3/D4/D5 — full-text painting, two-doc contrast, light marker.

Reference: ``/root/reference/java/alix/lucene/search/Doc.java:251-288``
(paint: every non-stop token marked with a CSS level by tf bucket),
``Doc.java:354-439`` (contrast: shared vs specific vocabulary of two
docs, levels by relative frequency), ``Marker.java:40-145`` (light
analyzer-match marker for short texts).
"""

from __future__ import annotations

import math
import re


def tf_level(tf: int, max_tf: int, levels: int = 6) -> int:
    """CSS class level for a token frequency (log-bucketed)."""
    if max_tf <= 1:
        return 1
    return 1 + min(
        levels - 1, int((levels - 1) * math.log1p(tf) / math.log1p(max_tf))
    )


def paint(
    text: str,
    token_offsets: list[tuple[int, int, str]],
    tfs: dict[str, int],
    stop: set[str] | None = None,
    levels: int = 6,
) -> str:
    """Mark every non-stop token with its tf level
    → ``<mark class="lvlN">`` wrapped text (``Doc.java:251-288``)."""
    stop = stop or set()
    max_tf = max(tfs.values(), default=1)
    out, prev = [], 0
    for s, e, term in sorted(token_offsets):
        if s < prev or not term or term in stop:
            continue
        lvl = tf_level(tfs.get(term, 1), max_tf, levels)
        out.append(text[prev:s])
        out.append(f'<mark class="lvl{lvl}">{text[s:e]}</mark>')
        prev = e
    out.append(text[prev:])
    return "".join(out)


def contrast(
    text: str,
    token_offsets: list[tuple[int, int, str]],
    tf_self: dict[str, int],
    tf_other: dict[str, int],
    len_self: int,
    len_other: int,
) -> str:
    """Two-doc comparative hilite (``Doc.java:354-439``): shared terms
    get class ``shared`` with a level by relative-frequency ratio;
    self-specific terms get ``specific``."""
    out, prev = [], 0
    for s, e, term in sorted(token_offsets):
        if s < prev or not term or term not in tf_self:
            continue
        out.append(text[prev:s])
        if term in tf_other:
            r_self = tf_self[term] / max(len_self, 1)
            r_other = tf_other[term] / max(len_other, 1)
            ratio = r_self / (r_self + r_other)
            lvl = 1 + min(4, int(ratio * 5))
            out.append(
                f'<mark class="shared lvl{lvl}">{text[s:e]}</mark>'
            )
        else:
            out.append(f'<mark class="specific">{text[s:e]}</mark>')
        prev = e
    out.append(text[prev:])
    return "".join(out)


def mark_terms(text: str, terms: list[str], tag: str = "mark") -> str:
    """D5 — light regex marker for short texts (titles)
    (``Marker.java:40-145``): case-insensitive whole-word matches."""
    if not terms:
        return text
    pat = re.compile(
        r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b", re.IGNORECASE
    )
    return pat.sub(lambda m: f"<{tag}>{m.group(0)}</{tag}>", text)
