"""Scalar text functions (SPEC.md §2) — the N1 glyph cleaner and HTML helpers.

All regexes are RE2-safe so the same pattern strings run both through Python ``re``
(scalar path, oracle parity) and ``pyarrow.compute.replace_substring_regex`` /
``count_substring_regex`` (vectorized batch path in the parse stage).

The glyph pattern is the reference's only text normalization and part of the
span-equality invariant (reference
``app/services/content_extractor/slice_extractor.py:62,212-225``).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# Pattern strings (shared by re and RE2/pyarrow).
GLYPH_PAT = r"(?i)glyph<(?:c=\d+,font=/[A-Z0-9]+\+[A-Za-z0-9-]+|\d+)>"
WS_RUN_PAT = r"[ \t]+"
TAG_PAT = r"(?s)<[^>]*>"
ANCHOR_PAT = r"(?is)<a\b[^>]*>.*?</a>"
HTML_DETECT_PAT = (
    r"(?is)<(?:!doctype|html|head|body|div|p|a|nav|span|ul|ol|li|table|h[1-6]|footer|header)\b"
)
WORD_PAT = r"[^ \t\n\r\f]+"

_GLYPH_RE = re.compile(GLYPH_PAT)
_WS_RUN_RE = re.compile(WS_RUN_PAT)
_TAG_RE = re.compile(TAG_PAT)
_ANCHOR_RE = re.compile(ANCHOR_PAT)
_HTML_DETECT_RE = re.compile(HTML_DETECT_PAT)
_WORD_RE = re.compile(WORD_PAT)

# Entity decode order matters: &amp; LAST (SPEC.md §2).
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def clean_text(s: str) -> str:
    """N1: glyph artifacts → ' ', collapse [ \\t]+ runs, strip. Newlines survive."""
    return _WS_RUN_RE.sub(" ", _GLYPH_RE.sub(" ", s)).strip()


def strip_tags(s: str) -> str:
    return _TAG_RE.sub(" ", s)


def decode_entities(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def visible_text(s: str) -> str:
    """HTML → visible text: strip tags then decode entities."""
    return decode_entities(strip_tags(s))


def extract_text(s: str, is_html: bool) -> str:
    return clean_text(visible_text(s)) if is_html else clean_text(s)


def word_count(s: str) -> int:
    return len(_WORD_RE.findall(s))


def looks_like_html(s: str) -> bool:
    return _HTML_DETECT_RE.search(s) is not None


def strip_anchors(s: str) -> str:
    return _ANCHOR_RE.sub(" ", s)


# ---------------------------------------------------------------------------
# Vectorized (pyarrow.compute, RE2) variants over string arrays.
# ---------------------------------------------------------------------------


def clean_text_arr(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    out = pc.replace_substring_regex(arr, pattern=GLYPH_PAT, replacement=" ")
    out = pc.replace_substring_regex(out, pattern=WS_RUN_PAT, replacement=" ")
    return pc.utf8_trim_whitespace(out)


def visible_text_arr(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    out = pc.replace_substring_regex(arr, pattern=TAG_PAT, replacement=" ")
    for ent, ch in _ENTITIES:
        out = pc.replace_substring(out, pattern=ent, replacement=ch)
    return out


def word_count_arr(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    return pc.count_substring_regex(arr, pattern=WORD_PAT)


def strip_anchors_arr(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    return pc.replace_substring_regex(arr, pattern=ANCHOR_PAT, replacement=" ")


def looks_like_html_arr(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    return pc.match_substring_regex(arr, pattern=HTML_DETECT_PAT)
