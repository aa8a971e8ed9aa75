"""Sniff stage (SPEC.md §3) — stateless, fully vectorized ``map_batches`` transform.

Analog of the reference's content-type / empty-upload validation and page-count
cost probe (``app/api.py:86-98``, ``content_extractor.py:137-154``): classify each
document from its *content* (magic-marker style RE2 match over span texts, not a
trusted label) and compute ``est_cost`` used by the cost-based splitter.

Runs as plain tasks: no state, pure Arrow compute, zero-copy batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.schema import MEDIA_KINDS, TEXT_KINDS
from ..functions.text_clean import looks_like_html_arr

_MEDIA_KIND_ARR = pa.array(sorted(MEDIA_KINDS))
_TEXT_KIND_ARR = pa.array(sorted(TEXT_KINDS))


def _segment_any(flags: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-list 'any' reduction over a flattened boolean array, given list offsets."""
    if len(flags) == 0:
        return np.zeros(len(offsets) - 1, dtype=bool)
    csum = np.concatenate([[0], np.cumsum(flags.astype(np.int64))])
    return (csum[offsets[1:]] - csum[offsets[:-1]]) > 0


def list_offsets(col: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Return (child values array, int64 offsets) of a list column.

    ``offs`` indexes into the *unsliced* child ``values`` array (Arrow semantics:
    list i = values[offs[i]:offs[i+1]]), so per-element kernels must be computed
    over the full child array.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return col.values, offs


# --------------------------------------------------------------------------
# Byte-level magic sniffing (F1 analog — reference api.py:86-90 gates uploads
# on content type BEFORE any parsing; real document bytes must route by their
# magic, not by span text). Used by the raw-upload seam ahead of the span-text
# classifier below; the interleaved-span corpus path is unaffected.
# --------------------------------------------------------------------------

_MAGIC_TYPES: list[tuple[bytes, str]] = [
    (b"%PDF-", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"PK\x03\x04", "application/zip"),
    (b"SIMG1\0", "image/x-synth"),
    (b"STBL1\0", "table/x-synth"),
]

_HTML_MARKERS = (b"<!doctype", b"<html", b"<head", b"<body", b"<div", b"<p",
                 b"<a ", b"<a>", b"<nav", b"<span", b"<table", b"<ul", b"<ol")


def sniff_magic(data: bytes | None) -> str:
    """Content type from the leading bytes: binary magics first, then an HTML
    marker scan over the (whitespace-stripped, lowercased) head, then a
    printable-ratio text/binary split."""
    if not data:
        return "application/x-empty"
    for magic, ctype in _MAGIC_TYPES:
        if data[: len(magic)] == magic:
            return ctype
    head = data[:512].lstrip()[:256].lower()
    if head.startswith(b"<") and any(m in head for m in _HTML_MARKERS):
        return "text/html"
    probe = data[:512]
    n_printable = sum(1 for b in probe if 32 <= b < 127 or b in (9, 10, 13))
    if n_printable >= 0.95 * len(probe):
        return "text/plain"
    return "application/octet-stream"


def sniff_magic_batch(batch: pa.Table, data_col: str = "data",
                      accept: tuple[str, ...] = ("application/pdf",
                                                 "text/html")) -> pa.Table:
    """Upload-gate stage: append content_type (from byte magic) and accepted
    (reference api.py:86-90 rejects everything but its accepted types with 415
    before parsing). Runs as a plain map_batches task over a binary column."""
    col = batch[data_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # only the heads leave the column: slice before materializing python bytes
    heads = pc.binary_slice(col, 0, 600)
    ctypes = [sniff_magic(h) for h in heads.to_pylist()]
    acc = [c in accept for c in ctypes]
    return batch.append_column(
        "content_type", pa.array(ctypes, pa.string())
    ).append_column("accepted", pa.array(acc, pa.bool_()))


def sniff_batch(batch: pa.Table) -> pa.Table:
    """Append doc_class / est_cost columns. One vectorized pass over span texts."""
    from ..core import limit_arrow_threads

    limit_arrow_threads(1)
    n = batch.num_rows
    if n == 0:
        return batch.append_column("doc_class", pa.array([], pa.string())).append_column(
            "est_cost", pa.array([], pa.int64())
        )
    spans_col = batch["spans"]
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    values, offs = list_offsets(spans_col)
    texts = values.field("text")
    kinds = values.field("kind")

    html_flags = looks_like_html_arr(texts).to_numpy(zero_copy_only=False)
    html_flags = np.where(np.equal(html_flags, None), False, html_flags).astype(bool)
    is_media = pc.is_in(kinds, value_set=_MEDIA_KIND_ARR).to_numpy(zero_copy_only=False)
    is_textkind = ~is_media  # unknown kinds count as text kinds (SPEC §1)
    is_boiler = pc.equal(kinds, "boilerplate").to_numpy(zero_copy_only=False)
    is_textkind = is_textkind & ~is_boiler
    # explicit ASCII non-whitespace class: identical semantics in RE2 and Python re
    # (RE2's \S would diverge from Python's unicode-aware \S on e.g. U+00A0)
    has_ws_text = (
        pc.match_substring_regex(texts, pattern=r"[^ \t\n\r\f\v]")
        .to_numpy(zero_copy_only=False)
    ).astype(bool)
    text_lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)

    doc_any_html = _segment_any(html_flags, offs)
    doc_any_rawtext = _segment_any(is_textkind & has_ws_text, offs)
    doc_any_media = _segment_any(is_media, offs)
    n_spans = offs[1:] - offs[:-1]
    csum_len = np.concatenate([[0], np.cumsum(text_lens)])
    doc_chars = csum_len[offs[1:]] - csum_len[offs[:-1]]
    csum_media = np.concatenate([[0], np.cumsum(is_media.astype(np.int64))])
    doc_media = csum_media[offs[1:]] - csum_media[offs[:-1]]

    doc_class = np.where(
        n_spans == 0,
        "empty",
        np.where(
            doc_any_html,
            "html",
            np.where(~doc_any_rawtext & doc_any_media, "scanned", "text"),
        ),
    )
    payload_bytes = batch["payload_bytes"].to_numpy(zero_copy_only=False).astype(np.int64)
    est_cost = doc_chars + 64 * doc_media + payload_bytes // 64

    return batch.append_column("doc_class", pa.array(doc_class, pa.string())).append_column(
        "est_cost", pa.array(est_cost, pa.int64())
    )
