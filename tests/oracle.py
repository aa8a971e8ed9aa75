"""Single-threaded pure-Python oracle for the extraction semantics (docs/SPEC.md).

Deliberately does NOT import anything from ``document_processor_ray`` — it
re-implements the spec from scratch (different structure, stdlib ``re`` only) so
implementation bugs cannot self-confirm (SURVEY §5.1).
"""

from __future__ import annotations

import hashlib
import json
import re
import struct
import zlib

GLYPH = re.compile(r"(?i)glyph<(?:c=\d+,font=/[A-Z0-9]+\+[A-Za-z0-9-]+|\d+)>")
WSRUN = re.compile(r"[ \t]+")
TAG = re.compile(r"(?s)<[^>]*>")
ANCHOR = re.compile(r"(?is)<a\b[^>]*>.*?</a>")
HTMLISH = re.compile(
    r"(?is)<(?:!doctype|html|head|body|div|p|a|nav|span|ul|ol|li|table|h[1-6]|footer|header)\b"
)
NONWS = re.compile(r"[^ \t\n\r\f\v]")

TEXT_KINDS = {
    "title", "section_header", "paragraph", "text", "list_item", "caption",
    "footnote", "page_header", "page_footer",
}
MEDIA_KINDS = {"table", "picture", "formula", "code"}


def clean(s: str) -> str:
    return WSRUN.sub(" ", GLYPH.sub(" ", s)).strip()


def visible(s: str) -> str:
    s = TAG.sub(" ", s)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        s = s.replace(ent, ch)
    return s


WORD = re.compile(r"[^ \t\n\r\f]+")


def nwords(s: str) -> int:
    return len(WORD.findall(s))


def classify(spans: list[dict]) -> str:
    if not spans:
        return "empty"
    if any(HTMLISH.search(s["text"]) for s in spans):
        return "html"
    raw_text = any(
        (s["kind"] not in MEDIA_KINDS and s["kind"] != "boilerplate")
        and NONWS.search(s["text"])
        for s in spans
    )
    if not raw_text:
        return "scanned" if any(s["kind"] in MEDIA_KINDS for s in spans) else "text"
    return "text"


def decode(data: bytes):
    """Returns ('img', w, h, text) | ('tbl', rows) | None on corruption."""
    try:
        if data[:6] == b"SIMG1\0":
            w, h = struct.unpack("<II", data[6:14])
            return ("img", w, h, zlib.decompress(data[14:]).decode("utf-8"))
        if data[:6] == b"STBL1\0":
            rows = json.loads(zlib.decompress(data[6:]).decode("utf-8"))
            if not isinstance(rows, list):
                return None
            return ("tbl", rows)
    except Exception:
        return None
    return None


def canonical_ref(dec) -> str:
    if dec[0] == "img":
        _, w, h, text = dec
        blob = (b"EIMG1\0" + struct.pack("<II", w, h)
                + zlib.compress(clean(text).encode("utf-8"), 9))
    else:
        rows = [[clean(c) if isinstance(c, str) else c for c in row] for row in dec[1]]
        blob = b"ETBL1\0" + zlib.compress(
            json.dumps(rows, separators=(",", ":"), ensure_ascii=True).encode("utf-8"), 9
        )
    return "media://" + hashlib.sha256(blob).hexdigest()[:16]


def ocr_of(dec) -> str:
    if dec[0] == "img":
        return dec[3]
    return " ".join(str(c) for row in dec[1] for c in row
                    if c is not None and str(c) != "")


def extract_doc(row: dict, span_range: tuple | None = None,
                ocr_pipeline: str = "hybrid") -> dict:
    """row: {doc_id, spans, payloads} → {doc_id, spans, metrics} per SPEC.
    ``span_range``: optional inclusive (first, last) input-offset bounds
    (SPEC §6c) applied before anything else; None bounds are open.
    ``ocr_pipeline``: SPEC §6a — "hybrid" (cascade), "fast" (never insert OCR
    spans), "full" (always insert)."""
    spans_in = sorted(row.get("spans") or [], key=lambda s: s["offset"])
    if span_range is not None:
        fs, ls = span_range
        spans_in = [s for s in spans_in
                    if (fs is None or s["offset"] >= fs)
                    and (ls is None or s["offset"] <= ls)]
    payloads = {p["media_ref"]: p["data"] for p in (row.get("payloads") or [])}
    doc_class = classify(spans_in)
    if doc_class == "empty":
        return _out(row["doc_id"], [], "empty", "none", 0, 0, "empty_document")
    is_html = doc_class == "html"
    n_err = 0

    # one pass computing everything needed for both cascade arms
    prepared = []  # (kind, text_out, media_ref_out, ocr_clean_or_None, is_text_kind)
    for s in spans_in:
        kind, raw = s["kind"], s["text"]
        if kind in MEDIA_KINDS:
            cap = clean(visible(raw)) if is_html else clean(raw)
            ref_out, ocr_clean = "", None
            if s["media_ref"]:
                data = payloads.get(s["media_ref"])
                dec = decode(data) if data is not None else None
                if dec is None:
                    n_err += 1
                else:
                    ref_out = canonical_ref(dec)
                    oc = clean(ocr_of(dec))
                    ocr_clean = oc if oc else None
            prepared.append((kind, cap, ref_out, ocr_clean, False))
            continue
        if kind == "boilerplate":
            continue
        if is_html:
            t = nwords(visible(raw))
            na = nwords(visible(ANCHOR.sub(" ", raw)))
            if t == 0 or 2 * (t - na) >= t:
                continue
            # text-density rule: tag-heavy tiny-text blocks (SPEC §4)
            if t <= 2 and 5 * len(clean(visible(raw))) < len(raw):
                continue
        txt = clean(visible(raw)) if is_html else clean(raw)
        if txt == "":
            continue
        prepared.append((kind, txt, "", None, True))

    has_text = any(p[4] for p in prepared)
    if ocr_pipeline == "fast":
        ocr_path, insert_ocr = "fast", False
    elif ocr_pipeline == "full":
        ocr_path, insert_ocr = "full", True
    else:
        ocr_path = "fast" if has_text else "full"
        insert_ocr = not has_text
    out = []
    for kind, txt, ref, ocr_clean, is_text in prepared:
        out.append({"kind": kind, "text": txt, "media_ref": ref, "offset": len(out)})
        if insert_ocr and ocr_clean is not None:
            out.append({"kind": "text", "text": ocr_clean, "media_ref": "",
                        "offset": len(out)})
    return _out(row["doc_id"], out, doc_class, ocr_path, len(spans_in), n_err, "")


def _out(doc_id, spans, doc_class, ocr_path, n_in, n_err, error):
    return {
        "doc_id": doc_id,
        "spans": spans,
        "metrics": {
            "doc_class": doc_class,
            "ocr_path": ocr_path,
            "n_spans_in": n_in,
            "n_spans_out": len(spans),
            "n_errors": n_err,
            "error": error,
        },
    }


def extract_corpus(rows: list[dict]) -> dict[str, dict]:
    return {r["doc_id"]: extract_doc(r) for r in rows}


# --- SPEC §6b: layout geometry + hierarchy over the OUTPUT span sequence ----

_MEDIA_HEIGHT = {"picture": 240, "table": 160, "code": 120, "formula": 80}


def layout_of(out_spans: list[dict]) -> list[dict]:
    """Pure function of the final output spans → one meta dict per span, each
    carrying a LIST of positions (one per page fragment for page-wrapping text
    spans; SPEC §6b)."""
    metas = []
    page, y = 1, 72
    title = None     # (ref, level)
    section = None
    for s in out_spans:
        kind = s["kind"]
        if kind in MEDIA_KINDS:
            h = _MEDIA_HEIGHT[kind]
        else:
            nlines = (len(s["text"]) + 79) // 80
            h = 14 * max(1, nlines)
        if y + h > 720 and y > 72:
            page, y = page + 1, 72
        positions = []
        if y + h <= 720:
            positions.append({"page_no": page, "l": 72.0, "t": round(float(y), 2),
                              "r": 540.0, "b": round(float(y + h), 2),
                              "coord_origin": "TOPLEFT"})
            y += h
        else:
            # taller than a fresh page (y == 72): one position per 46-line
            # page fragment, remainder on the last page
            rem = h
            while rem > 46 * 14:
                positions.append({"page_no": page, "l": 72.0, "t": 72.0,
                                  "r": 540.0, "b": round(72.0 + 46 * 14, 2),
                                  "coord_origin": "TOPLEFT"})
                page, rem = page + 1, rem - 46 * 14
            positions.append({"page_no": page, "l": 72.0, "t": 72.0,
                              "r": 540.0, "b": round(72.0 + rem, 2),
                              "coord_origin": "TOPLEFT"})
            y = 72 + rem
        ref = "#/spans/%d" % s["offset"]
        if kind == "title":
            parent, level = "#/", 1
            title, section = (ref, 1), None
        elif kind == "section_header":
            p = title if title else ("#/", 0)
            parent, level = p[0], p[1] + 1
            section = (ref, level)
        else:
            p = section if section else (title if title else ("#/", 0))
            parent, level = p[0], p[1] + 1
        metas.append({"ref": ref, "parent_ref": parent, "level": level,
                      # SPEC §6b caption fidelity: media-span text IS the
                      # cleaned caption; null for other kinds
                      "caption": s["text"] if kind in MEDIA_KINDS else None,
                      "positions": positions})
    return metas


# --- SPEC §6d: page-range selection over the laid-out output spans ----------


def page_range_filter(out_spans: list[dict], first_page: int | None = None,
                      last_page: int | None = None) -> list[dict]:
    """Keep output spans with >= 1 layout position on a page in the inclusive
    [first_page, last_page] range (None bounds open); SPEC §6d. Returns the
    kept spans in order (positions/refs unchanged — they refer to the full
    document's layout)."""
    lo = 1 if first_page is None else first_page
    hi = float("inf") if last_page is None else last_page
    metas = layout_of(out_spans)
    return [s for s, m in zip(out_spans, metas)
            if any(lo <= p["page_no"] <= hi for p in m["positions"])]
