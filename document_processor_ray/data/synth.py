"""Deterministic synthetic interleaved-document corpus generator (FIXTURES.md §1).

Seeded, pure-Python, no external data. Produces the authoritative input shape
``(doc_id, spans, payloads, n_spans, payload_bytes)`` (SPEC.md §1) with:

- doc classes html / pdf_text / pdf_scanned / mixed,
- glyph artifacts exercising the reference cleaner
  (``app/services/content_extractor/slice_extractor.py:62``),
- boilerplate/nav/link-farm spans for the HTML-strip stage,
- all-empty-text docs forcing the HYBRID fast→full OCR fallback
  (``app/services/content_extractor/content_extractor.py:85-108``),
- a Zipf-ish tail of giant documents (up to ~100× mean spans) to exercise the
  cost-based splitter, and
- a small rate of corrupt / missing media payloads (page-skip analog).

``corpus_from_flat`` derives the same shapes deterministically from the driver's flat
``documents`` parquet table (doc_id,text,lang,source,n_chars) so benches run over
driver-provided data.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..core import codec
from ..core.schema import INPUT_SCHEMA

_VOCAB = (
    "the quick brown fox jumps over lazy dog data pipeline stream block arrow ray "
    "actor shuffle partition schema span document media table picture formula code "
    "index vector token cluster worker node batch extract parse clean render layout "
    "page line word glyph scan image caption header footer title section paragraph "
    "quality language hash near duplicate sample window event metric lineage resume "
    "montagne rivière forêt straße größe año señor être déjà vu naïve café"
).split()

_TEXT_KINDS_W = [
    ("paragraph", 10),
    ("text", 6),
    ("section_header", 2),
    ("list_item", 3),
    ("title", 1),
    ("caption", 1),
    ("footnote", 1),
    ("page_header", 1),
    ("page_footer", 1),
]
_KINDS = [k for k, w in _TEXT_KINDS_W for _ in range(w)]

_FONTS = ["AAAAAA+Arial", "BBBBBB+Times-Roman", "CCCCCC+Courier", "DDDDDD+Helvetica-Bold"]
_NAV_WORDS = ["Home", "About", "Contact", "Login", "Products", "Blog", "Careers", "Terms",
              "Privacy", "Sitemap", "Next", "Prev", "Archive", "Tags"]


def _words(rng: random.Random, lo: int, hi: int, vocab=None) -> list[str]:
    vocab = vocab or _VOCAB
    return [vocab[rng.randrange(len(vocab))] for _ in range(rng.randint(lo, hi))]


def _glyph(rng: random.Random) -> str:
    if rng.random() < 0.5:
        return f"glyph<c={rng.randint(1, 999)},font=/{rng.choice(_FONTS)}>"
    return f"glyph<{rng.randint(1, 99999)}>"


def _sentence(rng: random.Random, glyph_rate: float, vocab=None) -> str:
    ws = _words(rng, 4, 18, vocab)
    if rng.random() < glyph_rate:
        ws.insert(rng.randrange(len(ws) + 1), _glyph(rng))
    if rng.random() < 0.15:  # tab/space runs the cleaner must collapse
        ws.insert(rng.randrange(len(ws) + 1), " \t ")
    return " ".join(ws)


def _html_content(rng: random.Random, glyph_rate: float, vocab=None) -> str:
    inner = _sentence(rng, glyph_rate, vocab)
    r = rng.random()
    if r < 0.3:
        inner = inner.replace(" ", " <b>bold</b> ", 1)
    elif r < 0.45:
        inner += " &amp; more &lt;stuff&gt;"
    elif r < 0.55:
        # a light anchor: below the 50% anchor-word threshold
        inner += f' see <a href="/ref{rng.randint(0, 99)}">here</a>'
    tag = rng.choice(["p", "div", "span", "li"])
    return f"<{tag}>{inner}</{tag}>"


def _boilerplate(rng: random.Random) -> str:
    links = [
        f'<a href="/{w.lower()}{rng.randint(0, 9)}">{w}</a>'
        for w in rng.sample(_NAV_WORDS, rng.randint(3, 8))
    ]
    sep = rng.choice([" | ", " · ", " "])
    return "<nav>" + sep.join(links) + "</nav>"


def _mk_payload(rng: random.Random, kind: str, glyph_rate: float, vocab=None,
                corrupt_rate: float = 0.0):
    """Returns (payload_bytes_or_None, input_media_ref)."""
    if kind == "table":
        ncol = rng.randint(2, 4)
        headers = [" ".join(_words(rng, 1, 2, vocab)) for _ in range(ncol)]
        rows = [headers]
        for _ in range(rng.randint(1, 5)):
            row = []
            for _ in range(ncol):
                r = rng.random()
                if r < 0.15:
                    row.append(None)
                elif r < 0.4:
                    row.append(rng.randint(0, 9999))
                else:
                    cell = " ".join(_words(rng, 1, 3, vocab))
                    if rng.random() < glyph_rate:
                        cell += " " + _glyph(rng)
                    row.append(cell)
            rows.append(row)
        data = codec.encode_table(rows)
    else:
        text = _sentence(rng, glyph_rate, vocab) if rng.random() < 0.8 else ""
        data = codec.encode_image(rng.randint(16, 2048), rng.randint(16, 2048), text)
    if rng.random() < corrupt_rate:
        data = b"JUNK" + data[: rng.randint(0, 10)]
    ref = f"media://in-{rng.getrandbits(64):016x}"
    return data, ref


def gen_doc(
    doc_id: str,
    rng: random.Random,
    *,
    mean_spans: int = 12,
    glyph_rate: float = 0.2,
    boilerplate_rate: float = 0.25,
    empty_text_rate: float = 0.15,
    media_rate: float = 0.15,
    corrupt_rate: float = 0.02,
    missing_payload_rate: float = 0.02,
    giant_rate: float = 0.01,
    giant_mult_max: int = 100,
    vocab: list[str] | None = None,
) -> dict:
    doc_class = rng.choices(
        ["html", "pdf_text", "pdf_scanned", "mixed"], weights=[35, 35, 15, 15]
    )[0]
    n = max(1, int(rng.expovariate(1.0 / mean_spans)) + 1)
    if rng.random() < giant_rate:
        n *= rng.randint(10, giant_mult_max)
    scanned = doc_class == "pdf_scanned" or (
        doc_class != "html" and rng.random() < empty_text_rate
    )

    spans, payloads = [], []
    for i in range(n):
        is_media = rng.random() < (media_rate * 2 if scanned else media_rate)
        if is_media or (scanned and i == n - 1 and not any(
            s["kind"] in ("picture", "table", "formula", "code") for s in spans
        )):
            kind = rng.choices(["picture", "table", "formula", "code"],
                               weights=[6, 3, 1, 1])[0]
            caption = "" if rng.random() < 0.3 else _sentence(rng, glyph_rate, vocab)
            if doc_class in ("html", "mixed") and rng.random() < 0.3 and caption:
                caption = f"<span>{caption}</span>"
            if rng.random() < 0.05:
                ref = ""  # media span with no payload attached
            else:
                data, ref = _mk_payload(rng, kind, glyph_rate, vocab, corrupt_rate)
                if rng.random() >= missing_payload_rate:
                    payloads.append({"media_ref": ref, "data": data})
            spans.append({"kind": kind, "text": caption, "media_ref": ref,
                          "offset": len(spans)})
        else:
            if scanned:
                spans.append({"kind": rng.choice(_KINDS), "text": "",
                              "media_ref": "", "offset": len(spans)})
            elif doc_class == "html" or (doc_class == "mixed" and rng.random() < 0.5):
                if rng.random() < boilerplate_rate:
                    r = rng.random()
                    if r < 0.6:
                        spans.append({"kind": "boilerplate", "text": _boilerplate(rng),
                                      "media_ref": "", "offset": len(spans)})
                    elif r < 0.85:
                        # link-farm mislabeled as a text kind: detection must catch it
                        spans.append({"kind": "paragraph", "text": _boilerplate(rng),
                                      "media_ref": "", "offset": len(spans)})
                    else:
                        # markup-junk separator block: only the text-density rule
                        # catches it (low visible text, heavy tags, no anchors)
                        junk = (f'<div class="sep{rng.randint(0, 99)}" '
                                f'style="margin:{rng.randint(0, 40)}px">'
                                "<span></span><hr/>" + rng.choice(["•", "›", "|", "·"])
                                + "</div>")
                        spans.append({"kind": "text", "text": junk,
                                      "media_ref": "", "offset": len(spans)})
                else:
                    spans.append({"kind": rng.choice(_KINDS),
                                  "text": _html_content(rng, glyph_rate, vocab),
                                  "media_ref": "", "offset": len(spans)})
            else:
                txt = _sentence(rng, glyph_rate, vocab)
                if rng.random() < 0.05:
                    txt = _glyph(rng)  # cleans to empty → dropped span
                spans.append({"kind": rng.choice(_KINDS), "text": txt,
                              "media_ref": "", "offset": len(spans)})
    if doc_class == "html" and not any("<" in s["text"] for s in spans):
        # guarantee the sniffer sees markup on html docs
        s0 = spans[0]
        s0["text"] = f"<div>{s0['text']}</div>" if s0["media_ref"] == "" else s0["text"]
        if "<" not in s0["text"]:
            spans.insert(0, {"kind": "paragraph", "text": "<p>intro</p>",
                             "media_ref": "", "offset": 0})
            for j, s in enumerate(spans):
                s["offset"] = j
    if rng.random() < 0.002:
        spans, payloads = [], []  # empty document → error row
    return {
        "doc_id": doc_id,
        "spans": spans,
        "payloads": payloads,
        "n_spans": len(spans),
        "payload_bytes": sum(len(p["data"]) for p in payloads),
    }


def gen_corpus(n_docs: int, seed: int = 42, **knobs) -> pa.Table:
    rows = [
        gen_doc(f"doc-{i:08d}", random.Random(f"{seed}|{i}"), **knobs)
        for i in range(n_docs)
    ]
    return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)


def write_corpus(out_dir: str, n_docs: int, seed: int = 42, n_files: int = 8,
                 **knobs) -> list[str]:
    """Write the corpus as parquet fragments (the Lance-table stand-in)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n_docs + n_files - 1) // n_files
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n_docs)
        if lo >= hi:
            break
        rows = [
            gen_doc(f"doc-{i:08d}", random.Random(f"{seed}|{i}"), **knobs)
            for i in range(lo, hi)
        ]
        tbl = pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)
        path = os.path.join(out_dir, f"part-{f:05d}.parquet")
        # small row groups → row-group statistics pruning on the n_spans metadata
        # column actually works for the giant-doc branch read
        pq.write_table(tbl, path, row_group_size=512)
        paths.append(path)
    return paths


def corpus_from_flat(flat_docs: pa.Table, seed: int = 42, repeat: int = 1,
                     **knobs) -> pa.Table:
    """Derive an interleaved corpus deterministically from the driver's flat
    ``documents`` table (doc_id:int64, text, lang, source, n_chars): each flat row's
    words become the generator vocabulary for ``repeat`` interleaved docs."""
    rows = []
    ids = flat_docs["doc_id"].to_pylist()
    texts = flat_docs["text"].to_pylist()
    for did, text in zip(ids, texts):
        vocab = (text or "").split() or ["empty"]
        for rep in range(repeat):
            rng = random.Random(f"{seed}|flat|{did}|{rep}" if rep else f"{seed}|flat|{did}")
            suffix = f"-{rep}" if rep else ""
            rows.append(gen_doc(f"doc-{did:08d}{suffix}", rng, vocab=vocab, **knobs))
    return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)


def write_corpus_from_flat(flat_docs: pa.Table, out_dir: str, seed: int = 42,
                           repeat: int = 1, n_files: int = 16, **knobs) -> list[str]:
    """Fragment-wise variant of ``corpus_from_flat`` for bench-scale corpora."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ids = flat_docs["doc_id"].to_pylist()
    texts = flat_docs["text"].to_pylist()
    work = [(d, t, r) for d, t in zip(ids, texts) for r in range(repeat)]
    per = (len(work) + n_files - 1) // n_files
    paths = []
    for f in range(n_files):
        chunk = work[f * per : (f + 1) * per]
        if not chunk:
            break
        rows = []
        for did, text, rep in chunk:
            vocab = (text or "").split() or ["empty"]
            rng = random.Random(f"{seed}|flat|{did}|{rep}" if rep else f"{seed}|flat|{did}")
            suffix = f"-{rep}" if rep else ""
            rows.append(gen_doc(f"doc-{did:08d}{suffix}", rng, vocab=vocab, **knobs))
        tbl = pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)
        path = os.path.join(out_dir, f"part-{f:05d}.parquet")
        pq.write_table(tbl, path, row_group_size=512)
        paths.append(path)
    return paths
