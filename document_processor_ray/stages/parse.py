"""Parse/extract stage (SPEC.md §4-§7) — the stateful actor-pool heart of the engine.

Ray-Data analog of the reference's warm Docling converter cascade
(``app/services/dl_converter.py:26-95`` — engines built once per process behind an
``lru_cache``; ``content_extractor.py:85-108`` — the HYBRID fast→full-OCR fallback;
``slice_extractor.py`` — span/text/table/position extraction; ``image_extractor.py`` —
deterministic media re-encode). Here the engine state (compiled RE2/`re` patterns, the
media codec, the media-store handle) is built once per **actor** in ``__init__`` and
reused across batches: ``ds.map_batches(ParseStage, concurrency=N, batch_size=B)``.

Two modes:

- ``whole``  — one row = one full document → emits final output rows.
- ``chunks`` — one row = a contiguous span-slice of a giant document (cost-based
  split, SURVEY §4.3) → emits intermediate chunk rows; ``finalize_group`` reassembles
  per doc_id after the (only) shuffle. Chunk results are mode-independent per span, so
  reassembly is exact under any parallel schedule: the fast/full cascade decision is
  resolved doc-level by OR-ing per-chunk ``chunk_has_text`` and dropping tagged
  ``ocr_inserted`` spans when the fast path wins.

String work (glyph clean, tag strip, entity decode, anchor/word counts) is vectorized
with pyarrow.compute RE2 kernels over the flattened span-text child array; the Python
loop only assembles per-document span lists and decodes media payloads.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core import codec
from ..core.schema import MEDIA_KINDS, METRICS_TYPE, SPAN_TYPE
from ..functions import text_clean as tc
from .sniff import list_offsets

CHUNK_SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("ocr_inserted", pa.bool_()),
    ]
)

CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part_idx", pa.int32()),
        ("n_parts", pa.int32()),
        ("doc_class", pa.string()),
        ("chunk_has_text", pa.bool_()),
        ("n_in", pa.int32()),
        ("n_err", pa.int32()),
        ("spans", pa.list_(CHUNK_SPAN_TYPE)),
    ]
)

FINAL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("metrics", METRICS_TYPE),
    ]
)


class MediaStore:
    """Content-addressed media sink: ``<dir>/<h[:2]>/<hash16>.bin``, atomic
    tmp+rename writes, idempotent across retries/resume (I3/I4 analog — media by
    pointer, not inline base64)."""

    _SEEN_CAP = 262_144  # bound the per-actor dedupe cache: long-lived parse
    # actors would otherwise grow one entry per distinct ref forever; the cache
    # is a pure optimization (os.path.exists re-checks below), so clearing it
    # only costs a few repeated stat() calls

    def __init__(self, root: str | None):
        self.root = root
        self._seen: set[str] = set()
        if root:
            os.makedirs(root, exist_ok=True)

    def put(self, ref: str, data: bytes) -> None:
        if not self.root or ref in self._seen:
            return
        if len(self._seen) >= self._SEEN_CAP:
            self._seen.clear()
        self._seen.add(ref)
        h = ref.removeprefix("media://")
        d = os.path.join(self.root, h[:2])
        path = os.path.join(d, h + ".bin")
        if os.path.exists(path):
            return
        os.makedirs(d, exist_ok=True)
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)


class ParseStage:
    """Callable class for ``map_batches`` actor pools. Mode: 'whole' | 'chunks'."""

    def __init__(self, mode: str = "whole", media_dir: str | None = None,
                 engine_effort: int = 0, media_format: str = codec.DEFAULT_FORMAT,
                 media_quality: int = codec.DEFAULT_QUALITY,
                 media_scale: int = 1, ocr_pipeline: str = "hybrid"):
        assert mode in ("whole", "chunks")
        assert ocr_pipeline in ("fast", "full", "hybrid")  # SPEC §6a (M2 config)
        from ..core import limit_arrow_threads

        limit_arrow_threads(1)  # one actor = one CPU; see core.limit_arrow_threads
        self.mode = mode
        self.ocr_pipeline = ocr_pipeline
        self.store = MediaStore(media_dir)
        # I3 config surface: defaults = the SPEC §5 canonical encoding the
        # equality invariant assumes; non-default knobs change refs/bytes
        # deterministically (JPEG/PNG/quality analog)
        self.media_format, self.media_quality = media_format, media_quality
        self.media_scale = media_scale
        # Warm engine state (reference: lru_cache'd converters, dl_converter.py:29).
        self.clean = tc.clean_text
        # Calibrated per-span inference cost emulation. The real engines behind
        # this stage (Docling layout + EasyOCR/TableFormer) cost ~1s/page on CPU
        # (Docling tech report, arXiv 2408.09869; SURVEY §6) — the synthetic codec
        # is ~1000x lighter, which makes fixed pipeline overheads dominate any
        # scaling measurement. effort = number of 16 KiB hash rounds per span
        # (~6us each); the bench uses a value ~100x lighter than real OCR.
        # Output is unaffected.
        self.effort = engine_effort
        self._scratch = b"\x5a" * 16384

    # ------------------------------------------------------------------
    def _precompute(self, batch: pa.Table):
        """Vectorized per-span string precompute; returns python lists aligned with
        the flattened span child array."""
        spans_col = batch["spans"]
        values, offs = list_offsets(spans_col)
        texts = values.field("text")
        n_child = len(values)

        doc_class = batch["doc_class"].to_pylist()
        n_per_doc = offs[1:] - offs[:-1]
        is_html_doc = np.array([c == "html" for c in doc_class], dtype=bool)
        # per-span html mask over the full child array (offs index into it)
        span_html = np.zeros(n_child, dtype=bool)
        for i in range(len(n_per_doc)):
            if is_html_doc[i]:
                span_html[offs[i] : offs[i + 1]] = True

        cleaned = [None] * n_child
        t_words = np.zeros(n_child, dtype=np.int64)
        na_words = np.zeros(n_child, dtype=np.int64)

        html_idx = np.flatnonzero(span_html)
        if len(html_idx):
            idx = pa.array(html_idx)
            sub = texts.take(idx)
            vis = tc.visible_text_arr(sub)
            for j, v in zip(html_idx, tc.clean_text_arr(vis).to_pylist()):
                cleaned[j] = v
            t_words[html_idx] = tc.word_count_arr(vis).to_numpy(zero_copy_only=False)
            na = tc.word_count_arr(tc.visible_text_arr(tc.strip_anchors_arr(sub)))
            na_words[html_idx] = na.to_numpy(zero_copy_only=False)

        raw_idx = np.flatnonzero(~span_html)
        if len(raw_idx):
            # restrict to the rows this batch actually references to avoid cleaning
            # unrelated slices of a shared child array
            lo, hi = int(offs[0]), int(offs[-1])
            use = raw_idx[(raw_idx >= lo) & (raw_idx < hi)]
            if len(use):
                sub = texts.take(pa.array(use))
                for j, v in zip(use, tc.clean_text_arr(sub).to_pylist()):
                    cleaned[j] = v

        kinds = values.field("kind").to_pylist()
        media_refs = values.field("media_ref").to_pylist()
        in_offsets = values.field("offset").to_pylist()
        raw_lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        return (offs, kinds, cleaned, media_refs, in_offsets,
                t_words, na_words, raw_lens, doc_class)

    # ------------------------------------------------------------------
    def _payload_map(self, batch: pa.Table, row: int) -> dict[str, bytes]:
        pl = batch["payloads"][row].as_py()
        return {p["media_ref"]: p["data"] for p in (pl or [])}

    def _extract_doc_spans(
        self,
        doc_class: str,
        order: list[int],
        kinds,
        cleaned,
        media_refs,
        t_words,
        na_words,
        raw_lens,
        payloads: dict[str, bytes],
        do_ocr_spans: bool,
    ):
        """Per-doc assembly over precomputed child indices ``order`` (input-offset
        order). Returns (tagged_spans, has_text, n_err); tagged span =
        (kind, text, media_ref, ocr_inserted)."""
        is_html = doc_class == "html"
        out: list[tuple[str, str, str, bool]] = []
        has_text = False
        n_err = 0
        effort = self.effort
        for j in order:
            kind = kinds[j]
            if effort:
                import hashlib as _hl

                h = _hl.sha256()
                for _ in range(effort):
                    h.update(self._scratch)
            if kind in MEDIA_KINDS:
                text_out = cleaned[j] or ""
                ref_in = media_refs[j]
                ref_out = ""
                ocr = None
                if ref_in:
                    data = payloads.get(ref_in)
                    if data is None:
                        n_err += 1
                    else:
                        try:
                            dec = codec.decode_payload(data)
                            canonical = codec.reencode(dec, self.clean,
                                                       self.media_format,
                                                       self.media_quality,
                                                       self.media_scale)
                            ref_out = codec.media_ref_of(canonical)
                            self.store.put(ref_out, canonical)
                            ocr = codec.ocr_text(dec)
                        except codec.CodecError:
                            n_err += 1
                out.append((kind, text_out, ref_out, False))
                if do_ocr_spans and ocr is not None:
                    ocr_clean = self.clean(ocr)
                    if ocr_clean:
                        out.append(("text", ocr_clean, "", True))
                continue
            # text-like kinds (incl. unknown) + boilerplate
            if kind == "boilerplate":
                continue
            if is_html:
                t = t_words[j]
                if t == 0 or 2 * (t - na_words[j]) >= t:
                    continue
                # text-density rule: tag-heavy tiny-text blocks (SPEC §4)
                if t <= 2 and 5 * len(cleaned[j] or "") < raw_lens[j]:
                    continue
            text_out = cleaned[j] or ""
            if text_out == "":
                continue
            out.append((kind, text_out, "", False))
            has_text = True
        return out, has_text, n_err

    # ------------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pylist([], schema=(
                CHUNK_SCHEMA if self.mode == "chunks" else FINAL_SCHEMA))
        (offs, kinds, cleaned, media_refs, in_offsets,
         t_words, na_words, raw_lens, doc_class) = self._precompute(batch)
        doc_ids = batch["doc_id"].to_pylist()
        rows = []
        # whole-mode accumulators: build Arrow arrays directly instead of
        # rows-of-dicts + from_pylist (≈20% of effort-0 parse cost)
        acc_ids: list[str] = []
        acc_counts: list[int] = []
        fk: list[str] = []; ft: list[str] = []; fm: list[str] = []
        mc: list[str] = []; mo: list[str] = []
        mi: list[int] = []; mn: list[int] = []; me: list[int] = []
        ms: list[str] = []

        def push_final(did_, spans_, cls_, ocr_, n_in_, n_err_, error_):
            acc_ids.append(did_)
            acc_counts.append(len(spans_))
            for k_, t_, m_ in spans_:
                fk.append(k_); ft.append(t_); fm.append(m_)
            mc.append(cls_); mo.append(ocr_); mi.append(n_in_)
            mn.append(len(spans_)); me.append(n_err_); ms.append(error_)

        for i, did in enumerate(doc_ids):
            lo, hi = int(offs[i]), int(offs[i + 1])
            order = sorted(range(lo, hi), key=lambda j: (in_offsets[j], j))
            cls = doc_class[i]
            try:
                payloads = (
                    self._payload_map(batch, i)
                    if any(kinds[j] in MEDIA_KINDS and media_refs[j] for j in order)
                    else {}
                )
                if self.mode == "chunks":
                    tagged, has_text, n_err = self._extract_doc_spans(
                        cls, order, kinds, cleaned, media_refs, t_words, na_words, raw_lens,
                        payloads, do_ocr_spans=True)
                    rows.append({
                        "doc_id": did,
                        "part_idx": batch["part_idx"][i].as_py(),
                        "n_parts": batch["n_parts"][i].as_py(),
                        "doc_class": cls,
                        "chunk_has_text": has_text,
                        "n_in": hi - lo,
                        "n_err": n_err,
                        "spans": [
                            {"kind": k, "text": t, "media_ref": m, "ocr_inserted": o}
                            for k, t, m, o in tagged
                        ],
                    })
                    continue
                # whole-doc mode: resolve the cascade locally
                if hi == lo:
                    push_final(did, [], cls, "none", 0, 0, "empty_document")
                    continue
                # SPEC §6a: forced modes skip the cascade decision; hybrid runs
                # the fast pass first (reference content_extractor.py:85-108)
                if self.ocr_pipeline == "full":
                    tagged, _, n_err = self._extract_doc_spans(
                        cls, order, kinds, cleaned, media_refs, t_words, na_words,
                        raw_lens, payloads, do_ocr_spans=True)
                    ocr_path = "full"
                else:
                    tagged, has_text, n_err = self._extract_doc_spans(
                        cls, order, kinds, cleaned, media_refs, t_words, na_words,
                        raw_lens, payloads, do_ocr_spans=False)
                    if self.ocr_pipeline == "fast" or has_text:
                        ocr_path = "fast"
                    else:
                        tagged, _, n_err = self._extract_doc_spans(
                            cls, order, kinds, cleaned, media_refs, t_words, na_words,
                            raw_lens, payloads, do_ocr_spans=True)
                        ocr_path = "full"
                push_final(did, [(k, t, m) for k, t, m, _ in tagged],
                           cls, ocr_path, hi - lo, n_err, "")
            except Exception as exc:  # F5: never fail the job for one row
                if self.mode == "chunks":
                    rows.append({
                        "doc_id": did, "part_idx": batch["part_idx"][i].as_py(),
                        "n_parts": batch["n_parts"][i].as_py(), "doc_class": cls,
                        "chunk_has_text": False, "n_in": hi - lo, "n_err": 1,
                        "spans": []})
                else:
                    push_final(did, [], cls, "none", hi - lo, 1, repr(exc))
        if self.mode == "chunks":
            return pa.Table.from_pylist(rows, schema=CHUNK_SCHEMA)
        flat_off: list[int] = []
        for c in acc_counts:
            flat_off.extend(range(c))
        span_struct = pa.StructArray.from_arrays(
            [pa.array(fk, pa.string()), pa.array(ft, pa.string()),
             pa.array(fm, pa.string()), pa.array(flat_off, pa.int32())],
            fields=list(SPAN_TYPE))
        list_offs = pa.array(
            np.concatenate([[0], np.cumsum(acc_counts)]).astype(np.int32))
        spans_col = pa.ListArray.from_arrays(list_offs, span_struct)
        metrics_col = pa.StructArray.from_arrays(
            [pa.array(mc, pa.string()), pa.array(mo, pa.string()),
             pa.array(mi, pa.int32()), pa.array(mn, pa.int32()),
             pa.array(me, pa.int32()), pa.array(ms, pa.string())],
            fields=list(METRICS_TYPE))
        return pa.Table.from_arrays(
            [pa.array(acc_ids, pa.string()), spans_col, metrics_col],
            schema=FINAL_SCHEMA)


def _final_row(doc_id, spans, doc_class, ocr_path, n_in, n_err, error):
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


def finalize_group(group: pa.Table, ocr_pipeline: str = "hybrid") -> pa.Table:
    """Reassemble documents from parsed chunks (the shuffle's reducer; SURVEY §4.3
    'salted regroup'). The group key is a coarse hash partition of doc_id — one
    call reassembles MANY docs (per-doc Ray groups would pay per-group scheduling
    overhead; see core/groupops.py). Deterministic: sort by (doc_id, part_idx),
    OR the cascade verdicts per doc, drop ocr_inserted spans when fast wins,
    renumber offsets by prefix order. Chunks always carry tagged OCR spans, so
    the SPEC §6a forced modes resolve here: "fast" drops every tagged span,
    "full" keeps them all — schedule-independent either way."""
    group = group.sort_by([("doc_id", "ascending"), ("part_idx", "ascending")])
    doc_ids = group["doc_id"].to_pylist()
    classes = group["doc_class"].to_pylist()
    has_texts = group["chunk_has_text"].to_pylist()
    n_ins = group["n_in"].to_pylist()
    n_errs = group["n_err"].to_pylist()
    chunks = group["spans"].to_pylist()

    rows = []
    i, n = 0, len(doc_ids)
    while i < n:
        j = i
        while j < n and doc_ids[j] == doc_ids[i]:
            j += 1
        has_text = any(has_texts[i:j])
        n_in = sum(n_ins[i:j])
        n_err = sum(n_errs[i:j])
        if ocr_pipeline == "fast":
            drop_ocr, path = True, "fast"
        elif ocr_pipeline == "full":
            drop_ocr, path = False, "full"
        else:
            drop_ocr, path = has_text, "fast" if has_text else "full"
        spans = []
        for chunk in chunks[i:j]:
            for s in chunk:
                if drop_ocr and s["ocr_inserted"]:
                    continue
                spans.append({"kind": s["kind"], "text": s["text"],
                              "media_ref": s["media_ref"], "offset": len(spans)})
        if n_in == 0:
            rows.append(_final_row(doc_ids[i], [], "empty", "none", 0, n_err,
                                   "empty_document"))
        else:
            rows.append(_final_row(doc_ids[i], spans, classes[i],
                                   path, n_in, n_err, ""))
        i = j
    return pa.Table.from_pylist(rows, schema=FINAL_SCHEMA)
