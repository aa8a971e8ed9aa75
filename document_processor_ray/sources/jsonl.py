"""JSONL source/sink for the interleaved corpus and the extraction output.

Two jobs (both vectorized map_batches; JSON work is per-row by nature — it IS
the codec — but bounded to the batch and runs distributed):

- **Source (S2 analog)**: ``read_corpus_jsonl`` ingests an interleaved corpus
  from JSON Lines — one document object per line, media payload bytes base64
  (JSON has no binary type) — and reconstructs the exact ``INPUT_SCHEMA``
  Arrow shape the parquet path produces, including the ``n_spans`` /
  ``payload_bytes`` planning metadata columns, so every downstream stage is
  format-agnostic.
- **Sink (I4 analog)**: the reference's HTTP response returns media as base64
  JSON (``app/models.py:55-57``); ``write_docs_jsonl`` / ``write_media_jsonl``
  export the extraction output the same way — docs as one JSON object per
  line, the content-addressed media table with ``data_b64`` — closing the I4
  surface as an EXPORT format while the pipeline-internal layout stays
  columnar parquet (a blob-per-JSON-inline layout would re-ship shared blobs;
  the content-addressed table ships each blob once).

Files are written per-block (``part-{task}-{block}.jsonl``), so the sink
parallelizes and never funnels through the driver.
"""

from __future__ import annotations

import base64
import glob
import json
import os

import pyarrow as pa

import ray.data as rd

from ..core.schema import INPUT_SCHEMA, PAYLOAD_TYPE, SPAN_TYPE


def corpus_rows_to_json(batch: pa.Table) -> list[str]:
    """Interleaved INPUT rows → JSONL strings (payload data → base64)."""
    out = []
    for row in batch.select(["doc_id", "spans", "payloads"]).to_pylist():
        row["payloads"] = [
            {"media_ref": p["media_ref"],
             "data_b64": base64.b64encode(p["data"]).decode("ascii")}
            for p in (row["payloads"] or [])]
        out.append(json.dumps(row, separators=(",", ":"), ensure_ascii=True))
    return out


def json_to_corpus_rows(lines: list[str]) -> pa.Table:
    """JSONL strings → exact INPUT_SCHEMA Arrow batch (metadata columns
    recomputed, base64 decoded)."""
    doc_ids, spans, payloads, n_spans, pbytes = [], [], [], [], []
    for ln in lines:
        row = json.loads(ln)
        doc_ids.append(row["doc_id"])
        sp = [{"kind": s["kind"], "text": s["text"],
               "media_ref": s.get("media_ref", ""),
               "offset": int(s["offset"])} for s in row.get("spans", [])]
        pl = [{"media_ref": p["media_ref"],
               "data": base64.b64decode(p["data_b64"])}
              for p in row.get("payloads", [])]
        spans.append(sp)
        payloads.append(pl)
        n_spans.append(len(sp))
        pbytes.append(sum(len(p["data"]) for p in pl))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "spans": pa.array(spans, pa.list_(SPAN_TYPE)),
        "payloads": pa.array(payloads, pa.list_(PAYLOAD_TYPE)),
        "n_spans": pa.array(n_spans, pa.int32()),
        "payload_bytes": pa.array(pbytes, pa.int64()),
    }, schema=INPUT_SCHEMA)


def write_corpus_jsonl(source, out_dir: str) -> str:
    """Interleaved corpus (Dataset / pa.Table / parquet path) → JSONL dir."""
    ds = _as_dataset(source)
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table, ctx=None) -> pa.Table:
        lines = corpus_rows_to_json(batch)
        # content-addressed name: two tasks can never collide, reruns overwrite
        import hashlib

        tag = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{tag}.jsonl")
        with open(path + ".tmp", "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(path + ".tmp", path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    ds.map_batches(write_block, batch_format="pyarrow").count()
    return out_dir


def read_corpus_jsonl(path: str) -> rd.Dataset:
    """JSONL corpus dir/file → Dataset with the exact parquet INPUT_SCHEMA.

    ``read_text`` streams lines block by block; the base64/JSON decode runs
    distributed inside ``map_batches``. (pyarrow's native JSON reader cannot
    reconstruct binary-from-base64 or the metadata columns, so the adapter is
    explicit.)"""
    paths = (sorted(glob.glob(os.path.join(path, "*.jsonl")))
             if os.path.isdir(path) else [path])

    def decode(batch: pa.Table) -> pa.Table:
        return json_to_corpus_rows(batch["text"].to_pylist())

    return rd.read_text(paths).map_batches(decode, batch_format="pyarrow")


def write_docs_jsonl(extracted: rd.Dataset, out_dir: str) -> str:
    """Extraction output rows → JSONL (doc_id, spans, metrics; spans_meta when
    present). Pure JSON-able columns, one object per line, written per block."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import hashlib

        cols = [c for c in ("doc_id", "spans", "spans_meta", "metrics")
                if c in batch.column_names]
        lines = [json.dumps(r, separators=(",", ":"), ensure_ascii=True)
                 for r in batch.select(cols).to_pylist()]
        tag = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"docs-{tag}.jsonl")
        with open(path + ".tmp", "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(path + ".tmp", path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    extracted.map_batches(write_block, batch_format="pyarrow").count()
    return out_dir


def write_media_jsonl(media: rd.Dataset, out_dir: str) -> str:
    """Media table → JSONL with base64 blob payloads (the reference's response
    encoding, ``app/models.py:55-57``): one content-addressed object per line
    — each shared blob ships exactly once, unlike inline-per-span base64."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import hashlib

        lines = []
        for r in batch.to_pylist():
            data = r.pop("data", b"") or b""
            r["data_b64"] = base64.b64encode(data).decode("ascii")
            lines.append(json.dumps(r, separators=(",", ":"),
                                    ensure_ascii=True))
        tag = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"media-{tag}.jsonl")
        with open(path + ".tmp", "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(path + ".tmp", path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    media.map_batches(write_block, batch_format="pyarrow").count()
    return out_dir


def _as_dataset(source) -> rd.Dataset:
    if isinstance(source, rd.Dataset):
        return source
    if isinstance(source, pa.Table):
        return rd.from_arrow(source)
    if os.path.isdir(source):
        return rd.read_parquet(sorted(glob.glob(os.path.join(source, "*.parquet"))))
    return rd.read_parquet(source)
