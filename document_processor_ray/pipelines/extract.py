"""The flagship extraction pipeline (SURVEY §3.4 restatement).

::

    read (parquet fragments; Lance seam)            # column-pruned, filter-pushed
     ├─ small docs (n_spans ≤ T)  ───────────────┐  # pushdown on metadata column
     │    sniff → ParseStage('whole')            │  # actor pool, no shuffle
     └─ giant docs (n_spans > T)                 │
          sniff → split → ParseStage('chunks')   │
          → groupby(doc_id).map_groups(finalize) │  # the only shuffle, key=doc_id,
     union ──────────────────────────────────────┘  #   giant-doc tail only
     → write_parquet + manifest (state/manifest.py)

The two read branches carry *disjoint* row sets selected by a parquet predicate on
the ``n_spans`` metadata column (row-group pruning at the scan), so nothing is read
or parsed twice and the all-to-all regroup shuffles only the giant-document tail —
extracted text only, media payloads already dropped/offloaded by the parse stage.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..stages.parse import ParseStage, finalize_group
from ..stages.sniff import sniff_batch
from ..stages.split import make_split_batch


@dataclass
class ExtractConfig:
    split_threshold: int = 2000      # docs with more spans than this get chunked
    chunk_size: int = 500            # spans per chunk for split docs
    media_dir: str | None = None     # content-addressed media sink (None = hash only)
    batch_size: int = 32             # docs per parse actor call (media-heavy → small)
    parse_concurrency: tuple[int, int] | int | None = None  # actor pool size
    regroup_partitions: int = 64     # coarse hash partitions for the giant-doc regroup
    engine_effort: int = 0           # emulated per-span inference cost (see ParseStage)
    override_num_blocks: int | None = None
    emit_layout: bool = True         # §6b spans_meta (positions + hierarchy) column
    # F3 analog (reference first_page/last_page): inclusive input-offset range;
    # spans outside it are dropped before classification (SPEC §6c)
    first_span: int | None = None
    last_span: int | None = None
    # I3 analog (reference image format/quality knobs): defaults = SPEC §5
    # canonical encoding; non-defaults change media bytes/refs deterministically
    media_format: str = "synth-z"
    media_quality: int = 9
    media_scale: int = 1             # reference image_scale render multiplier
    # I1 analog: per-page synthetic screenshot records (SPEC §7; off by default)
    page_screenshots: bool = False
    # M2 config (SPEC §6a; reference OcrPipeline FAST|FULL|HYBRID,
    # models.py:14-17, api.py:69): force the fast-only / full-only engine or
    # run the hybrid cascade (default)
    ocr_pipeline: str = "hybrid"
    # F3 page-granularity analog (SPEC §6d; reference first_page/last_page,
    # content_extractor.py:64-72): inclusive OUTPUT-page range applied after
    # layout; requires emit_layout. None bounds are open.
    first_page: int | None = None
    last_page: int | None = None
    # Documented no-ops (reference engine-tuning knobs threaded through the
    # converter cache key, dl_converter.py:58-93 — the synthetic engine has no
    # OCR confidence or bitmap-area concept, so these are accepted for config
    # parity and validated, but change nothing)
    ocr_confidence_threshold: float = 0.01
    ocr_bitmap_area_threshold: float = 0.1


def _parquet_paths(path: str | list[str]) -> list[str]:
    if isinstance(path, list):
        return path
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


def _max_n_spans(paths: list[str]) -> int:
    """Cheap planning probe: max(n_spans) from parquet row-group statistics only."""
    best = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}.get("n_spans")
        if idx is None:
            return 1 << 30
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.max is None:
                return 1 << 30
            best = max(best, st.max)
    return best


def _pool(cfg: ExtractConfig):
    """Main parse pool: fixed size ≈ 3/4 of the CPUs (instant ramp, headroom left
    for read/write/shuffle tasks). A fixed pool on BOTH branches would overcommit
    and deadlock the streaming executor — the giant-doc branch gets a small
    autoscaling pool instead (see build_extraction)."""
    if cfg.parse_concurrency is not None:
        return cfg.parse_concurrency
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        n = 8
    # leave >=2 CPUs of headroom below the cluster size: the giant-doc branch
    # holds a min-1 actor and the read/filter/write task operators need at
    # least one schedulable CPU, or a unioned plan deadlocks on tiny clusters.
    # The cap only binds at n <= 8/3*2: above that 3n/4 already leaves room,
    # keeping the pool CPU-proportional across scaling levels. The floor is 1
    # (not 2): a 3-CPU cluster must keep its n-2 headroom or the tiny-cluster
    # starvation the cap exists to prevent comes back.
    return max(1, min((n * 3) // 4, n - 2))


def _finalize_with(ocr_pipeline: str):
    def f(group: pa.Table) -> pa.Table:
        return finalize_group(group, ocr_pipeline)

    return f


def _branches(source, cfg: ExtractConfig):
    """Build the small-doc and giant-doc branch Datasets (either may be None)."""
    T = cfg.split_threshold

    if isinstance(source, (str, list)):
        paths = _parquet_paths(source)
        has_giants = _max_n_spans(paths) > T
        read_kw = {}
        if cfg.override_num_blocks:
            read_kw["override_num_blocks"] = cfg.override_num_blocks
        small = rd.read_parquet(paths, filter=pc.field("n_spans") <= T, **read_kw)
        big = rd.read_parquet(paths, filter=pc.field("n_spans") > T, **read_kw) if has_giants else None
    elif isinstance(source, pa.Table):
        mask = pc.less_equal(source["n_spans"], T)
        small_tbl = source.filter(mask)
        big_tbl = source.filter(pc.invert(mask))
        small = rd.from_arrow(small_tbl)
        big = rd.from_arrow(big_tbl) if big_tbl.num_rows else None
    else:
        # generic Dataset input (e.g. a corpus derived inside map_batches): no
        # parquet pushdown, so branch with streaming filters that share the
        # lazy upstream lineage — each branch re-executes the (cheap,
        # streaming) derivation rather than materializing the corpus anywhere
        small = source.filter(expr=f"n_spans <= {T}")
        big = source.filter(expr=f"n_spans > {T}")

    if cfg.first_span is not None or cfg.last_span is not None:
        from ..stages.split import make_span_range_batch

        rng = make_span_range_batch(cfg.first_span, cfg.last_span)
        small = small.map_batches(rng, batch_format="pyarrow")
        if big is not None:
            big = big.map_batches(rng, batch_format="pyarrow")

    parse_kwargs = {"media_dir": cfg.media_dir, "engine_effort": cfg.engine_effort,
                    "media_format": cfg.media_format,
                    "media_quality": cfg.media_quality,
                    "media_scale": cfg.media_scale,
                    "ocr_pipeline": cfg.ocr_pipeline}
    pool = _pool(cfg)
    small_out = (
        small.map_batches(sniff_batch, batch_format="pyarrow")
        .map_batches(
            ParseStage,
            fn_constructor_kwargs={"mode": "whole", **parse_kwargs},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=pool,
            num_cpus=1,
        )
    )
    big_out = None
    if big is not None:
        from ..core.groupops import _stable_part

        n_regroup = cfg.regroup_partitions

        def add_part(b: pa.Table) -> pa.Table:
            # vectorized stable doc_id hash (pandas siphash) — any deterministic
            # process-independent hash works here, the column only regroups a
            # doc's chunks onto one reducer and never reaches the output
            return b.append_column(
                "regroup_part", pa.array(_stable_part(b, ["doc_id"], n_regroup)))

        big_out = (
            big.map_batches(sniff_batch, batch_format="pyarrow")
            .map_batches(
                make_split_batch(cfg.chunk_size),
                batch_format="pyarrow",
                batch_size=4,
            )
            .map_batches(
                ParseStage,
                fn_constructor_kwargs={"mode": "chunks", **parse_kwargs},
                batch_format="pyarrow",
                batch_size=4,
                concurrency=(1, 4),  # tiny tail branch: autoscale, never starve main
                num_cpus=1,
            )
            # the only shuffle: coarse hash partitions of doc_id (salted regroup) —
            # one reducer call reassembles many docs, avoiding per-doc group overhead
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("regroup_part")
            .map_groups(_finalize_with(cfg.ocr_pipeline), batch_format="pyarrow")
        )
    if cfg.emit_layout:
        from ..stages.layout import add_layout_batch

        small_out = small_out.map_batches(add_layout_batch, batch_format="pyarrow")
        if big_out is not None:
            big_out = big_out.map_batches(add_layout_batch, batch_format="pyarrow")
    if cfg.first_page is not None or cfg.last_page is not None:
        if not cfg.emit_layout:
            raise ValueError("first_page/last_page need emit_layout=True "
                             "(pages are a layout output, SPEC §6d)")
        from ..stages.layout import make_page_range_batch

        prng = make_page_range_batch(cfg.first_page, cfg.last_page)
        small_out = small_out.map_batches(prng, batch_format="pyarrow")
        if big_out is not None:
            big_out = big_out.map_batches(prng, batch_format="pyarrow")
    return small_out, big_out


def build_extraction(source, cfg: ExtractConfig | None = None) -> rd.Dataset:
    """Build the lazy extraction Dataset (small-doc branch ∪ giant-doc branch).
    ``source``: a parquet file/dir path, a pyarrow Table, or a Dataset.

    Note: consuming the unioned Dataset interleaves two actor pools under one
    streaming plan, which halves pool utilization (measured); for full-corpus
    runs prefer ``run_extraction``, which executes the branches as two writes —
    identical rows, full pool each."""
    small_out, big_out = _branches(source, cfg or ExtractConfig())
    return small_out if big_out is None else small_out.union(big_out)


def build_media_table(source, cfg: ExtractConfig | None = None) -> rd.Dataset:
    """Columnar media sink: payloads → decode → canonical re-encode →
    (media_ref, content_type, width, height, data) rows.

    Runs as its own column-pruned pass (only doc payload columns leave storage)
    so the main extraction pipeline never writes per-blob files — at corpus
    scale a content-addressed blob-per-file store means billions of tiny
    objects; a parquet/Lance media table is the scalable layout. Duplicate refs
    across blocks are collapsed per batch; global duplicates are harmless
    (ref → identical canonical bytes by construction)."""
    cfg = cfg or ExtractConfig()
    if isinstance(source, (str, list)):
        ds = rd.read_parquet(_parquet_paths(source), columns=["payloads"])
    elif isinstance(source, pa.Table):
        ds = rd.from_arrow(source.select(["payloads"]))
    else:
        ds = source.select_columns(["payloads"])

    from ..core import codec
    from ..functions.text_clean import clean_text

    def to_media(b: pa.Table) -> pa.Table:
        import json

        refs, ctypes, ws, hs, cells, datas = [], [], [], [], [], []
        t_rows, t_cols, t_nulls = [], [], []
        seen = set()
        for plist in b["payloads"].to_pylist():
            for p in plist or []:
                try:
                    dec = codec.decode_payload(p["data"])
                except codec.CodecError:
                    continue
                canonical = codec.reencode(dec, clean_text, cfg.media_format,
                                           cfg.media_quality, cfg.media_scale)
                ref = codec.media_ref_of(canonical)
                if ref in seen:
                    continue
                seen.add(ref)
                refs.append(ref)
                if isinstance(dec, codec.DecodedImage):
                    ctypes.append("image/x-synth")
                    # recorded dims = the RENDER's dims (scale honored), same
                    # as what the canonical blob itself carries
                    ws.append(dec.width * cfg.media_scale)
                    hs.append(dec.height * cfg.media_scale)
                    cells.append(None)
                    t_rows.append(None); t_cols.append(None); t_nulls.append(None)
                else:
                    ctypes.append("table/x-synth"); ws.append(0); hs.append(0)
                    # cleaned cell matrix (T6: reference table_data) as a
                    # queryable column — identical bytes to the canonical
                    # blob's payload, so no second cleaning pass can diverge
                    cleaned = [[clean_text(c) if isinstance(c, str) else c
                                for c in row] for row in dec.rows]
                    cells.append(json.dumps(cleaned, separators=(",", ":"),
                                            ensure_ascii=True))
                    # shape stats materialized here, while the decoded matrix
                    # is in hand — downstream table queries become pure
                    # projections instead of per-row json.loads re-derivation
                    t_rows.append(len(cleaned))
                    t_cols.append(len(cleaned[0]) if cleaned else 0)
                    t_nulls.append(sum(1 for row in cleaned for c in row
                                       if c is None))
                datas.append(canonical)
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "content_type": pa.array(ctypes, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "cells_json": pa.array(cells, pa.string()),
            "n_rows": pa.array(t_rows, pa.int32()),
            "n_cols": pa.array(t_cols, pa.int32()),
            "n_null_cells": pa.array(t_nulls, pa.int32()),
            "data": pa.array(datas, pa.large_binary()),
        })

    return ds.map_batches(to_media, batch_format="pyarrow", batch_size=64)


def build_page_screenshots(extracted: rd.Dataset) -> rd.Dataset:
    """I1 closure (SPEC §7): one synthetic page-render record per laid-out page
    of each document — the reference emits a screenshot per ``Page``
    (``page_extractor.py:51-61``). Derives page counts from the ``spans_meta``
    positions already on the extraction output (requires ``emit_layout``);
    docs with no output spans emit no pages. Vectorized explode (np.repeat +
    cumulative-offset page numbering); only the per-page blob encode is
    per-row (it IS the render)."""
    import numpy as np

    from ..core import codec as _codec

    def pages(b: pa.Table) -> pa.Table:
        meta = b["spans_meta"]
        if isinstance(meta, pa.ChunkedArray):
            meta = meta.combine_chunks()
        doc_id = b["doc_id"]
        if isinstance(doc_id, pa.ChunkedArray):
            doc_id = doc_id.combine_chunks()
        n = len(doc_id)
        # last position's page per doc = the doc's page count (pages never go
        # backwards within a doc, SPEC §6b)
        meta_offs = meta.offsets.to_numpy(zero_copy_only=False)
        pos = meta.flatten().field("positions")
        pos_offs = pos.offsets.to_numpy(zero_copy_only=False)
        page_flat = pos.flatten().field("page_no").to_numpy(zero_copy_only=False)
        n_pages = np.zeros(n, dtype=np.int64)
        for d in range(n):  # ints only; spans may be empty for error docs
            last_pos_end = pos_offs[meta_offs[d + 1]] if meta_offs[d + 1] > meta_offs[d] else -1
            if last_pos_end > 0:
                n_pages[d] = page_flat[last_pos_end - 1]
        parent = np.repeat(np.arange(n), n_pages)
        offs = np.concatenate([[0], np.cumsum(n_pages)])
        page_nos = np.arange(len(parent)) - offs[parent] + 1
        ids = doc_id.take(pa.array(parent)).to_pylist()
        blobs = [_codec.encode_page_render(d, int(p))
                 for d, p in zip(ids, page_nos)]
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "page_no": pa.array(page_nos, pa.int32()),
            "media_ref": pa.array([_codec.media_ref_of(x) for x in blobs],
                                  pa.string()),
            "content_type": pa.array(["page/x-synth"] * len(blobs), pa.string()),
            "width": pa.array([_codec.PAGE_W] * len(blobs), pa.int32()),
            "height": pa.array([_codec.PAGE_H] * len(blobs), pa.int32()),
            "data": pa.array(blobs, pa.large_binary()),
        })

    return extracted.map_batches(pages, batch_format="pyarrow")


def run_extraction(source, out_dir: str, cfg: ExtractConfig | None = None,
                   write_media: bool = True) -> str:
    """Execute the pipeline and write partitioned parquet output (+ media table).

    The small-doc branch, the giant-doc branch and the media-table pass run as
    three separate plans driven from concurrent driver threads: a single unioned
    plan halves actor-pool utilization (the streaming executor interleaves its
    branches), while concurrent independent plans let the task-based media/giant
    work soak up whatever CPUs the fixed parse pool isn't using (ramp/tail) —
    measured ~1.3x end-to-end at 32 CPUs. Parquet writers use unique per-task
    file names, so two plans appending to the same directory cannot collide."""
    import threading

    cfg = cfg or ExtractConfig()
    # build ALL plans (and their read_parquet datasource imports) on the main
    # thread — concurrent first-imports of fsspec submodules from worker threads
    # race and raise spurious ImportError
    small_out, big_out = _branches(source, cfg)
    media_out = build_media_table(source, cfg) if write_media else None
    docs_dir = os.path.join(out_dir, "docs")
    errors = []

    def _run(fn):
        try:
            fn()
        except BaseException as exc:  # surface thread failures to the caller
            errors.append(exc)

    threads = []
    if big_out is not None:
        threads.append(threading.Thread(
            target=_run, args=(lambda: big_out.write_parquet(docs_dir),)))
    if media_out is not None:
        threads.append(threading.Thread(target=_run, args=(
            lambda: media_out.write_parquet(os.path.join(out_dir, "media")),)))
    for t in threads:
        t.start()
    _run(lambda: small_out.write_parquet(docs_dir))
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    if cfg.page_screenshots:
        if not cfg.emit_layout:
            raise ValueError("page_screenshots requires emit_layout=True")
        # second pruned pass over the WRITTEN docs (doc_id + spans_meta only
        # leave storage) — no re-extraction, streams block by block
        pages = build_page_screenshots(
            rd.read_parquet(docs_dir, columns=["doc_id", "spans_meta"]))
        pages.write_parquet(os.path.join(out_dir, "pages"))
    return docs_dir
