"""Checkpoint / lineage manifest + exact resume (SURVEY §4.3; north-rule mandate).

Output layout::

    out_dir/
      waves/wave-00000/docs/*.parquet     # one wave = one group of input fragments
      waves/wave-00000/media/*.parquet    # columnar media table (content-hash refs)
      manifest/wave-00000.json            # written atomically AFTER the wave commits

A *wave* is the unit of resume: a deterministic group of input parquet fragments.
Each manifest record carries lineage (the input fragments), per-stage metrics
(rows, spans, ocr_fast/full, errors, wall_s) and an optional content hash. Resume =
read the manifest, delete any wave dir without a manifest record (partial/crashed
write — ``write_parquet`` appends, so stale files must go), process only missing
waves. Exactly-once by idempotent wave naming + media content addressing.

The reference has no durable state at all (SURVEY §4.1); this layer is what
"resumable from checkpoint with per-partition lineage + metrics" means for a batch
pipeline at 10^12 scale.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time

import pyarrow.parquet as pq

from ..pipelines.extract import ExtractConfig


def _wave_groups(in_dir: str, n_waves: int) -> list[list[str]]:
    paths = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))
    n_waves = max(1, min(n_waves, len(paths)))
    groups: list[list[str]] = [[] for _ in range(n_waves)]
    for i, p in enumerate(paths):
        groups[i % n_waves].append(p)
    return [g for g in groups if g]


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _wave_metrics(docs_dir: str, compute_hash: bool) -> dict:
    """Cheap columnar read-back of the metrics column (+ optional content hash)."""
    rows = spans = fast = full = errors = 0
    doc_hashes = []
    for p in sorted(glob.glob(os.path.join(docs_dir, "*.parquet"))):
        cols = ["metrics"] + (["doc_id", "spans"] if compute_hash else [])
        t = pq.read_table(p, columns=cols)
        rows += t.num_rows
        for m in t["metrics"].to_pylist():
            spans += m["n_spans_out"]
            errors += m["n_errors"] + (1 if m["error"] else 0)
            if m["ocr_path"] == "fast":
                fast += 1
            elif m["ocr_path"] == "full":
                full += 1
        if compute_hash:
            for did, sp in zip(t["doc_id"].to_pylist(), t["spans"].to_pylist()):
                h = hashlib.sha256()
                h.update(did.encode())
                for s in sp:
                    h.update(
                        f"|{s['kind']}\x00{s['text']}\x00{s['media_ref']}".encode()
                    )
                doc_hashes.append(h.hexdigest())
    content_hash = (
        hashlib.sha256("".join(sorted(doc_hashes)).encode()).hexdigest()
        if compute_hash
        else ""
    )
    return {
        "rows": rows,
        "spans": spans,
        "ocr_fast": fast,
        "ocr_full": full,
        "errors": errors,
        "content_hash": content_hash,
    }


def _stage_summary(stats: str) -> list[dict]:
    """Compact per-stage metrics for the manifest (north-rule: per-partition
    lineage + per-stage metrics): operator name, wall span, task wall total,
    rows out — parsed from Ray Data's stats report."""
    import re

    out = []
    for block in stats.split("Operator ")[1:]:
        head = block.split("\n", 1)[0]
        m = re.match(r"\d+ (.+?): .*?in ([\d.]+)s", head)
        wall = re.search(r"Remote wall time: .*?([\d.]+)(us|ms|s) total", block)
        rows = re.search(r"Output num rows per block: .*?(\d+) total", block)
        if not m:
            continue
        rec = {"stage": m.group(1)[:80], "span_s": float(m.group(2))}
        if wall:
            unit = {"us": 1e-6, "ms": 1e-3, "s": 1.0}[wall.group(2)]
            rec["task_wall_s"] = round(float(wall.group(1)) * unit, 3)
        if rows:
            rec["rows_out"] = int(rows.group(1))
        out.append(rec)
    return out


def run_resumable(
    in_dir: str,
    out_dir: str,
    cfg: ExtractConfig | None = None,
    n_waves: int = 8,
    compute_hash: bool = False,
) -> dict:
    """Run the extraction pipeline wave-by-wave with exact resume.

    Returns a summary dict {waves_total, waves_run, waves_skipped, rows, ...}.
    """
    cfg = cfg or ExtractConfig()
    groups = _wave_groups(in_dir, n_waves)
    man_dir = os.path.join(out_dir, "manifest")
    waves_dir = os.path.join(out_dir, "waves")
    os.makedirs(man_dir, exist_ok=True)
    os.makedirs(waves_dir, exist_ok=True)

    import threading

    from ..pipelines.extract import _branches, build_media_table

    ran = skipped = 0
    totals = {"rows": 0, "spans": 0, "ocr_fast": 0, "ocr_full": 0, "errors": 0}
    for k, group in enumerate(groups):
        wave_name = f"wave-{k:05d}"
        man_path = os.path.join(man_dir, wave_name + ".json")
        wave_dir = os.path.join(waves_dir, wave_name)
        docs_dir = os.path.join(wave_dir, "docs")
        if os.path.exists(man_path):
            rec = json.load(open(man_path))
            if rec.get("status") == "done" and rec.get("input_fragments") == group:
                for key in totals:
                    totals[key] += rec["metrics"][key]
                skipped += 1
                continue
        # partial/crashed wave: write_parquet appends, so clear stale output first
        if os.path.exists(wave_dir):
            shutil.rmtree(wave_dir)
        t0 = time.perf_counter()
        # same threaded three-plan execution as run_extraction (a unioned plan
        # halves actor-pool utilization)
        small_out, big_out = _branches(group, cfg)
        media_out = build_media_table(group, cfg)
        os.makedirs(docs_dir, exist_ok=True)
        errs: list[BaseException] = []

        def _w(fn):
            try:
                fn()
            except BaseException as exc:
                errs.append(exc)

        threads = [threading.Thread(target=_w, args=(
            lambda: media_out.write_parquet(os.path.join(wave_dir, "media")),))]
        if big_out is not None:
            threads.append(threading.Thread(target=_w, args=(
                lambda: big_out.write_parquet(docs_dir),)))
        for th in threads:
            th.start()
        _w(lambda: small_out.write_parquet(docs_dir))
        for th in threads:
            th.join()
        if errs:
            raise errs[0]
        wall = time.perf_counter() - t0
        metrics = _wave_metrics(docs_dir, compute_hash)
        metrics["stages"] = _stage_summary(small_out.stats())
        wall_metrics = {**metrics, "wall_s": round(wall, 3)}
        _atomic_write_json(
            man_path,
            {
                "partition_id": k,
                "status": "done",
                "input_fragments": group,
                "metrics": wall_metrics,
            },
        )
        for key in totals:
            totals[key] += metrics[key]
        ran += 1
    return {
        "waves_total": len(groups),
        "waves_run": ran,
        "waves_skipped": skipped,
        **totals,
    }


def read_output(out_dir: str):
    """Ray Dataset over all committed wave outputs."""
    import ray.data as rd

    paths = []
    man_dir = os.path.join(out_dir, "manifest")
    for man in sorted(glob.glob(os.path.join(man_dir, "wave-*.json"))):
        rec = json.load(open(man))
        if rec.get("status") == "done":
            wave = f"wave-{rec['partition_id']:05d}"
            paths.extend(
                sorted(glob.glob(os.path.join(out_dir, "waves", wave, "docs", "*.parquet")))
            )
    return rd.read_parquet(paths)
