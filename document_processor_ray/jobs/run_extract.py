"""Cluster job entry point: ``ray job submit -- python -m
document_processor_ray.jobs.run_extract --input DIR --output DIR [options]``.

Runs the resumable wave runner (checkpoint manifest + exact resume) so a
re-submitted job skips committed waves. On the sandbox it runs against a local
session; on a real cluster ``ray.init(address="auto")`` attaches to the running
cluster (the driver owns the session here — library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="input corpus dir (parquet fragments)")
    p.add_argument("--output", required=True, help="output dir (waves + manifest + media)")
    p.add_argument("--waves", type=int, default=8)
    p.add_argument("--split-threshold", type=int, default=2000)
    p.add_argument("--chunk-size", type=int, default=500)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local session size; omit on a cluster (uses address=auto)")
    p.add_argument("--address", default="local")
    p.add_argument("--content-hash", action="store_true")
    p.add_argument("--first-span", type=int, default=None,
                   help="SPEC §6c inclusive span-range start (F3 analog)")
    p.add_argument("--last-span", type=int, default=None)
    p.add_argument("--media-format", default="synth-z",
                   help="media re-encode container (synth-z | synth-raw)")
    p.add_argument("--media-quality", type=int, default=9)
    p.add_argument("--no-layout", action="store_true",
                   help="skip the §6b spans_meta (positions/hierarchy) column")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "ignore_reinit_error": True,
              "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address=args.address, **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ..pipelines.extract import ExtractConfig
    from ..state.manifest import run_resumable

    summary = run_resumable(
        args.input,
        args.output,
        ExtractConfig(split_threshold=args.split_threshold,
                      chunk_size=args.chunk_size,
                      first_span=args.first_span, last_span=args.last_span,
                      media_format=args.media_format,
                      media_quality=args.media_quality,
                      emit_layout=not args.no_layout),
        n_waves=args.waves,
        compute_hash=args.content_hash,
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
