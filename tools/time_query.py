"""Settled single-query timing, outside the full bench sweep.

Times one or more named queries from ``pipelines.queries.QUERIES`` over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1), each in a FRESH Ray session
(object-store accumulation inflates within-session repeats — VERDICT r3 #1),
best-of-N attempts per query, and prints one JSON line per query. Used for
root-causing individual bench lines (e.g. the round-3 customer_order_nations
artifact anomaly) without paying for the whole 51-query sweep.

Usage: python tools/time_query.py customer_order_nations [more ...]
Env:   GRAFT_SF_DIR, RAY_GRAFT_CPUS, GRAFT_QUERY_ATTEMPTS (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ATTEMPTS = int(os.environ.get("GRAFT_QUERY_ATTEMPTS", "2"))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: time_query.py <query_name> [...]", file=sys.stderr)
        return 2
    import ray

    import document_processor_ray  # noqa: F401  (fsspec stub install)
    from document_processor_ray.pipelines.queries import QUERIES

    for name in names:
        if name not in QUERIES:
            print(f"unknown query: {name}", file=sys.stderr)
            return 2
    for name in names:
        if ray.is_initialized():
            ray.shutdown()
            time.sleep(2)
        ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        fn = QUERIES[name][0]
        best, times = None, []
        for _ in range(ATTEMPTS):
            t0 = time.perf_counter()
            res = fn(SF_DIR)
            if hasattr(res, "count"):
                res.count()
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            if best is None or dt < best:
                best = dt
        print(json.dumps({"query": name, "sec": round(best, 3),
                          "attempts": times, "num_cpus": CPUS,
                          "loadavg": round(os.getloadavg()[0], 2),
                          "sf": SF_DIR}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
