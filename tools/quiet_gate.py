"""Pre-flight external-load gate for scaling measurements.

Round-4 finding (BASELINE.md): raw scaling efficiency lands ≥ 0.8 whenever the
in-situ all-core slowdown probe is ≤ ~1.09, and ~0.74 whenever an external host
load wave pushes the probe ≥ 1.15. This gate measures the same pure-CPU probe
bench.py uses (sha256 over 16 KiB, process pools at 6 vs 24 workers) BEFORE
committing to a ~14-minute --scaling run, so attempts are only spent on quiet
hosts. Exit 0 = quiet (probe ≤ threshold), exit 1 = noisy.

Usage: python tools/quiet_gate.py [threshold]   (default 1.10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import machine_parallel_slowdown  # noqa: E402


def main() -> int:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 1.10
    load1 = os.getloadavg()[0]
    if load1 > 4.0:
        print(f"noisy: loadavg {load1:.2f} > 4.0 (skipped probe)")
        return 1
    slow = machine_parallel_slowdown(6, 24, n=30000)
    quiet = slow <= threshold
    print(f"{'quiet' if quiet else 'noisy'}: all-core slowdown {slow:.3f} "
          f"(threshold {threshold}), loadavg {load1:.2f}")
    return 0 if quiet else 1


if __name__ == "__main__":
    raise SystemExit(main())
