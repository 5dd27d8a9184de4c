"""One-command hostile sweep (round-6 verdict #7, previously a manual
session recorded in BENCH/BASELINE.md): reruns the full strict
driver-mimic Spark-vs-DuckDB sweep under a hostile environment —
``TZ=Asia/Tokyo`` + ``spark.sql.ansi.enabled=true`` — so session-timezone
leaks (the r3 streaming NTZ-cast bug's class) and ANSI-strict
cast/arithmetic differences cannot hide behind the UTC/lax defaults.

The sweep runs in a FRESH subprocess because the JVM captures the process
TZ at launch; flipping ``TZ`` inside an already-started session is a no-op.

Usage:  python tests/hostile_sweep.py [sf_dir] [query ...]
        (defaults: sf0.001, every registered query)
"""

from __future__ import annotations

import os
import subprocess
import sys


def main() -> int:
    args = sys.argv[1:] or ["/root/testdata/sf0.001"]
    env = dict(os.environ, TZ="Asia/Tokyo", SPARK_GRAFT_HOSTILE="1")
    return subprocess.call(
        [
            sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_driver_strict.py"),
            *args,
        ],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


if __name__ == "__main__":
    sys.exit(main())
