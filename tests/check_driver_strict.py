"""Strict driver-mimic: compare Spark vs DuckDB including dtype drift.

The driver's value-hash stringifies values, so int64 1981 vs float64 1981.0
hash-differ even though Python == says equal. This script catches that class
locally. Usage:  python tests/check_driver_strict.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pdfplucker_spark.session import get_spark  # noqa: E402
from tests.util_compare import duck_con  # noqa: E402


def strict_compare(sp, du):
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"columns: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    cols = sorted(sp.columns)
    sp, du = sp[cols], du[cols]
    if len(sp) != len(du):
        return False, f"rows: spark={len(sp)} duck={len(du)}"
    for c in cols:
        ka, kb = sp[c].dtype.kind, du[c].dtype.kind
        if ka != kb and {ka, kb} != {"O", "O"}:
            return False, f"dtype drift col={c}: spark={sp[c].dtype} duck={du[c].dtype}"
    a = sorted(map(repr, sp.itertuples(index=False, name=None)))
    b = sorted(map(repr, du.itertuples(index=False, name=None)))
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return False, f"row {i}:\n  spark={ra}\n  duck ={rb}"
    return True, f"ok ({len(sp)} rows, dtypes match)"


def main():
    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(entry.queries().keys())
    # SPARK_GRAFT_HOSTILE=1: the repeatable hostile sweep — session runs
    # under TZ=Asia/Tokyo + ANSI mode so tz-dependent instants and
    # ANSI-strict casts/arithmetic can't hide behind the UTC/lax defaults.
    # Launch via tests/hostile_sweep.py (fresh process: the JVM captures
    # TZ at startup, an in-process flip after launch is a no-op).
    hostile = os.environ.get("SPARK_GRAFT_HOSTILE") == "1"
    if hostile:
        os.environ["TZ"] = "Asia/Tokyo"
        time.tzset()
    spark = get_spark(
        extra_conf={"spark.sql.ansi.enabled": "true"} if hostile else None
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duck_con(sf_dir)
    bad = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE")
            continue
        sp = qs[name](spark, sf_dir).toPandas()
        du = con.sql(oracles[name]).df()
        ok, msg = strict_compare(sp, du)
        print(f"{name}: {'PASS' if ok else 'FAIL'} — {msg}")
        bad += 0 if ok else 1
        # operators persist() multi-consumer intermediates and (by design)
        # never unpersist the lazy plan's caches — reclaim between sweeps
        spark.catalog.clearCache()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
