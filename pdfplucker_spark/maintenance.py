"""Table maintenance for the parquet-fallback layout: vacuum + compaction.

Long-lived 100 TB output tables accumulate (a) torn partition directories
from crashed runs (invisible to readers via committed_view, but paying
storage + list costs forever) and (b) many small committed run directories
(append-per-run). Under Iceberg these are `expire_snapshots` and
`rewrite_data_files`; the parquet fallback gets the same two operations
here, both guarded by the job's single-writer lease.

Crash-consistency of compact(): the new consolidated run is written first
(invisible: no marker), then old markers are removed, then the new marker
is written, then old data dirs are deleted. Every crash window leaves the
table either fully on the old runs, briefly EMPTY-committed (readers see a
consistent zero-run view, resume reprocesses — correct, never duplicated),
or fully on the new run. Duplicates are never visible.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession, functions as F

from pdfplucker_spark.job import (
    _acquire_lock,
    _mark_committed,
    committed_run_ids,
    committed_view,
)

def discover_tables(output: str) -> tuple[str, ...]:
    """Every table directory under the output — including detail tables
    (pages/images/tables) when the job ran with --details. Compaction MUST
    cover all of them: it retires the commit markers globally, so a table
    left out would have its committed data orphaned."""
    try:
        return tuple(
            d
            for d in sorted(os.listdir(output))
            if os.path.isdir(os.path.join(output, d)) and not d.startswith("_")
        )
    except FileNotFoundError:
        return ()


def _run_dirs(output: str, table: str) -> dict[str, str]:
    base = os.path.join(output, table)
    out = {}
    try:
        for d in os.listdir(base):
            if d.startswith("run_id="):
                out[d.split("=", 1)[1]] = os.path.join(base, d)
    except FileNotFoundError:
        pass
    return out


def vacuum(output: str, tables=None) -> dict[str, list[str]]:
    """Physically delete partition dirs of UNCOMMITTED (torn) runs.
    Readers never saw them; resume already reprocesses their docs."""
    committed = set(committed_run_ids(output))
    removed: dict[str, list[str]] = {}
    for table in tables or discover_tables(output):
        for run_id, path in _run_dirs(output, table).items():
            if run_id not in committed:
                shutil.rmtree(path, ignore_errors=True)
                removed.setdefault(table, []).append(run_id)
    return removed


def compact(
    spark: SparkSession,
    output: str,
    tables=None,
    target_mb: int = 128,
) -> str:
    """Rewrite all committed runs of each table into ONE new run with
    right-sized files. Returns the new run_id."""
    new_run = f"compact{uuid.uuid4().hex[:10]}"
    tables = tables or discover_tables(output)
    lock = _acquire_lock(output, new_run)
    try:
        old_runs = committed_run_ids(output)
        if not old_runs:
            return new_run
        # 1) write the consolidated data as a new (uncommitted) run
        for table in tables:
            df = committed_view(spark, output, table).withColumn(
                "run_id", F.lit(new_run)
            )
            n_bytes = sum(
                os.path.getsize(os.path.join(r, f))
                for rid, r in _run_dirs(output, table).items()
                if rid in old_runs
                for f in os.listdir(r)
                if f.endswith(".parquet")
            )
            n_files = max(1, round(n_bytes / (target_mb * 1024 * 1024)))
            df.repartition(n_files).write.mode("append").partitionBy(
                "run_id"
            ).parquet(os.path.join(output, table))
        # 2) retire old markers (readers see a consistent empty-committed
        #    view for an instant — never duplicates)
        for rid in old_runs:
            os.remove(os.path.join(output, "_commits", rid))
        # 3) commit the consolidated run
        _mark_committed(output, new_run)
        # 4) physically drop the old data
        for table in tables:
            for rid, path in _run_dirs(output, table).items():
                if rid in old_runs:
                    shutil.rmtree(path, ignore_errors=True)
        return new_run
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def main(argv=None) -> int:
    import argparse

    from pdfplucker_spark.session import get_spark

    p = argparse.ArgumentParser(description="vacuum / compact output tables")
    p.add_argument("--output", required=True)
    p.add_argument("--action", choices=["vacuum", "compact"], required=True)
    p.add_argument("--target-mb", type=int, default=128)
    p.add_argument("--master", default=None)
    a = p.parse_args(argv)
    if a.action == "vacuum":
        removed = vacuum(a.output)
        print(f"vacuumed: {removed}")
        return 0
    spark = get_spark(app="maintenance", master=a.master)
    try:
        rid = compact(spark, a.output, target_mb=a.target_mb)
        print(f"compacted into run {rid}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
