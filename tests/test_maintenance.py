"""Vacuum + compaction: data-preserving, torn-run-removing, resume-safe."""

import os

import pytest

from pdfplucker_spark import job
from pdfplucker_spark.gen import write_tier
from pdfplucker_spark.maintenance import _run_dirs, compact, vacuum


@pytest.fixture(scope="module")
def t1_path(tmp_path_factory):
    return write_tier("t1", str(tmp_path_factory.mktemp("data")))


def _fingerprint(spark, out, table="spans_out"):
    from pyspark.sql import functions as F

    df = job.committed_view(spark, out, table).drop("run_id")
    rows = df.select(F.md5(F.to_json(F.struct("*"))).alias("h")).collect()
    return sorted(r.h for r in rows)


def test_compact_preserves_data_and_consolidates_runs(spark, t1_path, tmp_path):
    out = str(tmp_path / "out")
    job.run(spark, t1_path, out, run_id="r1", partitions=4, limit=60)
    job.run(spark, t1_path, out, run_id="r2", partitions=4, resume=True)
    before = _fingerprint(spark, out)
    docs_before = _fingerprint(spark, out, "docs_out")

    new_run = compact(spark, out)

    assert job.committed_run_ids(out) == [new_run]
    assert set(_run_dirs(out, "spans_out")) == {new_run}
    assert _fingerprint(spark, out) == before
    assert _fingerprint(spark, out, "docs_out") == docs_before

    # resume after compaction is still a no-op (docs_out survived intact)
    m = job.run(spark, t1_path, out, run_id="r3", partitions=4, resume=True)
    assert m["total_docs"] == 0


def test_compact_covers_detail_tables(spark, t1_path, tmp_path):
    """Compaction discovers EVERY table dir (incl. --details sidecars);
    leaving one out would orphan its committed data when markers retire."""
    out = str(tmp_path / "out")
    job.run(spark, t1_path, out, run_id="d1", partitions=4, details=True)
    before = {t: _fingerprint(spark, out, t) for t in ("spans_out", "pages", "images", "tables")}

    compact(spark, out)

    for t, fp in before.items():
        assert _fingerprint(spark, out, t) == fp, t


def test_vacuum_removes_only_torn_runs(spark, t1_path, tmp_path):
    out = str(tmp_path / "out")
    job.run(spark, t1_path, out, run_id="good", partitions=4, limit=50)
    job.run(spark, t1_path, out, run_id="torn", partitions=4, resume=True)
    os.remove(os.path.join(out, "_commits", "torn"))  # simulate crash

    removed = vacuum(out)
    assert "torn" in removed["spans_out"]
    assert set(_run_dirs(out, "spans_out")) == {"good"}
    assert job.committed_view(spark, out).count() == 50
