"""Job lifecycle: metrics math (S11/S12), failure log, lineage, resume."""

import os

import pytest

from pdfplucker_spark import job
from pdfplucker_spark.gen import gen_rows, write_tier
from pdfplucker_spark.oracle import extract_doc


@pytest.fixture(scope="module")
def t1_path(tmp_path_factory):
    return write_tier("t1", str(tmp_path_factory.mktemp("data")))


def test_job_end_to_end_metrics(spark, t1_path, tmp_path):
    out = str(tmp_path / "out")
    m = job.run(spark, t1_path, out, run_id="r1", partitions=4)

    rows = list(gen_rows("t1"))
    expected_failed = sum(
        1 for d, s in rows if extract_doc(d, s)["status"] == "error"
    )
    assert m["total_docs"] == 100
    assert m["processed_docs"] == 100
    assert m["failed_docs"] == expected_failed
    # the reference's formula ((p - f)/p)*100 (processor.py:449-450)
    assert m["success_rate"] == pytest.approx(
        (100 - expected_failed) / 100 * 100.0
    )
    assert m["elapsed_time"] > 0
    assert m["total_input_spans"] == sum(len(s) for _, s in rows)

    fails = spark.read.parquet(os.path.join(out, "fails"))
    assert fails.count() == expected_failed
    frow = fails.first()
    assert frow.run_id == "r1" and frow.error

    lin = spark.read.parquet(os.path.join(out, "lineage"))
    lrows = lin.collect()
    assert sum(r.n_docs for r in lrows) == 100
    assert sum(r.n_failed for r in lrows) == expected_failed
    assert all(r.run_id == "r1" for r in lrows)


def test_resume_no_duplicates_and_equality(spark, t1_path, tmp_path):
    out = str(tmp_path / "out")
    # partial run (S2 limit), then resume to completion
    m1 = job.run(spark, t1_path, out, run_id="part", partitions=4, limit=60)
    assert m1["total_docs"] == 60
    m2 = job.run(spark, t1_path, out, run_id="rest", partitions=4, resume=True)
    assert m2["total_docs"] == 40

    res = spark.read.parquet(os.path.join(out, "spans_out"))
    assert res.count() == 100
    assert res.select("doc_id").distinct().count() == 100  # no dups

    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in res.collect()
    }
    for doc_id, spans in gen_rows("t1"):
        exp = extract_doc(doc_id, spans)
        g = got[doc_id]
        gspans = [
            {k: s[k] for k in ("kind", "text", "media_ref", "offset")}
            for s in g["spans"]
        ]
        assert g["status"] == exp["status"] and gspans == exp["spans"], doc_id


def test_resume_noop_when_complete(spark, t1_path, tmp_path):
    out = str(tmp_path / "out")
    job.run(spark, t1_path, out, run_id="full", partitions=4)
    m = job.run(spark, t1_path, out, run_id="again", partitions=4, resume=True)
    assert m["total_docs"] == 0
    res = spark.read.parquet(os.path.join(out, "spans_out"))
    assert res.count() == 100


def test_torn_run_reprocessed_exactly_once(spark, t1_path, tmp_path):
    """Crash between spans_out and the commit marker → resume must
    reprocess those docs, and the committed view must hold exactly one
    copy per doc (exactly-once under the parquet fallback)."""
    import os as _os

    out = str(tmp_path / "out")
    # full run that "crashes" after writes but before the commit marker
    job.run(spark, t1_path, out, run_id="torn", partitions=4, limit=40)
    _os.remove(_os.path.join(out, "_commits", "torn"))  # simulate the crash

    # resume: torn run invisible → all 100 docs processed again
    m = job.run(spark, t1_path, out, run_id="good", partitions=4, resume=True)
    assert m["total_docs"] == 100

    # raw table contains the torn duplicates…
    raw = spark.read.parquet(_os.path.join(out, "spans_out"))
    assert raw.count() == 140
    # …the committed view does not
    view = job.committed_view(spark, out)
    assert view.count() == 100
    assert view.select("doc_id").distinct().count() == 100

    # and a further resume is a no-op
    m2 = job.run(spark, t1_path, out, run_id="again", partitions=4, resume=True)
    assert m2["total_docs"] == 0
