"""Doc partitioning: the default path is a single scan with no exchange
(byte-balanced scan splits bound per-task span mass — bytes ≈ spans); the
opt-in giant tier still strictly isolates giants from the small-doc
population; full_shuffle is one hash exchange on the unique doc_id."""

from pyspark.sql import functions as F

from pdfplucker_spark.gen import gen_doc, rows_to_table
from pdfplucker_spark.plans.partitioning import balance_docs


def _write(spark, tmp_path):
    import pyarrow.parquet as pq

    rows = [gen_doc(i, min_spans=5, max_spans=50) for i in range(200)]
    rows += [gen_doc(1000 + i, min_spans=30_000, max_spans=30_000) for i in range(3)]
    path = str(tmp_path / "in.parquet")
    pq.write_table(rows_to_table(rows), path)
    return path


def test_default_is_single_scan_no_exchange(spark, tmp_path):
    """The r10 default: balance_docs is pass-through — one FileScan, zero
    Exchange (the r1-r9 giant tier paid a second full input scan for
    isolation the byte-balanced splits already bound)."""
    path = _write(spark, tmp_path)
    routed = balance_docs(spark.read.parquet(path), 4)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan[:2000]
    assert plan.count("Exchange") == 0, plan[:2000]
    assert routed.count() == 203


def test_full_shuffle_is_one_scan_one_exchange(spark, tmp_path):
    path = _write(spark, tmp_path)
    routed = balance_docs(spark.read.parquet(path), 4, full_shuffle=True)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]
    assert routed.count() == 203


def test_route_giants_isolates_giants_from_smalls(spark, tmp_path):
    path = _write(spark, tmp_path)
    routed = balance_docs(
        spark.read.parquet(path), 4, skew_threshold=20_000, route_giants=True
    )
    pid = routed.select(
        "doc_id",
        F.size("spans").alias("n"),
        F.spark_partition_id().alias("pid"),
    )
    per_part = (
        pid.groupBy("pid")
        .agg(
            F.sum(F.when(F.col("n") >= 20_000, 1).otherwise(0)).alias("giants"),
            F.sum(F.when(F.col("n") < 20_000, 1).otherwise(0)).alias("smalls"),
        )
        .collect()
    )
    for r in per_part:
        assert not (r.giants > 0 and r.smalls > 0), per_part
    assert sum(r.giants for r in per_part) == 3
    assert sum(r.smalls for r in per_part) == 200
