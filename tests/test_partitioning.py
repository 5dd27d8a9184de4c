"""Skew routing: giants never share a task with the small-doc population."""

from pyspark.sql import functions as F

from pdfplucker_spark.gen import gen_doc, rows_to_table
from pdfplucker_spark.plans.partitioning import balance_docs


def test_giants_isolated_from_smalls(spark, tmp_path):
    import pyarrow.parquet as pq

    rows = [gen_doc(i, min_spans=5, max_spans=50) for i in range(200)]
    rows += [gen_doc(1000 + i, min_spans=30_000, max_spans=30_000) for i in range(3)]
    path = str(tmp_path / "in.parquet")
    pq.write_table(rows_to_table(rows), path)

    routed = balance_docs(spark.read.parquet(path), 4, skew_threshold=20_000)
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
