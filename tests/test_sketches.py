"""Sketch-tier error bounds, asserted directly (the driver gate only sees
the within-bound flag; these tests measure the actual relative error)."""

from pyspark.sql import functions as F

from pdfplucker_spark.operators.sketches import (
    HLL_BOUND,
    PCT_ACCURACY,
    PCT_BOUND,
    QUANTILES,
    q_events_approx_distinct,
    q_lineitem_approx_quantiles,
)
from pdfplucker_spark.sources.tables import load

SF = "/root/testdata/sf0.01"


def test_hll_within_relative_bound(spark):
    ev = load(spark, SF, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel = abs(r["approx"] - r["exact"]) / r["exact"]
        assert rel <= HLL_BOUND, (r["event_type"], r["exact"], r["approx"], rel)


def test_quantile_sketch_within_relative_bound(spark):
    li = load(spark, SF, "lineitem")
    qs = ", ".join(str(q) for q in QUANTILES)
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(f"percentile(cast(l_extendedprice as double), array({qs}))").alias("ex"),
            F.expr(
                f"percentile_approx(cast(l_extendedprice as double), array({qs}), {PCT_ACCURACY})"
            ).alias("ap"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        for e, a in zip(r["ex"], r["ap"]):
            assert abs(a - e) <= PCT_BOUND * abs(e), (r["l_returnflag"], e, a)


def test_registered_flags_all_true(spark):
    """The driver-facing flag must be TRUE on the oracle corpora — a sketch
    outside its bound here means the operator's contract is wrong."""
    d = q_events_approx_distinct(spark, SF)
    assert d.where(~F.col("approx_within_bound")).count() == 0
    q = q_lineitem_approx_quantiles(spark, SF)
    assert q.where(~F.col("approx_within_bound")).count() == 0
