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


def test_overlap_sketch_error_within_bound(spark):
    """The compounded inclusion-exclusion error, measured directly at
    sf0.01: |approx − exact| must stay within OVERLAP_BOUND·|union| (the
    registered flag asserts the same predicate through the oracle gate;
    this measures the actual error, per the sketches-module contract)."""
    from pyspark.sql import functions as F

    from pdfplucker_spark.operators.sketches import (
        HLL_RSD,
        OVERLAP_BOUND,
        q_events_approx_overlap,
    )
    from pdfplucker_spark.sources.tables import load

    sf = "/root/testdata/sf0.01"
    ev = load(spark, sf, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    va = F.when(F.col("event_type") == "view", F.col("user_id"))
    pb = F.when(F.col("event_type") == "purchase", F.col("user_id"))
    r = ev.groupBy().agg(
        F.countDistinct(va).alias("ve"),
        F.countDistinct(pb).alias("pe"),
        F.countDistinct("user_id").alias("ue"),
        F.approx_count_distinct(va, rsd=HLL_RSD).alias("va"),
        F.approx_count_distinct(pb, rsd=HLL_RSD).alias("pa"),
        F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("ua"),
    ).collect()[0]
    exact = r.ve + r.pe - r.ue
    approx = r.va + r.pa - r.ua
    assert abs(approx - exact) <= OVERLAP_BOUND * r.ue, (approx, exact, r.ue)
    # and the registered flag agrees
    row = q_events_approx_overlap(spark, sf).collect()[0]
    assert row.approx_within_bound and row.n_overlap_exact == exact


def test_cms_matches_pure_python_replica_and_only_overestimates(spark):
    """The CMS is deterministic: a pure-Python replica of the d×w grid
    (same md5 hash family) must reproduce every estimate EXACTLY, and the
    classic CMS property must hold — estimate ≥ exact for every key, with
    the grid's total mass per row equal to the corpus event count."""
    import hashlib

    from pdfplucker_spark.operators.sketches import (
        CMS_D,
        CMS_TOPK,
        CMS_W,
        q_events_cms_heavy_hitters,
    )

    ev = load(spark, SF, "events").select("user_id").collect()
    exact = {}
    for r in ev:
        exact[r.user_id] = exact.get(r.user_id, 0) + 1

    def bucket(i, key):
        h = int(hashlib.md5(f"cms{i}:{key}".encode()).hexdigest()[:15], 16)
        return h % CMS_W

    grid = [[0] * CMS_W for _ in range(CMS_D)]
    for u, n in exact.items():
        k = str(u) if u is not None else "∅null"
        for i in range(CMS_D):
            grid[i][bucket(i, k)] += n
    for i in range(CMS_D):
        assert sum(grid[i]) == len(ev)

    rows = q_events_cms_heavy_hitters(spark, SF).collect()
    assert len(rows) == min(CMS_TOPK, len(exact))
    key_img = lambda u: str(u) if u is not None else "∅null"
    want_top = sorted(exact.items(), key=lambda kv: (-kv[1], key_img(kv[0])))[
        :CMS_TOPK
    ]
    assert sorted(r.user_id for r in rows) == sorted(u for u, _ in want_top)
    for r in rows:
        k = str(r.user_id) if r.user_id is not None else "∅null"
        replica = min(grid[i][bucket(i, k)] for i in range(CMS_D))
        assert r.exact_n == exact[r.user_id]
        assert r.cms_estimate == replica, (r, replica)
        assert r.cms_estimate >= r.exact_n
    spark.catalog.clearCache()


def test_cms_accuracy_curve_width_sweep(spark):
    """The curve audits the SAME top-K keys at every width; per-key rows
    agree with the single-width operator at the default point; aggregate
    overestimate shrinks from the narrowest to the widest grid (error ∝
    N/w, a 16× spread — deterministic margin on this corpus), and every
    estimate still only overestimates."""
    from pdfplucker_spark.operators.sketches import (
        CMS_W,
        CMS_W_SWEEP,
        q_events_cms_accuracy_curve,
        q_events_cms_heavy_hitters,
    )

    rows = q_events_cms_accuracy_curve(spark, SF).collect()
    by_w = {}
    for r in rows:
        by_w.setdefault(r.grid_w, {})[r.user_id] = r
    assert set(by_w) == set(CMS_W_SWEEP)
    keys = {frozenset(v) for v in by_w.values()}
    assert len(keys) == 1  # same audited key set at every width
    default = {
        r.user_id: r for r in q_events_cms_heavy_hitters(spark, SF).collect()
    }
    for u, r in by_w[CMS_W].items():
        assert (r.exact_n, r.cms_estimate) == (
            default[u].exact_n,
            default[u].cms_estimate,
        )
    err = {
        w: sum(r.cms_estimate - r.exact_n for r in v.values())
        for w, v in by_w.items()
    }
    assert err[min(CMS_W_SWEEP)] >= err[max(CMS_W_SWEEP)], err
    for v in by_w.values():
        for r in v.values():
            assert r.cms_estimate >= r.exact_n
    spark.catalog.clearCache()
