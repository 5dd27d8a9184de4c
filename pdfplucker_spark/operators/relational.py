"""Relational operator coverage (SURVEY.md §2.3) over the testdata star
schema: hash aggregation, rollup, broadcast-able joins, top-k, windows.

Float-sum determinism across engines: money columns are cast to DECIMAL
before SUM (exact, order-independent), then the final projection casts back
to DOUBLE — so the driver's value-hash matches bit-for-bit regardless of
partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pdfplucker_spark.sources.tables import load


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style hash aggregation with exact decimal sums."""
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") < F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("_sq"),
            F.sum(dec("l_extendedprice")).alias("_sp"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            ).alias("_rev"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sp").cast("double").alias("sum_base_price"),
            F.col("_rev").cast("double").alias("sum_revenue"),
            "count_order",
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_revenue,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_returnflag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (partial+final agg through Catalyst Expand)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


SQL_RETURNFLAG_ROLLUP = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way join + top-k. customer/nation are broadcast-able
    dims — Catalyst picks broadcast hash join via AQE; lineitem⋈orders is
    the only real shuffle."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    # o_orderdate as epoch seconds: timestamp collection depends on the
    # session timezone, epoch does not — keeps the oracle compare TZ-proof
    return (
        rev.orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate) div 1000000"
            ).alias("o_orderdate_epoch"),
            "o_orderpriority",
            "revenue",
        )
    )


SQL_TOP_ORDERS = """
SELECT o_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_epoch, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_regional_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through two broadcast dims (supplier→nation→region)."""
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


SQL_REGIONAL_SUPPLY = """
SELECT r_name, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions over the event stream: row_number, lag, running sum
    (running sum in exact decimal → double, order-independent). Skew-proof
    shape: all three compose from (user_id, time-bucket) in-bucket windows
    plus a bucket-summary carry (prior-bucket row counts, last event type,
    exact decimal prefix sums) — the per-user window runs on summary rows
    only, so one pathological user never serializes an event-grain sort.
    The running sum keeps the single-window NULL rule: NULL until the
    first non-null value, exact decimal addition after (prior buckets'
    decimal sums + the in-bucket running sum — identical doubles). Oracle:
    the plain single-window SQL, unchanged."""
    # persist: e feeds the in-bucket window frame AND the summary agg
    e = _bucketed_events(load(spark, sf_dir, "events"), "event_type", "value").persist()
    wib = _wib()
    run_in = wib.rowsBetween(Window.unboundedPreceding, 0)
    vdec = F.col("value").cast("decimal(18,6)")
    e2 = (
        e.withColumn("rn_in", F.row_number().over(wib))
        .withColumn("lag_in", F.lag("event_type").over(wib))
        .withColumn("runv_in", F.sum(vdec).over(run_in))
        .withColumn(
            "nn_in",
            F.sum(F.when(F.col("value").isNotNull(), 1).otherwise(0)).over(run_in),
        )
    )
    summ = e.groupBy("user_id", "bk").agg(
        F.count("*").alias("n"),
        F.max(F.struct("usk", "event_id", "event_type")).alias("last_ev"),
        F.sum(vdec).alias("sumv"),
        F.sum(F.when(F.col("value").isNotNull(), 1).otherwise(0)).alias("nn"),
    )
    wcar = _wcar()
    before = wcar.rowsBetween(Window.unboundedPreceding, -1)
    carried = summ.select(
        "user_id",
        "bk",
        F.coalesce(F.sum("n").over(before), F.lit(0)).alias("cnt_before"),
        F.lag(F.col("last_ev.event_type")).over(wcar).alias("carry_type"),
        F.sum("sumv").over(before).alias("sumv_before"),
        F.coalesce(F.sum("nn").over(before), F.lit(0)).alias("nn_before"),
    )
    j = e2.join(carried, ["user_id", "bk"])
    total_nn = F.col("nn_before") + F.col("nn_in")
    running = F.when(
        total_nn > 0,
        (
            F.coalesce(F.col("sumv_before"), F.lit(0).cast("decimal(18,6)"))
            + F.coalesce(F.col("runv_in"), F.lit(0).cast("decimal(18,6)"))
        ).cast("double"),
    )
    return j.select(
        "user_id",
        "event_id",
        (F.col("cnt_before") + F.col("rn_in")).cast("int").alias("rn"),
        F.when(F.col("rn_in") == 1, F.col("carry_type"))
        .otherwise(F.col("lag_in"))
        .alias("prev_type"),
        running.alias("running_value"),
    )


SQL_EVENTS_WINDOW = """
SELECT user_id, event_id,
       ROW_NUMBER() OVER w AS rn,
       LAG(event_type) OVER w AS prev_type,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
"""


def q_order_priority_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation + semi-join (EXISTS) coverage."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    with_li = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    return with_li.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


SQL_ORDER_PRIORITY_DISTINCT = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# skew-proof per-user sequencing: every event-cardinality window partitions
# on (user_id, time-bucket), so a pathological user (10⁹ events at 100 TB)
# is chopped by time instead of serializing into one reducer sort; the only
# user_id-alone windows run over BUCKET SUMMARIES (one row per active
# (user, bucket) — time-range-bounded). Null-ts rows sort into a terminal
# bucket via usk = coalesce(micros, 2^62), which reproduces the original
# (ts ASC NULLS LAST, event_id) total order exactly.
# ---------------------------------------------------------------------------
SEQ_BUCKET_US = 3_600_000_000  # 1 hour, matching the as-of bucketing
_NULL_TS_USK = 1 << 62


def _wib():
    """Event-grain IN-BUCKET window: chopped by time, never user-alone.
    (Built lazily — Window specs need an active session.)"""
    return Window.partitionBy("user_id", "bk").orderBy("usk", "event_id")


def _wcar():
    """Bucket-summary CARRY window: user-alone over summary rows only."""
    return Window.partitionBy("user_id").orderBy("bk")


def _bucketed_events(ev: DataFrame, *cols: str) -> DataFrame:
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    usk = F.coalesce(us, F.lit(_NULL_TS_USK))
    return ev.select("user_id", "event_id", "ts", *cols, usk.alias("usk")).withColumn(
        "bk", F.floor(F.col("usk") / F.lit(float(SEQ_BUCKET_US)))
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30-min inactivity) over the event stream,
    with the skew-proof two-level plan: in-bucket lag/running-sum windows on
    (user_id, time-bucket), and session state crossing bucket boundaries
    via a per-bucket summary carry (first/last ts + in-bucket boundary
    count), so the per-user windows are bucket-summary-grain only. A
    session id = (boundaries in all earlier buckets) + (running boundary
    count inside the bucket), where the bucket's first event re-derives its
    boundary flag from the previous non-empty bucket's last ts — exactly
    the single-window lag semantics, including the asymmetric null rule
    (`prev_ts IS NULL OR gap > 30min`): a row after a null-ts row opens a
    session, a null-ts row after a real one does not.
    The oracle is the plain single-window DuckDB SQL — two plans, one
    truth. The batch formulation of what Structured Streaming's session
    window does with state."""
    GAP_US = 1800 * 1000000
    e = _bucketed_events(load(spark, sf_dir, "events"), "value")
    wib = _wib()
    e2 = e.withColumn("prev_ts", F.lag("ts").over(wib)).withColumn(
        "rn", F.row_number().over(wib)
    )
    gap_us = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    # in-bucket boundary for rows 2..n, replicating the single-window rule
    # `prev_ts IS NULL OR gap > 30min`: a row FOLLOWING a null-ts row
    # always opens a session (prev_ts null), while a null-ts row following
    # a real one does not (NULL gap falls to otherwise(0))
    e2 = e2.withColumn(
        "inflag",
        F.when(
            (F.col("rn") > 1)
            & (F.col("prev_ts").isNull() | (gap_us > GAP_US)),
            1,
        ).otherwise(0),
    ).persist()  # feeds the bucket-summary agg AND the final join
    summ = e2.groupBy("user_id", "bk").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum("inflag").alias("inb"),
    )
    wcar = _wcar()
    cross_gap = F.expr("timestampdiff(MICROSECOND, prev_last_ts, first_ts)")
    csum = (
        summ.withColumn("prev_bk", F.lag("bk").over(wcar))
        .withColumn("prev_last_ts", F.lag("last_ts").over(wcar))
        .withColumn(
            "first_flag",
            F.when(F.col("prev_bk").isNull(), 1)
            # defensive mirror of the in-bucket rule (a null-ts last event
            # can only occur in the terminal bucket, which nothing follows)
            .when(F.col("prev_last_ts").isNull(), 1)
            .when(cross_gap > GAP_US, 1)
            .otherwise(0),
        )
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum(F.col("inb") + F.col("first_flag")).over(
                    wcar.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("user_id", "bk", "first_flag", "cum_before")
    )
    sess = e2.join(csum, ["user_id", "bk"]).withColumn(
        "session_seq",
        F.col("cum_before")
        + F.sum(
            F.when(F.col("rn") == 1, F.col("first_flag")).otherwise(F.col("inflag"))
        ).over(wib.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', min(ts)) div 1000000"
        ).alias("session_start_epoch"),
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', max(ts)) div 1000000"
        ).alias("session_end_epoch"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


SQL_EVENTS_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR date_diff('microsecond', LAG(ts) OVER w, ts) > 1800 * 1000000
              THEN 1 ELSE 0 END AS boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
),
sess AS (
  SELECT *, SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch,
       CAST(floor(epoch(MAX(ts))) AS BIGINT) AS session_end_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM sess GROUP BY user_id, session_seq
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]  # fixed domain


def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix (explicit value list keeps
    the plan a single two-phase aggregate — no extra distinct pass)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count().na.fill(0)


SQL_EVENT_TYPE_PIVOT = "SELECT user_id,\n" + ",\n".join(
    f"  COUNT(*) FILTER (WHERE event_type = '{t}') AS \"{t}\"" for t in _EVENT_TYPES
) + "\nFROM events GROUP BY user_id"


def q_lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (returnflag, linestatus)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


SQL_LINEITEM_CUBE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_custkeys_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers with orders INTERSECT/EXCEPT customers
    whose orders have lineitems."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    with_orders = orders.select("o_custkey")
    with_items = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_custkey")
    )
    both = with_orders.intersect(with_items).withColumn("relation", F.lit("both"))
    # subtract = EXCEPT DISTINCT (set semantics, matching the SQL EXCEPT);
    # exceptAll would be multiset difference and misclassify customers
    # whose order counts differ between the two sides
    only_orders = with_orders.subtract(with_items).withColumn(
        "relation", F.lit("orders_only")
    )
    return both.unionByName(only_orders).withColumnRenamed("o_custkey", "custkey")


SQL_CUSTKEYS_SETOPS = """
SELECT custkey, 'both' AS relation FROM (
  SELECT o_custkey AS custkey FROM orders
  INTERSECT
  SELECT o_custkey FROM orders WHERE EXISTS
    (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
)
UNION ALL
SELECT custkey, 'orders_only' AS relation FROM (
  SELECT DISTINCT o_custkey AS custkey FROM orders
  EXCEPT
  SELECT o_custkey FROM orders WHERE EXISTS
    (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
)
"""


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: the events.props JSON string parsed
    with an EXPLICIT schema (from_json — one typed parse, JVM-side; schema
    inference or repeated get_json_object calls re-parse per access) and
    aggregated. At 100 TB the parse cost is the scan cost — keep it single-
    pass and typed."""
    ev = load(spark, sf_dir, "events")
    k = F.from_json("props", "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("null_k"),
        )
    )


SQL_EVENTS_JSON_PROPS = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k, MAX(k) AS max_k,
       COUNT(CASE WHEN k IS NULL THEN 1 END) AS null_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
GROUP BY event_type
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join coverage (the semi-join twin of order_priority_distinct):
    customers that never placed an URGENT order, counted per market
    segment. The filter lives on the anti-join build side, so it prunes
    before the join."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    no_urgent = cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    )
    return no_urgent.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.min("c_custkey").alias("min_custkey"),
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment, COUNT(*) AS n_customers, MIN(c_custkey) AS min_custkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def q_events_minutely_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill: per-minute event counts per type
    over the FULL observed range, empty minutes materialized as zero rows.
    The dense axis comes from sequence+explode of the (broadcast) global
    min/max — no driver-side loop; integer minute buckets keep it TZ-proof."""
    ev = load(spark, sf_dir, "events")
    bucket = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 60000000"
    )
    counts = ev.select(bucket.alias("minute_bucket"), "event_type").groupBy(
        "minute_bucket", "event_type"
    ).agg(F.count("*").alias("n"))
    bounds = ev.agg(
        F.min(bucket).alias("lo"), F.max(bucket).alias("hi")
    )
    types = ev.select("event_type").distinct()
    axis = (
        bounds.select(F.explode(F.sequence("lo", "hi")).alias("minute_bucket"))
        .crossJoin(F.broadcast(types))
    )
    return axis.join(counts, ["minute_bucket", "event_type"], "left").select(
        "minute_bucket",
        "event_type",
        F.coalesce("n", F.lit(0)).alias("n"),
    )


SQL_EVENTS_MINUTELY_GAPFILL = """
WITH b AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 60 AS minute_bucket, event_type
  FROM events
),
counts AS (
  SELECT minute_bucket, event_type, COUNT(*) AS n FROM b GROUP BY 1, 2
),
axis AS (
  SELECT UNNEST(range((SELECT MIN(minute_bucket) FROM b),
                      (SELECT MAX(minute_bucket) FROM b) + 1)) AS minute_bucket
)
SELECT a.minute_bucket, t.event_type, COALESCE(c.n, 0) AS n
FROM axis a
CROSS JOIN (SELECT DISTINCT event_type FROM events) t
LEFT JOIN counts c
  ON c.minute_bucket = a.minute_bucket AND c.event_type = t.event_type
"""


# Authored WITH {placeholders} (one SQL text, two bindings): the Spark
# path hands the template to spark.sql(...) whose formatter substitutes
# the parameter DataFrames for {lineitem} etc.; the DuckDB oracle formats
# the same template with bare table names. No whitespace-sensitive
# reverse-engineering of placeholders by string replace — a reformat of
# the SQL cannot silently leave an unresolvable bare name (round-6 advice).
_Q5_TABLES = ("customer", "orders", "lineitem", "supplier", "nation", "region")

_Q5_SQL_TMPL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM {lineitem}
JOIN {orders}   ON l_orderkey  = o_orderkey
JOIN {customer} ON o_custkey   = c_custkey
JOIN {supplier} ON l_suppkey   = s_suppkey
JOIN {nation}   ON s_nationkey = n_nationkey
JOIN {region}   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

_Q5_SQL = _Q5_SQL_TMPL.format(**{t: t for t in _Q5_TABLES})


def q_events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: one pass over events
    producing BOTH the hourly and the daily rollup per event_type via
    GROUPING SETS — at 100 TB this is one shuffle instead of two jobs, and
    the partial aggregation is shared map-side. Grain buckets are integer
    epoch hours/days (engine-agnostic, TZ-proof); NULL grain + grouping
    ids distinguish the sets."""
    ev = load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    base = ev.select(
        "event_type",
        F.floor(us / F.lit(3600.0 * 1e6)).alias("epoch_hour"),
        F.floor(us / F.lit(86400.0 * 1e6)).alias("epoch_day"),
        "value",
    )
    # parameterized SQL (the frame substitutes as {base}) — no session-
    # global temp view, so concurrent invocations on one SparkSession
    # cannot race on a shared name
    return spark.sql(
        """
        SELECT event_type, epoch_hour, epoch_day,
               CAST(grouping(epoch_hour) AS INT) AS is_daily,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM {base}
        GROUP BY event_type, GROUPING SETS ((epoch_hour), (epoch_day))
        """,
        base=base,
    )


SQL_EVENTS_TIME_ROLLUP = """
WITH base AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / (3600.0 * 1000000)) AS BIGINT) AS epoch_hour,
         CAST(floor(epoch_us(ts) / (86400.0 * 1000000)) AS BIGINT) AS epoch_day,
         value
  FROM events
)
SELECT event_type, epoch_hour, epoch_day,
       -- GROUPING(), not `epoch_hour IS NULL`: a NULL-ts event would make
       -- the hourly set's NULL grain masquerade as the daily row otherwise
       CAST(GROUPING(epoch_hour) AS INT) AS is_daily,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM base
GROUP BY GROUPING SETS ((event_type, epoch_hour), (event_type, epoch_day))
"""


N_HIST_BANDS = 20


def q_lineitem_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of extended prices: the OLAP profiling
    primitive. Two passes — a 1-row (min, max) aggregate broadcast back,
    then a map-side band assignment + hash count. Band edges use one
    literal-identical double expression in both engines (floor of the
    scaled offset, top value clamped into the last band), so bucketing is
    bit-deterministic."""
    li = load(spark, sf_dir, "lineitem")
    ext = li.select(F.col("l_extendedprice").cast("double").alias("p"))
    mm = ext.agg(F.min("p").alias("lo"), F.max("p").alias("hi"))
    # hi == lo (constant column) would make the band 0/0 = NaN, which the
    # two engines cast/clamp differently — route the degenerate case to
    # band 0 explicitly
    band = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor(
                (F.col("p") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / F.lit(float(N_HIST_BANDS)))
            ).cast("int"),
            F.lit(N_HIST_BANDS - 1),
        )
    )
    return (
        ext.crossJoin(F.broadcast(mm))
        .select(band.alias("band"), "lo", "hi")
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.first("lo") + F.col("band") * ((F.first("hi") - F.first("lo")) / N_HIST_BANDS),
                6,
            ).alias("band_lo"),
        )
        .select("band", "band_lo", "n_items")
    )


SQL_LINEITEM_PRICE_HISTOGRAM = f"""
WITH ext AS (SELECT CAST(l_extendedprice AS DOUBLE) AS p FROM lineitem),
mm AS (SELECT MIN(p) AS lo, MAX(p) AS hi FROM ext),
banded AS (
  SELECT CASE WHEN hi = lo THEN 0
              ELSE least(CAST(floor((p - lo) / ((hi - lo) / {N_HIST_BANDS}.0)) AS INT),
                         {N_HIST_BANDS - 1}) END AS band,
         lo, hi
  FROM ext, mm
)
SELECT band,
       round(MIN(lo) + band * ((MIN(hi) - MIN(lo)) / {N_HIST_BANDS}), 6) AS band_lo,
       COUNT(*) AS n_items
FROM banded GROUP BY band
"""


def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition counts (the Markov-chain / funnel
    diagnostic): per user, each consecutive (prev → curr) pair counted
    corpus-wide, plus the row-conditional probability. Skew-proof shape:
    the event-grain lag window partitions on (user_id, time-bucket); the
    first event of each bucket takes its predecessor from the previous
    non-empty bucket's last event via a bucket-summary carry (hash agg +
    one lag over summary rows), so no event-cardinality window keys on
    user_id alone. Probability = count / row total via a broadcast of the
    per-prev totals; the oracle stays the plain single-window SQL."""
    # persist: e feeds the bucket-summary aggregation AND the in-bucket
    # lag/row_number windows
    e = _bucketed_events(load(spark, sf_dir, "events"), "event_type").persist()
    wib = _wib()
    # per (user, bucket): the LAST event's type — a hash aggregation
    # (lexicographic struct max on (usk, event_id), no sort), then the
    # cross-bucket carry as a lag over the bucket-summary frame
    summ = e.groupBy("user_id", "bk").agg(
        F.max(F.struct("usk", "event_id", "event_type")).alias("last_ev")
    )
    wcar = _wcar()
    carried = summ.withColumn(
        "carry_type", F.lag(F.col("last_ev.event_type")).over(wcar)
    ).select("user_id", "bk", "carry_type")
    e2 = (
        e.withColumn("rn", F.row_number().over(wib))
        .withColumn("lag_in", F.lag("event_type").over(wib))
        .join(carried, ["user_id", "bk"])
    )
    prev_type = F.when(F.col("rn") == 1, F.col("carry_type")).otherwise(
        F.col("lag_in")
    )
    pairs = (
        e2.select(prev_type.alias("prev_type"), F.col("event_type").alias("next_type"))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("row_total"), 6).alias(
                "p_next"
            ),
        )
    )


SQL_EVENTS_TRANSITION_MATRIX = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
           AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
totals AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_total FROM pairs GROUP BY prev_type)
SELECT p.prev_type, p.next_type, p.n,
       round(CAST(p.n AS DOUBLE) / t.row_total, 6) AS p_next
FROM pairs p JOIN totals t USING (prev_type)
"""


def q_events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume anomaly score per event type: z = (count − mean)/std
    over that type's daily counts. Float determinism across engines comes
    from EXACT integer sums (Σcnt, Σcnt² in BIGINT — order-free), then one
    literal-identical double expression for mean/var/z in both engines; a
    stddev_samp aggregate would depend on partial-agg order. Two hash aggs
    + a broadcast of the per-type stats (one row per type)."""
    ev = load(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    daily = ev.select(
        "event_type", F.floor(us / F.lit(86400.0 * 1e6)).alias("epoch_day")
    ).groupBy("event_type", "epoch_day").agg(F.count("*").alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    mean = F.col("s").cast("double") / F.col("n_days").cast("double")
    var = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("n_days").cast("double")
    ) / (F.col("n_days").cast("double") - 1.0)
    z = (F.col("cnt").cast("double") - mean) / F.sqrt(var)
    return j.select(
        "event_type",
        "epoch_day",
        "cnt",
        F.when((F.col("n_days") > 1) & (var > 0), F.round(z, 6)).alias("zscore"),
    )


SQL_EVENTS_DAILY_ANOMALY = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / (86400.0 * 1000000)) AS BIGINT) AS epoch_day,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, COUNT(*) AS n_days,
         CAST(SUM(cnt) AS BIGINT) AS s,
         CAST(SUM(cnt * cnt) AS BIGINT) AS s2
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.epoch_day, d.cnt,
       CASE WHEN n_days > 1
             AND (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                    / CAST(n_days AS DOUBLE)) / (CAST(n_days AS DOUBLE) - 1.0) > 0
            THEN round((CAST(cnt AS DOUBLE)
                        - CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
                       / sqrt((CAST(s2 AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                 / CAST(n_days AS DOUBLE))
                              / (CAST(n_days AS DOUBLE) - 1.0)), 6)
       END AS zscore
FROM daily d JOIN stats USING (event_type)
"""


def q_returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-items report: revenue lost to returns per
    customer, top 20. The 4-table shape: lineitem filtered to returns at
    the SCAN (pushdown) ⋈ orders (the one real shuffle) ⋈ customer ⋈
    nation — both dims broadcast. Revenue in exact decimal, top-k ordered
    by (revenue desc, custkey) so cross-engine order is total."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("lost_revenue"),
            F.count("*").alias("n_returned_items"),
        )
    )
    return rev.orderBy(F.desc("lost_revenue"), F.asc("c_custkey")).limit(20)


SQL_RETURNED_ITEMS_REPORT = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS lost_revenue,
       COUNT(*) AS n_returned_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_regional_revenue_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier revenue, submitted through the
    spark.sql() TEXT entry path — the SQL API surface, same Catalyst plan
    as the DataFrame build (6-way join, dims broadcast by AQE,
    decimal-exact sums). The frames substitute as PARAMETERS
    (``spark.sql(q, lineitem=df, ...)``, the q_events_time_rollup
    pattern), not session-global temp views, so concurrent invocations on
    one SparkSession cannot race on a shared name. The oracle is the
    same statement over DuckDB's named views — one SQL text, two engines
    (``_Q5_SQL_TMPL``'s placeholders bind to frames here, to bare table
    names in the oracle)."""
    frames = {t: load(spark, sf_dir, t) for t in _Q5_TABLES}
    return spark.sql(_Q5_SQL_TMPL, **frames)


def q_events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation for a HOT grouping key: events has only
    5 event_type values, so a direct groupBy concentrates each group's
    entire partial state on one reducer. Phase 1 groups by (key, salt) — 16
    uniform md5-derived shards per hot key — phase 2 merges the shards.
    Equivalent by algebra to the direct groupBy (the oracle), but the big
    shuffle fans out over 5x16 reducers instead of 5.

    The exact-distinct leg deliberately does NOT ride the salted shards:
    merging per-shard ``collect_set`` arrays would materialize the union of
    ALL distinct users of a hot key as ONE array on ONE row (gigabytes at
    10^8 users — executor OOM). Instead it is a two-level distinct: level 1
    dedups on (event_type, user_id) — the shuffle key includes user_id, so
    it is uniform and the per-row state is a bare key — level 2 counts the
    survivors with ordinary map-side partial counts. Both legs are
    shuffle-safe at any key skew; the join that recombines them is on the
    5-row post-aggregate frames."""
    from pdfplucker_spark.functions.hashing import md5_long

    ev = load(spark, sf_dir, "events")
    salt = (md5_long(F.col("event_id").cast("string")) % 16).alias("salt")
    phase1 = (
        ev.select("event_type", "value", salt)
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        )
    )
    merged = phase1.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.sum("pv").cast("double").alias("total_value"),
    )
    # COUNT(DISTINCT user_id) semantics: NULL user_ids never count, and a
    # group whose users are ALL null still appears with n_users = 0 — hence
    # the not-null filter and the LEFT join + coalesce (an inner join would
    # drop such a group while the oracle's GROUP BY keeps it).
    n_users = (
        ev.where(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").cast("int").alias("n_users"))
    )
    # null-safe equality: a NULL event_type group must still pick up its
    # distinct-user count (SQL GROUP BY groups nulls together)
    return (
        merged.alias("m")
        .join(n_users.alias("u"), F.expr("m.event_type <=> u.event_type"), "left")
        .select(
            F.col("m.event_type").alias("event_type"),
            "n_events",
            "total_value",
            F.coalesce("u.n_users", F.lit(0)).alias("n_users"),
        )
    )


SQL_EVENTS_SALTED_AGG = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       CAST(COUNT(DISTINCT user_id) AS INT) AS n_users
FROM events GROUP BY event_type
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase, strictly increasing event
    time per user): stage N counts users whose earliest stage-N event
    happens AFTER their earliest qualifying stage-(N-1) event. Each stage
    is one filter + min-aggregate + a user-keyed join (uniform key, partial
    aggregation shrinks every shuffle) — no window over the full event
    stream, no per-user event ordering materialized."""
    ev = load(spark, sf_dir, "events")

    def stage(kind: str, prev: DataFrame | None, prev_col: str, out: str) -> DataFrame:
        s = ev.where(F.col("event_type") == kind)
        if prev is not None:
            s = s.join(prev, "user_id").where(F.col("ts") > F.col(prev_col))
        return s.groupBy("user_id").agg(F.min("ts").alias(out))

    # u1/u2 each feed TWO consumers (their own count row and the next
    # stage's join) — persist per CLAUDE.md's multi-consumer invariant so
    # the events scan + aggregation run once per stage, not per consumer
    u1 = stage("view", None, "", "t1").persist()
    u2 = stage("click", u1, "t1", "t2").persist()
    u3 = stage("purchase", u2, "t2", "t3")
    rows = None
    for name, df in (("1_view", u1), ("2_click", u2), ("3_purchase", u3)):
        r = df.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


SQL_EVENTS_FUNNEL = """
WITH u1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
u2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN u1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > u1.t1
  GROUP BY e.user_id
),
u3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN u2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > u2.t2
  GROUP BY e.user_id
)
SELECT '1_view' AS stage, COUNT(*) AS n_users FROM u1
UNION ALL SELECT '2_click', COUNT(*) FROM u2
UNION ALL SELECT '3_purchase', COUNT(*) FROM u3
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users cohorted by the epoch-week of their
    FIRST event; each later active week counts them at its week offset.
    Two hash aggregations + one user-keyed join; week ids are integer
    epoch-week — FLOOR(micros / week_micros) in both engines, never the
    truncate-toward-zero `div` (which would disagree with the oracle's
    floor for pre-1970 timestamps). Double math is exact here: |micros|
    < 2^53 for any timestamp within ±250 years of the epoch."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.floor(
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
            / F.lit(604800000000.0)
        ).alias("wk"),
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        e.join(first, "user_id")
        .groupBy("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


SQL_EVENTS_RETENTION = """
WITH e AS (
  SELECT user_id,
         CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 604800000000) AS BIGINT) AS wk
  FROM events
),
first AS (SELECT user_id, MIN(wk) AS cohort_week FROM e GROUP BY user_id)
SELECT cohort_week, wk - cohort_week AS week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users
FROM e JOIN first USING (user_id)
GROUP BY 1, 2
"""


def q_events_daily_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily value totals per event_type with a 7-day moving average — the
    sliding-frame window shape (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    the window coverage was missing. Day ids are integer epoch-days
    (FLOOR, engine-agnostic); window sums stay in DECIMAL (exact at any
    frame order) with one double division at the end. The window
    partitions on event_type and orders on the unique (event_type, day)
    key, so frame contents are deterministic."""
    ev = load(spark, sf_dir, "events")
    day = F.floor(
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
        / F.lit(86400000000.0)
    ).alias("day")
    daily = (
        ev.select("event_type", day, F.col("value").cast("decimal(18,6)").alias("v"))
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("dsum"), F.count("*").alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "event_type",
        "day",
        "n_events",
        F.col("dsum").cast("double").alias("daily_value"),
        F.round(
            F.sum("dsum").over(w).cast("double") / F.count("*").over(w), 6
        ).alias("ma7_value"),
    )


SQL_EVENTS_DAILY_MA = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000) AS BIGINT) AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS dsum,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n_events,
       CAST(dsum AS DOUBLE) AS daily_value,
       round(CAST(SUM(dsum) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 6) AS ma7_value
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


QUERIES = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "events_funnel": (q_events_funnel, SQL_EVENTS_FUNNEL),
    "events_retention": (q_events_retention, SQL_EVENTS_RETENTION),
    "events_daily_ma": (q_events_daily_ma, SQL_EVENTS_DAILY_MA),
    "regional_revenue_sql": (q_regional_revenue_sql, _Q5_SQL),
    "events_salted_agg": (q_events_salted_agg, SQL_EVENTS_SALTED_AGG),
    "events_json_props": (q_events_json_props, SQL_EVENTS_JSON_PROPS),
    "customers_without_orders": (
        q_customers_without_orders,
        SQL_CUSTOMERS_WITHOUT_ORDERS,
    ),
    "events_minutely_gapfill": (
        q_events_minutely_gapfill,
        SQL_EVENTS_MINUTELY_GAPFILL,
    ),
    "events_sessionize": (q_events_sessionize, SQL_EVENTS_SESSIONIZE),
    "event_type_pivot": (q_event_type_pivot, SQL_EVENT_TYPE_PIVOT),
    "lineitem_cube": (q_lineitem_cube, SQL_LINEITEM_CUBE),
    "custkeys_setops": (q_custkeys_setops, SQL_CUSTKEYS_SETOPS),
    "returnflag_rollup": (q_returnflag_rollup, SQL_RETURNFLAG_ROLLUP),
    "top_orders": (q_top_orders, SQL_TOP_ORDERS),
    "returned_items_report": (q_returned_items_report, SQL_RETURNED_ITEMS_REPORT),
    "events_time_rollup": (q_events_time_rollup, SQL_EVENTS_TIME_ROLLUP),
    "events_daily_anomaly": (q_events_daily_anomaly, SQL_EVENTS_DAILY_ANOMALY),
    "lineitem_price_histogram": (
        q_lineitem_price_histogram,
        SQL_LINEITEM_PRICE_HISTOGRAM,
    ),
    "events_transition_matrix": (
        q_events_transition_matrix,
        SQL_EVENTS_TRANSITION_MATRIX,
    ),
    "regional_supply": (q_regional_supply, SQL_REGIONAL_SUPPLY),
    "events_window": (q_events_window, SQL_EVENTS_WINDOW),
    "order_priority_distinct": (q_order_priority_distinct, SQL_ORDER_PRIORITY_DISTINCT),
}
