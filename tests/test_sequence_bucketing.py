"""The skew-proof (user, time-bucket) rewrites of the per-user sequence
operators must be bit-equal to the plain single-window formulation — on the
real corpus and on a crafted corpus that hits every carry edge: gaps that
cross bucket boundaries, a boundary exactly at the threshold, equal-ts
ties, null-ts rows (which sort last and never open a boundary), empty
buckets between events, and a single-event user."""

import datetime as dt

from pyspark.sql import Row, Window, functions as F

from pdfplucker_spark.operators.relational import (
    q_events_sessionize,
    q_events_transition_matrix,
    q_events_window,
)

SF = "/root/testdata/sf0.001"


def _reference_sessionize(ev):
    """The original single-window formulation (the oracle's shape)."""
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc("event_id")
    )
    prev = F.lag("ts").over(w)
    sess = ev.withColumn("prev_ts", prev)
    gap_us = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    boundary = F.when(
        F.col("prev_ts").isNull() | (gap_us > 1800 * 1000000), 1
    ).otherwise(0)
    sess = sess.withColumn(
        "session_seq",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)),
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


def _reference_transitions(ev):
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc("event_id")
    )
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return pairs.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("row_total"), 6).alias("p_next"),
    )


def _edge_corpus(spark, path):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    H = 3600
    rows = [
        # user 1: two in-bucket events, then a >30min gap INSIDE a bucket,
        # then a <=30min gap ACROSS a bucket boundary (same session
        # continues into the next hour), then a >30min gap across several
        # EMPTY buckets (new session)
        Row(event_id=1, ts=at(0), user_id=1, event_type="view", value=1.0, props=None),
        Row(event_id=2, ts=at(10), user_id=1, event_type="click", value=2.0, props=None),
        Row(event_id=3, ts=at(2000), user_id=1, event_type="view", value=3.0, props=None),
        Row(event_id=4, ts=at(H - 10), user_id=1, event_type="click", value=4.0, props=None),
        Row(event_id=5, ts=at(H + 10), user_id=1, event_type="purchase", value=5.0, props=None),
        Row(event_id=6, ts=at(5 * H), user_id=1, event_type="view", value=6.0, props=None),
        # gap EXACTLY 30min: NOT a boundary (strict >), across a bucket edge
        Row(event_id=7, ts=at(5 * H + 1800), user_id=1, event_type="click", value=7.0, props=None),
        # user 2: equal-ts tie broken by event_id, then null-ts rows which
        # sort last and never open a boundary
        Row(event_id=10, ts=at(100), user_id=2, event_type="view", value=1.0, props=None),
        Row(event_id=11, ts=at(100), user_id=2, event_type="click", value=1.0, props=None),
        Row(event_id=13, ts=None, user_id=2, event_type="view", value=9.0, props=None),
        Row(event_id=12, ts=None, user_id=2, event_type="purchase", value=8.0, props=None),
        # user 3: single event
        Row(event_id=20, ts=at(7 * H + 42), user_id=3, event_type="view", value=2.5, props=None),
        # user 4: leading NULL values (running sum must stay NULL until the
        # first non-null), crossing a bucket edge
        Row(event_id=30, ts=at(200), user_id=4, event_type="view", value=None, props=None),
        Row(event_id=31, ts=at(300), user_id=4, event_type="click", value=None, props=None),
        Row(event_id=32, ts=at(H + 400), user_id=4, event_type="view", value=3.5, props=None),
        Row(event_id=33, ts=at(H + 500), user_id=4, event_type="purchase", value=None, props=None),
    ]
    schema = (
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{path}/events.parquet"
    )


def _assert_frames_equal(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
        sorted(map(tuple, a.collect())),
        sorted(map(tuple, b.collect())),
    )


def test_sessionize_bucketed_matches_single_window(spark, tmp_path):
    _edge_corpus(spark, str(tmp_path))
    ev = spark.read.parquet(f"{tmp_path}/events.parquet")
    _assert_frames_equal(q_events_sessionize(spark, str(tmp_path)), _reference_sessionize(ev))
    sf_ev = spark.read.parquet(f"{SF}/events.parquet")
    _assert_frames_equal(q_events_sessionize(spark, SF), _reference_sessionize(sf_ev))


def test_transitions_bucketed_matches_single_window(spark, tmp_path):
    _edge_corpus(spark, str(tmp_path))
    ev = spark.read.parquet(f"{tmp_path}/events.parquet")
    _assert_frames_equal(
        q_events_transition_matrix(spark, str(tmp_path)), _reference_transitions(ev)
    )
    sf_ev = spark.read.parquet(f"{SF}/events.parquet")
    _assert_frames_equal(
        q_events_transition_matrix(spark, SF), _reference_transitions(sf_ev)
    )


def test_no_event_grain_window_keys_on_user_alone(spark):
    """REGISTRY-WIDE (round-6 extension): across every registered batch
    query, every window spec that mentions user_id must also mention bk —
    either as a partition key (the event-grain in-bucket windows) or as
    the order key (the user-alone carry windows, which run over the
    bucket-summary frame — per-user rows there are time-range-bounded,
    never event-bounded). A reintroduced user_id-alone event-grain
    window (partition user_id, order ts/usk) would produce a spec with
    user_id and NO bk and fail here. The three sequence ops must
    additionally HAVE window specs (the regex can't silently go blind)."""
    import re

    from pdfplucker_spark.registry import all_queries

    must_have_specs = {
        "events_sessionize",
        "events_transition_matrix",
        "events_window",
    }
    # SPECIFIC names only (round-7 narrowing — the old blanket prefixes
    # would silently exempt any future operator registered under them):
    # the streaming queries drain real StreamingQueries at invocation,
    # the Lloyd-fit family runs tens of Spark jobs during plan
    # CONSTRUCTION, and the connected-components pair runs iterative
    # min-label-propagation fixpoint loops (join + aggregate + count
    # action per round) at plan-construction time — minutes of work for a
    # regex that cannot match (none reads events). Everything else —
    # including every current and future docs_/dedup_/text_/media_/
    # extract_ name — is swept.
    skip = {
        "stream_windowed_counts",
        "stream_dedup_exact",
        "stream_click_purchase_join",
        "stream_sessionize",
        "stream_extract",
        "stream_user_running_totals",
        "stream_dedup_incremental",
        "stream_decontaminate_incremental",
        "sim_kmeans_fit",
        "sim_semdedup",
        "sim_semdedup_sampled",
        "sim_semdedup_k16",
        "dedup_clusters",
        "dedup_simhash_clusters",
        "docs_winnow_clusters",
        "sim_dup_clusters",
    }
    reg = all_queries()
    assert skip <= set(reg), skip - set(reg)  # a renamed op can't hide here
    checked = 0
    for name, (q, _sql) in reg.items():
        if name in skip:
            continue
        plan = q(spark, SF)._jdf.queryExecution().executedPlan().toString()
        specs = re.findall(r"windowspecdefinition\((.*?)\)", plan)
        if name in must_have_specs:
            assert specs, plan[:2000]
            assert "Aggregate" in plan  # bucket-summary agg exists
        bad = [s for s in specs if "user_id" in s and "bk" not in s]
        assert not bad, (name, bad)
        checked += 1
        # operators persist() multi-consumer intermediates (sweep invariant)
        spark.catalog.clearCache()
    # the sweep is genuinely registry-wide: every registered plan except
    # the 16 named drain/fit/fixpoint queries
    assert checked == len(reg) - len(skip) and checked >= 88, checked


def test_main_content_chunked_assembly_matches_and_bounds_buffers(spark, tmp_path):
    """The two-level (doc_id, chunk) assembly must be byte-identical to the
    single collect_list formulation on a corpus with a giant doc far above
    the chunk width, and the plan must aggregate on (doc_id, ck) first."""
    from pdfplucker_spark.operators.spans_sql import (
        MAIN_CONTENT_CHUNK,
        MAIN_CONTENT_KINDS,
        q_spans_main_content,
    )
    from pdfplucker_spark.sources.tables import derived_spans_flat

    # one giant (~6 chunks of spans) + two small docs + an empty-text doc
    giant = " ".join(f"w{i}" for i in range(6 * MAIN_CONTENT_CHUNK + 123))
    rows = [
        Row(doc_id=1, text=giant, lang="en", source="s", n_chars=len(giant)),
        Row(doc_id=2, text="alpha beta gamma delta", lang="en", source="s", n_chars=22),
        Row(doc_id=3, text="solo", lang="en", source="s", n_chars=4),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    sp = derived_spans_flat(spark, str(tmp_path))
    is_main = F.col("kind").isin(*MAIN_CONTENT_KINDS)
    flagged = sp.select(
        "doc_id", "offset", "text", is_main.alias("m"), F.length("text").alias("len")
    )
    total_len = F.sum(F.coalesce("len", F.lit(0)))
    main_len = F.sum(
        F.when(F.col("m") & F.col("len").isNotNull(), F.col("len")).otherwise(0)
    )
    single = flagged.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("m") & F.col("text").isNotNull(),
                            F.struct("offset", "text"),
                        )
                    )
                ),
                lambda x: x["text"],
            ),
        ).alias("main_text"),
        F.sum(F.when(F.col("m"), 1).otherwise(0)).alias("n_main_spans"),
        F.sum(F.when(~F.col("m"), 1).otherwise(0)).alias("n_furniture_spans"),
        F.when(total_len > 0, F.round(main_len.cast("double") / total_len, 6)).alias(
            "content_ratio"
        ),
    )
    chunked = q_spans_main_content(spark, str(tmp_path))
    _assert_frames_equal(chunked, single)
    plan = chunked._jdf.queryExecution().executedPlan().toString()
    assert "ck" in plan and plan.count("ObjectHashAggregate") >= 2, plan[:2000]


def _reference_window(ev):
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc("event_id")
    )
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(run)
        .cast("double")
        .alias("running_value"),
    )


def test_events_window_bucketed_matches_single_window(spark, tmp_path):
    _edge_corpus(spark, str(tmp_path))
    ev = spark.read.parquet(f"{tmp_path}/events.parquet")
    _assert_frames_equal(q_events_window(spark, str(tmp_path)), _reference_window(ev))
    sf_ev = spark.read.parquet(f"{SF}/events.parquet")
    _assert_frames_equal(q_events_window(spark, SF), _reference_window(sf_ev))


def test_bucketed_ops_match_on_random_corpora(spark, tmp_path):
    """Seeded random event corpora (null ts, null values, equal-ts ties,
    bucket-edge gaps): every bucketed rewrite must equal its single-window
    reference. Deterministic RNG — reproducible, no flakes."""
    import random

    t0 = dt.datetime(2024, 3, 1)
    for seed in (7, 23):
        rng = random.Random(seed)
        rows = []
        for eid in range(300):
            ts = (
                None
                if rng.random() < 0.05
                else t0 + dt.timedelta(seconds=rng.randrange(0, 36000))
            )
            rows.append(
                Row(
                    event_id=eid,
                    ts=ts,
                    user_id=rng.randrange(1, 6),
                    event_type=rng.choice(["view", "click", "purchase"]),
                    value=None if rng.random() < 0.1 else round(rng.uniform(0, 50), 3),
                    props=None,
                )
            )
        path = f"{tmp_path}/s{seed}"
        schema = (
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double, props string"
        )
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            f"{path}/events.parquet"
        )
        ev = spark.read.parquet(f"{path}/events.parquet")
        _assert_frames_equal(q_events_sessionize(spark, path), _reference_sessionize(ev))
        _assert_frames_equal(
            q_events_transition_matrix(spark, path), _reference_transitions(ev)
        )
        _assert_frames_equal(q_events_window(spark, path), _reference_window(ev))
