"""Semantic invariants of the round-3 pipeline operators (the oracle gate
checks value equality; these check the operators mean what they claim)."""

from collections import defaultdict

from pyspark.sql import functions as F

from pdfplucker_spark.operators.pipeline import (
    PACK_BUDGET,
    q_docs_pack_shards,
)
from pdfplucker_spark.operators.textstats import q_text_pii_scan

SF = "/root/testdata/sf0.001"


def test_pack_shards_contiguous_budget_fill(spark):
    rows = q_docs_pack_shards(spark, SF).collect()
    assert rows
    shards = defaultdict(list)
    for r in rows:
        # a shard owns exactly the docs that START inside its budget range
        assert r.shard_seq == r.start_offset // PACK_BUDGET
        shards[(r.stream_id, r.shard_seq)].append(r)
    for (stream, seq), docs in shards.items():
        last_seq = max(s for st, s in shards if st == stream)
        if seq < last_seq:
            # every non-final shard is filled to its boundary: its last doc
            # reaches (or straddles) the next shard's start
            end = max(r.start_offset + r.n_tokens for r in docs)
            assert end >= (seq + 1) * PACK_BUDGET, (stream, seq, end)
    # deterministic: a second evaluation packs identically
    again = {r.doc_id: r.shard_seq for r in q_docs_pack_shards(spark, SF).collect()}
    assert all(again[r.doc_id] == r.shard_seq for r in rows)


def test_pack_shards_matches_oracle_at_two_stream_counts(spark):
    """The stream count is a cluster-scaling parameter now, not a constant:
    the packing must stay cross-engine exact at ANY S (oracle SQL built
    from the same value), and shard ids must stay globally unique across
    streams (shard_id = stream·2³² + seq)."""
    import duckdb

    from pdfplucker_spark.operators.pipeline import sql_docs_pack_shards

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    for s in (4, 32):
        got = sorted(
            map(tuple, q_docs_pack_shards(spark, SF, pack_streams=s).collect())
        )
        exp = sorted(map(tuple, con.execute(sql_docs_pack_shards(s)).fetchall()))
        assert got == exp, f"pack_streams={s}"
    rows = q_docs_pack_shards(spark, SF, pack_streams=7).collect()
    assert {r.stream_id for r in rows} == set(range(7))
    assert len({r.shard_id for r in rows}) == len(
        {(r.stream_id, r.shard_seq) for r in rows}
    )


def test_repetition_null_text_matches_oracle(spark, tmp_path):
    """NULL text must score identically in both engines (Spark concat_ws
    maps NULL grams to '' while DuckDB list_distinct strips NULLs — the
    coalesce-first fix makes both see one '' gram → dup_frac 0.0)."""
    import duckdb
    from pyspark.sql import Row

    from pdfplucker_spark.operators.textstats import (
        SQL_TEXT_REPETITION,
        q_text_repetition,
    )

    rows = [
        Row(doc_id=1, text=None, lang="en", source="s", n_chars=0),
        Row(doc_id=2, text="a a a b", lang="en", source="s", n_chars=7),
    ]
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(rows).write.parquet(p)
    got = {
        r.doc_id: (r.dup_2gram_frac, r.dup_3gram_frac)
        for r in q_text_repetition(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    exp = {
        r[0]: (r[1], r[2])
        for r in con.execute(SQL_TEXT_REPETITION).fetchall()
    }
    assert got == exp
    assert got[1] == (0.0, 0.0)  # NULL text: one '' gram, no repetition


def test_retention_pre_epoch_week_bucketing(spark, tmp_path):
    """FLOOR (not truncate-toward-zero) week bucketing: a pre-1970 event
    must land in week -1, matching the oracle's floor()."""
    import duckdb
    from pyspark.sql import Row

    from pdfplucker_spark.operators.relational import (
        SQL_EVENTS_RETENTION,
        q_events_retention,
    )

    rows = [
        (1, "1969-12-28 00:00:00", 1, "view", 1.0, None),
        (2, "1970-01-08 00:00:00", 1, "view", 1.0, None),
    ]
    p = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP_NTZ) ts", "user_id",
        "event_type", "value", "props"
    ).write.parquet(p)
    got = {
        (r.cohort_week, r.week_offset): r.n_active_users
        for r in q_events_retention(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')")
    exp = {
        (r[0], r[1]): r[2] for r in con.execute(SQL_EVENTS_RETENTION).fetchall()
    }
    assert got == exp
    assert set(got) == {(-1, 0), (-1, 2)}  # cohort week -1, active again at +2


def test_pii_scan_detects_exactly_the_injected_contacts(spark):
    rows = q_text_pii_scan(spark, SF).collect()
    assert rows
    hit = [r for r in rows if r.doc_id % 13 == 0]
    clean = [r for r in rows if r.doc_id % 13 != 0]
    assert hit and clean
    assert all(r.n_emails == 1 and r.n_phones == 1 for r in hit)
    assert all(r.n_emails == 0 and r.n_phones == 0 for r in clean)
    # redaction changes the text of hit docs only: their md5 differs from
    # md5(original || injection), i.e. the replace actually fired — proxy:
    # a hit doc's redacted text still hashes differently from a clean doc's
    assert len({r.redacted_md5 for r in rows}) > 1


def test_asof_bucketed_equals_plain_on_pathological_user(spark, tmp_path):
    """The whole point of the bucketed variant: one user owning the entire
    stream. 3000 events across ~80 hour-buckets with sparse purchases —
    the cross-bucket carry (empty buckets, purchase-free bucket runs,
    same-timestamp purchase/event ties) must reproduce the plain window's
    as-of result exactly."""
    from pdfplucker_spark.operators.pipeline import (
        q_events_asof_bucketed,
        q_events_asof_plain,
    )

    rows = []
    for i in range(3000):
        # irregular spacing: clusters + gaps spanning many empty buckets
        t = 1_000_000 + i * 97 + (i % 7) * 13 + (i // 500) * 50_000
        kind = "purchase" if i % 211 == 0 else ("click" if i % 3 else "view")
        rows.append((i, float(t), 42, kind, 1.0, None))
    # a purchase exactly at event i=1's timestamp (97·1 + 13·1 = 110):
    # pins the <= tie semantics across the bucket carry
    rows.append((9001, float(1_000_000 + 110), 42, "purchase", 1.0, None))
    p = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows,
        "event_id long, tsec double, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(timestamp_micros(CAST(tsec * 1000000 AS BIGINT)) AS TIMESTAMP_NTZ) AS ts",
        "user_id", "event_type", "value", "props",
    ).write.parquet(p)
    plain = q_events_asof_plain(spark, str(tmp_path))
    bucketed = q_events_asof_bucketed(spark, str(tmp_path))
    assert plain.exceptAll(bucketed).count() == 0
    assert bucketed.exceptAll(plain).count() == 0
    assert bucketed.count() == 3001


def test_dedup_verdict_one_keeper_per_cluster(spark):
    """The keep-list contract: every doc appears exactly once; each
    cluster keeps exactly one doc; the keeper is the longest text
    (doc_id tie-break); singletons always keep."""
    from pdfplucker_spark.operators.pipeline import q_docs_dedup_verdict
    from pdfplucker_spark.sources.tables import load

    rows = q_docs_dedup_verdict(spark, SF).collect()
    n_docs = load(spark, SF, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    chars = {
        r.doc_id: r.n_chars
        for r in load(spark, SF, "documents").select("doc_id", "n_chars").collect()
    }
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r.cluster_id].append(r)
    for cid, members in by_cluster.items():
        keepers = [r for r in members if r.keep]
        assert len(keepers) == 1, cid
        assert all(r.cluster_size == len(members) for r in members)
        best = min(members, key=lambda r: (-chars[r.doc_id], r.doc_id))
        assert keepers[0].doc_id == best.doc_id, cid
        if len(members) == 1:
            assert keepers[0].keep


def test_asof_bucketed_equals_plain_on_boundary_heavy_random_corpora(spark, tmp_path):
    """Seeded randomized equivalence with timestamps CLUSTERED on hour-bucket
    boundaries (±1 µs and exact) — the carry hand-off points where an
    off-by-one-bucket bug would live. Five corpora, multiple users, purchase
    density varied."""
    import random

    from pdfplucker_spark.operators.pipeline import (
        ASOF_BUCKET_US,
        q_events_asof_bucketed,
        q_events_asof_plain,
    )

    rng = random.Random(41)
    for trial in range(5):
        rows = []
        eid = 0
        for _ in range(200):
            user = rng.randint(1, 4)
            bucket = rng.randint(0, 6)
            jitter = rng.choice([-1, 0, 1, rng.randint(2, ASOF_BUCKET_US - 2)])
            tus = bucket * ASOF_BUCKET_US + (jitter % ASOF_BUCKET_US)
            kind = "purchase" if rng.random() < (0.05 + 0.15 * trial) else "view"
            rows.append((eid, tus, user, kind, 1.0, None))
            eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, tus long, user_id long, event_type string, "
            "value double, props string",
        ).selectExpr(
            "event_id",
            "CAST(timestamp_micros(tus) AS TIMESTAMP_NTZ) AS ts",
            "user_id", "event_type", "value", "props",
        ).write.parquet(f"{tmp_path}/t{trial}/events.parquet")
        plain = q_events_asof_plain(spark, f"{tmp_path}/t{trial}")
        bucketed = q_events_asof_bucketed(spark, f"{tmp_path}/t{trial}")
        diff = plain.exceptAll(bucketed).count() + bucketed.exceptAll(plain).count()
        assert diff == 0, f"trial {trial}: {diff} differing rows"


def test_time_rollup_null_ts_distinguishes_grouping_from_null_grain(spark, tmp_path):
    """A NULL-ts event produces a NULL hourly grain INSIDE the hourly
    grouping set; the oracle must use GROUPING(), not `grain IS NULL`, or
    that row masquerades as the daily rollup. Both engines compared on a
    corpus that actually contains the NULL."""
    import duckdb

    from pdfplucker_spark.operators.relational import (
        SQL_EVENTS_TIME_ROLLUP,
        q_events_time_rollup,
    )

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, None),
        (2, "2024-01-01 11:30:00", 1, "view", 2.0, None),
        (3, None, 1, "view", 4.0, None),  # the NULL-ts event
    ]
    p = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP_NTZ) ts", "user_id",
        "event_type", "value", "props",
    ).write.parquet(p)
    key = lambda t: tuple(map(repr, t))
    got = sorted(
        map(tuple, q_events_time_rollup(spark, str(tmp_path)).collect()), key=key
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')")
    exp = sorted(map(tuple, con.execute(SQL_EVENTS_TIME_ROLLUP).fetchall()), key=key)
    assert got == exp
    # the NULL-grain HOURLY row (is_daily=0) and the NULL-grain DAILY row
    # (is_daily=1) must both exist and stay distinct
    null_hourly = [r for r in got if r[1] is None and r[3] == 0]
    null_daily = [r for r in got if r[2] is None and r[3] == 1 and r[1] is None]
    assert len(null_hourly) == 1 and null_hourly[0][4] == 1
    assert len(null_daily) == 1


def test_incremental_decontaminate_tracks_batch(spark):
    """The batch-vs-standing-index operator must return EXACTLY the
    full-scan operator's rows restricted to batch docs (caps never fire on
    the driver corpora), and its candidate volume must track the batch —
    no train doc outside the deterministic batch slice may appear."""
    from pdfplucker_spark.functions.hashing import md5_long
    from pdfplucker_spark.operators.pipeline import (
        DECONTAM_BATCH_MOD,
        q_docs_decontaminate,
        q_docs_decontaminate_incremental,
    )

    sf = "/root/testdata/sf0.01"
    inc = q_docs_decontaminate_incremental(spark, sf)
    d = spark.read.parquet(f"{sf}/documents.parquet")
    bgate = (
        md5_long(F.concat(F.lit("dbatch:"), F.col("doc_id").cast("string")))
        % DECONTAM_BATCH_MOD
    )
    batch_ids = d.where(bgate == 0).select(F.col("doc_id").alias("train_doc_id"))
    full_restricted = q_docs_decontaminate(spark, sf).join(batch_ids, "train_doc_id")
    assert inc.exceptAll(full_restricted).count() == 0
    assert full_restricted.exceptAll(inc).count() == 0


def test_mix_temperature_flattens_skewed_sources(spark, tmp_path):
    """alpha-sampling contract on a skewed corpus (one source 20x the
    other): keep rates are deterministic, the minority source keeps a
    LARGER fraction than the majority (flattening), rates match the
    closed-form formula, and the overall kept mass tracks the target."""
    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import (
        MIX_TARGET_FRAC,
        MIX_TEMPERATURE,
        q_docs_mix_temperature,
    )

    rows = [
        Row(doc_id=i, text=f"doc {i}", lang="en", source="big", n_chars=10)
        for i in range(2000)
    ] + [
        Row(doc_id=10_000 + i, text=f"doc {i}", lang="en", source="small", n_chars=10)
        for i in range(100)
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    out = q_docs_mix_temperature(spark, str(tmp_path)).collect()
    again = q_docs_mix_temperature(spark, str(tmp_path)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))  # no RNG

    kept = {"big": 0, "small": 0}
    rate = {}
    for r in out:
        kept[r.source] += 1
        rate[r.source] = r.keep_rate
    # closed form: r_s = min(1, t * (n_s^a / sum n^a) * N / n_s)
    import math

    n = {"big": 2000, "small": 100}
    wsum = sum(v**MIX_TEMPERATURE for v in n.values())
    for s, n_s in n.items():
        exp = min(1.0, MIX_TARGET_FRAC * (n_s**MIX_TEMPERATURE / wsum) * 2100 / n_s)
        assert rate[s] == round(exp, 6), (s, rate[s], exp)
    # flattening: the minority source keeps a strictly larger fraction
    assert rate["small"] > rate["big"]
    assert kept["small"] / 100 > kept["big"] / 2000
    # realized keep tracks the gate probability within Bernoulli noise
    for s in n:
        assert abs(kept[s] / n[s] - rate[s]) < 0.12, (s, kept[s], rate[s])


def test_shuffle_order_matches_global_rank_and_avoids_global_sort(spark):
    """Two-level distributed ranking == the naive global row_number (the
    bucket is a PREFIX of the sort key), positions are a 0..N-1
    permutation, and the corpus-grain window partitions on the bucket —
    the only unpartitioned window runs on the 256-row offsets frame."""
    import re

    from pyspark.sql import Window, functions as F

    from pdfplucker_spark.functions.hashing import md5_long
    from pdfplucker_spark.operators.pipeline import (
        SHUFFLE_EPOCH_SEED,
        q_docs_shuffle_order,
    )

    sf = "/root/testdata/sf0.001"
    out = q_docs_shuffle_order(spark, sf)
    got = {r.doc_id: r.shuffle_pos for r in out.collect()}
    d = spark.read.parquet(f"{sf}/documents.parquet")
    h = md5_long(
        F.concat(F.lit(f"sh{SHUFFLE_EPOCH_SEED}:"), F.col("doc_id").cast("string"))
    )
    ref = {
        r.doc_id: r.pos
        for r in d.select(
            "doc_id",
            (F.row_number().over(Window.orderBy(h.alias("h"), "doc_id")) - 1).alias(
                "pos"
            ),
        ).collect()
    }
    assert got == ref
    assert sorted(got.values()) == list(range(len(got)))  # true permutation
    plan = out._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\((.*?)\)", plan)
    assert specs
    # the row_number over the corpus must be bucket-partitioned; 'h' may
    # appear only as an ORDER key beside bkt
    assert any("bkt" in s for s in specs), specs


def test_shuffle_order_invariant_to_bucket_count(spark):
    """The bucket count is pure plan shape (the bucket is a prefix of the
    sort key): positions must be bit-equal across 16, 256 and 4096
    buckets — the knob that sizes per-bucket sorts at 10^12 docs cannot
    change the shuffle order."""
    from pdfplucker_spark.operators.pipeline import q_docs_shuffle_order

    sf = "/root/testdata/sf0.001"
    ref = sorted(map(tuple, q_docs_shuffle_order(spark, sf, bucket_bits=8).collect()))
    for bits in (4, 12):
        got = sorted(
            map(tuple, q_docs_shuffle_order(spark, sf, bucket_bits=bits).collect())
        )
        assert got == ref, bits


def test_domain_cap_two_level_matches_naive_and_salts_the_window(spark, tmp_path):
    """Salted two-level top-K per domain == the naive single window, on a
    skewed corpus (one domain 30x the cap, one under it), and the
    corpus-grain window partitions on (source, salt) — never source
    alone at document grain."""
    import re

    from pyspark.sql import Row, Window, functions as F

    from pdfplucker_spark.operators.pipeline import DOMAIN_CAP, q_docs_domain_cap

    rows = [
        Row(doc_id=i, text="x", lang="en", source="hot", n_chars=(i * 37) % 500)
        for i in range(600)
    ] + [
        Row(doc_id=1000 + i, text="x", lang="en", source="cold", n_chars=50 + i)
        for i in range(5)  # under the cap: all kept
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    out = q_docs_domain_cap(spark, str(tmp_path))
    got = sorted(map(tuple, out.collect()))
    naive = (
        spark.read.parquet(f"{tmp_path}/documents.parquet")
        .withColumn(
            "domain_rank",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.desc("n_chars"), F.asc("doc_id")
                )
            ),
        )
        .where(F.col("domain_rank") <= DOMAIN_CAP)
        .select("doc_id", "source", "n_chars", "domain_rank")
    )
    assert got == sorted(map(tuple, naive.collect()))
    per_source = {}
    for _doc, src, _n, _r in got:
        per_source[src] = per_source.get(src, 0) + 1
    assert per_source == {"hot": DOMAIN_CAP, "cold": 5}
    # plan: the document-grain window must carry the salt; source-alone
    # windows may only rank the <= cap*salts survivor frame
    plan = out._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\((.*?)\)", plan)
    assert any("salt" in s for s in specs), specs


def test_curation_manifest_stage_algebra(spark):
    """Piecewise contract of the composed manifest under the SEQUENTIAL
    semantics (round 7): every kept doc passes the quality gate AND is
    the canonical of its dup group AMONG GATE SURVIVORS (replayed here
    in pure Python — gate first, then per-bag argmax over passing docs
    only) AND sits within the domain cap of the deduped survivor set;
    positions are a dense 0..M-1 permutation."""
    from pdfplucker_spark.operators.pipeline import (
        DOMAIN_CAP,
        q_docs_curation_manifest,
    )
    from pdfplucker_spark.operators.textstats import q_text_gopher_rules

    sf = "/root/testdata/sf0.001"
    rows = q_docs_curation_manifest(spark, sf).collect()
    assert rows
    got_ids = {r.doc_id for r in rows}
    assert sorted(r.shuffle_pos for r in rows) == list(range(len(rows)))

    passed = {
        r.doc_id
        for r in q_text_gopher_rules(spark, sf).where("gopher_pass").collect()
    }
    # pure-Python replay of stage 2: bag-of-tokens groups over the GATE
    # SURVIVORS, canonical = (n_chars DESC, doc_id ASC) argmax per group
    d = spark.read.parquet(f"{sf}/documents.parquet").collect()
    groups: dict = {}
    for r in d:
        if r.doc_id is None or r.doc_id not in passed:
            continue
        bag = " ".join(sorted(set((r.text or "").split(" "))))
        groups.setdefault(bag, []).append(r)
    surv = {
        min(ms, key=lambda r: (-r.n_chars, r.doc_id)).doc_id
        for ms in groups.values()
    }
    assert got_ids <= passed and got_ids <= surv
    # per-domain count never exceeds the cap, and equals the survivor
    # count where the domain is under it
    by_src_surv, by_src_kept = {}, {}
    for r in d:
        if r.doc_id in surv:
            by_src_surv[r.source] = by_src_surv.get(r.source, 0) + 1
        if r.doc_id in got_ids:
            by_src_kept[r.source] = by_src_kept.get(r.source, 0) + 1
    for src, n_surv in by_src_surv.items():
        assert by_src_kept.get(src, 0) == min(n_surv, DOMAIN_CAP), src


def test_curation_manifest_sequential_not_intersect(spark, tmp_path):
    """THE sequential-vs-intersect distinction (round-6 advice): a dup
    group whose corpus-wide LONGEST member fails the gopher gate must
    still contribute its best PASSING member. Intersect semantics
    (full-corpus canonical ∩ gate survivors) would keep nothing from the
    group; both engines must keep the shorter passing doc."""
    import duckdb

    from pdfplucker_spark.operators.pipeline import q_docs_curation_manifest
    from pdfplucker_spark.registry import all_queries

    words = ["the", "cat", "sat", "on", "big", "mat"]
    short = " ".join(words)                # 6 tokens: passes every rule
    long = " ".join(words * 2000)          # same BAG, 12000 tokens: fails r_wordcount
    rows = [
        (1, short, "en", "s1", len(short)),
        (2, long, "en", "s1", len(long)),   # full-corpus canonical, gate-fails
        (3, "a dog ran over there quickly", "en", "s1", 29),
    ]
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")

    got = sorted(map(tuple, q_docs_curation_manifest(spark, str(tmp_path)).collect()))
    oracle_sql = all_queries()["docs_curation_manifest"][1]
    exp = sorted(map(tuple, con.execute(oracle_sql).fetchall()))
    assert got == exp
    kept = {r[0] for r in got}
    assert 1 in kept and 2 not in kept and 3 in kept


def test_line_dedup_removes_shared_segment_and_reassembles(spark, tmp_path):
    """Crafted corpus: an 8-word boilerplate segment planted at segment-
    aligned positions in 3 docs must be removed from each (threshold 3),
    a 2-doc segment must survive, and a doc with no boilerplate must
    reassemble to EXACTLY its original text (the segmenter + ordered
    concat round-trips)."""
    from pyspark.sql import Row

    from pdfplucker_spark.operators.dedup import (
        LINE_DF_THRESHOLD,
        LINE_SEG_WORDS,
        q_docs_line_dedup,
    )

    assert LINE_DF_THRESHOLD == 3
    boiler = " ".join(f"nav{i}" for i in range(LINE_SEG_WORDS))
    pair = " ".join(f"two{i}" for i in range(LINE_SEG_WORDS))
    mk = lambda *seg: " ".join(seg)
    u = [" ".join(f"u{d}w{i}" for i in range(LINE_SEG_WORDS)) for d in range(9)]
    rows = [
        Row(doc_id=1, text=mk(boiler, u[0]), lang="en", source="s", n_chars=1),
        Row(doc_id=2, text=mk(u[1], boiler), lang="en", source="s", n_chars=1),
        Row(doc_id=3, text=mk(u[2], boiler, u[3]), lang="en", source="s", n_chars=1),
        Row(doc_id=4, text=mk(pair, u[4]), lang="en", source="s", n_chars=1),
        Row(doc_id=5, text=mk(pair, u[5]), lang="en", source="s", n_chars=1),
        Row(doc_id=6, text=mk(u[6], u[7], u[8]) + " tail words", lang="en", source="s", n_chars=1),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: r for r in q_docs_line_dedup(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    for d, n, nb in ((1, 2, 1), (2, 2, 1), (3, 3, 1)):
        assert (got[d]["n_segs"], got[d]["n_boiler_segs"]) == (n, nb), got[d]
        assert boiler not in got[d]["clean_text"]
    assert got[1]["clean_text"] == u[0]
    assert got[3]["clean_text"] == mk(u[2], u[3])
    # below threshold: the 2-doc segment survives intact
    assert got[4]["n_boiler_segs"] == 0 and got[4]["clean_text"] == rows[3].text
    # no boilerplate: exact round-trip through segment + ordered reassembly
    assert got[6]["n_boiler_segs"] == 0 and got[6]["clean_text"] == rows[5].text


def test_unigram_logppl_matches_hand_computed_lm(spark, tmp_path):
    """Crafted 20-token-vocabulary corpus (16 common tokens that fill the
    top-V vocab exactly, 4 singleton rares that fall OOV): per-doc OOV
    counts and micro-grid log-perplexities must equal a hand-rolled
    Python replica of the LM, and an all-OOV doc must score strictly more
    surprising than an all-common doc."""
    import math

    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import (
        LOGPPL_MICRO,
        LOGPPL_VOCAB,
        q_docs_unigram_logppl,
    )

    assert LOGPPL_VOCAB == 16
    common = [f"c{i:02d}" for i in range(16)]
    texts = {
        1: "c00 c01 c02",
        2: "r0 r1 r2",
        3: "c00 r3",
        4: " ".join(common),
        5: " ".join(common),
    }
    rows = [
        Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t))
        for d, t in texts.items()
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    # hand-rolled replica of the operator's LM definition
    cnt: dict[str, int] = {}
    for t in texts.values():
        for tok in t.split(" "):
            cnt[tok] = cnt.get(tok, 0) + 1
    tot = sum(cnt.values())
    vocab = dict(
        sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:LOGPPL_VOCAB]
    )
    assert set(vocab) == set(common)  # rares are OOV by construction

    def micro(p: float) -> int:  # HALF_UP away from zero, like both engines
        x = math.log(p) * LOGPPL_MICRO
        return -int(math.floor(-x + 0.5)) if x < 0 else int(math.floor(x + 0.5))

    def expected(text: str) -> tuple[int, int, float]:
        toks = text.split(" ")
        lps = [
            micro(vocab[t] / tot) if t in vocab else micro(1.0 / (2 * tot))
            for t in toks
        ]
        oov = sum(1 for t in toks if t not in vocab)
        return len(toks), oov, (-sum(lps) // len(lps)) / float(LOGPPL_MICRO)

    got = {r.doc_id: r for r in q_docs_unigram_logppl(spark, str(tmp_path)).collect()}
    assert set(got) == set(texts)
    for d, t in texts.items():
        n, oov, lp = expected(t)
        assert (got[d].n_tokens, got[d].oov_tokens, got[d].logppl) == (n, oov, lp), d
    # the all-OOV doc is strictly more surprising than the all-common doc
    assert got[2].logppl > got[1].logppl


def test_substring_dedup_marks_merges_and_isolates_spans(spark, tmp_path):
    """Crafted corpus for the ExactSubstr span reporter: a 12-token run
    shared by two docs merges its 5 stride-1 windows into ONE span per
    doc; two separated shared runs give two spans; a within-doc repeat
    marks both occurrences; unique docs and sub-window docs emit nothing.
    The DuckDB oracle must agree row-for-row on the same corpus."""
    import duckdb
    from pyspark.sql import Row

    from pdfplucker_spark.operators.dedup import SUBSTR_W, q_docs_substring_dedup
    from pdfplucker_spark.registry import all_queries

    assert SUBSTR_W == 8
    dup12 = " ".join(f"d{i}" for i in range(12))
    runa = " ".join(f"a{i}" for i in range(10))
    runb = " ".join(f"b{i}" for i in range(10))
    runc = " ".join(f"c{i}" for i in range(SUBSTR_W))
    mk = lambda *parts: " ".join(parts)
    u = [" ".join(f"u{d}x{i}" for i in range(12)) for d in range(8)]
    rows = [
        # shared 12-token run: doc 1 leads with it, doc 2 trails with it
        Row(doc_id=1, text=mk(dup12, u[0]), lang="en", source="s", n_chars=1),
        Row(doc_id=2, text=mk(u[1], dup12), lang="en", source="s", n_chars=1),
        # unique >= W tokens: no spans
        Row(doc_id=3, text=u[2], lang="en", source="s", n_chars=1),
        # two shared runs separated by > W unique tokens: two spans each
        Row(doc_id=4, text=mk(runa, u[3], runb), lang="en", source="s", n_chars=1),
        Row(doc_id=5, text=mk(runa, u[4], runb), lang="en", source="s", n_chars=1),
        # within-doc repeat of an exactly-W-token run: both occurrences
        Row(doc_id=6, text=mk(runc, " ".join(f"g{i}" for i in range(9)), runc), lang="en", source="s", n_chars=1),
        # shorter than one window: no rows
        Row(doc_id=7, text="a b c", lang="en", source="s", n_chars=1),
    ]
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(rows).write.parquet(p)

    res = q_docs_substring_dedup(spark, str(tmp_path))
    got = sorted(map(tuple, res.collect()))
    spans = {}
    for doc_id, seq, s, e, nw in got:
        spans.setdefault(doc_id, []).append((seq, s, e, nw))
    assert set(spans) == {1, 2, 4, 5, 6}
    # doc 1: run at tokens [0, 12) -> windows 0..4 merge into one span
    assert spans[1] == [(1, 0, 12, 5)]
    # doc 2: same run after 12 lead tokens -> [12, 24)
    assert spans[2] == [(1, 12, 24, 5)]
    # docs 4/5: two 10-token runs, 12-token gap -> [0,10) and [22,32)
    assert spans[4] == [(1, 0, 10, 3), (2, 22, 32, 3)]
    assert spans[5] == [(1, 0, 10, 3), (2, 22, 32, 3)]
    # doc 6: the exact-W run occurs at pos 0 and pos 17 (both marked)
    assert spans[6] == [(1, 0, 8, 1), (2, 17, 25, 1)]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    exp = sorted(map(tuple, con.execute(
        all_queries()["docs_substring_dedup"][1]
    ).fetchall()))
    assert got == exp
    # the executed plan never degenerates into a cartesian pair join
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    spark.catalog.clearCache()


def test_dsir_weights_match_python_replica_and_rank_target_like_docs(spark, tmp_path):
    """The DSIR weight of every doc must equal a hand-rolled Python replica
    of the hashed-bigram bucket model (same md5-60bit buckets, same add-1
    smoothing, same integer micro grid), and a raw-pool doc written in the
    target domain's vocabulary must outscore a raw-pool doc written in the
    raw-only vocabulary. The model join must broadcast."""
    import hashlib
    import math

    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import (
        DSIR_BUCKETS,
        DSIR_TARGET_MOD,
        q_docs_dsir_weights,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def is_target(doc_id: int) -> int:
        return 1 if h60(f"dsir:{doc_id}") % DSIR_TARGET_MOD == 0 else 0

    # find target ids by the SAME deterministic gate the operator uses
    ids = list(range(1, 40))
    tgt = [d for d in ids if is_target(d)][:3]
    raw = [d for d in ids if not is_target(d)]
    assert len(tgt) == 3 and len(raw) >= 4
    tgt_text = "solar panels convert sunlight into clean electricity today"
    raw_text = "random forum chatter rambles about nothing in particular here"
    texts = {tgt[0]: tgt_text, tgt[1]: tgt_text, tgt[2]: tgt_text}
    texts[raw[0]] = tgt_text          # raw-pool doc in target vocabulary
    texts[raw[1]] = raw_text          # raw-pool doc in raw vocabulary
    texts[raw[2]] = raw_text
    texts[raw[3]] = raw_text
    rows = [
        Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t))
        for d, t in texts.items()
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    def feats(text: str) -> list[str]:
        t = text.split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    c_r: dict[int, int] = {}
    c_t: dict[int, int] = {}
    for d, t in texts.items():
        for f_ in feats(t):
            b = h60(f_) % DSIR_BUCKETS
            c_r[b] = c_r.get(b, 0) + 1
            if is_target(d):
                c_t[b] = c_t.get(b, 0) + 1
    tr, tt = sum(c_r.values()), sum(c_t.values())

    def half_up(x: float) -> int:
        return -int(math.floor(-x + 0.5)) if x < 0 else int(math.floor(x + 0.5))

    lam = {
        b: half_up(
            (
                math.log((c_t.get(b, 0) + 1.0) / (tt + DSIR_BUCKETS))
                - math.log((c_r[b] + 1.0) / (tr + DSIR_BUCKETS))
            )
            * 1_000_000
        )
        for b in c_r
    }

    res = q_docs_dsir_weights(spark, str(tmp_path))
    got = {r.doc_id: r for r in res.collect()}
    assert set(got) == set(texts)
    for d, t in texts.items():
        fs = feats(t)
        exp_w = sum(lam[h60(f_) % DSIR_BUCKETS] for f_ in fs)
        r = got[d]
        assert (r.n_feats, r.is_target, r.logw_micro) == (
            len(fs), is_target(d), exp_w,
        ), d
    # the target-vocabulary raw doc outscores every raw-vocabulary raw doc
    assert got[raw[0]].logw_micro > got[raw[1]].logw_micro
    # the 64-row model joins by broadcast; nothing degenerates to cartesian
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    spark.catalog.clearCache()


def test_balanced_sample_water_filling_exact_quotas(spark, tmp_path):
    """Skewed strata exercise the redistribution branch the uniform driver
    corpora never do: tiny strata are taken whole, the freed budget
    water-fills the big strata, leftovers go by source-name order, and the
    total hits the budget EXACTLY. DuckDB must agree row-for-row."""
    import duckdb
    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import (
        BALANCED_BUDGET_DEN,
        q_docs_balanced_sample,
    )
    from pdfplucker_spark.registry import all_queries

    assert BALANCED_BUDGET_DEN == 4
    sizes = {"sa": 2, "sb": 4, "sc": 40, "sd": 40}  # N=86 -> B=21
    rows, did = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            did += 1
            rows.append(
                Row(doc_id=did, text=f"tok{did} only", lang="en", source=src,
                    n_chars=10)
            )
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(rows).write.parquet(p)

    res = q_docs_balanced_sample(spark, str(tmp_path))
    got = sorted(map(tuple, res.collect()))
    per_src = {}
    for _d, s, r in got:
        per_src[s] = per_src.get(s, 0) + 1
        assert 1 <= r <= sizes[s]
    # hand-worked water-filling: full sa(2), sb(4); R=15 over 2 strata ->
    # level 7, 1 extra to the first non-full source by name (sc)
    assert per_src == {"sa": 2, "sb": 4, "sc": 8, "sd": 7}
    assert len(got) == 86 // 4

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    exp = sorted(map(tuple, con.execute(
        all_queries()["docs_balanced_sample"][1]
    ).fetchall()))
    assert got == exp
    # corpus-scale joins (bucket offsets, quotas) must be broadcast hash
    # joins; the allocation-side crossJoins are 1-row/K-row broadcasts
    # (the house-accepted totals fan-out shape) and MAY render as
    # nested-loop — only equi-join shapes are asserted here
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    spark.catalog.clearCache()


def test_contamination_report_exact_fractions(spark, tmp_path):
    """Planted eval docs (membership via the SAME deterministic gate the
    operator uses): one fully leaked into a train doc (contam = 10⁶ micro),
    one half-leaked (5·10⁵), one clean (0). DuckDB must agree."""
    import duckdb
    import hashlib
    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import (
        SAMPLE_MOD,
        q_docs_contamination_report,
    )
    from pdfplucker_spark.registry import all_queries

    def is_eval(doc_id: int, source: str = "s") -> bool:
        h = int(hashlib.md5(f"{source}:{doc_id}".encode()).hexdigest()[:15], 16)
        return h % SAMPLE_MOD == 0

    ids = list(range(1, 300))
    ev = [d for d in ids if is_eval(d)][:3]
    tr = [d for d in ids if not is_eval(d)][:4]
    texts = {
        ev[0]: "a b c d e f",            # shingles abc bcd cde def
        ev[1]: "p q r s t u",            # shingles pqr qrs rst stu
        ev[2]: "m n o v w x",            # all clean
        tr[0]: "a b c d e f gx1 gx2",    # carries ALL of ev[0]'s shingles
        tr[1]: "p q r s z9 z8",          # carries pqr + qrs only
        tr[2]: "h1 h2 h3 h4 h5",
        tr[3]: "k1 k2 k3 k4 k5",
    }
    rows = [
        Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t))
        for d, t in texts.items()
    ]
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(rows).write.parquet(p)

    res = q_docs_contamination_report(spark, str(tmp_path))
    got = {r.eval_doc_id: r for r in res.collect()}
    assert set(got) == set(ev)
    assert (got[ev[0]].n_shingles, got[ev[0]].n_contaminated,
            got[ev[0]].contam_micro) == (4, 4, 1_000_000)
    assert (got[ev[1]].n_shingles, got[ev[1]].n_contaminated,
            got[ev[1]].contam_micro) == (4, 2, 500_000)
    assert (got[ev[2]].n_shingles, got[ev[2]].n_contaminated,
            got[ev[2]].contam_micro) == (4, 0, 0)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    exp = sorted(map(tuple, con.execute(
        all_queries()["docs_contamination_report"][1]
    ).fetchall()))
    assert sorted(map(tuple, res.collect())) == exp
    spark.catalog.clearCache()


def test_substring_dedup_matches_bruteforce_on_random_corpus(spark, tmp_path):
    """Seeded-random corpus over a 2-token alphabet (dense window
    collisions, within-doc repeats, empty/NULL/short texts) — the operator
    must equal a brute-force Python reference exactly: same duplicated
    windows, same island merging, same span rows."""
    import random
    from collections import Counter

    from pyspark.sql import Row

    from pdfplucker_spark.operators.dedup import SUBSTR_W, q_docs_substring_dedup

    rnd = random.Random(90210)
    vocab = ["t0", "t1"]  # 2^8 = 256 window values over ~1300 windows:
    # collisions guaranteed, within-doc repeats common
    texts = {}
    for d in range(1, 81):
        pick = rnd.random()
        if pick < 0.05:
            texts[d] = None
        elif pick < 0.10:
            texts[d] = ""
        else:
            texts[d] = " ".join(
                rnd.choice(vocab) for _ in range(rnd.randint(1, 24))
            )
    rows = [
        Row(doc_id=d, text=t, lang="en", source="s",
            n_chars=len(t) if t else 0)
        for d, t in texts.items()
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    # brute force
    wins, cnt = {}, Counter()
    for d, t in texts.items():
        if t is None:
            continue
        toks = t.split(" ")
        ws = [
            " ".join(toks[i : i + SUBSTR_W])
            for i in range(len(toks) - SUBSTR_W + 1)
        ]
        wins[d] = ws
        cnt.update(ws)
    exp = []
    for d, ws in wins.items():
        islands = []  # [start, last_pos, n]
        for i, w in enumerate(ws):
            if cnt[w] < 2:
                continue
            if islands and i <= islands[-1][1] + SUBSTR_W:
                islands[-1][1] = i
                islands[-1][2] += 1
            else:
                islands.append([i, i, 1])
        for seq, (s, last, n) in enumerate(islands, 1):
            exp.append((d, seq, s, last + SUBSTR_W, n))

    got = sorted(map(tuple, q_docs_substring_dedup(spark, str(tmp_path)).collect()))
    assert got == sorted(exp) and got
    spark.catalog.clearCache()


def test_balanced_sample_matches_bruteforce_on_random_strata(spark, tmp_path):
    """Seeded-random stratum sizes (1..30 docs across 12 sources) — quota
    allocation AND within-stratum hash selection must equal a Python
    water-filling reference exactly, and the total must hit the budget."""
    import hashlib
    import random

    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import (
        BALANCED_BUDGET_DEN,
        q_docs_balanced_sample,
    )

    rnd = random.Random(1234)
    sizes = {f"s{i:02d}": rnd.randint(1, 30) for i in range(12)}
    rows, members, did = [], {}, 0
    for src, n in sizes.items():
        members[src] = []
        for _ in range(n):
            did += 1
            members[src].append(did)
            rows.append(
                Row(doc_id=did, text=f"x{did}", lang="en", source=src, n_chars=5)
            )
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    n_total = sum(sizes.values())
    b = n_total // BALANCED_BUDGET_DEN
    k = len(sizes)
    srt = sorted(sizes.items(), key=lambda kv: (kv[1], kv[0]))
    quotas, cum, istar = {}, 0, 0
    for i, (src, n) in enumerate(srt, 1):
        if n * (k - i + 1) <= b - cum:
            quotas[src] = n
            cum += n
            istar = i
        else:
            break
    rest = sorted(src for src, _n in sizes.items() if src not in quotas)
    if istar < k:
        level, extras = divmod(b - cum, k - istar)
        for j, src in enumerate(rest):
            quotas[src] = level + (1 if j < extras else 0)
    exp = []
    for src, ids in members.items():
        ordered = sorted(ids, key=lambda d: (h60(f"bs:{src}:{d}"), d))
        for r, d in enumerate(ordered[: quotas[src]], 1):
            exp.append((d, src, r))

    got = sorted(map(tuple, q_docs_balanced_sample(spark, str(tmp_path)).collect()))
    assert got == sorted(exp)
    assert len(got) == b
    spark.catalog.clearCache()


def test_zorder_interleave_math_and_two_dim_pruning(spark, tmp_path):
    """The Morton key must equal a bit-level Python reference, and the
    layout must deliver the property it exists for: with docs in two
    length clusters spread over many sources, a narrow length-range
    predicate PRUNES most z-order file buckets via the min/max stats
    (every matching doc provably inside the surviving buckets), while a
    1-D source-ordered layout cannot prune on length at all (each source
    holds both clusters, so every 1-D bucket's length range spans them)."""
    import hashlib

    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import (
        ZORDER_BITS,
        ZORDER_FILE_SHIFT,
        q_docs_zorder_layout,
        q_docs_zorder_stats,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(ZORDER_BITS):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    rows, did = [], 0
    for s in range(24):
        src = f"dom{s:02d}"
        for ln in (100 + s, 60_000 + s):  # every source: one short, one long
            did += 1
            rows.append(
                Row(doc_id=did, text="x", lang="en", source=src, n_chars=ln)
            )
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    lay = {r.doc_id: r for r in q_docs_zorder_layout(spark, str(tmp_path)).collect()}
    by_doc = {r.doc_id: r for r in rows}
    for d, r in lay.items():
        a = h60(by_doc[d].source) % (1 << ZORDER_BITS)
        b = min(max(by_doc[d].n_chars, 0), (1 << ZORDER_BITS) - 1)
        assert r.zkey == morton(a, b), d
        assert r.file_bucket == r.zkey >> ZORDER_FILE_SHIFT

    stats = q_docs_zorder_stats(spark, str(tmp_path)).collect()
    assert sum(r.n_docs for r in stats) == len(rows)
    # the length predicate: n_chars <= 1000 (exactly the short cluster)
    surviving = [r for r in stats if r.min_len <= 1000]
    pruned = [r for r in stats if r.min_len > 1000]
    assert pruned, "z-order failed to isolate the long cluster"
    # completeness: every matching doc is in a surviving bucket
    short_buckets = {lay[d].file_bucket for d, r in by_doc.items() if r.n_chars <= 1000}
    assert short_buckets <= {r.file_bucket for r in surviving}
    # the long cluster's mass is fully prunable: no long doc hides in a
    # surviving bucket's stats range unnecessarily — surviving buckets'
    # max_len stays in the short cluster (tight 2-D ranges)
    assert all(r.max_len <= 1000 for r in surviving)
    # the 1-D contrast: bucket by source hash alone — every bucket holds a
    # short AND a long doc, so min_len <= 1000 < max_len everywhere and a
    # length predicate prunes NOTHING
    one_d = {}
    for d, r in by_doc.items():
        k = (h60(r.source) % (1 << ZORDER_BITS)) >> (ZORDER_BITS - 5)
        lo, hi = one_d.get(k, (1 << 30, -1))
        one_d[k] = (min(lo, r.n_chars), max(hi, r.n_chars))
    assert all(lo <= 1000 < hi for lo, hi in one_d.values())
    spark.catalog.clearCache()


def test_length_outlier_tukey_fences_per_source(spark, tmp_path):
    """Hand-worked fences: source A = lengths {10,12,14,16,1000} → q1=12,
    q3=16, fences [6, 22] → only the 1000-char doc flags; source B's
    uniform lengths flag nothing — the per-source property an absolute
    threshold can't give. DuckDB agrees row-for-row (dyadic-exact fence
    arithmetic)."""
    import duckdb
    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import q_docs_length_outlier
    from pdfplucker_spark.registry import all_queries

    rows = [
        Row(doc_id=i + 1, text="x", lang="en", source="A", n_chars=n)
        for i, n in enumerate([10, 12, 14, 16, 1000])
    ] + [
        Row(doc_id=100 + i, text="x", lang="en", source="B", n_chars=5000 + i)
        for i in range(5)
    ]
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(rows).write.parquet(p)

    res = q_docs_length_outlier(spark, str(tmp_path))
    got = {r.doc_id: r for r in res.collect()}
    assert {d for d, r in got.items() if r.is_outlier} == {5}
    a = got[1]
    assert (a.lo_fence, a.hi_fence) == (6.0, 22.0)  # q1=12, q3=16, k=1.5
    assert all(got[d].is_outlier == 0 for d in range(100, 105))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    exp = sorted(map(tuple, con.execute(
        all_queries()["docs_length_outlier"][1]
    ).fetchall()))
    assert sorted(map(tuple, res.collect())) == exp
    spark.catalog.clearCache()


def test_random_projection_matches_numpy_and_is_map_only(spark):
    """The JL projection must equal a NumPy reference (same seeded ±1
    matrix, same fold order) on the real corpus, and the plan must be
    map-only — no exchange of the N-row side anywhere."""
    import numpy as np

    from pdfplucker_spark.operators.similarity import (
        DIM,
        RP_DIMS,
        _rp_signs,
        q_sim_random_projection,
    )

    spark.catalog.clearCache()
    res = q_sim_random_projection(spark, SF)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    R = np.array([_rp_signs(j) for j in range(RP_DIMS)])
    got = {(r.vec_id, r.dim): r.val for r in res.collect()}
    assert len(got) == len(emb) * RP_DIMS
    for vid, v in list(emb.items())[:50]:
        proj = R @ v
        for j in range(RP_DIMS):
            assert abs(got[(vid, j)] - proj[j]) < 2e-6, (vid, j)
    spark.catalog.clearCache()


def test_bloom_decontaminate_superset_semantics_and_small_m_fps(spark, tmp_path):
    """Planted corpus (membership via the operator's own deterministic
    gate): a train doc carrying ALL of one eval doc's shingles must be
    flagged with the exact hit count; a 2-shared-shingle doc must not; at
    the default m the tiny filter is collision-free so bloom == exact
    everywhere; at a deliberately saturated m=8 false POSITIVES must
    appear while the one-sided guarantee (bloom >= exact, every
    exact-flagged doc still flagged) survives. DuckDB must agree on the
    registered default."""
    import duckdb
    import hashlib
    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import (
        SAMPLE_MOD,
        q_docs_bloom_decontaminate,
    )
    from pdfplucker_spark.registry import all_queries

    def is_eval(doc_id: int, source: str = "s") -> bool:
        h = int(hashlib.md5(f"{source}:{doc_id}".encode()).hexdigest()[:15], 16)
        return h % SAMPLE_MOD == 0

    ids = list(range(1, 300))
    ev = [d for d in ids if is_eval(d)][:3]
    tr = [d for d in ids if not is_eval(d)][:4]
    texts = {
        ev[0]: "a b c d e f",            # shingles abc bcd cde def
        ev[1]: "p q r s t u",
        ev[2]: "m n o v w x",
        tr[0]: "a b c d e f gx1 gx2",    # 6 shingles, 4 of them eval's
        tr[1]: "p q r s z9 z8",          # 4 shingles, 2 eval hits — below 3
        tr[2]: "h1 h2 h3 h4 h5",         # clean (3 shingles)
        tr[3]: "k1 k2 k3 k4 k5",         # clean (3 shingles)
    }
    rows = [
        Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t))
        for d, t in texts.items()
    ]
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(rows).write.parquet(p)

    exact = {tr[0]: 4, tr[1]: 2, tr[2]: 0, tr[3]: 0}
    n_sh = {tr[0]: 6, tr[1]: 4, tr[2]: 3, tr[3]: 3}

    res = q_docs_bloom_decontaminate(spark, str(tmp_path))
    got = {r.train_doc_id: r for r in res.collect()}
    assert set(got) == set(tr)
    for d in tr:
        assert got[d].n_shingles == n_sh[d]
        # default m = 2^20: ~36 set bits — collision-free on this corpus
        assert got[d].n_bloom_hits == exact[d], d
        assert got[d].flagged is (exact[d] >= 3)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    exp = sorted(map(tuple, con.execute(
        all_queries()["docs_bloom_decontaminate"][1]
    ).fetchall()))
    assert sorted(map(tuple, res.collect())) == exp

    # saturate the filter: m=8, k=2 — ~0.95 fill, so clean shingles
    # collide into set bits and false positives MUST appear; the Bloom
    # one-sided contract must hold regardless
    small = {
        r.train_doc_id: r
        for r in q_docs_bloom_decontaminate(spark, str(tmp_path), m=8, k=2).collect()
    }
    assert all(small[d].n_bloom_hits >= exact[d] for d in tr)
    assert small[tr[0]].flagged  # exact-flagged docs never unflagged
    assert any(small[d].n_bloom_hits > exact[d] for d in tr), (
        "saturated filter produced no false positive — not a Bloom probe?"
    )
    spark.catalog.clearCache()


def test_bloom_decontaminate_probe_is_broadcast_semi_only(spark):
    """Plan pin: the probe is k=3 broadcast LEFT-SEMI joins (map-side, no
    fan-out) and the filter side never shuffles the corpus — the only
    corpus-grain exchanges are the two per-doc aggs + their doc-keyed
    merge join."""
    from pdfplucker_spark.operators.pipeline import q_docs_bloom_decontaminate

    spark.catalog.clearCache()
    plan = q_docs_bloom_decontaminate(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("LeftSemi") == 3, plan[:3000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    spark.catalog.clearCache()


def test_bigram_logppl_matches_hand_computed_lm(spark, tmp_path):
    """Crafted corpus against a pure-Python replica of the interpolated
    bigram LM (same vocab/total/model definitions, same IEEE op order,
    same micro-grid rounding): per-doc bigram counts, seen-bigram counts
    and log-perplexities must match exactly; docs with <2 tokens (single
    word, empty text, NULL text) must be absent from the output while
    their tokens still count toward the corpus fit; the all-OOV doc must
    score strictly more surprising than the all-common doc. Because the
    model is fit on the scored corpus itself, a bigram position is
    'seen' iff BOTH its tokens are in the top-V vocab — the pbi=0
    backoff is exercised exactly by the OOV-containing pairs."""
    import math

    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import (
        LOGPPL_MICRO,
        LOGPPL_VOCAB,
        q_docs_bigram_logppl,
    )

    assert LOGPPL_VOCAB == 16
    common = [f"c{i:02d}" for i in range(16)]
    texts = {
        1: "c00 c01 c02",
        2: "r0 r1 r2",
        3: "c00 r3",
        4: " ".join(common),
        5: " ".join(common),
        6: "solo",
        7: "",
        8: None,
        # third all-commons doc: keeps every common's count above the
        # cnt=2 of the '' token the empty/NULL texts contribute, so the
        # top-V vocab is exactly the 16 commons
        9: " ".join(common),
    }
    rows = [
        Row(doc_id=d, text=t, lang="en", source="s", n_chars=len(t or ""))
        for d, t in texts.items()
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    def toks_of(t):
        return (t or "").split(" ")

    cnt: dict[str, int] = {}
    for t in texts.values():
        for tok in toks_of(t):
            cnt[tok] = cnt.get(tok, 0) + 1
    tot = sum(cnt.values())
    vocab = dict(
        sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:LOGPPL_VOCAB]
    )
    assert set(vocab) == set(common)

    bmodel: dict[tuple[str, str], int] = {}
    for t in texts.values():
        tk = toks_of(t)
        for c, w in zip(tk, tk[1:]):
            if c in vocab and w in vocab:
                bmodel[(c, w)] = bmodel.get((c, w), 0) + 1

    def micro(p: float) -> int:  # HALF_UP away from zero, like both engines
        x = math.log(p) * LOGPPL_MICRO
        return -int(math.floor(-x + 0.5)) if x < 0 else int(math.floor(x + 0.5))

    def expected(text: str) -> tuple[int, int, float]:
        tk = toks_of(text)
        lps, seen = [], 0
        for c, w in zip(tk, tk[1:]):
            pbi = bmodel[(c, w)] / vocab[c] if (c, w) in bmodel else 0.0
            puni = vocab[w] / tot if w in vocab else 1.0 / (2 * tot)
            lps.append(micro(0.5 * pbi + 0.5 * puni))
            seen += (c, w) in bmodel
        return len(lps), seen, (-sum(lps) // len(lps)) / float(LOGPPL_MICRO)

    got = {r.doc_id: r for r in q_docs_bigram_logppl(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 9}  # <2-token docs absent
    for d in sorted(got):
        n, seen, lp = expected(texts[d])
        assert (got[d].n_bigrams, got[d].seen_bigrams, got[d].logppl2) == (
            n,
            seen,
            lp,
        ), d
    assert got[2].seen_bigrams == 0 and got[4].seen_bigrams == 15
    assert got[2].logppl2 > got[4].logppl2
    spark.catalog.clearCache()


def test_substring_dedup_apply_removes_all_marked_occurrences(spark, tmp_path):
    """The removal pass over the same crafted corpus the reporter test
    uses: every marked interval is cut from every occurrence (both
    sharers of a run lose it; a within-doc repeat loses both copies),
    untouched docs round-trip verbatim through the split/join rebuild
    (sub-window docs included), and counts reconcile with the reporter's
    span lengths. DuckDB must agree row-for-row."""
    import duckdb
    from pyspark.sql import Row

    from pdfplucker_spark.operators.dedup import (
        SUBSTR_W,
        q_docs_substring_dedup_apply,
    )
    from pdfplucker_spark.registry import all_queries

    assert SUBSTR_W == 8
    dup12 = " ".join(f"d{i}" for i in range(12))
    runa = " ".join(f"a{i}" for i in range(10))
    runb = " ".join(f"b{i}" for i in range(10))
    runc = " ".join(f"c{i}" for i in range(SUBSTR_W))
    gs = " ".join(f"g{i}" for i in range(9))
    mk = lambda *parts: " ".join(parts)
    u = [" ".join(f"u{d}x{i}" for i in range(12)) for d in range(8)]
    rows = [
        Row(doc_id=1, text=mk(dup12, u[0]), lang="en", source="s", n_chars=1),
        Row(doc_id=2, text=mk(u[1], dup12), lang="en", source="s", n_chars=1),
        Row(doc_id=3, text=u[2], lang="en", source="s", n_chars=1),
        Row(doc_id=4, text=mk(runa, u[3], runb), lang="en", source="s", n_chars=1),
        Row(doc_id=5, text=mk(runa, u[4], runb), lang="en", source="s", n_chars=1),
        Row(doc_id=6, text=mk(runc, gs, runc), lang="en", source="s", n_chars=1),
        Row(doc_id=7, text="a b c", lang="en", source="s", n_chars=1),
        Row(doc_id=8, text=None, lang="en", source="s", n_chars=0),
    ]
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(rows).write.parquet(p)

    res = q_docs_substring_dedup_apply(spark, str(tmp_path))
    got = {r.doc_id: r for r in res.collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}  # NULL text absent
    expect = {
        1: (24, 12, u[0]),
        2: (24, 12, u[1]),
        3: (12, 0, u[2]),
        4: (32, 20, u[3]),
        5: (32, 20, u[4]),
        6: (25, 16, gs),
        7: (3, 0, "a b c"),
    }
    for d, (n, rem, clean) in expect.items():
        r = got[d]
        assert (r.n_tokens, r.n_removed, r.clean_text) == (n, rem, clean), d

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    exp = sorted(map(tuple, con.execute(
        all_queries()["docs_substring_dedup_apply"][1]
    ).fetchall()))
    assert sorted(map(tuple, res.collect())) == exp
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    spark.catalog.clearCache()


def test_substring_dedup_keep_one_preserves_first_occurrence(spark, tmp_path):
    """Keep-one policy on the same crafted corpus: the lexicographically
    first (doc_id, pos) occurrence of each duplicated window SURVIVES —
    doc 1 keeps the shared 12-token run doc 2 loses, doc 4 keeps both
    runs doc 5 loses, and the within-doc repeat keeps its first copy and
    loses the second. Exactly one copy of every duplicated run remains
    corpus-wide. DuckDB must agree row-for-row."""
    import duckdb
    from pyspark.sql import Row

    from pdfplucker_spark.operators.dedup import (
        SUBSTR_W,
        q_docs_substring_dedup_keep_one,
    )
    from pdfplucker_spark.registry import all_queries

    assert SUBSTR_W == 8
    dup12 = " ".join(f"d{i}" for i in range(12))
    runa = " ".join(f"a{i}" for i in range(10))
    runb = " ".join(f"b{i}" for i in range(10))
    runc = " ".join(f"c{i}" for i in range(SUBSTR_W))
    gs = " ".join(f"g{i}" for i in range(9))
    mk = lambda *parts: " ".join(parts)
    u = [" ".join(f"u{d}x{i}" for i in range(12)) for d in range(8)]
    texts = {
        1: mk(dup12, u[0]),
        2: mk(u[1], dup12),
        3: u[2],
        4: mk(runa, u[3], runb),
        5: mk(runa, u[4], runb),
        6: mk(runc, gs, runc),
        7: "a b c",
    }
    rows = [
        Row(doc_id=d, text=t, lang="en", source="s", n_chars=1)
        for d, t in texts.items()
    ]
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(rows).write.parquet(p)

    res = q_docs_substring_dedup_keep_one(spark, str(tmp_path))
    got = {r.doc_id: r for r in res.collect()}
    expect = {
        1: (24, 0, texts[1]),            # keeper of the shared run
        2: (24, 12, u[1]),               # loser: run cut
        3: (12, 0, texts[3]),
        4: (32, 0, texts[4]),            # keeper of both runs
        5: (32, 20, u[4]),
        6: (25, 8, mk(runc, gs)),        # first in-doc copy kept
        7: (3, 0, texts[7]),
    }
    assert set(got) == set(expect)
    for d, (n, rem, clean) in expect.items():
        r = got[d]
        assert (r.n_tokens, r.n_removed, r.clean_text) == (n, rem, clean), d

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    exp = sorted(map(tuple, con.execute(
        all_queries()["docs_substring_dedup_keep_one"][1]
    ).fetchall()))
    assert sorted(map(tuple, res.collect())) == exp
    # arg-min election must never plan a per-hash window sort
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    import re
    assert not re.search(r"windowspecdefinition\(wh", plan)
    spark.catalog.clearCache()


def test_ppl_buckets_balanced_monotone_and_never_lang_alone_ranked(spark):
    """CCNet perplexity terciles: within every language the three
    buckets are balanced to ±1 doc (the floor-div rank-tercile
    property), bucket order is monotone in the quantized-ppl bin (a bin
    may straddle one boundary — hash splits ties inside it — but bucket
    b's max bin never exceeds bucket b+1's min bin), and the executed
    plan's corpus-grain rank window is keyed by (lang, pmb, hb), NEVER
    lang alone — a 3-language web corpus must not sort itself on three
    keys."""
    import re
    from collections import Counter, defaultdict

    from pdfplucker_spark.operators.pipeline import (
        PPL_N_BUCKETS,
        q_docs_ppl_buckets,
    )

    spark.catalog.clearCache()
    df = q_docs_ppl_buckets(spark, SF)
    rows = df.collect()
    assert {r.ppl_bucket for r in rows} <= set(range(PPL_N_BUCKETS))
    sizes = Counter((r.lang, r.ppl_bucket) for r in rows)
    per_lang = defaultdict(list)
    for (lang, b), n in sizes.items():
        per_lang[lang].append((b, n))
    for lang, bn in per_lang.items():
        ns = [n for _, n in bn]
        assert max(ns) - min(ns) <= 1, (lang, bn)

    from pdfplucker_spark.operators.pipeline import PPL_BIN_SHIFT

    bins = defaultdict(list)
    for r in rows:
        bins[(r.lang, r.ppl_bucket)].append(r.ppl_micro >> PPL_BIN_SHIFT)
    for lang in per_lang:
        for b in range(PPL_N_BUCKETS - 1):
            lo, hi = bins.get((lang, b)), bins.get((lang, b + 1))
            if lo and hi:
                assert max(lo) <= min(hi), (lang, b)

    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^\)]*)\)", plan)
    rank_specs = [s for s in specs if "ppl_micro" in s]
    assert rank_specs, plan[:2500]
    for s in rank_specs:
        assert "pmb" in s and "hb" in s, s  # never lang-alone over the corpus
    spark.catalog.clearCache()


def test_winnow_fingerprints_match_replica_guarantee_and_hash_once(spark, tmp_path):
    """Winnowing against a pure-Python replica of the MOSS rule
    (rightmost-minimal per window, same 60-bit md5): exact (pos, hash)
    sets per doc; the winnowing GUARANTEE holds (every window of W
    consecutive k-gram hashes contains a selected position, and two docs
    sharing a K+W-1-token run share a fingerprint hash); docs shorter
    than K+W-1 tokens emit nothing; and the optimized plan hashes each
    k-gram ONCE (the hoisted projection survives CollapseProject — the
    collapsed shape re-hashes once per window)."""
    import hashlib

    from pyspark.sql import Row

    from pdfplucker_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        _WINNOW_FPS,
        _WINNOW_HS,
        q_docs_winnow_fingerprints,
    )

    assert (WINNOW_K, WINNOW_W) == (4, 4)
    run = " ".join(f"r{i}" for i in range(WINNOW_K + WINNOW_W - 1))  # 7 tokens
    texts = {
        1: " ".join(f"a{i}" for i in range(12)) + " " + run,
        2: run + " " + " ".join(f"b{i}" for i in range(12)),
        3: " ".join(f"c{i}" for i in range(WINNOW_K + WINNOW_W - 2)),  # too short
        4: " ".join(f"d{i}" for i in range(20)),
    }
    rows = [
        Row(doc_id=d, text=t, lang="en", source="s", n_chars=1)
        for d, t in texts.items()
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def replica(text: str) -> set[tuple[int, int]]:
        t = text.split(" ")
        hs = [
            h60(" ".join(t[i : i + WINNOW_K]))
            for i in range(len(t) - WINNOW_K + 1)
        ]
        out = set()
        for j in range(len(hs) - WINNOW_W + 1):
            best_h, best_p = None, None
            for i in range(j, j + WINNOW_W):
                if best_h is None or hs[i] <= best_h:  # ties -> rightmost
                    best_h, best_p = hs[i], i
            out.add((best_p, best_h))
        return out

    got: dict[int, set] = {}
    for r in q_docs_winnow_fingerprints(spark, str(tmp_path)).collect():
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp_hash))
    assert set(got) == {1, 2, 4}  # doc 3 has no complete window
    for d in got:
        assert got[d] == replica(texts[d]), d

    # guarantee: every window contains a selected position
    for d, t in texts.items():
        if d not in got:
            continue
        n_hs = len(t.split(" ")) - WINNOW_K + 1
        sel = {p for p, _ in got[d]}
        for j in range(n_hs - WINNOW_W + 1):
            assert sel & set(range(j, j + WINNOW_W)), (d, j)
    # the shared 7-token run gives docs 1 and 2 a common fingerprint hash
    assert {h for _, h in got[1]} & {h for _, h in got[2]}

    # hoist pin: ONE md5 in the optimized two-projection plan
    from pdfplucker_spark.sources.tables import load

    fp = (
        load(spark, str(tmp_path), "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("t"))
        .select("doc_id", F.expr(_WINNOW_HS).alias("hs"))
        .select("doc_id", F.explode(F.expr(_WINNOW_FPS)).alias("fp"))
    )
    plan = fp._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5(") == 1, plan[:3000]
    spark.catalog.clearCache()


def test_winnow_pairs_detect_shared_runs_and_cap_never_fires(spark, tmp_path):
    """The MOSS matching step on the crafted shared-run corpus: the pair
    sharing a K+W-1-token run must surface with >= 1 shared fingerprint
    (the winnowing guarantee composed through the join); unrelated docs
    must not pair; the default occupancy cap must not drop anything at
    this scale (cap=None output identical); and the join must plan as a
    hash join, never a nested loop."""
    from pyspark.sql import Row

    from pdfplucker_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        q_docs_winnow_pairs,
    )

    run = " ".join(f"r{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    texts = {
        1: " ".join(f"a{i}" for i in range(12)) + " " + run,
        2: run + " " + " ".join(f"b{i}" for i in range(12)),
        4: " ".join(f"d{i}" for i in range(20)),
    }
    rows = [
        Row(doc_id=d, text=t, lang="en", source="s", n_chars=1)
        for d, t in texts.items()
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    res = q_docs_winnow_pairs(spark, str(tmp_path))
    got = {(r.doc_a, r.doc_b): r.n_shared_fps for r in res.collect()}
    assert set(got) == {(1, 2)} and got[(1, 2)] >= 1

    uncapped = {
        (r.doc_a, r.doc_b): r.n_shared_fps
        for r in q_docs_winnow_pairs(spark, str(tmp_path), bucket_cap=None).collect()
    }
    assert uncapped == got

    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    spark.catalog.clearCache()


def test_simhash_clusters_are_pair_graph_components(spark):
    """The simhash cluster table must be exactly the transitive closure of
    the Hamming pair graph (independent pure-Python union-find), with the
    component min-id as the cluster label and consistent sizes — and every
    reported Hamming pair co-clustered."""
    from pdfplucker_spark.operators.dedup import q_dedup_simhash_pairs
    from pdfplucker_spark.operators.pipeline import q_dedup_simhash_clusters

    pairs = [(r.doc_a, r.doc_b) for r in q_dedup_simhash_pairs(spark, SF).collect()]
    got = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in q_dedup_simhash_clusters(spark, SF).collect()
    }
    assert got, "empty cluster table"

    parent = {d: d for d in got}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = defaultdict(set)
    for d in got:
        comps[find(d)].add(d)
    for root, members in comps.items():
        lab = min(members)
        for d in members:
            assert got[d] == (lab, len(members)), (d, got[d], lab, len(members))
    for a, b in pairs:
        assert got[a][0] == got[b][0], (a, b)
    spark.catalog.clearCache()


def test_token_entropy_matches_shannon_and_extremes(spark, tmp_path):
    """token_entropy equals the pure-Python Shannon entropy (nats) within
    the micro-grid tolerance; a one-token-repeated doc scores exactly 0 and
    an all-distinct doc scores ln(n); null text degrades to 0, not null."""
    import math

    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import q_docs_token_entropy

    texts = {
        1: "a a a a a a a a",
        2: "t0 t1 t2 t3 t4 t5 t6 t7",
        3: "x x y y z mixed bag of words x",
        4: None,
    }
    rows = [
        Row(doc_id=d, text=t, lang="en", source="s", n_chars=1)
        for d, t in texts.items()
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    got = {r.doc_id: r for r in q_docs_token_entropy(spark, str(tmp_path)).collect()}
    assert set(got) == set(texts)

    def shannon(toks):
        n = len(toks)
        cnt = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        return math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n

    for d, t in texts.items():
        toks = (t or "").split(" ")
        exp = shannon(toks)
        assert abs(got[d].token_entropy - exp) <= 5e-6, (d, got[d], exp)
        assert got[d].n_tokens == len(toks)
        assert got[d].n_distinct_tokens == len(set(toks))
    assert got[1].token_entropy == 0.0
    assert abs(got[2].token_entropy - math.log(8)) <= 5e-6
    assert got[4].token_entropy == 0.0


def test_heading_outline_tiles_docs_and_owns_one_heading_per_section(spark):
    """The outline must TILE each document: sections in order, intervals
    contiguous and non-overlapping, span/char mass reconciling exactly with
    the raw span table; each section's header_text is the text of the one
    heading span that opened it (section 0 = headerless preamble only)."""
    from pdfplucker_spark.operators.spans_sql import (
        HEADING_KINDS,
        q_spans_heading_outline,
    )
    from pdfplucker_spark.sources.tables import derived_spans_flat

    sp = derived_spans_flat(spark, SF).collect()
    by_doc = defaultdict(list)
    for r in sp:
        by_doc[r.doc_id].append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.offset)

    out = defaultdict(list)
    for r in q_spans_heading_outline(spark, SF).collect():
        out[r.doc_id].append(r)
    assert set(out) == set(by_doc)

    for doc, secs in out.items():
        secs.sort(key=lambda r: r.section_idx)
        spans = by_doc[doc]
        # tiling: first section starts at the first offset, each section
        # ends right before the next one starts, last ends at the last span
        assert secs[0].start_offset == spans[0].offset
        assert secs[-1].end_offset == spans[-1].offset
        for a, b in zip(secs, secs[1:]):
            assert b.section_idx == a.section_idx + 1, (doc, a, b)
            nxt = min(s.offset for s in spans if s.offset > a.end_offset)
            assert b.start_offset == nxt, (doc, a, b)
        # mass reconciliation
        assert sum(s.n_spans for s in secs) == len(spans)
        assert sum(s.n_chars for s in secs) == sum(
            len(s.text) for s in spans if s.text is not None
        )
        # one heading per section, and it is the opener
        for s in secs:
            members = [
                x for x in spans if s.start_offset <= x.offset <= s.end_offset
            ]
            heads = [x for x in members if x.kind in HEADING_KINDS]
            if s.section_idx == 0:
                assert not heads and s.header_text is None
            else:
                assert len(heads) == 1
                assert heads[0].offset == s.start_offset
                assert s.header_text == heads[0].text


def test_pairs_agreement_matches_independent_set_arithmetic(spark):
    """The agreement matrix must equal pure-Python set arithmetic over the
    three detectors' collected pair sets, with the integer-grid overlap
    ratio; intersections are symmetric and bounded by both sizes."""
    from pdfplucker_spark.operators.dedup import (
        q_dedup_minhash_pairs,
        q_dedup_ngram_pairs,
        q_dedup_simhash_pairs,
    )
    from pdfplucker_spark.operators.pipeline import (
        AGREEMENT_MICRO,
        q_dedup_pairs_agreement,
    )

    sets = {
        "minhash": {(r.doc_a, r.doc_b) for r in q_dedup_minhash_pairs(spark, SF).collect()},
        "ngram": {(r.doc_a, r.doc_b) for r in q_dedup_ngram_pairs(spark, SF).collect()},
        "simhash": {(r.doc_a, r.doc_b) for r in q_dedup_simhash_pairs(spark, SF).collect()},
    }
    spark.catalog.clearCache()
    got = {
        (r.method_a, r.method_b): r
        for r in q_dedup_pairs_agreement(spark, SF).collect()
    }
    assert set(got) == {
        ("minhash", "ngram"),
        ("minhash", "simhash"),
        ("ngram", "simhash"),
    }
    for (ma, mb), r in got.items():
        a, b = sets[ma], sets[mb]
        common = len(a & b)
        assert (r.n_a, r.n_b, r.n_common) == (len(a), len(b), common)
        union = len(a) + len(b) - common
        exp = (common * AGREEMENT_MICRO) // union / AGREEMENT_MICRO if union else 1.0
        assert r.overlap_jaccard == exp, (ma, mb, r.overlap_jaccard, exp)
    spark.catalog.clearCache()


def test_section_chunks_pack_contract_and_never_split_sections(spark):
    """Chunk assignment follows the streaming-packing contract within each
    doc: chunk_idx = start//budget over the section-order running mass,
    chunk indices are monotone in section order, every non-final chunk is
    filled to (or straddles) its boundary, and each section belongs to
    exactly one chunk."""
    from pdfplucker_spark.operators.spans_sql import (
        SECTION_CHUNK_CHARS,
        q_spans_section_chunks,
    )

    rows = q_spans_section_chunks(spark, SF).collect()
    assert rows
    docs = defaultdict(list)
    for r in rows:
        docs[r.doc_id].append(r)
    multi = 0
    for secs in docs.values():
        secs.sort(key=lambda r: r.section_idx)
        cum = 0
        last_chunk = 0
        ends = defaultdict(int)
        for s in secs:
            assert s.chunk_start_char == cum, s
            assert s.chunk_idx == s.chunk_start_char // SECTION_CHUNK_CHARS, s
            assert s.chunk_idx >= last_chunk
            last_chunk = s.chunk_idx
            cum += s.n_chars
            ends[s.chunk_idx] = max(ends[s.chunk_idx], s.chunk_start_char + s.n_chars)
        for c, end in ends.items():
            if c < last_chunk:
                assert end >= (c + 1) * SECTION_CHUNK_CHARS, (c, end)
        if last_chunk > 0:
            multi += 1
    # the budget actually bites: most docs split into multiple chunks
    assert multi > len(docs) // 2, (multi, len(docs))


def test_cdc_chunks_tile_realign_after_edits_and_ratio_reconciles(spark, tmp_path):
    """CDC structural invariants: chunks tile each doc in order and
    reconstruct the text; only a chunk's LAST token may be a cut token.
    The content-defined property: prepending one token re-aligns every
    chunk after the first boundary (suffix chunk hashes identical) —
    which fixed-stride segmentation cannot do. The dedup-ratio table
    must reconcile exactly with the chunk table."""
    from pyspark.sql import Row

    from pdfplucker_spark.functions.hashing import md5_long
    from pdfplucker_spark.operators.dedup import (
        CDC_DIVISOR,
        q_docs_cdc_chunks,
        q_docs_cdc_dedup_ratio,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight again " * 3
    rows = [
        Row(doc_id=1, text=base.strip(), lang="en", source="s1", n_chars=1),
        Row(doc_id=2, text=("EDIT " + base).strip(), lang="en", source="s2", n_chars=1),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    # which tokens cut, per the engine's own portable hash
    toks = sorted(set(base.split()) | {"EDIT"})
    cuts = {
        r.tok
        for r in spark.createDataFrame([Row(tok=t) for t in toks])
        .select("tok", (md5_long(F.concat(F.lit("cdc:"), F.col("tok"))) % CDC_DIVISOR == 0).alias("c"))
        .collect()
        if r.c
    }
    assert cuts, "test corpus must contain at least one cut token"

    chunks = defaultdict(list)
    for r in q_docs_cdc_chunks(spark, str(tmp_path)).collect():
        chunks[r.doc_id].append(r)
    for doc_id, cs in chunks.items():
        cs.sort(key=lambda r: r.chunk_idx)
        text = rows[doc_id - 1].text
        assert " ".join(c.chunk_text for c in cs) == text
        assert [c.chunk_idx for c in cs] == list(range(len(cs)))
        for c in cs:
            words = c.chunk_text.split(" ")
            assert len(words) == c.n_tokens
            # no interior cut tokens — a cut closes its chunk
            assert not any(wd in cuts for wd in words[:-1]), c
        for c in cs[:-1]:
            assert c.chunk_text.split(" ")[-1] in cuts, c

    # edit locality: past the first boundary the token streams are equal,
    # so the chunk streams REALIGN exactly — either the edit merged into
    # chunk 0 (EDIT not a cut token: h2[1:] == h1[1:]) or it formed its
    # own chunk (EDIT is a cut token: h2[1:] == h1)
    h1 = [c.chunk_hash for c in chunks[1]]
    h2 = [c.chunk_hash for c in chunks[2]]
    assert h2[1:] == h1[1:] or h2[1:] == h1, (h1, h2)

    ratio = {r.source: r for r in q_docs_cdc_dedup_ratio(spark, str(tmp_path)).collect()}
    for src, doc in (("s1", 1), ("s2", 2)):
        hs = [c.chunk_hash for c in chunks[doc]]
        assert ratio[src].n_chunks == len(hs)
        assert ratio[src].n_distinct_chunks == len(set(hs))


def test_cdc_incremental_screen_replica_and_edit_robustness(spark, tmp_path):
    """The chunk-grain incremental screen equals a pure-Python replica
    (chunk both sides with the cut rule, index = non-batch distinct
    hashes, count membership), and it is EDIT-ROBUST: a batch doc that
    prepends one token to an indexed doc still matches on every
    realigned chunk, while a unique batch doc scores zero."""
    import hashlib

    from pyspark.sql import Row

    from pdfplucker_spark.operators.dedup import (
        CDC_DIVISOR,
        CDC_INC_MOD,
        q_docs_cdc_incremental,
    )

    def gate(doc_id):
        h = int(hashlib.md5(f"cinc:{doc_id}".encode()).hexdigest()[:15], 16)
        return h % CDC_INC_MOD

    batch_ids = [i for i in range(1, 200) if gate(i) == 0][:2]
    index_ids = [i for i in range(1, 200) if gate(i) != 0][:2]
    assert len(batch_ids) == 2 and len(index_ids) == 2

    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight again " * 3
    texts = {
        index_ids[0]: base.strip(),
        index_ids[1]: "completely different indexed content here now",
        batch_ids[0]: ("EDIT " + base).strip(),      # edited copy of indexed
        batch_ids[1]: "unique never seen tokens qq zz pp",  # novel
    }
    rows = [
        Row(doc_id=d, text=t, lang="en", source="s", n_chars=1)
        for d, t in texts.items()
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")

    def cut(tok):
        h = int(hashlib.md5(f"cdc:{tok}".encode()).hexdigest()[:15], 16)
        return h % CDC_DIVISOR == 0

    def chunks(text):
        out, cur = [], []
        for t in text.split(" "):
            cur.append(t)
            if cut(t):
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    idx_hashes = {
        hashlib.md5(c.encode()).hexdigest()
        for d in index_ids
        for c in chunks(texts[d])
    }
    got = {r.doc_id: r for r in q_docs_cdc_incremental(spark, str(tmp_path)).collect()}
    assert set(got) == set(batch_ids)
    for d in batch_ids:
        cs = chunks(texts[d])
        dup = sum(
            1 for c in cs if hashlib.md5(c.encode()).hexdigest() in idx_hashes
        )
        assert got[d].n_chunks == len(cs)
        assert got[d].n_dup_chunks == dup, (d, got[d], dup)
    # edit robustness: all but at most the first (edited) chunk match
    edited = got[batch_ids[0]]
    assert edited.n_dup_chunks >= edited.n_chunks - 1 > 0
    assert got[batch_ids[1]].n_dup_chunks == 0


def test_dsir_sample_is_exact_bernoulli_of_normalized_weight(spark):
    """The kept set equals the pure-Python replay of the log-space gate:
    keep iff round(ln(u)·1e6) < logw − max(logw), u = (md5%1e6+1)/1e6 —
    i.e. an exact deterministic Bernoulli(w/w_max) draw; kept rows carry
    the weight columns unchanged."""
    import hashlib
    import math

    from pdfplucker_spark.operators.pipeline import (
        q_docs_dsir_sample,
        q_docs_dsir_weights,
    )

    w = {r.doc_id: r for r in q_docs_dsir_weights(spark, SF).collect()}
    spark.catalog.clearCache()
    mx = max(r.logw_micro for r in w.values())

    def keeps(doc_id):
        h = int(hashlib.md5(f"dw:{doc_id}".encode()).hexdigest()[:15], 16)
        u = (h % 1000000 + 1) / 1000000.0
        return round(math.log(u) * 1000000) < w[doc_id].logw_micro - mx

    expect = {d for d in w if keeps(d)}
    got = {r.doc_id: r for r in q_docs_dsir_sample(spark, SF).collect()}
    assert set(got) == expect
    assert 0 < len(got) < len(w)  # the gate actually bites both ways
    for d, r in got.items():
        assert (r.n_feats, r.is_target, r.logw_micro) == (
            w[d].n_feats,
            w[d].is_target,
            w[d].logw_micro,
        )
    spark.catalog.clearCache()


def test_winnow_clusters_are_pair_graph_components(spark):
    """Winnow cluster table = transitive closure of the winnow pair graph
    (independent union-find), min-id labels, consistent sizes."""
    from pdfplucker_spark.operators.dedup import q_docs_winnow_pairs
    from pdfplucker_spark.operators.pipeline import q_docs_winnow_clusters

    pairs = [(r.doc_a, r.doc_b) for r in q_docs_winnow_pairs(spark, SF).collect()]
    got = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in q_docs_winnow_clusters(spark, SF).collect()
    }
    assert got
    parent = {d: d for d in got}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = defaultdict(set)
    for d in got:
        comps[find(d)].add(d)
    for members in comps.values():
        lab = min(members)
        for d in members:
            assert got[d] == (lab, len(members))
    spark.catalog.clearCache()


def test_cdc_chunks_fuzz_vs_python_replica(spark, tmp_path):
    """Property fuzz (hypothesis corpus-level: one Spark run per example,
    few examples — the Spark-operator analogue of the local-kernel fuzz):
    on arbitrary token streams (unicode, repeats, empties, None text) the
    CDC chunk table equals the pure-Python replica of the cut rule, and
    chunks always tile the document."""
    import hashlib

    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Row

    from pdfplucker_spark.operators.dedup import CDC_DIVISOR, q_docs_cdc_chunks

    TOK = st.sampled_from(
        ["a", "b", "the", "quick", "ação", "東京", "🙂", "x1", "zz", "word",
         "nav", "repeat", "repeat", "q", "末尾"]
    )
    DOCTEXT = st.one_of(
        st.none(),
        st.lists(TOK, min_size=0, max_size=30).map(lambda t: " ".join(t)),
    )

    def cut(tok):
        h = int(hashlib.md5(f"cdc:{tok}".encode()).hexdigest()[:15], 16)
        return h % CDC_DIVISOR == 0

    def replica(text):
        out, cur = [], []
        for t in (text or "").split(" "):
            cur.append(t)
            if cut(t):
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(st.lists(DOCTEXT, min_size=1, max_size=6))
    def run(texts):
        counter[0] += 1
        path = f"{tmp_path}/fz{counter[0]}"
        rows = [
            Row(doc_id=i + 1, text=t, lang="en", source="s", n_chars=1)
            for i, t in enumerate(texts)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{path}/documents.parquet")
        got = defaultdict(list)
        for r in q_docs_cdc_chunks(spark, path).collect():
            got[r.doc_id].append(r)
        assert set(got) == {i + 1 for i in range(len(texts))}
        for i, t in enumerate(texts):
            cs = sorted(got[i + 1], key=lambda r: r.chunk_idx)
            exp = replica(t)
            assert [c.chunk_text for c in cs] == exp, (t, cs)
            assert " ".join(c.chunk_text for c in cs) == (t or "")
            for c in cs:
                assert c.n_tokens == len(c.chunk_text.split(" "))
                assert c.chunk_hash == hashlib.md5(
                    c.chunk_text.encode()
                ).hexdigest()

    run()


def test_token_entropy_fuzz_vs_shannon_replica(spark, tmp_path):
    """Corpus-level fuzz: on arbitrary unicode/empty/None token streams
    the operator's entropy stays within the micro-grid tolerance of the
    pure-Python Shannon value and the count columns are exact."""
    import math

    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Row

    from pdfplucker_spark.operators.pipeline import q_docs_token_entropy

    TOK = st.sampled_from(
        ["a", "b", "b", "the", "ação", "東京", "🙂", "x1", "zz", "w", "w", "末尾"]
    )
    DOCTEXT = st.one_of(
        st.none(),
        st.lists(TOK, min_size=0, max_size=40).map(lambda t: " ".join(t)),
    )

    def shannon(toks):
        n = len(toks)
        cnt = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        return math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n

    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(st.lists(DOCTEXT, min_size=1, max_size=6))
    def run(texts):
        counter[0] += 1
        path = f"{tmp_path}/ez{counter[0]}"
        rows = [
            Row(doc_id=i + 1, text=t, lang="en", source="s", n_chars=1)
            for i, t in enumerate(texts)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{path}/documents.parquet")
        got = {r.doc_id: r for r in q_docs_token_entropy(spark, path).collect()}
        assert set(got) == {i + 1 for i in range(len(texts))}
        for i, t in enumerate(texts):
            toks = (t or "").split(" ")
            r = got[i + 1]
            assert r.n_tokens == len(toks)
            assert r.n_distinct_tokens == len(set(toks))
            assert abs(r.token_entropy - shannon(toks)) <= 5e-6, (t, r)

    run()
