"""Hostile-corpus cross-engine gates for round-4 analytics operators: the
driver corpora carry no NULL text / NULL event types / constant columns,
so these edges are exercised on purpose-built corpora against the SAME
registered oracle SQL."""

import duckdb

from pdfplucker_spark.operators.relational import (
    SQL_EVENTS_TRANSITION_MATRIX,
    SQL_LINEITEM_PRICE_HISTOGRAM,
    q_events_transition_matrix,
    q_lineitem_price_histogram,
)
from pdfplucker_spark.operators.textstats import (
    SQL_TEXT_GOPHER_RULES,
    q_text_gopher_rules,
)


def _cmp(spark_df, con, sql):
    key = lambda t: tuple(map(repr, t))
    got = sorted(map(tuple, spark_df.collect()), key=key)
    exp = sorted(map(tuple, con.execute(sql).fetchall()), key=key)
    assert got == exp, f"\nspark={got[:5]}\nduck ={exp[:5]}"
    return got


def test_gopher_rules_null_and_empty_text(spark, tmp_path):
    """NULL and empty text: both engines must agree (coalesce-first
    contract) and both docs must fail the gate deterministically."""
    rows = [
        (1, None, "en", "s", 0),
        (2, "", "en", "s", 0),
        (3, "the cat sat on the mat", "en", "s", 22),
        (4, "1 2 3 4 5 6 7 8 9 10 11 12", "en", "s", 26),  # numeric-heavy
        (5, "### ||| ### ||| the ###", "en", "s", 23),  # symbol-heavy
        # '42\n' token: Java's $ would match before the trailing newline
        # (counting it numeric) while DuckDB's regexp_full_match would not —
        # the \A..\z anchors keep both engines at "not numeric"
        (6, "the 42\n cat sat on mat", "en", "s", 22),
    ]
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    got = _cmp(q_text_gopher_rules(spark, str(tmp_path)), con, SQL_TEXT_GOPHER_RULES)
    verdicts = {r[0]: r[-1] for r in got}
    assert verdicts[1] is False and verdicts[2] is False  # null/empty fail
    assert verdicts[3] is True  # normal prose passes
    assert verdicts[4] is False  # numeric fraction rule
    assert verdicts[5] is False  # symbol ratio rule
    newline_doc = [r for r in got if r[0] == 6][0]
    assert newline_doc[4] == 0.0  # '42\n' is NOT a numeric token in either engine


def test_histogram_constant_price_column(spark, tmp_path):
    """hi == lo: the band expression is 0/0 without the guard — both
    engines must route every row to band 0."""
    rows = [(i, 42.5) for i in range(10)]
    p = f"{tmp_path}/lineitem.parquet"
    spark.createDataFrame(rows, "l_orderkey long, l_extendedprice double").write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{p}/*.parquet')")
    got = _cmp(
        q_lineitem_price_histogram(spark, str(tmp_path)),
        con,
        SQL_LINEITEM_PRICE_HISTOGRAM,
    )
    assert len(got) == 1 and got[0][0] == 0 and got[0][2] == 10


def test_transition_matrix_null_event_types(spark, tmp_path):
    """NULL event types: transitions INTO a NULL type group under the NULL
    key identically in both engines; transitions OUT of NULL are dropped by
    the prev IS NOT NULL filter in both."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, None),
        (2, "2024-01-01 10:01:00", 1, None, 1.0, None),
        (3, "2024-01-01 10:02:00", 1, "purchase", 1.0, None),
        (4, "2024-01-01 10:03:00", 1, "view", 1.0, None),
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
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')")
    got = _cmp(
        q_events_transition_matrix(spark, str(tmp_path)),
        con,
        SQL_EVENTS_TRANSITION_MATRIX,
    )
    # view->NULL and purchase->view survive; NULL->purchase dropped
    assert ("view", None, 1, 1.0) in got
    assert ("purchase", "view", 1, 1.0) in got
    assert not any(r[0] is None for r in got)


def test_round6_curation_ops_on_null_heavy_corpus(spark, tmp_path):
    """Round-6 curation operators on a corpus the driver SFs never build:
    NULL doc_id, NULL source, NULL n_chars, and heavy n_chars ties. Each
    operator must agree with its REGISTERED oracle SQL, and NULL-id docs
    must be absent from the shuffle order in both engines."""
    from pdfplucker_spark.operators.pipeline import (
        SQL_DOCS_DOMAIN_CAP,
        SQL_DOCS_MIX_TEMPERATURE,
        SQL_DOCS_SHUFFLE_ORDER,
        q_docs_domain_cap,
        q_docs_mix_temperature,
        q_docs_shuffle_order,
    )

    rows = [
        (None, "orphan", "en", "s1", 10),
        # NULL id TYING real docs on n_chars in the same source: doc_id ASC
        # sorts NULLs first in Spark but last in DuckDB, so without the
        # NULL-id exclusion this row would shift domain_rank for 4/5 in
        # one engine only (the round-6 advice divergence, now exercised)
        (None, "tie", "en", "s1", 30),
        (1, "a", "en", None, 10),        # NULL source
        (2, "b", "en", None, 20),
        (3, "c", "en", "s1", None),      # NULL n_chars
        (4, "d", "en", "s1", 30),
        (5, "e", "en", "s1", 30),        # tie with 4
        (6, "f", "en", "s2", 30),
    ] + [(100 + i, "t", "en", "s2", 30) for i in range(30)]  # ties past the cap
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")

    shuffle = _cmp(q_docs_shuffle_order(spark, str(tmp_path)), con, SQL_DOCS_SHUFFLE_ORDER)
    ids = [r[0] for r in shuffle]
    assert None not in ids and sorted(r[1] for r in shuffle) == list(range(len(ids)))

    capped = _cmp(q_docs_domain_cap(spark, str(tmp_path)), con, SQL_DOCS_DOMAIN_CAP)
    assert not any(r[0] is None for r in capped)  # NULL ids excluded (both engines)
    _cmp(q_docs_mix_temperature(spark, str(tmp_path)), con, SQL_DOCS_MIX_TEMPERATURE)


def test_dedup_canonical_null_id_tie(spark, tmp_path):
    """A NULL-id doc TYING a real doc on n_chars inside one bag group: the
    canonical window's doc_id tie-break is asc_nulls_last because Spark's
    plain ASC sorts NULLs FIRST while DuckDB's sorts them LAST — without
    it the two engines pick different canonicals (NULL vs 7) for the tied
    group. Also covers an all-NULL-id singleton group (canonical stays
    NULL in both engines — nothing addressable to prefer)."""
    from pdfplucker_spark.operators.pipeline import (
        SQL_DEDUP_CANONICAL,
        q_dedup_canonical,
    )

    rows = [
        (None, "x y", "en", "s1", 10),   # bag {x,y}, ties doc 7
        (7, "y x", "en", "s1", 10),      # same bag, same n_chars
        (8, "x y z", "en", "s1", 12),    # different bag
        (None, "p q", "en", "s1", 5),    # all-NULL-id singleton group
    ]
    p = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    got = _cmp(q_dedup_canonical(spark, str(tmp_path)), con, SQL_DEDUP_CANONICAL)
    tied = [r for r in got if r[3] == 2]
    assert len(tied) == 1 and tied[0][1] == 7  # tied group: addressable doc wins
    assert sum(r[1] is None for r in got) == 1  # only the singleton stays NULL
