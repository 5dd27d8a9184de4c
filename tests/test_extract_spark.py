"""End-to-end Spark vs pure-Python oracle equality (SURVEY §5 items 1 & 4).

The correctness invariant from BASELINE.json input_hint: exact per-doc
span-sequence equality (kind, text, media_ref, order) between the Spark
engine and the reference oracle, including error-path docs.
"""

import pyarrow as pa
import pytest

from pdfplucker_spark.gen import EDGE_DOCS, gen_rows, rows_to_table, write_tier
from pdfplucker_spark.operators.extract import extract_spans
from pdfplucker_spark.oracle import extract_doc


def _spark_df_from_rows(spark, rows):
    import tempfile

    import pyarrow.parquet as pq

    path = tempfile.mkdtemp(prefix="plk_") + "/in.parquet"
    pq.write_table(rows_to_table(rows), path)
    return spark.read.parquet(path)


def _assert_equal_to_oracle(result_rows, input_rows):
    got = {r["doc_id"]: r for r in result_rows}
    assert len(got) == len(input_rows), "row count mismatch (dup or lost docs)"
    for doc_id, spans in input_rows:
        exp = extract_doc(doc_id, spans)
        g = got[doc_id]
        assert g["status"] == exp["status"], (doc_id, g["status"], g["error"])
        assert (g["error"] or None) == exp["error"], doc_id
        got_spans = [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": s["offset"]}
            for s in g["spans"]
        ]
        assert got_spans == exp["spans"], f"span mismatch for {doc_id}"


def test_edge_docs_spark(spark):
    rows = list(EDGE_DOCS)
    out = extract_spans(_spark_df_from_rows(spark, rows)).collect()
    _assert_equal_to_oracle([r.asDict(recursive=True) for r in out], rows)


def test_t1_spark_repartitioned(spark):
    rows = list(gen_rows("t1"))
    df = _spark_df_from_rows(spark, rows).repartition(7)  # odd split on purpose
    out = extract_spans(df).collect()
    _assert_equal_to_oracle([r.asDict(recursive=True) for r in out], rows)


def test_t2_spark_full(spark):
    rows = list(gen_rows("t2"))
    df = _spark_df_from_rows(spark, rows)
    out = extract_spans(df).collect()
    _assert_equal_to_oracle([r.asDict(recursive=True) for r in out], rows)


def test_counters_match_bundle(spark):
    rows = list(gen_rows("t1"))
    out = extract_spans(_spark_df_from_rows(spark, rows)).collect()
    got = {r["doc_id"]: r for r in out}
    for doc_id, spans in rows:
        exp = extract_doc(doc_id, spans)
        g = got[doc_id]
        assert g["n_pages"] == len(exp["pages"])
        assert g["n_images"] == len(exp["images"])
        assert g["n_tables"] == len(exp["tables"])
        assert g["n_input_spans"] == len(spans)


def test_output_schema_stable(spark):
    df = extract_spans(_spark_df_from_rows(spark, list(EDGE_DOCS)))
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "status", "error", "spans",
        "n_input_spans", "n_pages", "n_images", "n_tables",
    ]
    span_t = df.schema["spans"].dataType.elementType
    assert [f.name for f in span_t.fields] == ["kind", "text", "media_ref", "offset"]


def test_adversarial_inputs_are_rows_not_failures(spark):
    """Spark-plumbing edges: a NULL spans array or a NULL span element is a
    per-doc ERROR ROW (F12 — one bad doc can't kill a 100 TB job); empty
    arrays and all-null fields extract to ok; an empty frame yields an
    empty frame; a missing spans column fails analysis cleanly."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    from pdfplucker_spark.schemas import INPUT_SCHEMA

    rows = [
        ("d_null_spans", None),
        ("d_null_elem", [None]),
        ("d_empty", []),
        ("d_null_fields", [{"kind": None, "text": None, "media_ref": None, "offset": None}]),
    ]
    out = {
        r["doc_id"]: r["status"]
        for r in extract_spans(spark.createDataFrame(rows, INPUT_SCHEMA)).collect()
    }
    assert out == {
        "d_null_spans": "error",
        "d_null_elem": "error",
        "d_empty": "ok",
        "d_null_fields": "ok",
    }
    assert extract_spans(spark.createDataFrame([], INPUT_SCHEMA)).count() == 0
    with pytest.raises(AnalysisException):
        extract_spans(spark.createDataFrame([("x",)], "doc_id string")).collect()


def test_no_shuffle_in_extract_plan(spark):
    """The extract stage must be map-only — no Exchange in the plan."""
    df = extract_spans(_spark_df_from_rows(spark, list(EDGE_DOCS)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_derived_spans_nested_is_map_only_and_matches_flat(spark):
    """r10: the nested spans table is built with an index-aware transform
    (map-only) instead of explode -> shuffle -> collect_list -> sort. Pin
    (a) row-for-row equality with the flat-derived reassembly and (b) the
    no-Exchange plan shape."""
    from pyspark.sql import functions as F

    from pdfplucker_spark.sources.tables import (
        derived_spans_flat,
        derived_spans_nested,
    )

    sf = "/root/testdata/sf0.001"
    flat = derived_spans_flat(spark, sf)
    rebuilt = (
        flat.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ).alias("_s")
        )
        .select(
            "doc_id",
            F.transform(
                "_s",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
        .select("doc_id", F.to_json("spans").alias("j"))
    )
    nested = derived_spans_nested(spark, sf).select(
        "doc_id", F.to_json("spans").alias("j")
    )
    assert rebuilt.exceptAll(nested).count() == 0
    assert nested.exceptAll(rebuilt).count() == 0
    plan = (
        derived_spans_nested(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one round-robin fan-out exchange at most (the under-parallel-scan
    # fix); never a hashpartitioning reassembly shuffle
    assert "hashpartitioning" not in plan, plan[:2000]
    assert "collect_list" not in plan, plan[:2000]
