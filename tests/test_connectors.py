"""Multi-format connectors: every format roundtrips to the identical
DataFrame, and the extraction engine is format-agnostic over them."""

import pytest

from pyspark.sql import functions as F

from pdfplucker_spark.gen import write_tier
from pdfplucker_spark.sources.connectors import (
    read_docs_nested,
    read_documents,
    write_docs_nested,
    write_documents,
)


@pytest.fixture(scope="module")
def t1_path(tmp_path_factory):
    return write_tier("t1", str(tmp_path_factory.mktemp("data")))


def _fingerprint(df, cols):
    rows = df.select(
        F.md5(F.to_json(F.struct(*cols))).alias("h")
    ).collect()
    return sorted(r.h for r in rows)


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_documents_roundtrip(spark, tmp_path, fmt):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / f"docs_{fmt}")
    write_documents(src, out, fmt)
    back = read_documents(spark, out, fmt)
    cols = src.columns
    assert _fingerprint(back, cols) == _fingerprint(src, cols)


@pytest.mark.parametrize("fmt", ["orc", "json"])
def test_nested_input_roundtrip_through_engine(spark, tmp_path, t1_path, fmt):
    from pdfplucker_spark.operators.extract import extract_spans

    src = spark.read.parquet(t1_path)
    out = str(tmp_path / f"nested_{fmt}")
    write_docs_nested(src, out, fmt)
    back = read_docs_nested(spark, out, fmt)

    exp = extract_spans(src).select("doc_id", "status", F.to_json("spans").alias("s"))
    got = extract_spans(back).select("doc_id", "status", F.to_json("spans").alias("s"))
    assert _fingerprint(got, got.columns) == _fingerprint(exp, exp.columns)


def test_csv_rejected_for_nested(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        read_docs_nested(spark, str(tmp_path), "csv")


def test_text_lines_ingestion_deterministic_ids(spark, tmp_path):
    """Line-oriented text source: one doc per line, ids content-addressed
    and stable across re-reads and repartitioning."""
    import os

    from pdfplucker_spark.sources.connectors import read_text_lines

    d = tmp_path / "txt"
    os.makedirs(d)
    (d / "a.txt").write_text("the cat sat\non the mat\n")
    (d / "b.txt").write_text("another document line\n")
    df = read_text_lines(spark, str(d))
    rows = df.collect()
    assert len(rows) == 3
    assert {r.text for r in rows} == {
        "the cat sat", "on the mat", "another document line",
    }
    assert len({r.doc_id for r in rows}) == 3
    again = {r.text: r.doc_id for r in read_text_lines(spark, str(d)).repartition(8).collect()}
    for r in rows:
        assert again[r.text] == r.doc_id  # deterministic across scans
    assert all(r.source.endswith(".txt") for r in rows)


def test_text_lines_duplicate_lines_collapse_to_one_row(spark, tmp_path):
    """doc_id must be a KEY: the same line twice in one file collapses to
    one row; the same line in DIFFERENT files stays two docs."""
    import os

    from pdfplucker_spark.sources.connectors import read_text_lines

    d = tmp_path / "txt2"
    os.makedirs(d)
    (d / "a.txt").write_text("dup line\ndup line\nunique a\n")
    (d / "b.txt").write_text("dup line\n")
    rows = read_text_lines(spark, str(d)).collect()
    assert len(rows) == 3  # a:dup, a:unique, b:dup
    assert len({r.doc_id for r in rows}) == 3
