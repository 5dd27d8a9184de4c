"""Multi-format source/sink connectors (SURVEY.md §2.3 connectors row).

The engine is parquet/iceberg-first, but ingestion at the edge of a 100 TB
pipeline arrives as CSV dumps, JSON lines, or ORC from other stacks. These
helpers keep that path declarative: every format maps onto the same
DataFrame with an EXPLICIT schema (schema inference is a full extra pass
over the data at scale — never rely on it in production paths), so
downstream plans are format-agnostic.

CSV cannot carry the nested `spans` column; for the flat `documents` shape
it is supported, for the nested input shape JSON/ORC/parquet are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pdfplucker_spark.schemas import INPUT_SCHEMA

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

_FLAT_FORMATS = ("parquet", "orc", "json", "csv")
_NESTED_FORMATS = ("parquet", "orc", "json")


def read_documents(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """Read the flat documents table from any supported format."""
    if fmt not in _FLAT_FORMATS:
        raise ValueError(f"unsupported documents format: {fmt}")
    reader = spark.read.schema(DOCUMENTS_SCHEMA)
    if fmt == "csv":
        # multiLine: document text contains no newlines by contract, but
        # quotes/escapes are handled by the standard csv dialect
        return reader.option("header", "true").option("escape", '"').csv(path)
    return getattr(reader, fmt)(path)


def write_documents(df: DataFrame, path: str, fmt: str) -> None:
    if fmt not in _FLAT_FORMATS:
        raise ValueError(f"unsupported documents format: {fmt}")
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").option("escape", '"').csv(path)
    else:
        getattr(writer, fmt)(path)


def read_media_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """RAW media ingestion — the production entry point for the multimodal
    tier: Spark's ``binaryFile`` source reads whole files as one binary row
    each (path, modificationTime, length, content), distributed and
    partition-pruned like any other scan. Decode stages (multimodal.py)
    consume the ``content`` column directly; ``pathGlobFilter`` prunes by
    extension BEFORE any bytes are read."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text ingestion — the rawest crawl-dump format: one
    document per line via the built-in ``text`` source (distributed,
    splittable). Returns (doc_id, text, source): doc_id is the
    content-addressed md5 of (file, line), so ids are DETERMINISTIC across
    runs, partitionings, and scan orders (a monotonically_increasing_id
    would not be). Identical lines within one file share an id and are
    COLLAPSED to one row (dropDuplicates on the id) — for a crawl dump
    that is exact same-file dedup, and it keeps doc_id an actual key for
    every downstream doc_id-keyed operator. The id hashes the file name
    and the line through separate digests (not a delimited concat: a ':'
    in a filename could otherwise make distinct (file, line) pairs
    collide)."""
    from pyspark.sql import functions as F

    return (
        spark.read.text(path)
        .select(
            F.md5(
                F.concat(F.md5(F.input_file_name()), F.md5(F.col("value")))
            ).alias("doc_id"),
            F.col("value").alias("text"),
            F.input_file_name().alias("source"),
        )
        .dropDuplicates(["doc_id"])
    )


def read_docs_nested(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """Read the nested (doc_id, spans) input table from any format that can
    carry the nested struct array."""
    if fmt not in _NESTED_FORMATS:
        raise ValueError(f"unsupported nested-input format: {fmt}")
    return getattr(spark.read.schema(INPUT_SCHEMA), fmt)(path)


def write_docs_nested(df: DataFrame, path: str, fmt: str) -> None:
    if fmt not in _NESTED_FORMATS:
        raise ValueError(f"unsupported nested-input format: {fmt}")
    getattr(df.write.mode("overwrite"), fmt)(path)
