"""Frozen Spark/Arrow schemas for the extraction engine.

Input schema is exactly BASELINE.json ``input_hint``; output schema is the
SURVEY.md §7.3 span contract plus status/error columns (failures are data,
not side-channel files — replaces the reference's temp-file error log,
/root/reference/pdfplucker/processor.py:24-121) and per-doc counters used by
the metrics aggregation (processor.py:380-388 analogue).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

SPAN_FIELDS = [
    ("kind", T.StringType()),
    ("text", T.StringType()),
    ("media_ref", T.StringType()),
    ("offset", T.IntegerType()),
]

SPAN_STRUCT = T.StructType([T.StructField(n, t, True) for n, t in SPAN_FIELDS])

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
    ]
)

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
        T.StructField("n_input_spans", T.IntegerType(), False),
        T.StructField("n_pages", T.IntegerType(), False),
        T.StructField("n_images", T.IntegerType(), False),
        T.StructField("n_tables", T.IntegerType(), False),
    ]
)

# Arrow mirror of EXTRACT_SCHEMA (mapInArrow yields these batches).
ARROW_SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)
ARROW_EXTRACT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("status", pa.string()),
        pa.field("error", pa.string()),
        pa.field("spans", pa.list_(ARROW_SPAN_STRUCT)),
        pa.field("n_input_spans", pa.int32()),
        pa.field("n_pages", pa.int32()),
        pa.field("n_images", pa.int32()),
        pa.field("n_tables", pa.int32()),
    ]
)

# Detail (sidecar) schemas mirroring the reference's Data bundle records
# after temp-field pops (utils.py:145-157,103-111,186-188,210-214).
IMAGE_DETAIL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("ref", T.StringType(), True),
        T.StructField("self_ref", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("classification", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("references", T.ArrayType(T.StringType()), True),
        T.StructField("footnotes", T.ArrayType(T.StringType()), True),
        T.StructField("page", T.IntegerType(), True),
    ]
)

TABLE_DETAIL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("self_ref", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("references", T.ArrayType(T.StringType()), True),
        T.StructField("footnotes", T.ArrayType(T.StringType()), True),
        T.StructField("page", T.IntegerType(), True),
        T.StructField("table", T.StringType(), True),
    ]
)
