"""Multimodal column plumbing: opaque binary media + vectorized decode stub.

Media arrive as refs in the span table (BASELINE.json input_hint: bytes out
of scope). This module demonstrates the *real* Spark plumbing a multimodal
pipeline needs — a typed ``binary`` column fetched by ref (here synthesized
content-addressed: md5(media_ref || doc_id) as 16 fake bytes), pushed
through a vectorized Arrow decode stage that parses per-item metadata.

THE DECODER IS A STUB: real image decoding (PIL/libvips) is not in this
container, so ``_decode_stub`` derives deterministic fake metadata from the
bytes. The Spark-side plumbing — binary Arrow column, mapInArrow batch
shape, schema, partition-agnostic map-only plan — is real and oracle-tested
(the DuckDB oracle reproduces the same metadata from md5 arithmetic).
Swap ``_decode_stub`` for a real decoder to productionize.
"""

from __future__ import annotations

from typing import Iterator, List

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from pdfplucker_spark.sources.tables import DERIVED_SPANS_CTE, derived_spans_flat

_FORMATS = ["png", "jpeg", "webp", "gif"]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("media_format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)

_ARROW_OUT = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("media_format", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("channels", pa.int32()),
    ]
)


def _decode_stub(blob: bytes):
    """STUB decode: deterministic fake metadata from the bytes.

    A real implementation would be e.g. PIL.Image.open(io.BytesIO(blob));
    raise NotImplementedError there if the codec is unavailable.
    """
    h = blob.hex()
    return (
        _FORMATS[int(h[0], 16) % 4],
        64 + int(h[:15], 16) % 1856,
        64 + int(h[15:30], 16) % 1024,
        1 + int(h[30], 16) % 4,
    )


def _decode_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        doc = batch.column(batch.schema.get_field_index("doc_id"))
        ref = batch.column(batch.schema.get_field_index("media_ref"))
        blob = batch.column(batch.schema.get_field_index("media_bytes"))
        fmts: List[str] = []
        ws: List[int] = []
        hs: List[int] = []
        cs: List[int] = []
        # per-item loop over the Arrow buffer is the decode stage's nature
        # (each blob is an independent codec call); batch-level transfer
        # stays columnar/Arrow
        for b in blob:
            f, w, h, c = _decode_stub(b.as_py())
            fmts.append(f)
            ws.append(w)
            hs.append(h)
            cs.append(c)
        yield pa.RecordBatch.from_arrays(
            [
                doc,
                ref,
                pa.array(fmts, pa.string()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
                pa.array(cs, pa.int32()),
            ],
            schema=_ARROW_OUT,
        )


def media_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Picture spans with their (synthesized content-addressed) bytes."""
    pics = derived_spans_flat(spark, sf_dir).where(F.col("kind") == "picture")
    return pics.select(
        "doc_id",
        "media_ref",
        F.unhex(F.md5(F.concat("media_ref", "doc_id"))).alias("media_bytes"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary media column → decoded metadata via one Arrow map stage."""
    return media_items(spark, sf_dir).mapInArrow(_decode_batches, MEDIA_META_SCHEMA)


def _hx(start: int, ln: int) -> str:
    return f"CAST('0x' || substr(h, {start}, {ln}) AS BIGINT)"


SQL_MEDIA_FEATURES = f"""WITH {DERIVED_SPANS_CTE},
m AS (
  SELECT doc_id, media_ref, md5(media_ref || doc_id) AS h
  FROM spans WHERE kind = 'picture'
)
SELECT doc_id, media_ref,
       CASE CAST({_hx(1, 1)} % 4 AS INT)
         WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'webp' ELSE 'gif' END
         AS media_format,
       CAST(64 + {_hx(1, 15)} % 1856 AS INT) AS width,
       CAST(64 + {_hx(16, 15)} % 1024 AS INT) AS height,
       CAST(1 + {_hx(31, 1)} % 4 AS INT) AS channels
FROM m"""


QUERIES = {
    "media_features": (q_media_features, SQL_MEDIA_FEATURES),
}
