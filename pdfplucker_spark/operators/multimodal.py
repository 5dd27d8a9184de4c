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
import pyarrow.compute as pc

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


# ---------------------------------------------------------------------------
# frame sampling: 1→N vectorized expansion over typed media
# ---------------------------------------------------------------------------
_FRAME_OUT = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("media_kind", pa.string()),
        pa.field("frame_idx", pa.int32()),
        pa.field("frame_ref", pa.string()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("media_kind", T.StringType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("frame_ref", T.StringType(), True),
    ]
)

_KINDS3 = ["image", "video", "audio"]


def _frame_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """STUB frame sampler: media type + frame count derived from the bytes
    (a real one would probe the container and decode keyframes). The
    Spark-side shape is real: a vectorized 1→N row expansion via
    np.repeat over Arrow buffers — no per-row Python except the hex reads."""
    import numpy as np

    for batch in batches:
        doc = batch.column(batch.schema.get_field_index("doc_id"))
        ref = batch.column(batch.schema.get_field_index("media_ref"))
        blob = batch.column(batch.schema.get_field_index("media_bytes"))
        n = batch.num_rows
        kinds = np.empty(n, dtype=object)
        counts = np.empty(n, dtype=np.int64)
        for i, b in enumerate(blob):  # stub "container probe" per item
            h = b.as_py().hex()
            k = int(h[:15], 16) % 3
            kinds[i] = _KINDS3[k]
            counts[i] = 1 if k == 0 else (2 + int(h[15], 16) % 7 if k == 1 else 1 + int(h[15], 16) % 3)
        idx = np.repeat(np.arange(n), counts)
        frame_idx = (np.arange(len(idx)) - np.repeat(np.cumsum(counts) - counts, counts)).astype(np.int32)
        take = pa.array(idx)
        ref_rep = ref.take(take)
        frame_ref = pc.binary_join_element_wise(
            pc.fill_null(ref_rep, ""), "#", pc.cast(pa.array(frame_idx), pa.string()), ""
        )
        yield pa.RecordBatch.from_arrays(
            [
                doc.take(take),
                ref_rep,
                pa.array(kinds, pa.string()).take(take),
                pa.array(frame_idx, pa.int32()),
                frame_ref,
            ],
            schema=_FRAME_OUT,
        )


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-media frame/chunk sampling: image→1 frame, video→2-8 frames,
    audio→1-3 chunks; deterministic stub decode, real expansion plumbing."""
    return media_items(spark, sf_dir).mapInArrow(_frame_batches, FRAME_SCHEMA)


SQL_MEDIA_FRAMES = f"""WITH {DERIVED_SPANS_CTE},
m AS (
  SELECT doc_id, media_ref, md5(media_ref || doc_id) AS h
  FROM spans WHERE kind = 'picture'
),
typed AS (
  SELECT doc_id, media_ref,
         CAST({_hx(1, 15)} % 3 AS INT) AS k,
         CAST({_hx(16, 1)} AS INT) AS h16
  FROM m
),
counted AS (
  SELECT doc_id, media_ref,
         CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'video' ELSE 'audio' END AS media_kind,
         CASE k WHEN 0 THEN 1 WHEN 1 THEN 2 + h16 % 7 ELSE 1 + h16 % 3 END AS n_frames
  FROM typed
)
SELECT doc_id, media_ref, media_kind,
       CAST(UNNEST(range(n_frames)) AS INT) AS frame_idx,
       media_ref || '#' || CAST(UNNEST(range(n_frames)) AS VARCHAR) AS frame_ref
FROM counted"""


QUERIES = {
    "media_features": (q_media_features, SQL_MEDIA_FEATURES),
    "media_frames": (q_media_frames, SQL_MEDIA_FRAMES),
}
