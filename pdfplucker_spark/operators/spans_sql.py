"""SQL-expressible span operators over the derived interleaved-spans view.

Each operator here is one of the format_results dataflow operators
(SURVEY.md §2.2 F3/F4/F6/F7 and the full composition) re-expressed twice:
  - Spark DataFrame API (the ``queries()`` entry — what the engine does),
  - independent DuckDB SQL (the ``oracle_sql()`` entry the driver compares
    against at sf0.01).

``extract_full`` is the flagship: the ENTIRE per-doc transform (pages with
first-touch ordering + placeholders, image spans with per-doc counters and
caption joins, table spans, dense output offsets) as one SQL statement —
a full-pipeline oracle for the vectorized engine on the poison-free derived
corpus (the poison/error path is covered by pytest instead, FIXTURES §3.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pdfplucker_spark.operators.extract import extract_spans
from pdfplucker_spark.oracle import TEXT_FORMATS
from pdfplucker_spark.sources.tables import (
    DERIVED_SPANS_CTE,
    derived_spans_flat,
    derived_spans_nested,
)

# text kinds that occur in the derived corpus (cycle of 16, tables.py) —
# ALL 13 branches of the reference's label dispatch (utils.py:52-85),
# so every F3 format branch passes through the driver's DuckDB gate.
_DERIVED_TEXT_KINDS = [
    "section_header",
    "paragraph",
    "text",
    "list_item",
    "caption",
    "title",
    "footnote",
    "formula",
    "reference",
    "page_footer",
    "checkbox_selected",
    "checkbox_unselected",
    "code",
]


def _sql_str(s: str) -> str:
    """Render a python string as a DuckDB expression (newlines via chr(10))."""
    if s == "":
        return "''"
    parts = []
    for i, seg in enumerate(s.split("\n")):
        if i > 0:
            parts.append("chr(10)")
        if seg:
            parts.append("'" + seg.replace("'", "''") + "'")
    return " || ".join(parts) if parts else "''"


def _frag_case_sql(col_kind: str = "kind", col_text: str = "text") -> str:
    whens = "\n    ".join(
        f"WHEN '{k}' THEN {_sql_str(TEXT_FORMATS[k][0])} || {col_text} || {_sql_str(TEXT_FORMATS[k][1])}".replace(
            " || ''", ""
        )
        for k in _DERIVED_TEXT_KINDS
    )
    return f"CASE {col_kind}\n    {whens}\n  END"


def _frag_col():
    c = None
    for k in _DERIVED_TEXT_KINDS:
        pre, suf = TEXT_FORMATS[k]
        expr = F.concat(F.lit(pre), F.col("text"), F.lit(suf))
        c = F.when(F.col("kind") == k, expr) if c is None else c.when(F.col("kind") == k, expr)
    return c


def _page_col():
    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    page_val = F.when(
        F.col("kind") == "page_break", F.col("media_ref").cast("int")
    )
    return F.coalesce(F.last(page_val, ignorenulls=True).over(w), F.lit(1))


_PAGED_SQL = f"""
paged AS (
  SELECT doc_id, kind, text, media_ref, "offset",
         COALESCE(last_value(CASE WHEN kind = 'page_break'
                                  THEN CAST(media_ref AS INT) END IGNORE NULLS)
                  OVER (PARTITION BY doc_id ORDER BY "offset"
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1)
           AS page
  FROM spans
)
"""

_TEXT_KINDS_IN = "(" + ", ".join(f"'{k}'" for k in _DERIVED_TEXT_KINDS) + ")"


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------
def q_spans_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derived_spans_flat(spark, sf_dir)


SQL_SPANS_DERIVE = f'WITH {DERIVED_SPANS_CTE} SELECT doc_id, kind, text, media_ref, "offset" FROM spans'


def q_f3_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: the 13-way label→markdown projection (utils.py:51-85)."""
    s = derived_spans_flat(spark, sf_dir)
    return s.where(F.col("kind").isin(_DERIVED_TEXT_KINDS)).select(
        "doc_id", "offset", _frag_col().alias("frag")
    )


SQL_F3_FORMAT = f"""WITH {DERIVED_SPANS_CTE}
SELECT doc_id, "offset", {_frag_case_sql()} AS frag
FROM spans WHERE kind IN {_TEXT_KINDS_IN}"""


def q_f4_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: group-by page + ordered concat with first-touch marker
    (utils.py:45-48,88) over text-kind fragments."""
    s = derived_spans_flat(spark, sf_dir).withColumn("page", _page_col())
    frags = s.where(F.col("kind").isin(_DERIVED_TEXT_KINDS)).select(
        "doc_id", "page", "offset", _frag_col().alias("frag")
    )
    return frags.groupBy("doc_id", "page").agg(
        F.min("offset").alias("first_touch"),
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("offset", "frag"))),
                lambda x: x["frag"],
            ),
        ).alias("content"),
    )


SQL_F4_PAGES = f"""WITH {DERIVED_SPANS_CTE}, {_PAGED_SQL}
SELECT doc_id, page, MIN("offset") AS first_touch,
       STRING_AGG({_frag_case_sql()}, '' ORDER BY "offset") AS content
FROM paged WHERE kind IN {_TEXT_KINDS_IN}
GROUP BY doc_id, page"""


def q_f6_picture_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: per-doc picture counter in stream order → placeholder rewrite
    (utils.py:37,132-133,158)."""
    s = derived_spans_flat(spark, sf_dir).where(F.col("kind") == "picture")
    w = Window.partitionBy("doc_id").orderBy("offset")
    seq = (F.row_number().over(w) - 1).cast("long")
    return s.select(
        "doc_id",
        "offset",
        F.col("media_ref").alias("self_ref"),
        F.concat("doc_id", F.lit("_"), seq.cast("string"), F.lit(".png")).alias(
            "placeholder"
        ),
    )


SQL_F6_PICTURE_SEQ = f"""WITH {DERIVED_SPANS_CTE}
SELECT doc_id, "offset", media_ref AS self_ref,
       doc_id || '_' || CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset") - 1 AS VARCHAR) || '.png' AS placeholder
FROM spans WHERE kind = 'picture'"""


def q_f7_captions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7+F9: last-caption-per-parent map, applied to table/picture refs
    (utils.py:60-69,167-171,192-195)."""
    s = derived_spans_flat(spark, sf_dir)
    caps = (
        s.where((F.col("kind") == "caption") & F.col("media_ref").isNotNull())
        .groupBy("doc_id", F.col("media_ref").alias("parent"))
        .agg(F.max_by("text", "offset").alias("cap"))
    )
    targets = s.where(F.col("kind").isin("table", "picture")).select(
        "doc_id", F.col("kind").alias("target_kind"), F.col("media_ref").alias("self_ref"), "offset"
    )
    return targets.join(
        caps,
        (targets.doc_id == caps.doc_id) & (targets.self_ref == caps.parent),
        "left",
    ).select(
        targets.doc_id,
        "target_kind",
        "self_ref",
        "offset",
        F.coalesce("cap", F.lit("")).alias("caption"),
    )


SQL_F7_CAPTIONS = f"""WITH {DERIVED_SPANS_CTE},
caps AS (
  SELECT doc_id, media_ref AS parent, arg_max(text, "offset") AS cap
  FROM spans WHERE kind = 'caption' AND media_ref IS NOT NULL
  GROUP BY doc_id, media_ref
)
SELECT t.doc_id, t.kind AS target_kind, t.media_ref AS self_ref, t."offset",
       COALESCE(c.cap, '') AS caption
FROM spans t LEFT JOIN caps c ON c.doc_id = t.doc_id AND c.parent = t.media_ref
WHERE t.kind IN ('table', 'picture')"""


def flatten_spans(ext: DataFrame) -> DataFrame:
    """Flatten an extract-output frame to one row per output span — the
    single definition of the flat compare shape, shared by the batch
    flagship and the streaming drain (both gate against the same oracle, so
    their flatteners must never drift)."""
    return ext.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def q_extract_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: the WHOLE engine (mapInArrow) over the derived corpus,
    output exploded to flat spans for comparison."""
    return flatten_spans(extract_spans(derived_spans_nested(spark, sf_dir)))


SQL_EXTRACT_FULL = f"""WITH {DERIVED_SPANS_CTE}, {_PAGED_SQL},
pic AS (
  SELECT doc_id, page, "offset", media_ref,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset") - 1 AS seq
  FROM paged WHERE kind = 'picture'
),
frag AS (
  SELECT doc_id, page, "offset", {_frag_case_sql()} AS frag
  FROM paged WHERE kind IN {_TEXT_KINDS_IN}
  UNION ALL
  SELECT doc_id, page, "offset", ' <' || media_ref || '>' FROM paged WHERE kind = 'table'
  UNION ALL
  SELECT doc_id, page, "offset",
         ' <' || doc_id || '_' || CAST(seq AS VARCHAR) || '.png>' FROM pic
),
pages AS (
  SELECT doc_id, page, MIN("offset") AS ft,
         STRING_AGG(frag, '' ORDER BY "offset") AS content
  FROM frag GROUP BY doc_id, page
),
caps AS (
  SELECT doc_id, media_ref AS parent, arg_max(text, "offset") AS cap
  FROM spans WHERE kind = 'caption' AND media_ref IS NOT NULL
  GROUP BY doc_id, media_ref
),
out AS (
  SELECT doc_id, 0 AS sec, ft AS ord, 'page' AS kind, content AS text,
         CAST(page AS VARCHAR) AS media_ref
  FROM pages
  UNION ALL
  SELECT p.doc_id, 1, p.seq, 'image', COALESCE(c.cap, ''),
         p.doc_id || '_' || CAST(p.seq AS VARCHAR) || '.png'
  FROM pic p LEFT JOIN caps c ON c.doc_id = p.doc_id AND c.parent = p.media_ref
  UNION ALL
  SELECT doc_id, 2, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset") - 1,
         'table', text, media_ref
  FROM paged WHERE kind = 'table'
)
SELECT doc_id, kind, text, media_ref,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sec, ord) - 1 AS INT) AS "offset"
FROM out"""


def q_extract_agg_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine per-doc counters aggregated (S11/S12 analogue) — cross-checked
    against counts derived in pure SQL from the input spans."""
    ext = extract_spans(derived_spans_nested(spark, sf_dir))
    return ext.agg(
        F.count("*").alias("total_docs"),
        F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("failed_docs"),
        F.sum("n_input_spans").alias("total_input_spans"),
        F.sum("n_pages").alias("total_pages"),
        F.sum("n_images").alias("total_images"),
        F.sum("n_tables").alias("total_tables"),
    )


SQL_EXTRACT_AGG_METRICS = f"""WITH {DERIVED_SPANS_CTE}, {_PAGED_SQL},
per_doc_pages AS (
  SELECT doc_id, COUNT(DISTINCT page) AS n_pages
  FROM paged WHERE kind <> 'page_break' GROUP BY doc_id
)
SELECT (SELECT COUNT(DISTINCT doc_id) FROM spans) AS total_docs,
       CAST(0 AS BIGINT) AS failed_docs,
       (SELECT COUNT(*) FROM spans) AS total_input_spans,
       (SELECT CAST(SUM(n_pages) AS BIGINT) FROM per_doc_pages) AS total_pages,
       (SELECT COUNT(*) FROM spans WHERE kind = 'picture') AS total_images,
       (SELECT COUNT(*) FROM spans WHERE kind = 'table') AS total_tables"""


def q_extract_images_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image detail records (utils.py:145-157 after pops): engine bundle
    path incl. classification argmax — vs pure-SQL derivation."""
    from pdfplucker_spark.operators.extract import extract_bundle

    b = extract_bundle(derived_spans_nested(spark, sf_dir))
    return b.select("doc_id", F.explode("images").alias("im")).select(
        "doc_id",
        F.col("im.ref").alias("ref"),
        F.col("im.self_ref").alias("self_ref"),
        F.col("im.caption").alias("caption"),
        F.col("im.classification").alias("classification"),
        F.col("im.confidence").alias("confidence"),
        F.col("im.page").alias("page"),
    )


SQL_EXTRACT_IMAGES_DETAIL = f"""WITH {DERIVED_SPANS_CTE}, {_PAGED_SQL},
pic AS (
  SELECT doc_id, page, "offset", media_ref, text,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset") - 1 AS seq
  FROM paged WHERE kind = 'picture'
),
caps AS (
  SELECT doc_id, media_ref AS parent, arg_max(text, "offset") AS cap
  FROM spans WHERE kind = 'caption' AND media_ref IS NOT NULL
  GROUP BY doc_id, media_ref
)
SELECT p.doc_id,
       p.doc_id || '_' || CAST(p.seq AS VARCHAR) || '.png' AS ref,
       p.media_ref AS self_ref,
       COALESCE(c.cap, '') AS caption,
       string_split(p.text, ':')[1] AS classification,
       CAST(string_split(p.text, ':')[2] AS DOUBLE) AS confidence,
       CAST(p.page AS INT) AS page
FROM pic p LEFT JOIN caps c ON c.doc_id = p.doc_id AND c.parent = p.media_ref"""


def q_extract_tables_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table detail records (utils.py:103-111 after pops) via engine bundle."""
    from pdfplucker_spark.operators.extract import extract_bundle

    b = extract_bundle(derived_spans_nested(spark, sf_dir))
    return b.select("doc_id", F.explode("tables").alias("t")).select(
        "doc_id",
        F.col("t.self_ref").alias("self_ref"),
        F.col("t.caption").alias("caption"),
        F.col("t.page").alias("page"),
        F.col("t.table").alias("table_md"),
    )


SQL_EXTRACT_TABLES_DETAIL = f"""WITH {DERIVED_SPANS_CTE}, {_PAGED_SQL},
caps AS (
  SELECT doc_id, media_ref AS parent, arg_max(text, "offset") AS cap
  FROM spans WHERE kind = 'caption' AND media_ref IS NOT NULL
  GROUP BY doc_id, media_ref
)
SELECT t.doc_id, t.media_ref AS self_ref, COALESCE(c.cap, '') AS caption,
       CAST(t.page AS INT) AS page, t.text AS table_md
FROM paged t LEFT JOIN caps c ON c.doc_id = t.doc_id AND c.parent = t.media_ref
WHERE t.kind = 'table'"""


def q_extract_pages_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page records with full content (placeholders included), first-touch
    order surfaced via page_rank — engine bundle path."""
    from pdfplucker_spark.operators.extract import extract_bundle

    b = extract_bundle(derived_spans_nested(spark, sf_dir))
    return b.select("doc_id", F.posexplode("pages").alias("page_rank", "p")).select(
        "doc_id",
        "page_rank",
        F.col("p.page_number").alias("page_number"),
        F.col("p.content").alias("content"),
    )


SQL_EXTRACT_PAGES_DETAIL = f"""WITH {DERIVED_SPANS_CTE}, {_PAGED_SQL},
pic AS (
  SELECT doc_id, page, "offset", media_ref,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset") - 1 AS seq
  FROM paged WHERE kind = 'picture'
),
frag AS (
  SELECT doc_id, page, "offset", {_frag_case_sql()} AS frag
  FROM paged WHERE kind IN {_TEXT_KINDS_IN}
  UNION ALL
  SELECT doc_id, page, "offset", ' <' || media_ref || '>' FROM paged WHERE kind = 'table'
  UNION ALL
  SELECT doc_id, page, "offset",
         ' <' || doc_id || '_' || CAST(seq AS VARCHAR) || '.png>' FROM pic
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY MIN("offset")) - 1 AS INT)
         AS page_rank,
       CAST(page AS INT) AS page_number,
       STRING_AGG(frag, '' ORDER BY "offset") AS content
FROM frag GROUP BY doc_id, page"""


def q_markdown_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 analogue (processor.py:294-305): one markdown document per doc —
    ordered page contents joined with page-break separators (derived view
    over the engine output; media stay refs, not base64, per input_hint)."""
    from pdfplucker_spark.operators.extract import extract_spans

    ext = extract_spans(derived_spans_nested(spark, sf_dir))
    pages = ext.select("doc_id", F.explode("spans").alias("s")).where(
        F.col("s.kind") == "page"
    )
    return pages.groupBy("doc_id").agg(
        F.concat_ws(
            "\n\n---\n\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("s.offset").alias("o"), F.col("s.text").alias("t")))
                ),
                lambda x: x["t"],
            ),
        ).alias("markdown")
    )


SQL_MARKDOWN_EXPORT = f"""WITH {DERIVED_SPANS_CTE}, {_PAGED_SQL},
pic AS (
  SELECT doc_id, page, "offset",
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset") - 1 AS seq
  FROM paged WHERE kind = 'picture'
),
frag AS (
  SELECT doc_id, page, "offset", {_frag_case_sql()} AS frag
  FROM paged WHERE kind IN {_TEXT_KINDS_IN}
  UNION ALL
  SELECT doc_id, page, "offset", ' <' || media_ref || '>' FROM paged WHERE kind = 'table'
  UNION ALL
  SELECT doc_id, page, "offset",
         ' <' || doc_id || '_' || CAST(seq AS VARCHAR) || '.png>' FROM pic
),
pages AS (
  SELECT doc_id, page, MIN("offset") AS ft,
         STRING_AGG(frag, '' ORDER BY "offset") AS content
  FROM frag GROUP BY doc_id, page
)
SELECT doc_id,
       STRING_AGG(content, chr(10) || chr(10) || '---' || chr(10) || chr(10) ORDER BY ft)
         AS markdown
FROM pages GROUP BY doc_id"""


def _json_esc(c):
    """Minimal JSON string escape (\\, ", newline) — the only characters the
    span alphabet can produce; identical replace chain on the DuckDB side."""
    x = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    x = F.replace(x, F.lit('"'), F.lit('\\"'))
    return F.replace(x, F.lit("\n"), F.lit("\\n"))


def q_markdown_export_embedded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 EMBEDDED mode (processor.py:294-305, ImageRefMode.EMBEDDED): the
    markdown export with image refs replaced by base64 data-URIs. The
    input_hint input carries no real image bytes, so the embedded payload is
    the deterministic stub (md5(ref) as 16 fake PNG bytes — same convention
    as operators/multimodal.py); the embedding mechanics (per-image
    placeholder → data-URI rewrite inside page content) are real and
    cross-checked. Spark side folds F.replace over the doc's image list
    (JVM-side aggregate, no UDF); the oracle builds the embedded form
    directly in the frag CTE — two independent constructions."""
    from pdfplucker_spark.operators.extract import extract_bundle

    b = extract_bundle(derived_spans_nested(spark, sf_dir))
    pages = b.select("doc_id", "images", F.posexplode("pages").alias("rank", "p"))
    embedded = pages.select(
        "doc_id",
        "rank",
        F.aggregate(
            "images",
            F.col("p.content"),
            lambda acc, im: F.replace(
                acc,
                F.concat(F.lit("<"), im["ref"], F.lit(">")),
                F.concat(
                    F.lit("!["),
                    im["ref"],
                    F.lit("](data:image/png;base64,"),
                    F.base64(F.unhex(F.md5(im["ref"]))),
                    F.lit(")"),
                ),
            ),
        ).alias("content"),
    )
    return embedded.groupBy("doc_id").agg(
        F.concat_ws(
            "\n\n---\n\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("rank").alias("o"), F.col("content").alias("t"))
                    )
                ),
                lambda x: x["t"],
            ),
        ).alias("markdown")
    )


_EMBED_SQL = (
    "'![' || ph || '](data:image/png;base64,' || to_base64(unhex(md5(ph))) || ')'"
)

SQL_MARKDOWN_EXPORT_EMBEDDED = f"""WITH {DERIVED_SPANS_CTE}, {_PAGED_SQL},
pic AS (
  SELECT doc_id, page, "offset",
         doc_id || '_' ||
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset") - 1 AS VARCHAR)
         || '.png' AS ph
  FROM paged WHERE kind = 'picture'
),
frag AS (
  SELECT doc_id, page, "offset", {_frag_case_sql()} AS frag
  FROM paged WHERE kind IN {_TEXT_KINDS_IN}
  UNION ALL
  SELECT doc_id, page, "offset", ' <' || media_ref || '>' FROM paged WHERE kind = 'table'
  UNION ALL
  SELECT doc_id, page, "offset", ' ' || {_EMBED_SQL} FROM pic
),
pages AS (
  SELECT doc_id, page, MIN("offset") AS ft,
         STRING_AGG(frag, '' ORDER BY "offset") AS content
  FROM frag GROUP BY doc_id, page
)
SELECT doc_id,
       STRING_AGG(content, chr(10) || chr(10) || '---' || chr(10) || chr(10) ORDER BY ft)
         AS markdown
FROM pages GROUP BY doc_id"""


def q_json_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 analogue (processor.py:307-308): per-doc JSON rendering of the
    span bundle (debug exporter; Iceberg tables are the real sink).

    Canonical form — fixed key order (doc_id, spans, status), spans in
    offset order, explicit escaping — so the rendering is deterministic and
    byte-comparable across engines (to_json key order / null conventions
    are engine-specific; an explicit concat is not).
    """
    from pdfplucker_spark.operators.extract import extract_spans

    ext = extract_spans(derived_spans_nested(spark, sf_dir))
    s = ext.select("doc_id", "status", F.explode("spans").alias("s"))
    span_json = F.concat(
        F.lit('{"kind":"'),
        _json_esc(F.col("s.kind")),
        F.lit('","media_ref":"'),
        _json_esc(F.col("s.media_ref")),
        F.lit('","offset":'),
        F.col("s.offset").cast("string"),
        F.lit(',"text":"'),
        _json_esc(F.col("s.text")),
        F.lit('"}'),
    )
    per_doc = s.groupBy("doc_id", "status").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("s.offset").alias("o"), span_json.alias("j"))
                    )
                ),
                lambda x: x["j"],
            ),
        ).alias("body")
    )
    return per_doc.select(
        "doc_id",
        F.concat(
            F.lit('{"doc_id":"'),
            F.col("doc_id"),
            F.lit('","spans":['),
            F.col("body"),
            F.lit('],"status":"'),
            F.col("status"),
            F.lit('"}'),
        ).alias("json"),
    )


def _esc_sql(col: str) -> str:
    return (
        f"replace(replace(replace({col}, '\\', '\\\\'), '\"', '\\\"'), chr(10), '\\n')"
    )


SQL_JSON_EXPORT = f"""WITH {DERIVED_SPANS_CTE}, {_PAGED_SQL},
pic AS (
  SELECT doc_id, page, "offset", media_ref,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset") - 1 AS seq
  FROM paged WHERE kind = 'picture'
),
frag AS (
  SELECT doc_id, page, "offset", {_frag_case_sql()} AS frag
  FROM paged WHERE kind IN {_TEXT_KINDS_IN}
  UNION ALL
  SELECT doc_id, page, "offset", ' <' || media_ref || '>' FROM paged WHERE kind = 'table'
  UNION ALL
  SELECT doc_id, page, "offset",
         ' <' || doc_id || '_' || CAST(seq AS VARCHAR) || '.png>' FROM pic
),
pages AS (
  SELECT doc_id, page, MIN("offset") AS ft,
         STRING_AGG(frag, '' ORDER BY "offset") AS content
  FROM frag GROUP BY doc_id, page
),
caps AS (
  SELECT doc_id, media_ref AS parent, arg_max(text, "offset") AS cap
  FROM spans WHERE kind = 'caption' AND media_ref IS NOT NULL
  GROUP BY doc_id, media_ref
),
out AS (
  SELECT doc_id, 0 AS sec, ft AS ord, 'page' AS kind, content AS text,
         CAST(page AS VARCHAR) AS media_ref
  FROM pages
  UNION ALL
  SELECT p.doc_id, 1, p.seq, 'image', COALESCE(c.cap, ''),
         p.doc_id || '_' || CAST(p.seq AS VARCHAR) || '.png'
  FROM pic p LEFT JOIN caps c ON c.doc_id = p.doc_id AND c.parent = p.media_ref
  UNION ALL
  SELECT doc_id, 2, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "offset") - 1,
         'table', text, media_ref
  FROM paged WHERE kind = 'table'
),
final AS (
  SELECT doc_id, kind, text, media_ref,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sec, ord) - 1 AS "offset"
  FROM out
)
SELECT doc_id,
       '{{"doc_id":"' || doc_id || '","spans":[' ||
       COALESCE(STRING_AGG(
         '{{"kind":"' || {_esc_sql('kind')} ||
         '","media_ref":"' || {_esc_sql('media_ref')} ||
         '","offset":' || CAST("offset" AS VARCHAR) ||
         ',"text":"' || {_esc_sql('text')} || '"}}',
         ',' ORDER BY "offset"), '') ||
       '],"status":"ok"}}' AS json
FROM final GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# main-content extraction: boilerplate/furniture strip over the span model
# ---------------------------------------------------------------------------
# the north-rule "main-content extraction" analogue at the span layer: the
# layout parse already typed every block, so boilerplate stripping is a
# semantic-kind gate — page furniture, references/footnotes, captions and
# structural placeholders drop; narrative/content kinds keep. (An HTML
# pipeline's DOM heuristics land HERE: whatever produced the kinds, the
# strip is this one declarative map-side filter + per-doc reassembly.)
MAIN_CONTENT_KINDS = (
    "section_header",
    "title",
    "paragraph",
    "text",
    "list_item",
    "code",
    "formula",
    "checkbox_selected",
    "checkbox_unselected",
)


# giant-doc guard for main-content assembly: per-aggregation-buffer span
# structs are bounded by this chunk width, so a 100k-span giant never
# materializes one 100k-struct collect_list buffer
MAIN_CONTENT_CHUNK = 4096


def q_spans_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc main content: furniture kinds (page_footer/footnote/
    reference/caption/page_break/table/picture) stripped, content spans
    reassembled in reading order, plus the content-density stats a quality
    gate would filter on. Giant-proof two-level assembly: spans aggregate
    first on (doc_id, offset div 4096) — the collect_list buffer holds
    at most MAIN_CONTENT_CHUNK structs regardless of doc size — then per doc over the
    pre-concatenated CHUNK strings (~25 rows for the 100k-span
    skew tier, vs one 100k-struct buffer in the single-level plan). Empty
    chunks surface as NULL so the outer concat_ws skips them and the
    output is byte-identical to the single-level formulation (pytest) and
    to the unchanged single-GROUP-BY oracle. Map-side filter, two hash
    aggregations, no window, no join."""
    sp = derived_spans_flat(spark, sf_dir)
    is_main = F.col("kind").isin(*MAIN_CONTENT_KINDS)
    flagged = sp.select(
        "doc_id",
        "offset",
        "text",
        is_main.alias("m"),
        F.length("text").alias("len"),
        F.floor(F.col("offset") / MAIN_CONTENT_CHUNK).alias("ck"),
    )
    arr = F.array_sort(
        F.collect_list(
            F.when(F.col("m") & F.col("text").isNotNull(), F.struct("offset", "text"))
        )
    )
    chunks = flagged.groupBy("doc_id", "ck").agg(
        arr.alias("arr"),
        F.sum(F.when(F.col("m"), 1).otherwise(0)).alias("nm"),
        F.sum(F.when(~F.col("m"), 1).otherwise(0)).alias("nf"),
        F.sum(F.coalesce("len", F.lit(0))).alias("tl"),
        F.sum(
            F.when(F.col("m") & F.col("len").isNotNull(), F.col("len")).otherwise(0)
        ).alias("ml"),
    ).select(
        "doc_id",
        "ck",
        F.when(
            F.size("arr") > 0,
            F.concat_ws(" ", F.transform("arr", lambda x: x["text"])),
        ).alias("ctext"),
        "nm",
        "nf",
        "tl",
        "ml",
    )
    total_len = F.sum("tl")
    main_len = F.sum("ml")
    return chunks.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("ctext").isNotNull(), F.struct("ck", "ctext"))
                    )
                ),
                lambda x: x["ctext"],
            ),
        ).alias("main_text"),
        F.sum("nm").alias("n_main_spans"),
        F.sum("nf").alias("n_furniture_spans"),
        F.when(total_len > 0, F.round(main_len.cast("double") / total_len, 6)).alias(
            "content_ratio"
        ),
    )


_MAIN_IN = ", ".join(f"'{k}'" for k in MAIN_CONTENT_KINDS)

SQL_SPANS_MAIN_CONTENT = f"""WITH {DERIVED_SPANS_CTE},
f AS (
  SELECT doc_id, "offset", text,
         kind IN ({_MAIN_IN}) AS m,
         length(text) AS len
  FROM spans
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN m AND text IS NOT NULL THEN text END,
                           ' ' ORDER BY "offset"), '') AS main_text,
       CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_main_spans,
       CAST(SUM(CASE WHEN NOT m THEN 1 ELSE 0 END) AS BIGINT) AS n_furniture_spans,
       CASE WHEN SUM(coalesce(len, 0)) > 0
            THEN round(CAST(SUM(CASE WHEN m AND len IS NOT NULL THEN len ELSE 0 END) AS DOUBLE)
                       / SUM(coalesce(len, 0)), 6) END AS content_ratio
FROM f GROUP BY doc_id"""


HEADING_KINDS = ("title", "section_header")


def q_spans_heading_outline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document OUTLINE reconstruction — the section structure a layout
    parser recovers from heading spans: each title/section_header span in
    reading order opens a new section owning every span up to the next
    heading (spans before the first heading form section 0, header NULL).
    Reference analogue: none — the reference FLATTENS headings into
    markdown prefixes ('# '/'## ', utils.py:52-53,72-73) and discards the
    hierarchy; this operator keeps the section table a chunking/retrieval
    stage needs, which the flat markdown cannot recover without re-parsing.
    Output per (doc, section): the heading text, span count, text mass,
    and the [start_offset, end_offset] reading-order interval — the table
    a chunking/retrieval stage consumes to split documents on semantic
    boundaries instead of byte counts.

    Scale shape: one running count of heading flags per doc (window keyed
    on the uniform doc_id, ordered by offset — the accepted doc-grain
    pattern, bounded by doc length like the reassembly sorts), then one
    hash aggregation on (doc_id, section_idx). A section has exactly one
    heading row (each heading increments the running count), so the
    header_text MAX picks that row deterministically. No joins."""
    sp = derived_spans_flat(spark, sf_dir)
    is_h = F.col("kind").isin(*HEADING_KINDS)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = sp.select(
        "doc_id",
        "offset",
        "text",
        is_h.cast("int").alias("is_h"),
        F.length("text").alias("len"),
    ).withColumn("section_idx", F.sum("is_h").over(w).cast("int"))
    return marked.groupBy("doc_id", "section_idx").agg(
        F.max(F.when(F.col("is_h") == 1, F.col("text"))).alias("header_text"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.coalesce("len", F.lit(0))).alias("n_chars"),
        F.min("offset").alias("start_offset"),
        F.max("offset").alias("end_offset"),
    )


_HEADING_IN = ", ".join(f"'{k}'" for k in HEADING_KINDS)

SQL_SPANS_HEADING_OUTLINE = f"""WITH {DERIVED_SPANS_CTE},
marked AS (
  SELECT doc_id, "offset", text,
         CASE WHEN kind IN ({_HEADING_IN}) THEN 1 ELSE 0 END AS is_h,
         length(text) AS len
  FROM spans
),
sec AS (
  SELECT doc_id, "offset", text, is_h, len,
         CAST(SUM(is_h) OVER (PARTITION BY doc_id ORDER BY "offset"
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS INT) AS section_idx
  FROM marked
)
SELECT doc_id, section_idx,
       MAX(CASE WHEN is_h = 1 THEN text END) AS header_text,
       COUNT(*) AS n_spans,
       CAST(SUM(coalesce(len, 0)) AS BIGINT) AS n_chars,
       MIN("offset") AS start_offset,
       MAX("offset") AS end_offset
FROM sec GROUP BY doc_id, section_idx
"""


SECTION_CHUNK_CHARS = 100


def q_spans_section_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic chunking — the retrieval/context-window stage the heading
    outline exists for: sections pack greedily, in reading order, into
    chunks of ~SECTION_CHUNK_CHARS text mass. A chunk owns every section
    that STARTS inside its budget range (the ``docs_pack_shards``
    streaming-packing contract, applied within a document on semantic
    boundaries instead of across documents on token counts), so splits
    always land BETWEEN sections — a section is never cut mid-heading.

    Scale shape: one per-doc running sum over the section table (window
    keyed on the uniform doc_id, ordered by section_idx — sections per
    doc are bounded by doc length / heading density, far below the span
    count), no joins. Deterministic: same outline → same chunks."""
    out = q_spans_heading_outline(spark, sf_dir)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("section_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (F.sum("n_chars").over(w) - F.col("n_chars")).alias("chunk_start_char")
    return out.select(
        "doc_id", "section_idx", "header_text", "n_chars", start
    ).select(
        "doc_id",
        "section_idx",
        "header_text",
        "n_chars",
        "chunk_start_char",
        F.floor(F.col("chunk_start_char") / SECTION_CHUNK_CHARS)
        .cast("int")
        .alias("chunk_idx"),
    )


SQL_SPANS_SECTION_CHUNKS = f"""
WITH outline AS ({SQL_SPANS_HEADING_OUTLINE}),
runs AS (
  SELECT doc_id, section_idx, header_text, n_chars,
         CAST(SUM(n_chars) OVER (PARTITION BY doc_id ORDER BY section_idx
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_chars AS BIGINT) AS chunk_start_char
  FROM outline
)
SELECT doc_id, section_idx, header_text, n_chars, chunk_start_char,
       CAST(chunk_start_char // {SECTION_CHUNK_CHARS} AS INT) AS chunk_idx
FROM runs
"""


QUERIES = {
    "spans_main_content": (q_spans_main_content, SQL_SPANS_MAIN_CONTENT),
    "spans_heading_outline": (q_spans_heading_outline, SQL_SPANS_HEADING_OUTLINE),
    "spans_section_chunks": (q_spans_section_chunks, SQL_SPANS_SECTION_CHUNKS),
    "spans_derive": (q_spans_derive, SQL_SPANS_DERIVE),
    "markdown_export": (q_markdown_export, SQL_MARKDOWN_EXPORT),
    "markdown_export_embedded": (
        q_markdown_export_embedded,
        SQL_MARKDOWN_EXPORT_EMBEDDED,
    ),
    "json_export": (q_json_export, SQL_JSON_EXPORT),
    "extract_images_detail": (q_extract_images_detail, SQL_EXTRACT_IMAGES_DETAIL),
    "extract_tables_detail": (q_extract_tables_detail, SQL_EXTRACT_TABLES_DETAIL),
    "extract_pages_detail": (q_extract_pages_detail, SQL_EXTRACT_PAGES_DETAIL),
    "f3_format": (q_f3_format, SQL_F3_FORMAT),
    "f4_pages": (q_f4_pages, SQL_F4_PAGES),
    "f6_picture_seq": (q_f6_picture_seq, SQL_F6_PICTURE_SEQ),
    "f7_captions": (q_f7_captions, SQL_F7_CAPTIONS),
    "extract_full": (q_extract_full, SQL_EXTRACT_FULL),
    "extract_agg_metrics": (q_extract_agg_metrics, SQL_EXTRACT_AGG_METRICS),
}
