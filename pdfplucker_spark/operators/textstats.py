"""Text-analysis operators for a training-data pipeline over ``documents``:
token counting, quality scoring, n-gram-heuristic language ID, document
fingerprinting. All per-row expression work (no shuffle at all — scales
linearly with executors); ratios use integer counts so the oracle compare
is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdfplucker_spark.functions.hashing import sql_expr_md5_long, sql_md5_long
from pdfplucker_spark.sources.tables import load

# tiny fixed stopword lists for the heuristic language vote; tie-break is
# the fixed order en > es > de > fr
_STOP = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une"],
}
_LANGS = ["en", "es", "de", "fr"]


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _spark_count_in(toks: str, words) -> F.Column:
    arr = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({toks}, t -> array_contains(array({arr}), t)))")


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + distinct + char length."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


SQL_TEXT_TOKENS = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       length(text) AS n_chars_actual
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring from integer counts: type-token ratio, stopword
    ratio, mean token length — composite score rounded to 6 dp."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_dis = F.size(F.array_distinct(toks))
    n_stop = _spark_count_in("split(text, ' ')", _STOP["en"])
    ttr = n_dis.cast("double") / n_tok
    stop_ratio = n_stop.cast("double") / n_tok
    mean_len = F.length("text").cast("double") / n_tok
    return d.select(
        "doc_id",
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(ttr * 0.5 + stop_ratio * 0.3 + F.least(mean_len / 10.0, F.lit(1.0)) * 0.2, 6).alias(
            "quality_score"
        ),
    )


SQL_TEXT_QUALITY = f"""
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS n_dis,
         len(list_filter(string_split(text, ' '),
             t -> list_contains({_sql_list(_STOP['en'])}, t))) AS n_stop,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id,
       round(CAST(n_dis AS DOUBLE) / n_tok, 6) AS type_token_ratio,
       round(CAST(n_stop AS DOUBLE) / n_tok, 6) AS stopword_ratio,
       round(CAST(n_chars AS DOUBLE) / n_tok, 6) AS mean_token_len,
       round(CAST(n_dis AS DOUBLE) / n_tok * 0.5
             + CAST(n_stop AS DOUBLE) / n_tok * 0.3
             + least(CAST(n_chars AS DOUBLE) / n_tok / 10.0, 1.0) * 0.2, 6)
         AS quality_score
FROM t
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID with deterministic tie-break en>es>de>fr."""
    d = load(spark, sf_dir, "documents")
    votes = {
        lang: _spark_count_in("split(text, ' ')", words) for lang, words in _STOP.items()
    }
    pred = (
        F.when(
            (votes["en"] >= votes["es"])
            & (votes["en"] >= votes["de"])
            & (votes["en"] >= votes["fr"]),
            "en",
        )
        .when((votes["es"] >= votes["de"]) & (votes["es"] >= votes["fr"]), "es")
        .when(votes["de"] >= votes["fr"], "de")
        .otherwise("fr")
    )
    out = d.select(
        "doc_id",
        *[votes[lang].alias(f"votes_{lang}") for lang in _LANGS],
        pred.alias("pred_lang"),
        F.col("lang").alias("actual_lang"),
    )
    return out


SQL_TEXT_LANGID = f"""
WITH v AS (
  SELECT doc_id, lang,
  {", ".join(
    f"len(list_filter(string_split(text, ' '), t -> list_contains({_sql_list(words)}, t))) AS votes_{lang}"
    for lang, words in _STOP.items()
  )}
  FROM documents
)
SELECT doc_id, votes_en, votes_es, votes_de, votes_fr,
       CASE WHEN votes_en >= votes_es AND votes_en >= votes_de AND votes_en >= votes_fr THEN 'en'
            WHEN votes_es >= votes_de AND votes_es >= votes_fr THEN 'es'
            WHEN votes_de >= votes_fr THEN 'de'
            ELSE 'fr' END AS pred_lang,
       lang AS actual_lang
FROM v
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling document fingerprint: polynomial fold of
    portable token hashes mod 1e9+7 — pure per-row higher-order fns."""
    d = load(spark, sf_dir, "documents")
    h = sql_expr_md5_long("t")
    fp = F.expr(
        f"aggregate(split(text, ' '), 0L, (acc, t) -> pmod(acc * 31 + {h}, 1000000007L))"
    )
    return d.select("doc_id", fp.alias("fingerprint"))


SQL_TEXT_FINGERPRINT = f"""
SELECT doc_id,
       list_reduce([CAST(0 AS BIGINT)] ||
                   list_transform(string_split(text, ' '), t -> {sql_md5_long('t')}),
                   (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
FROM documents
"""


def q_text_regex_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar-function coverage (extract / count / replace), all
    JVM-side. Patterns are kept to the common Java-regex ∩ RE2 subset so
    engine and oracle agree; the replace result is compared by md5 — a
    byte-exact check without shipping megabyte strings through the gate."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "ta[a-z]*", 0).alias("first_ta_word"),
        F.expr("regexp_count(text, 'ta[a-z]*')").cast("int").alias("n_ta_words"),
        F.md5(F.regexp_replace("text", "a+", "@")).alias("replaced_md5"),
    )


SQL_TEXT_REGEX_STATS = """
SELECT doc_id,
       regexp_extract(text, 'ta[a-z]*', 0) AS first_ta_word,
       CAST(len(regexp_extract_all(text, 'ta[a-z]*')) AS INT) AS n_ta_words,
       md5(regexp_replace(text, 'a+', '@', 'g')) AS replaced_md5
FROM documents
"""


# ---------------------------------------------------------------------------
# repetition scoring (Gopher-style quality rule): the fraction of duplicated
# n-grams WITHIN a document — boilerplate/spam detector. Map-only.
# ---------------------------------------------------------------------------
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition: 1 - distinct/total for 2-gram and 3-gram
    shingles (0 = no repetition, →1 = heavily looped text). The standard
    repetition gate of quality-filter stacks; pure per-row expressions.

    NULL text coalesces to '' BEFORE tokenizing in BOTH engines (DuckDB's
    list_distinct strips NULL grams while Spark's concat_ws maps them to ''
    — coalescing first removes the divergence: both see one '' gram).
    Interpreted-HOF discipline (CLAUDE.md): the gram arrays are projected
    ONCE and the fracs computed from the materialized columns — not four
    independent fold copies per row."""
    d = load(spark, sf_dir, "documents")

    def grams(n: int) -> str:
        return (
            f"transform(sequence(1, greatest(size(split(coalesce(text, ''),' ')) - {n - 1}, 1)), "
            f"i -> concat_ws(' ', slice(split(coalesce(text, ''),' '), i, {n})))"
        )

    frac = lambda c: F.round(
        1 - F.expr(f"size(array_distinct({c}))").cast("double") / F.size(c), 6
    )
    return d.select(
        "doc_id", F.expr(grams(2)).alias("g2"), F.expr(grams(3)).alias("g3")
    ).select(
        "doc_id",
        frac("g2").alias("dup_2gram_frac"),
        frac("g3").alias("dup_3gram_frac"),
    )


def _sql_gram_frac(n: int) -> str:
    grams = (
        f"list_transform(range(1, greatest(len(string_split(coalesce(text, ''), ' ')) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(string_split(coalesce(text, ''), ' ')[i:i+{n - 1}], ' '))"
    )
    return (
        f"round(1 - CAST(len(list_distinct({grams})) AS DOUBLE) / len({grams}), 6)"
    )


SQL_TEXT_REPETITION = f"""
SELECT doc_id,
       {_sql_gram_frac(2)} AS dup_2gram_frac,
       {_sql_gram_frac(3)} AS dup_3gram_frac
FROM documents
"""


# ---------------------------------------------------------------------------
# PII scan + redaction. The synthetic corpus carries no PII, so the scan
# runs over a derived view that INJECTS deterministic emails/phones into
# every 13th doc identically in both engines — the detectors and the
# redaction md5 are verified on text where they actually fire (and on text
# where they must not). Patterns stay in the Java-regex ∩ RE2 subset.
# ---------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+[a-z]"
_PHONE_RE = "555-[0-9]+"


def q_text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect + redact contact PII per document: match counts for the
    email/phone detectors and the md5 of the fully redacted text (byte-
    exact check without shipping the strings). Map-only at any scale."""
    d = load(spark, sf_dir, "documents")
    injected = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-0"),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.col("text"))
    p = d.select("doc_id", injected.alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return p.select(
        "doc_id",
        F.expr(f"regexp_count(text, '{_EMAIL_RE}')").cast("int").alias("n_emails"),
        F.expr(f"regexp_count(text, '{_PHONE_RE}')").cast("int").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


SQL_TEXT_PII_SCAN = f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or call 555-0' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM p
"""


# ---------------------------------------------------------------------------
# Gopher-style rule filter: the standard production text gate
# ---------------------------------------------------------------------------
def _gopher_metrics() -> dict:
    """The Gopher rule expressions over a ``text`` column, as named
    Columns — ONE definition shared by the audit query (which projects
    every metric/rule) and in-line consumers like the curation manifest
    (which applies ``gopher_pass`` as a map-only filter on its own scan
    instead of paying a corpus⋈corpus join against the audit output).
    NULL text coalesces to '' BEFORE tokenizing in both engines (the
    list_distinct/concat_ws NULL-gram divergence, CLAUDE.md). Mean word
    length uses the exact identity total_token_chars = length(text) −
    (n_tok − 1) for space-joined text — no per-token length pass."""
    txt = F.coalesce(F.col("text"), F.lit(""))
    toks = F.split(txt, " ")
    n_tok = F.size(toks)
    n_chars = F.length(txt)
    mean_wl = (n_chars - (n_tok - 1)).cast("double") / n_tok
    n_sym = (n_chars - F.length(F.replace(txt, F.lit("#"), F.lit("")))) + (
        n_chars - F.length(F.replace(txt, F.lit("|"), F.lit("")))
    )
    sym_ratio = n_sym.cast("double") / F.greatest(n_chars, F.lit(1))
    n_stop = _spark_count_in("split(coalesce(text, ''), ' ')", _STOP["en"])
    # \A...\z, not ^...$: Java's $ matches BEFORE a final newline, so
    # '123\n' would count as numeric in Spark but not in DuckDB's
    # regexp_full_match — anchor to absolute string edges in both engines
    n_num = F.expr(
        "size(filter(split(coalesce(text, ''), ' '), t -> t rlike '\\\\A[0-9]+\\\\z'))"
    )
    num_frac = n_num.cast("double") / n_tok
    r_wc = (n_tok >= 5) & (n_tok <= 10000)
    r_wl = (mean_wl >= 1.5) & (mean_wl <= 10.0)
    r_sym = sym_ratio <= 0.1
    r_stop = n_stop >= 1
    r_num = num_frac <= 0.3
    return {
        "n_tok": n_tok,
        "mean_wl": mean_wl,
        "sym_ratio": sym_ratio,
        "num_frac": num_frac,
        "r_wc": r_wc,
        "r_wl": r_wl,
        "r_sym": r_sym,
        "r_stop": r_stop,
        "r_num": r_num,
        "gopher_pass": r_wc & r_wl & r_sym & r_stop & r_num,
    }


def gopher_pass_col():
    """The composite Gopher gate as a single boolean Column over ``text``
    — the map-only form scale consumers apply directly to their own scan."""
    return _gopher_metrics()["gopher_pass"]


def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality RULES (word-count bounds, mean word length,
    symbol ratio, stopword presence, numeric-token fraction) as per-doc
    boolean columns plus the composite pass flag — the rule-stack shape
    production filters use (each rule auditable, the gate their AND).
    Map-only integer/char arithmetic (``_gopher_metrics``)."""
    d = load(spark, sf_dir, "documents")
    m = _gopher_metrics()
    return d.select(
        "doc_id",
        m["n_tok"].alias("n_tokens"),
        F.round(m["mean_wl"], 6).alias("mean_word_len"),
        F.round(m["sym_ratio"], 6).alias("symbol_ratio"),
        F.round(m["num_frac"], 6).alias("numeric_frac"),
        m["r_wc"].alias("r_wordcount"),
        m["r_wl"].alias("r_wordlen"),
        m["r_sym"].alias("r_symbols"),
        m["r_stop"].alias("r_stopwords"),
        m["r_num"].alias("r_numeric"),
        m["gopher_pass"].alias("gopher_pass"),
    )


SQL_TEXT_GOPHER_RULES = f"""
WITH t AS (
  SELECT doc_id, coalesce(text, '') AS txt FROM documents
),
m AS (
  SELECT doc_id,
         len(string_split(txt, ' ')) AS n_tok,
         length(txt) AS n_chars,
         length(txt) - length(replace(txt, '#', ''))
           + length(txt) - length(replace(txt, '|', '')) AS n_sym,
         len(list_filter(string_split(txt, ' '),
             t -> list_contains({_sql_list(_STOP['en'])}, t))) AS n_stop,
         len(list_filter(string_split(txt, ' '),
             t -> regexp_full_match(t, '[0-9]+'))) AS n_num
  FROM t
),
r AS (
  SELECT doc_id, n_tok,
         CAST(n_chars - (n_tok - 1) AS DOUBLE) / n_tok AS mean_wl,
         CAST(n_sym AS DOUBLE) / greatest(n_chars, 1) AS sym_ratio,
         CAST(n_num AS DOUBLE) / n_tok AS num_frac,
         n_stop
  FROM m
)
SELECT doc_id, CAST(n_tok AS INT) AS n_tokens,
       round(mean_wl, 6) AS mean_word_len,
       round(sym_ratio, 6) AS symbol_ratio,
       round(num_frac, 6) AS numeric_frac,
       n_tok >= 5 AND n_tok <= 10000 AS r_wordcount,
       mean_wl >= 1.5 AND mean_wl <= 10.0 AS r_wordlen,
       sym_ratio <= 0.1 AS r_symbols,
       n_stop >= 1 AS r_stopwords,
       num_frac <= 0.3 AS r_numeric,
       (n_tok >= 5 AND n_tok <= 10000) AND (mean_wl >= 1.5 AND mean_wl <= 10.0)
         AND sym_ratio <= 0.1 AND n_stop >= 1 AND num_frac <= 0.3 AS gopher_pass
FROM r
"""


QUERIES = {
    "text_gopher_rules": (q_text_gopher_rules, SQL_TEXT_GOPHER_RULES),
    "text_tokens": (q_text_tokens, SQL_TEXT_TOKENS),
    "text_pii_scan": (q_text_pii_scan, SQL_TEXT_PII_SCAN),
    "text_repetition": (q_text_repetition, SQL_TEXT_REPETITION),
    "text_regex_stats": (q_text_regex_stats, SQL_TEXT_REGEX_STATS),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "text_langid": (q_text_langid, SQL_TEXT_LANGID),
    "text_fingerprint": (q_text_fingerprint, SQL_TEXT_FINGERPRINT),
}
