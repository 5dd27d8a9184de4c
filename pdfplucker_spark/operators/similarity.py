"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

  - ``sim_cosine_topk``: brute-force cosine top-k against a query vector —
    the exactness baseline. zip_with + aggregate keeps the dot product
    JVM-side (whole-stage codegen); both engines accumulate doubles
    sequentially so scores match bit-for-bit (verified).
  - ``sim_lsh_buckets``: the scale path — sign-LSH over 4 deterministic
    hyperplanes with integer quantization (floor(x*1000)) so bucket
    assignment is exact integer math in both engines; at 100 TB the
    bucket id becomes the shuffle/blocking key and top-k runs per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdfplucker_spark.sources.tables import load

TOP_K = 10
QUERY_VEC_ID = 0
N_PLANES = 4
QUANT = 1000


def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    dot = "aggregate(zip_with(cast(embedding as array<double>), qv, (x,y) -> x*y), 0D, (a,b) -> a+b)"
    n1 = "sqrt(aggregate(cast(embedding as array<double>), 0D, (a,x) -> a+x*x))"
    n2 = "sqrt(aggregate(qv, 0D, (a,x) -> a+x*x))"
    scored = (
        emb.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", F.expr(f"{dot} / ({n1} * {n2})").alias("cos"))
    )
    w_ordered = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(TOP_K)
    return w_ordered.select(
        "vec_id",
        F.round("cos", 8).alias("cosine"),
    )


SQL_SIM_COSINE_TOPK = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, round(cos, 8) AS cosine FROM (
  SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q))
           / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
              * sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))) AS cos
  FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}
)
ORDER BY cos DESC, vec_id ASC
LIMIT {TOP_K}
"""


def _plane_dot_spark(j: int) -> str:
    # plane_j[i] = ((i+1)*(j+2)) % 7 - 3, integer dot with floor(x*1000)
    return (
        f"aggregate(transform(sequence(0, size(embedding) - 1), "
        f"i -> CAST(floor(element_at(cast(embedding as array<double>), i + 1) * {QUANT}) AS BIGINT)"
        f" * (((i + 1) * ({j} + 2)) % 7 - 3)), 0L, (a, x) -> a + x)"
    )


def q_sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    bucket = None
    for j in range(N_PLANES):
        bit = F.when(F.expr(_plane_dot_spark(j)) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    per_vec = emb.select("vec_id", bucket.alias("bucket"))
    return per_vec.groupBy("bucket").agg(
        F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec_id")
    )


def _plane_dot_sql(j: int) -> str:
    return (
        f"list_reduce([CAST(0 AS BIGINT)] || list_transform(range(len(embedding)), "
        f"i -> CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * {QUANT}) AS BIGINT)"
        f" * (((i + 1) * ({j} + 2)) % 7 - 3)), (a, x) -> a + x)"
    )


SQL_SIM_LSH_BUCKETS = f"""
WITH b AS (
  SELECT vec_id,
         {" + ".join(f"CASE WHEN {_plane_dot_sql(j)} > 0 THEN {1 << j} ELSE 0 END" for j in range(N_PLANES))}
           AS bucket
  FROM embeddings
)
SELECT bucket, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec_id
FROM b GROUP BY bucket
"""


# synthetic embeddings are near-isotropic (max pairwise cosine ≈0.35),
# so the near-dup threshold is set where real pairs exist
COSINE_DUP_THRESHOLD = 0.30


def q_sim_cosine_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket as the
    blocking key (the scale path — bucket is the shuffle key; only
    same-bucket pairs pay the dot product), verified with exact cosine.
    Output rounded to 6 dp; double accumulation is sequential in both
    engines so values match."""
    emb = load(spark, sf_dir, "embeddings")
    bucket = None
    for j in range(N_PLANES):
        bit = F.when(F.expr(_plane_dot_spark(j)) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    e = emb.select(
        "vec_id",
        bucket.alias("bucket"),
        F.col("embedding").cast("array<double>").alias("v"),
        F.sqrt(
            F.expr("aggregate(cast(embedding as array<double>), 0D, (a,x) -> a + x*x)")
        ).alias("nrm"),
    )
    a, b = e.alias("a"), e.alias("b")
    dot = "aggregate(zip_with(a.v, b.v, (x,y) -> x*y), 0D, (s,t) -> s+t)"
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (F.expr(dot) / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
        )
        .where(F.col("cos") >= COSINE_DUP_THRESHOLD)
    )
    return pairs.select("vec_a", "vec_b", F.round("cos", 6).alias("cosine"))


def _sql_bucket(alias: str) -> str:
    return " + ".join(
        f"CASE WHEN {_plane_dot_sql(j).replace('embedding', alias + '.embedding')} > 0 THEN {1 << j} ELSE 0 END"
        for j in range(N_PLANES)
    )


SQL_SIM_COSINE_DUP_PAIRS = f"""
WITH e AS (
  SELECT vec_id, embedding,
         {" + ".join(f"CASE WHEN {_plane_dot_sql(j)} > 0 THEN {1 << j} ELSE 0 END" for j in range(N_PLANES))}
           AS bucket,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
)
SELECT vec_a, vec_b, round(cos, 6) AS cosine FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
           / (a.nrm * b.nrm) AS cos
  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE cos >= {COSINE_DUP_THRESHOLD}
"""


QUERIES = {
    "sim_cosine_topk": (q_sim_cosine_topk, SQL_SIM_COSINE_TOPK),
    "sim_lsh_buckets": (q_sim_lsh_buckets, SQL_SIM_LSH_BUCKETS),
    "sim_cosine_dup_pairs": (q_sim_cosine_dup_pairs, SQL_SIM_COSINE_DUP_PAIRS),
}
