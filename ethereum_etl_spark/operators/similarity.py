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


def _grouped_topk(scored: DataFrame, key: str, order, k: int,
                  rank_col: str = "rank") -> DataFrame:
    """Exact per-key top-k in two phases. A single
    ``row_number() OVER (PARTITION BY key)`` on a corpus-sized scored set
    is a scale trap when there are few keys: the whole set sorts in
    n_keys partitions (3 ANN queries => a 3-partition sort of every
    scored pair — the straggler IS the query at 10^10 rows). Phase 1
    ranks over ``(key, spark_partition_id())`` — hash-distributed over
    n_keys x n_partitions groups — and prunes each partition to its local
    top-k; phase 2 ranks the surviving n_keys x n_partitions x k rows (a
    tiny set) for the true per-key top-k. Output-identical to the single
    window for ANY partitioning (the global top-k is always a subset of
    the union of partition-local top-ks), so task retries / AQE
    re-coalescing cannot change results, only the pruning ratio."""
    w1 = Window.partitionBy(key, "_tp").orderBy(*order)
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        scored.withColumn("_tp", F.spark_partition_id())
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
        .drop("_tp", "_r1")
    )


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
    # two-phase top-k: the scored set is corpus-sized and there are few
    # queries — a single per-query window would sort it in |queries|
    # partitions (see _grouped_topk)
    return _grouped_topk(
        scored, "query_id", [F.desc("cos_sim"), F.asc("neighbor_id")], k
    )


def _plane_sign(j: int, i: int) -> float:
    """Hyperplane h_j's ±1 component at dim i: parity of the first hex digit
    of md5("j:i") — the same family the ANSI-SQL oracle reproduces."""
    import hashlib

    return 1.0 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0


def sign_lsh_key(vec: Column, bits: int = 8, dim: int | None = None) -> Column:
    """Deterministic sign-sketch bucket key.

    Hyperplane h_j has ±1 components derived from md5(j, dim-index) — a
    seeded pseudo-random projection that both Spark and an ANSI-SQL oracle
    can reproduce exactly. Key = bit string of projection signs.

    ``dim``: when the vector width is known (the usual case — embedding
    columns are fixed-width), the quantization runs ONCE per element —
    ``q_i = CAST(CAST(x_i AS DECIMAL(18,6)) * 10^6 AS BIGINT)`` — into an
    int64 array bound as a lambda VARIABLE (the fold-don't-inline pattern:
    referencing a returned expression bits× times would re-evaluate it that
    many times), and each bit is then ``aggregate(zip_with(q, ±1), +)`` over
    plain int64 — no per-bit decimal arithmetic, no md5 per row. Keeping the
    per-bit work inside zip_with/aggregate matters: an unrolled chain of
    dim element_at adds was measured ~3× SLOWER than this (the huge
    expression tree blows compile/codegen budgets), and a single
    array-accumulator aggregate over all bits ~15× slower still.

    Both paths produce bit-identical keys: Spark's double→DECIMAL(18,6)
    cast rounds HALF_UP (ties away from zero), which is symmetric under
    negation, so ``Q(x·±1) = ±Q(x)`` exactly and the integer projection
    ``Σ ±(Q(x_i)·10^6)`` is the old decimal projection scaled by 10^6 —
    same sign, same key (verified 0 mismatches across 22k random vectors).
    Int64 headroom: |x| < 1.4e11 (dim ≤ 64) before the sum could overflow —
    embeddings are unit-ish, with 5 orders of margin.

    With ``dim`` set, a row whose vector length differs from ``dim`` raises
    (a silent null-pad would mis-key the row to the all-'0' bucket) —
    ragged corpora must pass ``dim=None``.
    """

    def bit_slow(j: int) -> Column:
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

    def bit_fast(q: Column, j: int) -> Column:
        signs = F.array(*[F.lit(int(_plane_sign(j, i))) for i in range(dim)])
        proj = F.aggregate(
            F.zip_with(q, signs, lambda v, s: v * s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))

    if dim is not None:
        q6 = F.transform(
            vec,
            lambda x: (x.cast("double").cast("decimal(18,6)") * F.lit(1000000)).cast("long"),
        )
        # let-bind q6: a 1-element transform makes it a lambda variable, so
        # the bits×dim element_at references below read it without
        # re-evaluating the quantization pass
        key = F.element_at(
            F.transform(
                F.transform(F.array(F.lit(0)), lambda _: q6),
                lambda q: F.concat(*[bit_fast(q, j) for j in range(bits)]),
            ),
            1,
        )
    else:
        key = F.concat(*[bit_slow(j) for j in range(bits)])
    if dim is None:
        return key
    return F.when(F.size(vec) == dim, key).otherwise(
        F.raise_error(
            F.concat(
                F.lit("sign_lsh_key: vector length "),
                F.size(vec).cast("string"),
                F.lit(f" != dim={dim} (pass dim=None for ragged corpora)"),
            )
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_fn=None,
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k: candidates share the sign-LSH bucket, exact cosine re-rank.

    At cluster scale the corpus is written bucketed/partitioned by the LSH
    key so this join is partition-local (no shuffle of the corpus).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        sign_lsh_key(F.col(vec_col), bits, dim).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        sign_lsh_key(F.col(vec_col), bits, dim).alias("bucket"),
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
    return _grouped_topk(
        scored, "query_id", [F.desc("cos_sim"), F.asc("neighbor_id")], k
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_fn=None,
) -> DataFrame:
    """IVF cell assignment: nearest centroid per vector (cosine argmax,
    ties to the lowest centroid id — identical to a
    ``row_number() OVER (ORDER BY score DESC, centroid_id)`` oracle).

    Scale shape (round 5): the centroid codebook is collapsed to ONE
    array-of-structs row (``collect_list`` — k x dim values, always a dim)
    and broadcast; the argmax is an ``array_max`` over per-centroid
    ``(score, -id)`` structs computed INSIDE one ``transform`` — a pure
    zero-shuffle projection. The previous shape exploded corpus x k rows
    through a crossJoin and ranked them with a window (an Exchange+Sort
    of k copies of the corpus); at 10^10 rows x 4096 cells that shuffle
    IS the assignment cost, and none of it is necessary: the argmax is
    per-row local. ``collect_list``'s nondeterministic order is
    irrelevant — argmax over all elements with the deterministic
    struct tie-break is order-insensitive. At cluster scale the assigned
    table is written out partitioned by cell so probes are
    partition-pruned scans."""
    score_fn = score_fn or _default_score
    cdim = centroids.agg(
        F.collect_list(
            F.struct(
                F.col(id_col).cast("long").alias("cid"),
                F.col(vec_col).alias("cvec"),
            )
        ).alias("_cents")
    )
    best = F.array_max(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                score_fn(F.col(vec_col), c["cvec"]).alias("s"),
                (c["cid"] * -1).alias("nc"),
            ),
        )
    )
    return corpus.crossJoin(F.broadcast(cdim)).select(
        F.col(id_col),
        F.col(vec_col),
        (best["nc"] * -1).alias("cell"),
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
    return _grouped_topk(
        scored, "query_id", [F.desc("cos_sim"), F.asc("neighbor_id")], k
    )


def assign_to_centroid_literals(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_fn=None,
) -> DataFrame:
    """Assign every vector to its nearest centroid (cosine argmax) where the
    centroids are DRIVER-side values (the k-means working set — k×dim
    floats always fit the driver). One pass, no shuffle, no join: each
    centroid becomes a literal array and the argmax is an ``array_max``
    over (score, −cell) structs — ties deterministically pick the lowest
    cell, matching a ``row_number() ... ORDER BY score DESC, cell`` oracle."""
    score_fn = score_fn or _default_score
    scored = F.array(
        *[
            F.struct(
                score_fn(F.col(vec_col), F.array(*[F.lit(float(v)) for v in c])).alias("s"),
                F.lit(-j).alias("nc"),
            )
            for j, c in enumerate(centroids)
        ]
    )
    best = F.array_max(scored)
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        (-best["nc"]).cast("int").alias("cell"),
        best["s"].alias("cos_sim"),
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_fn=None,
) -> tuple[list[list[float]], DataFrame]:
    """Train IVF centroids with Lloyd iterations, Spark-first and
    cross-engine-deterministic — the missing piece between ``ivf_topk``
    (which takes centroids as given) and a raw corpus.

    Per iteration: ONE broadcast-free assignment pass
    (:func:`assign_to_centroid_literals`) and ONE groupBy("cell") with
    per-dimension DECIMAL(18,6)-quantized sums (exact, order-insensitive —
    double summation would be partition-order-dependent and break both
    determinism and the oracle); means = correctly-rounded double of the
    exact sum ÷ count, computed identically by any engine. Init =
    the ``k`` lowest-id vectors (deterministic). Empty cells keep their
    previous centroid. Driver traffic per iteration is k×(dim+1) values —
    the classic scalable k-means shape (data never leaves the cluster,
    centroids ride the closure).

    Returns (final centroids, final assignment DataFrame with
    (id, vec, cell, cos_sim)).
    """
    dim = corpus.select(F.size(F.col(vec_col))).first()[0]
    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [list(map(float, r[vec_col])) for r in init]
    score_fn = score_fn or _default_score
    for _ in range(iters):
        assigned = assign_to_centroid_literals(corpus, centroids, id_col, vec_col, score_fn)
        stats = (
            assigned.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.element_at(F.col(vec_col), p).cast("double").cast("decimal(18,6)")
                    ).alias(f"s{p}")
                    for p in range(1, dim + 1)
                ],
            )
            .collect()
        )
        new_centroids = list(centroids)  # empty cells keep previous
        for r in stats:
            new_centroids[r["cell"]] = [float(r[f"s{p}"]) / r["n"] for p in range(1, dim + 1)]
        centroids = new_centroids
    return centroids, assign_to_centroid_literals(corpus, centroids, id_col, vec_col, score_fn)


def lsh_bits_for_corpus(n_rows: int, target_bucket: int = 1024) -> int:
    """Sizing rule for sign-LSH sketch width: enough bits that the expected
    bucket holds ~``target_bucket`` vectors — the within-bucket pairwise
    join is O(n·target_bucket), never O(n²/2^bits) with a fixed small
    ``bits``. 10^10 rows at target 1024 → 24 bits."""
    import math

    return max(4, math.ceil(math.log2(max(n_rows / max(target_bucket, 1), 2))))


def _resolve_bits(bits, df: DataFrame, target_bucket: int) -> int:
    """``bits='auto'`` → apply :func:`lsh_bits_for_corpus` to the corpus
    row count (one column-pruned count job). Fixed small sketches are the
    classic near-dup scale bug — buckets grow as n/2^bits, so the
    within-bucket join quietly goes quadratic as the corpus grows; auto is
    the safe default for callers that don't pre-size."""
    if bits == "auto":
        return lsh_bits_for_corpus(df.count(), target_bucket=target_bucket)
    if not isinstance(bits, int):
        raise ValueError(f"bits must be an int or 'auto', got {bits!r}")
    return bits


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int | str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    score_fn=None,
    dim: int | None = None,
    auto_target_bucket: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the fifth dedup strategy):
    bucket by sign-LSH (or a metadata block), pairwise cosine within bucket.

    ``bits`` must grow with the corpus (see ``lsh_bits_for_corpus``): a
    fixed small sketch makes the within-bucket join quadratic — the default
    ``'auto'`` sizes it from the corpus count. A single wide key also
    *loses recall* (near-dups must agree on every bit) — at scale prefer
    ``embedding_near_dup_pairs_banded``, which ORs several shorter keys
    exactly like the MinHash band scheme.
    """
    if block_col is None:
        bits = _resolve_bits(bits, embeddings, auto_target_bucket)
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        (F.col(block_col) if block_col else sign_lsh_key(F.col(vec_col), bits, dim)).alias("bucket"),
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


def embedding_near_dup_pairs_banded(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bands: int = 4,
    bits_per_band: int | str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_fn=None,
    dim: int | None = None,
    prefilter_margin: float | None = 1e-3,
    auto_target_bucket: int = 64,
) -> DataFrame:
    """Banded embedding near-dup — the at-scale variant: a
    ``bands*bits_per_band``-bit sign sketch split into ``bands`` shorter
    keys; candidates are pairs agreeing on ANY band (union of ``bands``
    equi-joins via one posexplode), deduped before the exact-cosine verify.

    Exactly the MinHash band trade: per-band keys are short (high recall —
    a near-dup pair only needs one band of sign agreement), while the
    AND-within-band keeps buckets small (collision rate per band
    ~n²/2^bits_per_band, spread across 2^bits_per_band buckets of a slim
    (id, band) table). Candidate generation never materializes all-pairs,
    and the vector payloads only travel in the final verify join.
    """
    score_fn = score_fn or _default_score
    # 'auto' (default): per-band width from the corpus count so per-band
    # bucket sizes stay ~auto_target_bucket as n grows (per-band collision
    # work ~ n*target, never n²/2^bits with a width someone fixed at small n)
    bits_per_band = _resolve_bits(bits_per_band, embeddings, auto_target_bucket)
    total_bits = bands * bits_per_band
    # Materialize the slim (id, key) sketch table: both self-join sides read
    # ONE sketch computation, and the read is a barrier against project-
    # collapse inlining the per-bit aggregates into each band substring.
    # At cluster scale this is the sketch table you would persist bucketed.
    # (Scratch-managed dir — removed at process exit.)
    from ethereum_etl_spark import scratch

    keyed = scratch.materialize(
        embeddings.select(
            F.col(id_col).alias("id"),
            sign_lsh_key(F.col(vec_col), total_bits, dim).alias("_key"),
        ),
        "lsh_sketch_",
    )
    banded = keyed.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.substring(F.col("_key"), b * bits_per_band + 1, bits_per_band)
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()  # a pair agreeing on several bands is verified once
    )
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    joined = cand.join(va, "id_a").join(vb, "id_b")
    if score_fn is cosine_portable and prefilter_margin is not None:
        # Exact-decimal cosine is ~an order of magnitude costlier than the
        # float one, and candidates outnumber survivors ~100:1. Two-stage
        # verify: (1) float cosine prefilter at threshold − margin, (2) the
        # bit-exact portable cosine only on survivors — identical output to
        # a single exact pass, measured ~4x faster end-to-end.
        #
        # Margin soundness: |cosine − cosine_portable| ≤ dim·5e-7/(|a||b|)
        # (per-product DECIMAL(18,6) quantization). The base
        # ``prefilter_margin`` assumes roughly unit-norm embeddings; rather
        # than trust that, widen it by the bound at the corpus's observed
        # worst case (one cheap agg pass). Degenerate norms (≈0) would blow
        # the bound up — then the prefilter is skipped entirely, which is
        # always output-safe. Pass ``prefilter_margin=None`` to force a
        # single exact pass.
        stats = embeddings.agg(
            F.min(l2_norm(F.col(vec_col))).alias("mn"),
            F.max(F.size(F.col(vec_col))).alias("dim"),
        ).first()
        min_norm, obs_dim = float(stats["mn"] or 0.0), int(stats["dim"] or 0)
        if min_norm > 1e-6:
            margin = prefilter_margin + obs_dim * 5e-7 / (min_norm * min_norm)
            joined = joined.filter(
                cosine(F.col("_va"), F.col("_vb")) >= threshold - margin
            )
    return joined.select(
        "id_a", "id_b", score_fn(F.col("_va"), F.col("_vb")).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


# ---------------- int8 symmetric quantization (the memory/bandwidth path) ----

def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_col: str = "qvec",
) -> DataFrame:
    """Per-vector symmetric int8 quantization:
    ``q_i = round(127 * v_i / max|v|)`` (all-zeros for a zero vector).

    The standard embedding-compression step for billion-vector ANN: 4x
    less storage/shuffle/scan than float32, integer dot products, exact
    rerank only on survivors. The arithmetic is engine-portable — IEEE
    double multiply/divide then half-away-from-zero round produce the
    same int8 in Spark and DuckDB, so quantized rankings are
    oracle-checkable bit-for-bit.

    Implementation note: the scale (an ``aggregate`` result) must NOT be
    referenced per-element in the same projection — Catalyst inlines
    aggregate results per reference (the round-2 simhash lesson, an
    O(dim²) trap). Round 4 prevented the inlining with a full
    ``repartition`` shuffle barrier; that cost a whole-corpus exchange
    just to pin expression evaluation. This version uses the
    fold-don't-inline LET-BINDING instead (the ``sign_lsh_key`` pattern):
    the scale is wrapped in a 1-element array and re-enters the transform
    as a lambda VARIABLE — lambda variables are evaluated once per row by
    construction, so the aggregate runs once, per-element references are
    free, and the operator is a pure zero-shuffle projection (at 10^10
    rows the removed exchange was the entire cost of quantization).
    """
    scale = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
    )
    q = F.element_at(
        F.transform(
            F.array(scale),  # let-bind: scale becomes a lambda variable
            lambda s: F.transform(
                F.col(vec_col),
                lambda v: F.when(
                    s > 0, F.round(F.lit(127.0) * v.cast("double") / s)
                ).otherwise(F.lit(0.0)).cast("int"),
            ),
        ),
        1,
    )
    return df.withColumn(q_col, q)


def _qdot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_cosine(a: Column, b: Column) -> Column:
    """Cosine over int8 codes — exact integer sums, one double division."""
    denom = F.sqrt(_qdot(a, a).cast("double")) * F.sqrt(_qdot(b, b).cast("double"))
    return F.when(denom > 0, _qdot(a, b).cast("double") / denom).otherwise(F.lit(0.0))


def ann_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | None = None,
    score_fn=None,
) -> DataFrame:
    """Quantize-then-rerank ANN: rank ALL pairs on int8 cosine (the cheap
    pass — integer multiplies over 4x-smaller codes), keep the top
    ``rerank`` (default 4k) candidates per query, then score only those
    with the exact float/portable cosine and emit the top k.

    Scale shape: the quantized pass ships ONLY (id, int8 codes) through
    the broadcast join — float vectors never travel. Candidates are a slim
    (query_id, neighbor_id) table joined back to the corpus for the exact
    rerank, so full-precision vectors are read for O(queries x rerank)
    rows, not O(corpus). Recall loss of int8 cosine at 4k-deep candidates
    is negligible for real embeddings (quantization error ~1/254 per dim);
    the exact pass restores true ranking among survivors.
    """
    rerank = rerank or 4 * k
    score_fn = score_fn or _default_score
    cq = quantize_int8(corpus, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("cq")
    )
    qq = quantize_int8(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("qq")
    )
    scored = (
        cq.crossJoin(F.broadcast(qq))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            quantized_cosine(F.col("cq"), F.col("qq")).alias("_qcos"),
        )
    )
    cand = _grouped_topk(
        scored, "query_id", [F.desc("_qcos"), F.asc("neighbor_id")], rerank,
        rank_col="_qrank",
    ).select("query_id", "neighbor_id")
    # exact rerank: join the slim candidate set back to full-precision rows
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    exact = (
        cand.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            score_fn(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)


def ivf_quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_fn=None,
) -> DataFrame:
    """IVF x int8 composition — the realistic billion-vector ANN shape:
    SUBLINEAR candidate generation (each query probes only its ``nprobe``
    nearest IVF cells, so the scored set is a cell-pruned slice, not the
    whole corpus) combined with COMPRESSED scoring (the cheap pass ranks
    candidates on int8 codes — 4x less shuffle/scan than float32, integer
    dot products), then an exact rerank of the top ``rerank`` survivors
    with full-precision vectors. This composes :func:`ivf_topk`'s cell
    pruning with :func:`ann_topk_quantized`'s quantize-then-rerank — each
    alone is a demo; together they are the FAISS-style IVF-SQ8 layout.

    Scale shape: cell assignment and query-probe selection are broadcast
    joins against the small centroid dim; the quantized corpus codes join
    the (tiny) probed-cells table on ``cell`` — at cluster scale the
    assigned+quantized table is written out partitioned by cell, making
    the cheap pass a partition-pruned scan. Float vectors travel only in
    the final rerank join, for O(queries x rerank) rows.

    Determinism: quantization (IEEE double mul/div + half-away-from-zero
    round), integer dots, and all tie-breaks (ascending id / centroid id)
    are engine-portable, so the full pipeline — cells, candidates, final
    ranking — is reproducible bit-for-bit by an ANSI-SQL oracle.
    """
    rerank = rerank or 4 * k
    score_fn = score_fn or _default_score
    # corpus -> nearest cell (exact), then int8 codes for the cheap pass
    assigned = ivf_assign(corpus, centroids, id_col, vec_col, score_fn)
    cq = quantize_int8(assigned, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("cell"), F.col("qvec").alias("cq")
    )
    # queries -> nprobe nearest cells (exact over the broadcast centroid dim)
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
    )
    qq = quantize_int8(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec_f"),
        F.col("qvec").alias("qq"),
    )
    qscore = qq.crossJoin(F.broadcast(c)).select(
        "query_id", "qq", "centroid_id",
        score_fn(F.col("qvec_f"), F.col("cvec")).alias("_cs"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_cs"), F.asc("centroid_id"))
    qcells = (
        qscore.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qq", F.col("centroid_id").alias("cell"))
    )
    # cheap pass: int8 cosine over cell-pruned candidates only
    scored = (
        cq.join(F.broadcast(qcells), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            quantized_cosine(F.col("cq"), F.col("qq")).alias("_qcos"),
        )
    )
    cand = _grouped_topk(
        scored, "query_id", [F.desc("_qcos"), F.asc("neighbor_id")], rerank,
        rank_col="_qrank",
    ).select("query_id", "neighbor_id")
    # exact rerank: slim candidate set joined back to full-precision rows
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    exact = (
        cand.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            score_fn(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)
