"""Deduplication operators for large-scale training-data pipelines.

Five strategies, all declarative DataFrame compositions (no row-at-a-time
Python), each designed so the same semantics are expressible in ANSI SQL for
the DuckDB correctness oracle:

- exact:        hash-groupBy on content digest
- MinHash+LSH:  shingle → per-seed min-digest signature → band buckets →
                bucket self-join → Jaccard verify
- SimHash:      per-token digest bit-votes → sign fingerprint → Hamming buckets
- n-gram Jaccard: blocked self-join + token-set overlap
- embedding:    cosine near-dup within LSH/blocking buckets (see similarity.py)

Scale notes (100 TB): every self-join is *blocked* (band key, fingerprint,
or metadata block) so candidate generation is an equi-join — never a cross
join; signatures are computed in one projection pass (map-side, no shuffle);
the only shuffles are the groupBy on digest/bucket keys, which are
high-cardinality and salt-friendly.

Digest choice: md5 (JVM-native in Spark, built-in in DuckDB) — deterministic
across engines, which is what makes the oracle comparison possible. MinHash
"seeds" are digest-prefix salts: min(md5(seed || shingle)) is a valid
min-wise hash family member per seed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------- exact ----------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one survivor (min id) per exact content digest."""
    return (
        df.withColumn("digest", F.md5(F.col(text_col)))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


# ---------------- shingles / minhash ----------------

def char_shingles(col: Column, k: int = 8) -> Column:
    """Distinct k-char shingles as an array (one transform(), JVM-side)."""
    n = F.greatest(F.length(col) - F.lit(k - 1), F.lit(0))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(col, i, k))
    )


def minhash_signature(col: Column, n_hashes: int = 16, k: int = 8) -> Column:
    """Array of ``n_hashes`` min-hash values over the shingle set.

    Cost shape: each shingle is digested ``ceil(n_hashes/4)`` times (one
    salted md5 yields four independent 8-hex-char hash slices), then the
    per-seed minima are cheap substring scans over the precomputed digest
    array — 4x fewer digest evaluations than one-md5-per-seed."""
    sh = char_shingles(col, k)
    n_digests = (n_hashes + 3) // 4
    digests = F.transform(
        sh,
        lambda s: F.concat(*[F.md5(F.concat(F.lit(f"{d}:"), s)) for d in range(n_digests)]),
    )
    def _slice(j: int):
        # NOTE: must be a closure factory — a `lambda h, j=j:` default-arg
        # would make PySpark bind j as the (element, index) lambda's INDEX
        # argument, silently corrupting the signature
        return lambda h: F.substring(h, j * 8 + 1, 8)

    mins = [F.array_min(F.transform(digests, _slice(j))) for j in range(n_hashes)]
    return F.array(*mins)


def minhash_band_keys(sig: Column, bands: int, rows_per_band: int) -> Column:
    """LSH band keys: digest of each band's signature slice."""
    keys = [
        F.md5(F.concat_ws("|", F.lit(str(b)), F.slice(sig, b * rows_per_band + 1, rows_per_band)))
        for b in range(bands)
    ]
    return F.array(*keys)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two DISTINCT-element string arrays.

    |A∪B| is derived as |A|+|B|−|A∩B| — one hash-set build per pair instead
    of two (array_union was the measured hotspot of LSH verification)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 8,
    threshold: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, Jaccard-verified.

    Plan shape: project(signature, bands, shingles) → explode(band) →
    self-equi-join on (band_key) with id< id ordering → dedup pairs →
    exact-Jaccard filter. The join key is the band bucket — hot buckets are
    bounded by band width; no cross join ever materializes.

    The signature table is read three times (band keys + both verify sides),
    so it is cached for the computation; with ``materialize=True`` (default)
    the result is written out eagerly and the cache released before
    returning — repeated invocations leak no cached blocks. Pass
    ``materialize=False`` to keep the lazy plan (caller owns the cache; at
    cluster scale, write the signature table bucketed by band_key instead).
    """
    rows_per_band = n_hashes // bands
    n_digests = (n_hashes + 3) // 4
    # TWO projection steps: the digest array is materialized as its own
    # column before the 16 min-scans reference it — a single-expression form
    # would inline (and re-evaluate) the md5 transform into every scan
    with_digs = df.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), k).alias("shingles"),
    ).withColumn(
        "_digs",
        F.transform(
            F.col("shingles"),
            lambda s: F.concat(*[F.md5(F.concat(F.lit(f"{d}:"), s)) for d in range(n_digests)]),
        ),
    )

    def _slice(j: int):
        return lambda h: F.substring(h, j * 8 + 1, 8)

    sig = F.array(
        *[F.array_min(F.transform(F.col("_digs"), _slice(j))) for j in range(n_hashes)]
    )
    base = with_digs.withColumn("sig", sig).select("id", "shingles", "sig")
    # cached: read once for band keys, twice more for shingle lookups (at
    # cluster scale: materialize the signature table to parquet/Iceberg
    # instead, bucketed by band_key)
    base = base.persist()

    # candidate generation over SLIM rows (id, band_key) — shingle arrays
    # don't travel through the self-join shuffle
    banded = base.select(
        "id", F.explode(minhash_band_keys(F.col("sig"), bands, rows_per_band)).alias("band_key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()  # dedup BEFORE the expensive verify: a pair colliding in
    )  # several bands is verified once, not once per band

    # verify: join shingles back, prune with the size bound (J <= min/max —
    # a pair whose sizes are too different can never pass), then exact Jaccard
    sh_a = base.select(F.col("id").alias("id_a"), F.col("shingles").alias("_sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("shingles").alias("_sh_b"))
    na, nb = F.size("_sh_a"), F.size("_sh_b")
    pairs = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .filter(F.least(na, nb).cast("double") >= threshold * F.greatest(na, nb))
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("_sh_a"), F.col("_sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if not materialize:
        return pairs
    from ethereum_etl_spark import scratch

    out = scratch.materialize(pairs, "minhash_pairs_")
    base.unpersist()
    return out


def minhash_dedup(df: DataFrame, id_col: str, text_col: str, **kw) -> DataFrame:
    """Survivors after dropping the higher id of every near-dup pair."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, **kw)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------- simhash ----------------

_HEX_CHARS = "0123456789abcdef"


def simhash_votes(col: Column, bits: int, finish=None) -> Column:
    """Per-bit SimHash vote counters as an ``array<long>`` of length ``bits``.

    Whitespace tokens; vote j = sum over tokens of (2*bit_j(md5(token)) − 1),
    where bit_j is bit ``j%4`` of hex digit ``j//4`` of the digest. ONE
    aggregate() pass with an **array accumulator**: per token the ±1 bit
    array is built by transform/flatten and zip_with-added into the
    accumulator. Unlike the previous bits-wide struct accumulator (whose
    generated code exceeded the JVM method-size limit at 16 bits and fell
    back to interpreted evaluation), the array form compiles to loops —
    whole-stage codegen survives at any width up to md5's 128 bits.

    ``finish``: optional lambda applied to the vote array INSIDE the
    aggregate — consumers that reference individual votes many times (the
    hex fingerprint reads all 64) must fold here, where the accumulator is
    a lambda *variable*; referencing the returned expression N times would
    inline — and re-evaluate — the whole aggregate N times (a measured 70×
    slowdown for the 64-bit fingerprint).
    """
    if bits > 128:
        raise ValueError("md5 provides at most 128 bits")
    n_nibbles = (bits + 3) // 4
    toks = F.filter(F.split(F.trim(col), r"\s+"), lambda t: F.length(t) > 0)
    hashes = F.transform(toks, lambda t: F.md5(t))

    def pm1(h: Column) -> Column:
        # hex chars -> nibble values -> 4 ±1 bits each (LSB-first), flattened
        nibbles = F.transform(
            F.slice(F.split(h, ""), 1, n_nibbles),
            lambda c: F.conv(c, 16, 10).cast("int"),
        )
        return F.slice(
            F.flatten(
                F.transform(
                    nibbles,
                    lambda v: F.array(
                        *[
                            ((F.shiftright(v, r).bitwiseAND(F.lit(1))) * 2 - 1).cast("long")
                            for r in range(4)
                        ]
                    ),
                )
            ),
            1,
            bits,
        )

    acc0 = F.array_repeat(F.lit(0).cast("long"), bits)
    return F.aggregate(
        hashes, acc0, lambda acc, h: F.zip_with(acc, pm1(h), lambda a, b: a + b),
        finish,
    )


def simhash_bits(col: Column, bits: int = 16) -> Column:
    """SimHash fingerprint as a BIGINT (``bits`` ≤ 62): per-token md5 bit
    votes → sign. Bit-for-bit reproducible in SQL (the DuckDB oracle replays
    the same md5 arithmetic)."""
    if bits > 62:
        raise ValueError("use simhash_hex for fingerprints wider than 62 bits")
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])

    def finish(votes: Column) -> Column:
        signed = F.zip_with(
            votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
        )
        return F.aggregate(signed, F.lit(0).cast("long"), lambda a, b: a + b)

    return simhash_votes(col, bits, finish)


def simhash_hex(col: Column, bits: int = 64) -> Column:
    """SimHash fingerprint as a lowercase hex string of ``bits/4`` chars —
    the at-scale representation: 64-bit default (16 hex chars), no BIGINT
    sign-bit ceiling, substring-sliceable into LSH bands. Hex digit i packs
    votes 4i..4i+3 (LSB-first within the digit)."""
    if bits % 4:
        raise ValueError("bits must be a multiple of 4")
    chars = F.array(*[F.lit(c) for c in _HEX_CHARS])

    def finish(votes: Column) -> Column:
        digits = F.transform(
            F.sequence(F.lit(0), F.lit(bits // 4 - 1)),
            lambda i: sum(
                F.when(F.element_at(votes, (i * 4 + r + 1).cast("int")) > 0, F.lit(1 << r))
                .otherwise(F.lit(0))
                for r in range(4)
            ),
        )
        return F.array_join(F.transform(digits, lambda d: F.element_at(chars, d + 1)), "")

    return simhash_votes(col, bits, finish)


def simhash_dedup(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Docs sharing a fingerprint collapse to the min-id survivor (exact-
    fingerprint collapse; for near-dup detection at scale use
    ``simhash_hamming_pairs``, which catches Hamming-distance neighbors)."""
    return (
        df.withColumn("simhash", simhash_bits(F.col(text_col), bits))
        .groupBy("simhash")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_docs"))
    )


def hamming_distance_hex(fp_a: Column, fp_b: Column, bits: int) -> Column:
    """Hamming distance between two equal-width hex fingerprints: XOR +
    popcount over 16-bit chunks — pure JVM column ops in Spark, and the
    identical xor/bit_count arithmetic exists in ANSI engines."""
    n_chunks = (bits + 15) // 16
    terms = [
        F.bit_count(
            F.conv(F.substring(fp_a, 4 * c + 1, 4), 16, 10)
            .cast("long")
            .bitwiseXOR(F.conv(F.substring(fp_b, 4 * c + 1, 4), 16, 10).cast("long"))
        )
        for c in range(n_chunks)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs within Hamming distance ``max_hamming`` of the
    ``bits``-wide SimHash — the multi-index scheme that makes SimHash an
    actual dedup tool at 10^10 docs (exact-fingerprint equality misses
    almost all true near-dups at 64 bits).

    Multi-index (pigeonhole): split the fingerprint into ``bands``
    contiguous bands; any pair with Hamming ≤ bands−1 agrees exactly on at
    least one band, so candidates come from ``bands`` *equi-joins* on
    (band_idx, band_value) — never all-pairs. ``max_hamming`` must be
    < ``bands`` for exact recall. The verify step is a cheap XOR popcount
    on the 16-char fingerprints carried through the join (no second join
    back to the corpus).

    Scale shape: the banded table is slim (id, 16-char fp, band key);
    band values are ``bits/bands`` wide (16 bits at the defaults → 65k
    buckets per band, and band values distribute ~uniformly because md5
    bits are balanced), so the self-join is a bounded-bucket equi-join.
    """
    if max_hamming >= bands:
        raise ValueError("exact recall needs max_hamming < bands (pigeonhole)")
    if bits % (4 * bands):
        raise ValueError("bands must evenly split the hex fingerprint")
    width = bits // 4 // bands  # hex chars per band
    base = df.select(
        F.col(id_col).alias("id"), simhash_hex(F.col(text_col), bits).alias("fp")
    )
    # Materialize the slim (id, fp) table: (a) both sides of the self-join
    # read ONE fingerprint computation instead of recomputing it per side,
    # and (b) the read is a barrier against project-collapse inlining the
    # fingerprint aggregate into each band substring (a measured per-band
    # re-evaluation otherwise). At cluster scale this is the fingerprint
    # table you would persist bucketed anyway. (Scratch-managed: the dir is
    # tracked and removed at process exit — see ethereum_etl_spark.scratch.)
    from ethereum_etl_spark import scratch

    base = scratch.materialize(base, "simhash_fp_")
    banded = base.select(
        "id",
        "fp",
        F.posexplode(
            F.array(*[F.substring(F.col("fp"), b * width + 1, width) for b in range(bands)])
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
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()  # a pair colliding in several bands is verified once
    )
    return cand.select(
        "id_a",
        "id_b",
        hamming_distance_hex(F.col("fp_a"), F.col("fp_b"), bits).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


# ---------------- n-gram jaccard ----------------

def word_ngrams_all(col: Column, n: int = 2) -> Column:
    """All word n-grams WITH multiplicity (repetition metrics need counts).
    Docs shorter than n tokens yield an empty array — the when() guard
    matters: sequence(1, 0) would generate a DESCENDING [1, 0] and feed
    slice() an illegal 0 start."""
    toks = F.filter(F.split(F.trim(F.lower(col)), r"\s+"), lambda t: F.length(t) > 0)
    cnt = F.size(toks) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column, n: int = 2) -> Column:
    return F.array_distinct(word_ngrams_all(col, n))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    n: int = 2,
    threshold: float = 0.3,
) -> DataFrame:
    """Blocked pairwise n-gram Jaccard: self-equi-join on ``block_cols``
    (metadata blocking — never all-pairs), then exact overlap."""
    base = df.select(
        F.col(id_col).alias("id"), *[F.col(c) for c in block_cols],
        word_ngrams(F.col(text_col), n).alias("grams"),
    )
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    na, nb = F.size("a.grams"), F.size("b.grams")
    return (
        a.join(b, cond)
        # size bound J <= min/max prunes pairs that can never pass before
        # the hash-set intersection runs
        .filter(F.least(na, nb).cast("double") >= threshold * F.greatest(na, nb))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jaccard(F.col("a.grams"), F.col("b.grams")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------- connected components (cluster collapse) ----------------

def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Collapse a near-dup pair list into clusters: (id, comp) where ``comp``
    is the minimum node id reachable from ``id`` (the canonical survivor).

    This is the missing last step of every pair-producing dedup strategy
    above: MinHash/SimHash/n-gram emit *edges*; keeping one survivor per
    *cluster* needs the transitive closure (A~B, B~C => drop two of three,
    not one of each pair independently).

    Algorithm: min-label propagation with pointer jumping (path halving).
    Each round
      1. pulls the min neighbour label across the symmetrized edge list
         (equi-join on the node id + groupBy min — slim (id, comp) rows
         only, never payloads), then
      2. jumps ``comp -> comp(comp)`` (a self-join of the label table),
    which makes chains collapse in O(log n) rounds instead of O(diameter)
    (Kiveris et al., "Connected Components in MapReduce and Beyond" use the
    same two-phase min-propagation idea; near-dup graphs additionally have
    tiny diameters because LSH emits most intra-cluster pairs directly).

    Scale notes (10^10 nodes): per round the only shuffles are equi-joins /
    groupBy on the node id — high-cardinality keys, AQE-friendly; labels are
    ``localCheckpoint``ed every round so the plan/lineage stays O(1) deep
    (on a real cluster prefer ``spark.sparkContext.setCheckpointDir`` +
    ``.checkpoint()`` for fault tolerance; local mode has no reliable store).
    Convergence is detected with a single count on the slim label table.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("id")).distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(
                labels.select(F.col("id").alias("v"), F.col("comp").alias("vcomp")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("nbr"))
        )
        stepped = labels.join(nbr, labels["id"] == nbr["u"], "left").select(
            "id", F.least("comp", F.coalesce("nbr", "comp")).alias("comp")
        )
        # pointer jump: comp <- comp(comp). comp is always an existing node
        # id (a min over observed ids), so the left join always matches.
        jumped = (
            stepped.alias("a")
            .join(
                stepped.select(
                    F.col("id").alias("comp"), F.col("comp").alias("jump")
                ).alias("b"),
                "comp",
                "left",
            )
            .select("id", F.coalesce("jump", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) for every doc appearing in a
    near-dup pair; ``cluster_id`` is the min doc id of the cluster — the
    canonical survivor (keep rows where doc_id == cluster_id, drop the rest).
    """
    labels = connected_components(pairs, src, dst, max_iter)
    sizes = labels.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "comp").select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        "cluster_size",
    )
