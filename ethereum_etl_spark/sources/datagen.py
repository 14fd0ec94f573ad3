"""Deterministic synthetic change-event log (the CDC input fixture).

The engine's input is a 10^10-row change-event table shaped
``(seq, repo, path, commit, lang, content)`` (BASELINE.json input_hint) —
the analog of the reference's chain of blocks (`seq` = block number,
cf. /root/reference/blockchainetl/streaming/streamer.py:89-114).

Generation is **fully Spark-side and seed-deterministic**: every column is a
pure function of ``seq`` via md5, so the same (seed, n_rows) always yields
bit-identical data at any parallelism, with no driver-side loops — this is
what lets the generator scale to bench sizes (10^7 rows locally, 10^10 on a
cluster) without changing code.

Skew: ``repo`` is Zipf-like (u^3 transform of a uniform hash fraction) so a
few repos are hot — the fixture for salted-repartition testing
(FIXTURES.md §0; the reference's hot-contract analog).

Content quirks exercised (FIXTURES.md §0):
- multiple commits to the same (repo, path)  → upsert ordering
- rows containing ASCII-0                    → sanitize rule
  (reference: export_tokens_job.py:80-90 `clean_user_provided_content`)
- embedded uint256-scale hex payloads        → non-native hex decode

Every expression here is EXACT integer/string arithmetic over md5 — no
floats — so an ANSI-SQL engine can regenerate the identical table and the
driver's oracle can value-check the full replay, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHANGE_LOG_SCHEMA = (
    "seq BIGINT, repo STRING, path STRING, commit STRING, lang STRING, content STRING"
)

_LANGS = ["py", "rs", "go", "js", "java", "c", "md", "sql"]


def _hash_u32(col, salt: str, seed: int):
    """Deterministic uniform 32-bit integer from a column value."""
    h = F.md5(F.concat(F.lit(f"{salt}:{seed}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def generate_repo_changes(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_repos: int = 200,
    paths_per_repo: int = 50,
    start_seq: int = 0,
    skew: float = 3.0,
    partitions: int | None = None,
    with_ops: bool = False,
    delete_every: int = 17,
) -> DataFrame:
    """Return a DataFrame of ``n_rows`` deterministic change events.

    ``start_seq`` lets callers generate disjoint (or deliberately
    overlapping, for replay-idempotence tests) seq ranges that are
    consistent with each other: row content depends only on (seed, seq).

    ``with_ops`` adds a binlog-style ``op`` column (``'u'`` upsert /
    ``'d'`` delete): every ``delete_every``-th row is a DELETE whose merge
    key (repo, path, commit) is that of an earlier row — seq
    ``s - 1 - (s % 7)`` — so the tombstone targets a key the log really
    inserted. The delete rule is pure seq arithmetic, so an ANSI-SQL
    engine regenerates the identical ops log and the final post-delete
    table state stays value-checkable. Default output (``with_ops=False``)
    is unchanged — the append-only chain model.
    """
    if skew != 3.0:
        raise ValueError("only the cubic skew (skew=3.0) is supported — it is "
                         "computed in exact integer arithmetic for oracle parity")
    if with_ops and delete_every < 2:
        raise ValueError("delete_every must be >= 2")
    rng = spark.range(start_seq, start_seq + n_rows, 1, partitions or None)
    seq = F.col("id")
    # key columns derive from kseq: the row's own seq for upserts, the
    # delete target's seq for tombstones (clamped at 0 for tiny start_seq)
    if with_ops:
        is_del = (seq % delete_every) == (delete_every - 1)
        kseq = F.when(is_del, F.greatest(seq - 1 - (seq % 7), F.lit(0))).otherwise(seq)
    else:
        kseq = seq

    # Zipf-ish: u^3 concentrates mass near repo 0 (hot repos). Computed as
    # floor(h^3 * n_repos / 2^96) over exact DECIMAL(38,0) — bit-identical in
    # any engine (a float pow() here would flip floor boundaries across
    # libm implementations and break the SQL replay oracle)
    h = _hash_u32(kseq, "repo", seed).cast("decimal(38,0)")
    num = h * h * h * F.lit(n_repos).cast("decimal(38,0)")
    den = F.lit(str(2 ** 96)).cast("decimal(38,0)")  # 2^96 exceeds long; go via string
    repo_id = ((num - F.pmod(num, den)) / den).cast("decimal(38,0)").cast("int")
    path_id = (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"path:{seed}:"), kseq.cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % paths_per_repo
    )
    lang_id = (repo_id + path_id) % len(_LANGS)
    lang_expr = F.element_at(F.array(*[F.lit(x) for x in _LANGS]), (lang_id + 1).cast("int"))

    commit_h = F.md5(F.concat(F.lit(f"commit:{seed}:"), kseq.cast("string")))
    commit = F.concat(commit_h, F.substring(F.md5(commit_h), 1, 8))  # 40 hex chars

    body = F.md5(F.concat(F.lit(f"content:{seed}:"), seq.cast("string")))
    # uint256-scale hex payload: 24 hex chars ≈ 2^96 (> 2**64, forces the
    # exact-decimal decode path; < 10^38 so Decimal(38,0) holds it)
    big_hex = F.concat(F.lit("0x"), F.substring(body, 1, 24))
    # ~1/32 rows embed an ASCII-0 to exercise the sanitize rule
    nul = F.when((seq % 32) == 7, F.lit("\x00")).otherwise(F.lit(""))
    content = F.concat(
        F.lit("fn change_"),
        seq.cast("string"),
        F.lit("() { // "),
        body,
        nul,
        F.lit(" value="),
        big_hex,
        F.lit(" }\n"),
    )

    cols = [
        seq.alias("seq"),
        F.concat(F.lit("repo-"), F.format_string("%04d", repo_id)).alias("repo"),
        F.concat(
            F.lit("src/"), lang_expr, F.lit("/f"), F.format_string("%03d", path_id.cast("int")),
            F.lit("."), lang_expr,
        ).alias("path"),
        commit.alias("commit"),
        lang_expr.alias("lang"),
        content.alias("content"),
    ]
    if with_ops:
        cols.append(F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"))
    return rng.select(*cols)


def write_repo_changes(
    spark: SparkSession,
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    partitions: int | None = None,
    **kwargs,
) -> None:
    """Materialize the change log as parquet (the bench/test input)."""
    df = generate_repo_changes(spark, n_rows, seed=seed, partitions=partitions, **kwargs)
    df.write.mode("overwrite").parquet(out_dir)
