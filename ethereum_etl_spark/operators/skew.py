"""Hot-key skew handling — salted two-phase aggregation.

The reference has no answer to hot contracts/repos (it simply melts —
SURVEY.md §4 item 4); the north_rule mandates salted repartitioning before
the merge-apply stage. The MERGE itself shuffles on the *full* merge key
(repo, path, commit) — high cardinality, naturally balanced — so salting
belongs to the **pre-aggregations keyed by the hot column alone**
(per-repo rollups, per-contract totals).

Pattern: phase 1 aggregates on (key, salt) — spreading one hot key over
``n_salts`` reducers — phase 2 combines the partials on key. With AQE on,
Spark 3+ also splits skewed shuffle partitions at runtime; the explicit salt
keeps the plan robust when a single key exceeds what AQE can split (one
giant group is indivisible without a salt).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int = 16, deterministic_col: str | None = None) -> DataFrame:
    """Add a salt column. If ``deterministic_col`` is given the salt is a
    stable hash of it (reproducible plans, e.g. for tests); otherwise a
    uniform pseudo-random salt per row."""
    if deterministic_col is not None:
        salt = F.pmod(F.xxhash64(F.col(deterministic_col)), F.lit(n_salts))
    else:
        salt = (F.rand(seed=42) * n_salts).cast("int")
    return df.withColumn(SALT_COL, salt)


# phase-1/phase-2 agg pairs for the common algebraic aggregates
_COMBINE = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase GROUP BY ``keys`` with salting.

    ``aggs``: output_name -> (fn, input_col), fn ∈ {sum, count, min, max}.
    Result is identical to a plain groupBy — verified against the DuckDB
    oracle — but the first shuffle distributes each hot key over
    ``n_salts`` partitions (partial/map-side combine then a tiny final
    combine on ≤ n_salts rows per key).
    """
    salted = with_salt(df, n_salts, deterministic_col=salt_source)
    phase1_cols, phase2_cols = [], []
    for out, (fn, col) in aggs.items():
        p1, p2 = _COMBINE[fn]
        phase1_cols.append(getattr(F, p1)(col).alias(f"__p_{out}"))
        phase2_cols.append(getattr(F, p2)(f"__p_{out}").alias(out))
    partial = salted.groupBy(*keys, SALT_COL).agg(*phase1_cols)
    return partial.groupBy(*keys).agg(*phase2_cols)
