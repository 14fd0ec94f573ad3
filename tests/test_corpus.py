"""Corpus prep operators: deterministic hash split + boilerplate removal."""

from pyspark.sql import functions as F

from ethereum_etl_spark.operators.corpus import (
    hash_split,
    remove_boilerplate_lines,
    split_thresholds,
)


def test_split_thresholds_cover_space_and_normalize():
    th = split_thresholds({"a": 9, "b": 1})  # un-normalized weights
    assert th[-1][1] == "ffffffff"
    assert th[0][1] == format(int(0.9 * 16**8), "08x")


def test_hash_split_deterministic_and_stable_under_growth(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    assert a == b
    # growing the corpus must not migrate existing rows
    sub = {r["doc_id"]: r["split"]
           for r in hash_split(df.filter("doc_id < 500"), "doc_id").collect()}
    assert all(a[k] == v for k, v in sub.items())
    # fractions roughly honor the 90/5/5 default
    from collections import Counter
    c = Counter(a.values())
    assert 0.85 < c["train"] / 2000 < 0.95
    assert c["train"] + c["val"] + c["test"] == 2000


def test_hash_split_salt_rerolls(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df, "doc_id", salt="v2").collect()}
    assert a != b


def test_hash_split_is_projection_no_shuffle(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = hash_split(df, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_remove_boilerplate_lines(spark):
    boiler = "COOKIE BANNER"
    rows = [
        (1, f"alpha one\n{boiler}\nbeta two"),
        (2, f"{boiler}\ngamma three"),
        (3, f"delta four\n{boiler}"),
        (4, boiler),  # all-boilerplate doc survives as empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_boilerplate_lines(df, "doc_id", "text", max_occurrences=2).collect()}
    assert out[1]["clean_text"] == "alpha one\nbeta two"  # order preserved
    assert out[2]["clean_text"] == "gamma three"
    assert out[3]["clean_text"] == "delta four"
    assert out[4]["clean_text"] == "" and out[4]["n_lines_kept"] == 0
    assert out[1]["n_lines_dropped"] == 1
    # a line occurring exactly max_occurrences times is kept
    df2 = spark.createDataFrame(
        [(1, "x\ny"), (2, "x\nz")], "doc_id long, text string"
    )
    out2 = {r["doc_id"]: r["clean_text"] for r in
            remove_boilerplate_lines(df2, "doc_id", "text", max_occurrences=2).collect()}
    assert out2 == {1: "x\ny", 2: "x\nz"}
