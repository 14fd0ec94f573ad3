"""Physical-plan regression audit — the plans PLANS.md promises must not
silently degrade. Each assertion pins a scale property: dims broadcast
(no sort-merge join on the fact side), predicates reach the parquet
reader, and pure-JVM paths contain no Python eval nodes."""

import json

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_tpch_joins_broadcast_not_sortmerge(spark):
    import __spark_entry__ as e

    for name in ("q3_shipping_priority", "q5_region_revenue", "token_metadata_enrich"):
        plan = _plan(spark, e.queries()[name](spark, SF_DIR))
        assert "SortMergeJoin" not in plan, f"{name} fell back to sort-merge join"
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"


def test_filter_pushdown_reaches_scan(spark):
    import __spark_entry__ as e

    plan = _plan(spark, e.queries()["purchase_filter_pushdown"](spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "purchase" in plan  # the event_type predicate is in the scan, not a post-filter


def test_replay_seq_range_pushed(spark, tmp_path):
    from ethereum_etl_spark.sources.datagen import write_repo_changes
    from ethereum_etl_spark.sources.tail import TailSource

    log = str(tmp_path / "log")
    write_repo_changes(spark, log, 2000, seed=42, partitions=4)
    src = TailSource(spark, log, lag=0, batch_size=1000)
    plan = _plan(spark, src.range_df(100, 900))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(seq,100)" in plan and "LessThanOrEqual(seq,900)" in plan


def test_structured_flatten_plan_is_pure_jvm(spark):
    """The structured flatten's parse+explode pipeline must contain no
    Python eval nodes (the whole point vs the kernel), and the kernel
    variant must be the one paying for Python workers."""
    from ethereum_etl_spark.operators.traces import (
        _cached_frames_array,
        _nested_node_ddl,
        _SCALAR_FIELDS,
        flatten_geth_traces,
    )

    tree = {"type": "call", "from": "0xa", "calls": [{"type": "create"}]}
    df = spark.createDataFrame(
        [(1, "0xt", json.dumps(tree))],
        "block_number long, transaction_hash string, trace_json string",
    )
    root_ddl = (
        f"{_SCALAR_FIELDS.replace(':', '')}, "
        f"`calls` ARRAY<{_nested_node_ddl(3)}>, `_corrupt` STRING"
    )
    exploded = df.select(
        F.from_json("trace_json", root_ddl, {"columnNameOfCorruptRecord": "_corrupt"}).alias("_node")
    ).select(F.explode(_cached_frames_array(4)).alias("_f"))
    plan = _plan(spark, exploded)
    for py_node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert py_node not in plan
    kernel_plan = _plan(spark, flatten_geth_traces(df))
    assert "MapInPandas" in kernel_plan


def test_near_dup_candidate_join_is_slim(spark):
    """The banded near-dup candidate self-join must shuffle only the slim
    (id, band) table — embedding payloads travel exclusively in the final
    verify joins, never through the candidate exchange."""
    from ethereum_etl_spark.operators.similarity import (
        embedding_near_dup_pairs_banded,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = embedding_near_dup_pairs_banded(emb, threshold=0.9, bits_per_band=4)
    plan = _plan(spark, pairs)
    # formatted explain: every shuffle Exchange node lists its input
    # columns; none of them may carry the embedding payload (it travels
    # only through the broadcast verify joins)
    lines = plan.splitlines()
    exchange_ids = [
        l.strip().split(")")[0].lstrip("(")
        for l in lines
        if l.strip().startswith("(") and l.strip().endswith(" Exchange")
    ]
    assert exchange_ids, "expected at least the candidate-dedup exchange"
    for i, l in enumerate(lines):
        if any(l.startswith(f"({x}) Exchange") for x in exchange_ids):
            detail = "\n".join(lines[i : i + 4])
            assert "embedding" not in detail and "_va" not in detail, detail


def test_quantized_ann_join_ships_codes_not_floats(spark):
    """The quantized candidate pass's broadcast join must carry int8 codes
    only — the float embedding column stays out of the pairwise stage (the
    4x-bandwidth win the operator exists for), reappearing only in the
    exact rerank join."""
    from ethereum_etl_spark.operators.similarity import (
        cosine_portable,
        quantize_int8,
        quantized_cosine,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cq = quantize_int8(emb).select(
        F.col("vec_id").alias("neighbor_id"), F.col("qvec").alias("cq")
    )
    qq = quantize_int8(emb.filter("vec_id < 2")).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("qq")
    )
    scored = (
        cq.crossJoin(F.broadcast(qq))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                quantized_cosine(F.col("cq"), F.col("qq")).alias("qcos"))
    )
    plan = _plan(spark, scored)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the join inputs project qvec codes; the float column is pruned before
    # the pairwise stage (ReadSchema still names it — quantization reads it
    # once at the scan — but no join-side Project carries 'embedding')
    assert "cq" in plan and "qq" in plan
    for line in plan.splitlines():
        if "Project" in line and "embedding" in line and "qvec" not in line:
            raise AssertionError(f"float embeddings travel into the join: {line}")


def test_ivf_quantized_cheap_pass_is_cell_pruned_broadcast(spark):
    """The IVF x int8 composition's cheap pass must join the quantized
    corpus to a BROADCAST probed-cells table on the cell key (never a
    shuffle of the corpus side), and — like the flat quantized variant —
    only int8 codes may travel through that join; float vectors reappear
    exclusively in the exact rerank join."""
    from ethereum_etl_spark.operators.similarity import (
        cosine_portable,
        ivf_quantized_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = ivf_quantized_topk(
        emb,
        emb.filter("vec_id < 2"),
        emb.filter("vec_id % 10 = 0"),
        k=3,
        nprobe=2,
        rerank=12,
        score_fn=cosine_portable,
    )
    plan = _plan(spark, out)
    assert "BroadcastHashJoin" in plan, "probed-cells join lost its broadcast"
    # the corpus side must not be re-sorted for a sort-merge join anywhere
    assert "SortMergeJoin" not in plan, "a join fell back to sort-merge"
