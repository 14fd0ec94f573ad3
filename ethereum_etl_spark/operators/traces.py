"""Trace flatten — the reference's P6: recursive call-tree -> rows.

Reference: ``geth_trace_to_traces``
(/root/reference/ethereumetl/mappers/trace_mapper.py:127-170) walks a geth
``callTracer`` JSON tree recursively, emitting one row per call frame with
the accumulated ``trace_address`` path and per-type field routing
(call/create/suicide/reward, trace_mapper.py:30-80); genesis/daofork
synthetic traces at :97-125.

Spark-first shape: the tree walk is per-row local compute with no cross-row
dependency, so it runs as an Arrow-batched ``mapInPandas`` kernel (the
sanctioned escape hatch for operators Spark's relational algebra lacks) —
one pass, no shuffle, output size = total frames. Everything downstream
(status derivation, per-type projections) is declarative column work.
"""

from __future__ import annotations

import json
from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRACE_SCHEMA = (
    "block_number BIGINT, transaction_hash STRING, trace_address STRING, "
    "depth INT, subtraces INT, trace_type STRING, from_address STRING, "
    "to_address STRING, value_hex STRING, gas_hex STRING, error STRING, "
    "input STRING, output STRING, gas_used_hex STRING"
)


_FRAME_COLS = [
    "block_number", "transaction_hash", "trace_address", "depth",
    "subtraces", "trace_type", "from_address", "to_address",
    "value_hex", "gas_hex", "error", "input", "output", "gas_used_hex",
]


def _walk_iter(root: dict, cols: list[list], block_number, tx_hash) -> None:
    """DFS-preorder flatten with an explicit stack (no recursion — immune to
    pathological call-tree depth, and appends straight into column lists
    instead of per-row dicts)."""
    stack = [(root, "", 0)]
    while stack:
        node, path, depth = stack.pop()
        calls = node.get("calls") or []
        cols[0].append(block_number)
        cols[1].append(tx_hash)
        cols[2].append(path)
        cols[3].append(depth)
        cols[4].append(len(calls))
        cols[5].append((node.get("type") or "call").lower())
        cols[6].append((node.get("from") or "").lower() or None)
        cols[7].append((node.get("to") or "").lower() or None)
        cols[8].append(node.get("value"))
        cols[9].append(node.get("gas"))
        cols[10].append(node.get("error"))
        cols[11].append(node.get("input"))
        cols[12].append(node.get("output"))
        cols[13].append(node.get("gasUsed"))
        for i in range(len(calls) - 1, -1, -1):  # reversed → preorder pop
            stack.append(
                (calls[i], f"{path},{i}" if path else str(i), depth + 1)
            )


def flatten_geth_traces(
    traces: DataFrame,
    trace_col: str = "trace_json",
    block_col: str = "block_number",
    tx_col: str = "transaction_hash",
) -> DataFrame:
    """(block_number, transaction_hash, trace_json) -> one row per call frame
    with the accumulated trace_address path (trace_mapper.py:127-170)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: list[list] = [[] for _ in _FRAME_COLS]
            for bn, tx, tj in zip(pdf[block_col], pdf[tx_col], pdf[trace_col]):
                if tj is None:
                    continue
                try:
                    root = json.loads(tj)
                except (TypeError, ValueError):
                    continue
                _walk_iter(root, cols, bn, tx)
            yield pd.DataFrame(dict(zip(_FRAME_COLS, cols)), columns=_FRAME_COLS)

    return traces.select(block_col, tx_col, trace_col).mapInPandas(
        kernel, TRACE_SCHEMA
    )


_FRAME_DDL = (
    "type STRING, `from` STRING, `to` STRING, value STRING, gas STRING, "
    "error STRING, input STRING, output STRING, gasUsed STRING, "
    "calls ARRAY<STRING>, _corrupt STRING"
)

_SCALAR_FIELDS = (
    "`type`: STRING, `from`: STRING, `to`: STRING, `value`: STRING, "
    "`gas`: STRING, `error`: STRING, `input`: STRING, `output`: STRING, "
    "`gasUsed`: STRING"
)


def _frame_rows(parsed: DataFrame, p) -> DataFrame:
    """One output row per frame from a frontier whose ``p`` column is the
    parsed node (struct) — shared by every flatten variant so their field
    semantics cannot drift (lowercasing, '' -> 'call' default, null from/to)."""
    t = F.coalesce(p["type"], F.lit(""))
    return parsed.select(
        "block_number",
        "transaction_hash",
        F.col("_path").alias("trace_address"),
        F.col("_depth").cast("int").alias("depth"),
        F.coalesce(F.size(p["calls"]), F.lit(0)).cast("int").alias("subtraces"),
        F.when(F.length(t) > 0, F.lower(t)).otherwise(F.lit("call")).alias("trace_type"),
        F.nullif(F.lower(F.coalesce(p["from"], F.lit(""))), F.lit("")).alias("from_address"),
        F.nullif(F.lower(F.coalesce(p["to"], F.lit(""))), F.lit("")).alias("to_address"),
        p["value"].alias("value_hex"),
        p["gas"].alias("gas_hex"),
        p["error"].alias("error"),
        p["input"].alias("input"),
        p["output"].alias("output"),
        p["gasUsed"].alias("gas_used_hex"),
    )


def _child_frontier(parsed: DataFrame, calls) -> DataFrame:
    """Explode a frontier's ``calls`` into the next frontier, extending the
    trace_address path with each child's position."""
    return (
        parsed.filter(F.size(calls) > 0)
        .select(
            "block_number",
            "transaction_hash",
            "_path",
            "_depth",
            F.posexplode(calls).alias("_pos", "_node"),
        )
        .select(
            "block_number",
            "transaction_hash",
            "_node",
            F.when(
                F.length("_path") > 0,
                F.concat(F.col("_path"), F.lit(","), F.col("_pos")),
            )
            .otherwise(F.col("_pos").cast("string"))
            .alias("_path"),
            (F.col("_depth") + 1).alias("_depth"),
        )
    )


def _string_level_loop(frontier: DataFrame, max_levels: int, levels: list):
    """Level-by-level walk of a STRING-node frontier (columns block_number,
    transaction_hash, _node json-text, _path, _depth): parse one level,
    emit its rows, explode its children as raw JSON strings. Appends each
    persisted level to ``levels`` (caller unpersists); returns the union of
    row DataFrames or None."""
    p = F.col("_p")
    out = None
    for _ in range(max_levels):
        # PERMISSIVE from_json yields an all-null struct (not NULL) for
        # malformed text; the corrupt-record column makes the skip
        # explicit, matching the kernel's json.loads try/except
        parsed = frontier.withColumn(
            "_p",
            F.from_json("_node", _FRAME_DDL, {"columnNameOfCorruptRecord": "_corrupt"}),
        ).filter(F.col("_p").isNotNull() & F.col("_p")["_corrupt"].isNull())
        parsed = parsed.persist()
        levels.append(parsed)
        if parsed.isEmpty():
            break
        rows = _frame_rows(parsed, p)
        out = rows if out is None else out.unionByName(rows)
        frontier = _child_frontier(parsed, p["calls"])
    return out


def flatten_geth_traces_relational(
    traces: DataFrame,
    trace_col: str = "trace_json",
    block_col: str = "block_number",
    tx_col: str = "transaction_hash",
    max_depth: int = 1024,
    materialize: bool = True,
) -> DataFrame:
    """Pure-JVM trace flatten: iterative level-by-level explode of the
    ``calls`` array — no Python in the pipeline.

    ``from_json`` with ``calls ARRAY<STRING>`` yields each child subtree as
    its raw JSON text, so one parse per level extracts that level's scalar
    frame fields AND the next frontier; posexplode numbers the children for
    the trace_address path. Each level is persisted and drained exactly once
    (the emptiness probe is also the materialization action); levels shrink
    geometrically, so the loop runs depth-of-deepest-tree jobs (EVM call
    depth caps at 1024). With ``materialize`` (default) the union of levels
    is written out and the level caches released before returning.

    Cost note: from_json re-parses each subtree once per ancestor level, so
    worst-case parse cost is O(size * depth). Prefer
    :func:`flatten_geth_traces_structured`, which parses ONCE against a
    fixed-depth nested struct schema and only falls back to this loop for
    the rare deeper-than-schema rows — this variant remains as the
    unbounded-depth fallback and as an independent cross-check.
    """
    frontier = traces.select(
        F.col(block_col).alias("block_number"),
        F.col(tx_col).alias("transaction_hash"),
        F.col(trace_col).alias("_node"),
        F.lit("").alias("_path"),
        F.lit(0).alias("_depth"),
    )
    levels: list[DataFrame] = []
    try:
        out = _string_level_loop(frontier, max_depth + 1, levels)
        if out is None:
            return traces.sparkSession.createDataFrame([], TRACE_SCHEMA)
        if not materialize:
            return out
        from ethereum_etl_spark import scratch

        return scratch.materialize(out, "trace_flat_")
    finally:
        if materialize:
            for lv in levels:
                lv.unpersist()


def _nested_node_ddl(levels: int) -> str:
    """DDL for a call-tree struct ``levels`` deep; the deepest level's
    ``calls`` is ``ARRAY<STRING>`` (raw JSON text), which is both the
    spill-over detector and the fallback handoff for deeper trees."""
    node = f"STRUCT<{_SCALAR_FIELDS}, `calls`: ARRAY<STRING>>"
    for _ in range(levels - 1):
        node = f"STRUCT<{_SCALAR_FIELDS}, `calls`: ARRAY<{node}>>"
    return node


def _frame_struct(node, path, depth: int, spill) -> "F.Column":
    """One output frame as a struct — RAW field values (normalization to
    lower/'' -> 'call' etc. happens once, post-explode, in
    ``_post_explode_select``); every branch must produce the exact same
    field order/types for array concat."""
    return F.struct(
        path.alias("_path"),
        F.lit(depth).cast("int").alias("_depth"),
        (F.coalesce(F.size(node["calls"]), F.lit(0)).cast("int") if node is not None
         else F.lit(None).cast("int")).alias("_subtraces"),
        *[
            (node[f] if node is not None else F.lit(None).cast("string")).alias(f"_{f}")
            for f in ("type", "from", "to", "value", "gas", "error",
                      "input", "output", "gasUsed")
        ],
        (spill if spill is not None else F.lit(None).cast("string")).alias("_spill"),
    )


def _frames_array(node, path, depth: int, struct_depth: int):
    """array<frame-struct> for ``node`` and its whole subtree, built as one
    nested transform/flatten expression — the recursion is unrolled at plan
    build time (the schema depth is fixed), so the runtime is a single
    expression-tree walk over already-parsed structs.

    Paths are built comma-PREFIXED (root '', child ',0', grandchild ',0,1')
    so each level references the parent path expression exactly ONCE — a
    'prefix only when non-empty' conditional would reference it 3×/level,
    an O(3^depth) expression blow-up (measured: 155 s to build depth 16).
    The single leading comma is stripped once, post-explode."""
    self_frame = F.array(_frame_struct(node, path, depth, None))

    def child_path(i):
        return F.concat(path, F.lit(","), i.cast("string"))

    if depth == struct_depth - 1:
        # deepest schema level: calls elements are raw JSON STRING — emit
        # them as spill markers for the string-loop handoff
        kids = F.transform(
            node["calls"],
            lambda c, i: _frame_struct(None, child_path(i), depth + 1, c),
        )
    else:
        kids = F.flatten(
            F.transform(
                node["calls"],
                lambda c, i: _frames_array(c, child_path(i), depth + 1, struct_depth),
            )
        )
    return F.concat(self_frame, F.coalesce(kids, F.array()))


@lru_cache(maxsize=8)
def _cached_frames_array(struct_depth: int):
    """The frames expression depends only on ``struct_depth`` and Columns
    are immutable unresolved expressions — building it once per depth saves
    ~1 s of expression construction on every invocation."""
    return _frames_array(F.col("_node"), F.lit(""), 0, struct_depth)


def _sampled_depth_bound(
    traces: DataFrame, trace_col: str, cap: int, sample_rows: int = 100_000
) -> int:
    """Safe struct-schema depth from the data: along any root-to-leaf path
    of depth d there are d-1 nested ``"calls"`` arrays, so
    ``regexp_count(json, '"calls"') + 1`` is an upper bound on that tree's
    depth (it counts ALL branches, so it only ever overshoots — and
    overshoot is clamped at ``cap``, today's fixed default). Estimated on a
    LIMIT sample (an early-stopping scan, trivial even at 100 TB); rows
    outside the sample that are deeper than the bound are NOT wrong — they
    take the string-loop spill path, which is row-identical. The payoff is
    plan cost: the generated from_json + transform/flatten expression grows
    with schema depth, and codegen of the depth-16 schema costs ~7-14 s of
    driver CPU where a depth-4 corpus needs ~1 s."""
    hit = (
        traces.select(
            F.regexp_count(F.col(trace_col), F.lit('"calls"')).alias("_c")
        )
        .limit(sample_rows)
        .agg(F.max("_c"))
        .first()[0]
    )
    if hit is None:
        return 2
    return max(2, min(cap, int(hit) + 1))


def flatten_geth_traces_structured(
    traces: DataFrame,
    trace_col: str = "trace_json",
    block_col: str = "block_number",
    tx_col: str = "transaction_hash",
    struct_depth: int | str = "auto",
    max_depth: int = 1024,
    materialize: bool = True,
) -> DataFrame:
    """Single-parse, single-pass, pure-JVM trace flatten — the scale
    default.

    ONE ``from_json`` against a struct schema nested ``struct_depth`` deep
    parses the whole call tree; ONE generated nested
    ``transform``/``flatten`` expression then emits every frame (with its
    accumulated trace_address path) as an array, exploded once. No Python
    workers (vs the mapInPandas kernel), no per-level re-parse (vs the
    relational loop's O(size × depth)), no persisted frontiers, no
    level-by-level job barrier — one scan, one narrow pipeline, full
    whole-stage codegen.

    Trees deeper than ``struct_depth`` (EVM call depth caps at 1024, real
    trees ≤ ~16): the deepest schema level types ``calls`` as
    ``ARRAY<STRING>``, and those raw-JSON subtrees are emitted as spill
    rows alongside the normal frames, then (only if any exist — one cheap
    pushed-filter probe against the materialized output) continued through
    the level-by-level string loop. Identical output to the kernel on any
    input.

    ``struct_depth="auto"`` (default) sizes the schema from a sampled
    ``"calls"``-count upper bound (see ``_sampled_depth_bound``): shallow
    corpora get a shallow schema — 7-14x cheaper plan codegen — while
    deeper-than-sampled rows still land on the spill loop, output
    unchanged. Two caveats callers should know: (1) "auto" runs an EAGER
    sampling job inside this otherwise-lazy builder (an early-stopping
    LIMIT scan — cheap, but a job); (2) the LIMIT sample has no defined
    row order, so two runs over the same data may pick different depths —
    output is row-identical either way (the spill loop covers any
    shortfall), but plan shape, codegen cost, and how much lands on the
    spill path can vary run to run. Callers that know their data (or need
    a deterministic plan) should pin an int — 16 = the old fixed default —
    which also keeps this builder fully lazy; a caller invoking the
    flatten repeatedly over one corpus should derive the bound once via
    ``_sampled_depth_bound`` and pass it pinned.
    """
    if struct_depth == "auto":
        struct_depth = _sampled_depth_bound(traces, trace_col, cap=16)
    if not isinstance(struct_depth, int) or struct_depth < 1:
        raise ValueError("struct_depth must be >= 1 or 'auto'")
    root_ddl = (
        f"{_SCALAR_FIELDS.replace(':', '')}, "
        + (
            f"`calls` ARRAY<{_nested_node_ddl(struct_depth - 1)}>, "
            if struct_depth > 1
            else "`calls` ARRAY<STRING>, "
        )
        + "`_corrupt` STRING"
    )
    node = F.col("_node")
    parsed = traces.select(
        F.col(block_col).alias("block_number"),
        F.col(tx_col).alias("transaction_hash"),
        F.from_json(
            trace_col, root_ddl, {"columnNameOfCorruptRecord": "_corrupt"}
        ).alias("_node"),
    ).filter(node.isNotNull() & node["_corrupt"].isNull())
    exploded = parsed.select(
        "block_number",
        "transaction_hash",
        F.explode(_cached_frames_array(struct_depth)).alias("_f"),
    )
    f = F.col("_f")
    flat = exploded.select(
        "block_number",
        "transaction_hash",
        f["_path"].alias("_path"),
        f["_depth"].alias("_depth"),
        f["_subtraces"].alias("_subtraces"),
        *[f[f"_{c}"].alias(f"_{c}") for c in ("type", "from", "to", "value", "gas",
                                              "error", "input", "output", "gasUsed")],
        f["_spill"].alias("_spill"),
    )
    from ethereum_etl_spark import scratch

    # materialize once: the normal rows AND the spill probe read the same
    # computation (and the spill filter is a pushed parquet predicate)
    store = scratch.materialize(flat, "trace_flat_")
    t = F.coalesce(F.col("_type"), F.lit(""))
    # paths were built comma-prefixed (see _frames_array); strip once here
    rows = store.filter(F.col("_spill").isNull()).select(
        "block_number",
        "transaction_hash",
        F.expr("substring(_path, 2)").alias("trace_address"),
        F.col("_depth").cast("int").alias("depth"),
        F.col("_subtraces").cast("int").alias("subtraces"),
        F.when(F.length(t) > 0, F.lower(t)).otherwise(F.lit("call")).alias("trace_type"),
        F.nullif(F.lower(F.coalesce(F.col("_from"), F.lit(""))), F.lit("")).alias("from_address"),
        F.nullif(F.lower(F.coalesce(F.col("_to"), F.lit(""))), F.lit("")).alias("to_address"),
        F.col("_value").alias("value_hex"),
        F.col("_gas").alias("gas_hex"),
        F.col("_error").alias("error"),
        F.col("_input").alias("input"),
        F.col("_output").alias("output"),
        F.col("_gasUsed").alias("gas_used_hex"),
    )
    spill_frontier = store.filter(F.col("_spill").isNotNull()).select(
        "block_number",
        "transaction_hash",
        F.col("_spill").alias("_node"),
        F.expr("substring(_path, 2)").alias("_path"),
        F.col("_depth").cast("int").alias("_depth"),
    )
    if spill_frontier.isEmpty():
        return rows
    levels: list[DataFrame] = []
    try:
        spill = _string_level_loop(spill_frontier, max_depth + 1 - struct_depth, levels)
        if spill is None:
            return rows
        out = rows.unionByName(spill)
        if not materialize:
            return out
        return scratch.materialize(out, "trace_flat_")
    finally:
        for lv in levels:
            lv.unpersist()


def route_trace_fields(flat: DataFrame) -> DataFrame:
    """Per-type field routing (trace_mapper.py:30-80): call keeps from/to,
    create maps `to` to the created contract, suicide maps from->self,
    to->refund address. Declarative, post-flatten."""
    t = F.col("trace_type")
    return flat.select(
        "block_number",
        "transaction_hash",
        "trace_address",
        "depth",
        "subtraces",
        "trace_type",
        F.when(t.isin("call", "create", "suicide"), F.col("from_address")).alias("from_address"),
        F.when(t == "suicide", F.col("to_address"))
        .when(t.isin("call", "create"), F.col("to_address"))
        .alias("to_address"),
        "value_hex",
        "error",
        (F.col("error").isNull()).alias("status_ok"),
    )


def genesis_traces(spark: SparkSession, allocs: list[tuple[str, str]]) -> DataFrame:
    """Synthetic genesis reward rows (trace_mapper.py:97-111): one reward
    trace per genesis allocation (address, value_hex) at block 0."""
    rows = [
        (0, None, "", 0, 0, "genesis", None, addr.lower(), value_hex, None,
         None, None, None, None)
        for addr, value_hex in allocs
    ]
    return spark.createDataFrame(rows, TRACE_SCHEMA)
