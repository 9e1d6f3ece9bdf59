"""RainStorm job-spec shim: the reference's 10-argument streaming CLI compiled
to DataFrame pipelines.

Reference surface (core_process_stream_DS.go:1652-1705; README grammar):
    RainStorm <op1> <op1_param> <op2> <op2_param> ... <src> <dest> <num_tasks>
where op1 is a stage-1 binary (flatMap/filter/project, line → JSON array) and
op2 is stage-2 (stateful keyed count, or stateless project/collect). Operators
were ONE OS PROCESS PER TUPLE (RunOperatorlocal, core_process_utils.go:1347-1400)
— the reference's own bottleneck. Here each named operator is a pure DataFrame
transform; the 3-stage chain source → op1 → hash-shuffle → op2 → sink becomes
read → transform → groupBy → write, and Catalyst owns partitioning (the
reference's SHA1-mod shuffle, ST4) and exactly-once (its ack/dedup/replay
machinery, ST2/ST3/ST7, collapses into checkpointed Structured Streaming —
see streamds_spark.streaming).

Named operators reproduce the reference binaries' semantics column-for-column
(file:line cited per op). Input is a line-oriented DataFrame with columns
(key, value) where key = "<filename>:<lineNumber>" (GetSourceKey,
core_process_utils.go:522-524).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# ---------------------------------------------------------------------------
# Schemas of the reference CSV datasets (FIXTURES.md §1-3)

TRAFFIC_COLS = [f"c{i}" for i in range(20)]  # 20-col CSV, no header
LICHESS_COLS = [
    "id", "rated", "created_at", "last_move_at", "turns", "victory_status",
    "winner", "increment_code", "white_id", "white_rating", "black_id",
    "black_rating", "moves", "opening_eco", "opening_name", "opening_ply",
]
PARKING_COLS = [
    "x", "y", "objectid", "meterloc", "hours", "rate", "days", "wrm", "zoneid",
    "zonedesc", "notes", "facilityid", "active", "blocknumber", "blockstreet",
    "enforcement_zone", "enforcement_time", "enforcement_days", "max_time",
    "no_max", "no_charge_1", "no_parking", "no_charge_2",
]


def _csv_schema(cols: list[str]) -> StructType:
    # All-string schema: the reference types transiently inside operators
    # (strconv.ParseFloat); we cast per-expression the same way.
    return StructType([StructField(c, StringType(), True) for c in cols])


def _parse(value: Column, cols: list[str]) -> Column:
    # escape='"' → RFC-4180 doubled-quote unescaping ("" → "), matching the
    # reference's encoding/csv (LazyQuotes) and Python's csv module; Spark's
    # default escape is backslash, which would leave `16"" X 42""` unparsed.
    return F.from_csv(value, _csv_schema(cols).simpleString(), {"escape": '"'})


# ---------------------------------------------------------------------------
# Stage-1 operators: DataFrame[(key, value)] -> DataFrame[(key, out)]
# Empty result per row = filtered; 1 row = map; n rows = flatMap.

Stage1Op = Callable[[DataFrame, str], DataFrame]


def op_split(df: DataFrame, _param: str) -> DataFrame:
    """P1 split_operator (misc/split_operator.go:22-33): whitespace tokenize,
    emit word per row; key extended with the token index for uniqueness."""
    toks = F.filter(F.split(F.col("value"), r"\s+"), lambda w: w != "")
    return df.select("key", F.posexplode(toks).alias("idx", "out")).select(
        F.concat_ws(":", "key", "idx").alias("key"), "out"
    )


def op_app1_1(df: DataFrame, param: str) -> DataFrame:
    """P2 app1_1 (operators/app1_1.go:14-55): WHERE line CONTAINS param →
    emit 'objectid-sign_type' (c2-c3), the reference's 2-element concat
    (GetOutputFromOperatorStage1, core_process_utils.go:557-573)."""
    p = _parse(F.col("value"), TRAFFIC_COLS)
    return (
        df.filter(F.col("value").contains(param))
        .select("key", F.concat_ws("-", p.getField("c2"), p.getField("c3")).alias("out"))
    )


def op_app1_2(df: DataFrame, _param: str) -> DataFrame:
    """P3 app1_2 (operators/app1_2.go:13-39): project c2-c3 unconditionally."""
    p = _parse(F.col("value"), TRAFFIC_COLS)
    return df.select("key", F.concat_ws("-", p.getField("c2"), p.getField("c3")).alias("out"))


def op_app2_1(df: DataFrame, param: str) -> DataFrame:
    """P4 app2_1 (operators/app2_1.go:11-48): WHERE sign_post(c6) = param →
    emit category (c8)."""
    p = _parse(F.col("value"), TRAFFIC_COLS)
    return (
        df.withColumn("_p", p)
        .filter(F.col("_p").getField("c6") == param)
        .select("key", F.col("_p").getField("c8").alias("out"))
    )


def op_rate_filter_1(df: DataFrame, _param: str) -> DataFrame:
    """P5 rate_filter_op_1 (misc/rate_filter_op_1.go:27-34): Active='No' → OBJECTID."""
    p = _parse(F.col("value"), PARKING_COLS)
    return (
        df.withColumn("_p", p)
        .filter(F.col("_p").getField("active") == "No")
        .select("key", F.col("_p").getField("objectid").alias("out"))
    )


def op_rate_filter_2(df: DataFrame, _param: str) -> DataFrame:
    """P6 rate_filter_op_2 (misc/rate_filter_op_2.go:27-33): BlockNumber='1000' → OBJECTID."""
    p = _parse(F.col("value"), PARKING_COLS)
    return (
        df.withColumn("_p", p)
        .filter(F.col("_p").getField("blocknumber") == "1000")
        .select("key", F.col("_p").getField("objectid").alias("out"))
    )


def op_rate_filter(df: DataFrame, _param: str) -> DataFrame:
    """P7 rate_filter_operator (misc/rate_filter_operator.go:31-40):
    CAST(rate) <= 0.5 → ZONEID."""
    p = _parse(F.col("value"), PARKING_COLS)
    return (
        df.withColumn("_p", p)
        .filter(F.col("_p").getField("rate").try_cast("double") <= 0.5)
        .select("key", F.col("_p").getField("zoneid").alias("out"))
    )


def op_lichess_1(df: DataFrame, _param: str) -> DataFrame:
    """P8 lichess_op_1 (misc/lichess_op_1.go:27-34): winner='white' → game id.
    (Reference splits on raw commas; moves are comma-free per FIXTURES.md.)"""
    p = _parse(F.col("value"), LICHESS_COLS)
    return (
        df.withColumn("_p", p)
        .filter(F.col("_p").getField("winner") == "white")
        .select("key", F.col("_p").getField("id").alias("out"))
    )


def op_lichess_2(df: DataFrame, _param: str) -> DataFrame:
    """P9 lichess_op_2 (misc/lichess_op_2.go:27-33): victory_status='mate' → id."""
    p = _parse(F.col("value"), LICHESS_COLS)
    return (
        df.withColumn("_p", p)
        .filter(F.col("_p").getField("victory_status") == "mate")
        .select("key", F.col("_p").getField("id").alias("out"))
    )


_LICHESS_OPENINGS = (
    "Scandinavian Defense", "Sicilian Defense", "Indian Game",
    "Caro-Kann Defense", "Italian Game",
)


def op_lichess_complex(df: DataFrame, _param: str) -> DataFrame:
    """P10 lichess_operator_1 (misc/lichess_operator_1.go:28-46): winner='white'
    AND turns>40 AND victory_status IN (mate,resign,outoftime) AND opening_name
    IN (5 openings) → first two words of opening joined by '_'."""
    p = _parse(F.col("value"), LICHESS_COLS)
    opening = F.col("_p").getField("opening_name")
    condensed = F.concat_ws(
        "_", F.split(opening, " ").getItem(0), F.split(opening, " ").getItem(1)
    )
    return (
        df.withColumn("_p", p)
        .filter(
            (F.col("_p").getField("winner") == "white")
            & (F.col("_p").getField("turns").try_cast("int") > 40)
            & F.col("_p").getField("victory_status").isin("mate", "resign", "outoftime")
            & opening.isin(*_LICHESS_OPENINGS)
        )
        .select("key", condensed.alias("out"))
    )


def op_grep_filter(df: DataFrame, param: str) -> DataFrame:
    """P11-as-stage-1: regex filter emitting the whole line."""
    return df.filter(F.col("value").rlike(param)).select("key", F.col("value").alias("out"))


STAGE1_OPS: dict[str, Stage1Op] = {
    "split_operator": op_split,
    "app1_1": op_app1_1,
    "app1_2": op_app1_2,
    "app2_1": op_app2_1,
    "rate_filter_op_1": op_rate_filter_1,
    "rate_filter_op_2": op_rate_filter_2,
    "rate_filter_operator": op_rate_filter,
    "lichess_op_1": op_lichess_1,
    "lichess_op_2": op_lichess_2,
    "lichess_operator_1": op_lichess_complex,
    "grep_filter": op_grep_filter,
}

# ---------------------------------------------------------------------------
# Stage-2 operators over the stage-1 output DataFrame[(key, out)]

Stage2Op = Callable[[DataFrame, str], DataFrame]


def op_count(df: DataFrame, _param: str) -> DataFrame:
    """A1 count_operator (operators/count_operator.go:17-112): stateful keyed
    COUNT. The reference's per-task state file + full-map re-emit becomes
    groupBy().count() — in streaming, update-mode managed state."""
    return df.groupBy(F.col("out").alias("word")).agg(F.count("*").alias("count"))


def op_collect_distinct(df: DataFrame, _param: str) -> DataFrame:
    """A4 stateless stage-2 (core_process_stream_DS.go:1186-1206): dedup emitted
    values into the output map (SELECT DISTINCT materialization)."""
    return df.select(F.col("out").alias("value")).distinct()


def op_identity(df: DataFrame, _param: str) -> DataFrame:
    """Stateless pass-through stage 2 (project partner ops, e.g. app1_2 runs
    here in the reference demos): keep (key, value) pairs as emitted."""
    return df.select("key", F.col("out").alias("value"))


STAGE2_OPS: dict[str, Stage2Op] = {
    "count_operator": op_count,
    "collect_distinct": op_collect_distinct,
    "identity": op_identity,
}


# ---------------------------------------------------------------------------
# Job compiler

@dataclass
class RainStormJob:
    op1: str
    op1_param: str
    op2: str
    op2_param: str
    src: str
    dest: str | None = None
    num_tasks: int = 3


def read_source(spark: SparkSession, src: str) -> DataFrame:
    """Source stage: text file → (key, value) with key = filename:lineNumber
    (GetSourceKey parity, core_process_utils.go:522-524). Line numbers are
    per-file 1-based and exact.

    Scale posture (split-local numbering, NOT a per-file window): a
    partitionBy(file) window would funnel every line of a file through one
    task — a single 100 GB file becomes a straggler. Instead:
      1. number rows within each FILE SPLIT (`_metadata.file_block_start`
         identifies the split; splits are ≤ maxPartitionBytes, so the window
         partition is bounded by split size, parallelism = #splits);
      2. aggregate per-split line counts (tiny: one row per split, map-side
         combined) and compute each split's cumulative line offset within its
         file with a window over that driver-sized table;
      3. broadcast-join the offsets back: line_no = split_offset + row_in_split.
    Costs one extra scan for the counts; no data-sized per-file shuffle exists
    anywhere in the plan (pinned by tests/test_plans.py).
    """
    from pyspark.sql import Window

    base = spark.read.text(src).select(
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("file"),
        F.col("_metadata.file_block_start").alias("blk"),
        F.monotonically_increasing_id().alias("mid"),
        F.col("value"),
    )
    # Rows of a split arrive in read order; mid is ascending within a read
    # partition, so ordering by it reproduces line order inside the split.
    w_split = Window.partitionBy("file", "blk").orderBy("mid")
    numbered = base.withColumn("rn", F.row_number().over(w_split))

    counts = base.groupBy("file", "blk").agg(F.count("*").alias("n"))
    w_file = Window.partitionBy("file").orderBy("blk")
    offsets = counts.select(
        "file",
        "blk",
        F.coalesce(
            F.sum("n").over(w_file.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("base_off"),
    )

    return (
        numbered.join(F.broadcast(offsets), ["file", "blk"])
        .select(
            F.concat_ws(":", "file", (F.col("base_off") + F.col("rn")).cast("long")).alias("key"),
            "value",
        )
    )


def compile_rainstorm(spark: SparkSession, job: RainStormJob, source: DataFrame | None = None) -> DataFrame:
    """Compile a RainStorm job spec to its result DataFrame (batch semantics =
    the reference run's final quantify output)."""
    if job.op1 not in STAGE1_OPS:
        raise KeyError(f"unknown stage-1 operator {job.op1!r}; known: {sorted(STAGE1_OPS)}")
    if job.op2 not in STAGE2_OPS:
        raise KeyError(f"unknown stage-2 operator {job.op2!r}; known: {sorted(STAGE2_OPS)}")
    src_df = source if source is not None else read_source(spark, job.src)
    stage1 = STAGE1_OPS[job.op1](src_df, job.op1_param)
    return STAGE2_OPS[job.op2](stage1, job.op2_param)


def run_rainstorm(
    spark: SparkSession,
    op1: str,
    op1_param: str,
    op2: str,
    op2_param: str,
    src: str,
    dest: str | None = None,
    num_tasks: int = 3,
) -> DataFrame:
    """The reference CLI, one call: returns the result and (optionally) writes
    the dest table (parquet replaces the HyDFS append-buffer format; S6/S8 —
    the quantify/merge dance collapses into a plain table read)."""
    job = RainStormJob(op1, op1_param, op2, op2_param, src, dest, num_tasks)
    result = compile_rainstorm(spark, job)
    if dest:
        result.coalesce(max(1, num_tasks)).write.mode("overwrite").parquet(dest)
    return result
