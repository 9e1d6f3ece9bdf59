"""Reference-parity operators re-expressed over the TESTDATA tables.

Maps SURVEY.md §2's inventory onto Spark built-ins:
  P11 (MP1 grep: reference core_process/core_process.go:91-124)  → rlike filters
  A3  (per-machine count gather: core_process.go:259-349)        → groupBy(source).count()
  P2-P9 (filter→project binaries: operators/*.go, misc/*.go)     → filter().select()
  P1+A1 (split_operator + count_operator wordcount:
         misc/split_operator.go:22-33, operators/count_operator.go:17-112)
                                                                 → explode(split()).groupBy().count()
  A4  (stateless distinct collect: core_process_stream_DS.go:1186-1206) → distinct()

Scale notes: every query here is a single scan → (optional) hash-shuffle on the
group key → partial+final agg. Filters and projections reach the parquet scan
(PushedFilters / ReadSchema); regex filters are evaluated inside whole-stage
codegen. No driver-side state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.text import tokens
from streamds_spark.registry import query

# A regex that actually matches a useful fraction of the synthetic docs.
GREP_PATTERN = "scan (join|merge)"


@query(
    "flagship_filter_group_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS cnt
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def flagship_filter_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference flagship demo: filter → keyed COUNT (P4+A1, the
    'signs per category WHERE sign_post = Punched Telespar' shape;
    reference operators/app2_1.go + operators/count_operator.go)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "grep_count",
    oracle=f"""
    SELECT count(*) AS match_count
    FROM documents WHERE regexp_matches(text, '{GREP_PATTERN}')
    """,
)
def grep_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP1 `grep -c pattern`: total matching lines (reference core_process.go:91-124;
    gather/sum core_process.go:259-349)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").rlike(GREP_PATTERN)).agg(F.count("*").alias("match_count"))


@query(
    "grep_per_source",
    oracle=f"""
    SELECT source, count(*) AS cnt
    FROM documents WHERE regexp_matches(text, '{GREP_PATTERN}')
    GROUP BY source
    """,
)
def grep_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP1 per-machine match counts (the `vm(i).txt` accumulator,
    core_process.go:259-349): group matches by originating source."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike(GREP_PATTERN))
        .groupBy("source")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "grep_lines",
    oracle=f"""
    SELECT doc_id, source
    FROM documents WHERE regexp_matches(text, '{GREP_PATTERN}')
    """,
)
def grep_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP1 full-line grep (no -c): ship matching line ids."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").rlike(GREP_PATTERN)).select("doc_id", "source")


@query(
    "grep_invert_case",
    oracle="""
    SELECT count(*) AS match_count
    FROM documents
    WHERE NOT regexp_matches(text, '(?i)VECTOR')
    """,
)
def grep_invert_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP1 `grep -v -i`: inverted, case-insensitive match (flag translation per
    reference README grep grammar)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(~F.col("text").rlike("(?i)VECTOR")).agg(F.count("*").alias("match_count"))


@query(
    "filter_project",
    oracle="""
    SELECT event_id, user_id
    FROM events WHERE event_type = 'click'
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P8-shape stage-1 operator: equality filter → 2-column projection
    (reference operators/app1_1.go, misc/lichess_op_1.go)."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "click").select("event_id", "user_id")


@query(
    "filter_numeric_project",
    oracle="""
    SELECT event_id, round(value, 4) AS value_r
    FROM events WHERE value <= 0.5
    """,
)
def filter_numeric_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7-shape: numeric-cast predicate (RATE <= 0.5 → ZONEID;
    reference misc/rate_filter_operator.go:31-40)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("value") <= 0.5)
        .select("event_id", F.round("value", 4).alias("value_r"))
    )


@query(
    "conjunctive_filter",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE value > 10 AND event_type IN ('click', 'view', 'purchase') AND user_id % 2 = 0
    """,
)
def conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10-shape conjunctive predicate (winner='white' AND turns>40 AND
    victory_status IN (...) AND opening IN (...); reference misc/lichess_operator_1.go)."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        (F.col("value") > 10)
        & F.col("event_type").isin("click", "view", "purchase")
        & (F.col("user_id") % 2 == 0)
    ).select("event_id", "user_id", "event_type")


@query(
    "wordcount",
    oracle=r"""
    SELECT word, count(*) AS cnt
    FROM (
        SELECT unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS word
        FROM documents
    )
    GROUP BY word
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical RainStorm pipeline: split_operator (P1) + count_operator (A1)
    = streaming word count (reference misc/split_operator.go + operators/count_operator.go).
    explode stays JVM-side; count is partial-agg'd map-side before the shuffle.
    spread=True (round 11): the regex tokenize + explode map stage dominates and
    a tiny documents file is one scan task — spread it across cores first."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "word_index_pairs",
    oracle=r"""
    SELECT doc_id, unnest(words) AS word,
           unnest(range(1, len(words) + 1)) AS pos
    FROM (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS words
        FROM documents
    )
    WHERE len(words) > 0
    """,
)
def word_index_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_operator's `word-index` unique-key tagging (misc/split_operator.go:24-27):
    posexplode gives (pos, word) without the reference's string concat hack."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "word"))
        .select("doc_id", "word", (F.col("pos0") + 1).alias("pos"))
    )


@query(
    "distinct_values",
    oracle="SELECT DISTINCT event_type FROM events",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 stateless stage-2 'collect into output_map' = SELECT DISTINCT
    (reference core_process_stream_DS.go:1186-1206)."""
    return load_table(spark, sf_dir, "events").select("event_type").distinct()


@query(
    "group_count_users",
    oracle="""
    SELECT user_id, count(*) AS cnt
    FROM events GROUP BY user_id
    """,
)
def group_count_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 stateful keyed count on a higher-cardinality key (hash-shuffle ST4 →
    per-key state; reference core_process_utils.go:2398-2414)."""
    return load_table(spark, sf_dir, "events").groupBy("user_id").agg(F.count("*").alias("cnt"))
