"""Data-integrity and reshaping operators: table checksums (migration
validation), text scrubbing (PII-style normalization), unpivot."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.hashing import duckdb_md5_int, md5_int60
from streamds_spark.registry import query


@query(
    "table_checksum",
    oracle=f"""
    SELECT count(*) AS n_rows,
           bit_xor({duckdb_md5_int(
               "concat_ws('|', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR), "
               "l_returnflag, l_linestatus, CAST(l_quantity AS VARCHAR))"
           )}) AS checksum
    FROM lineitem
    """,
)
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table content checksum: XOR-aggregate of per-row md5 hashes —
    order-insensitive, overflow-free, mergeable (partial XORs combine), and
    identical across engines. THE cheap migration/replication validation
    primitive: two copies of a 100 TB table compare with one scan each and an
    8-byte exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    row_repr = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.col("l_quantity").cast("string"),
    )
    return li.agg(
        F.count("*").alias("n_rows"),
        F.bit_xor(md5_int60(row_repr)).alias("checksum"),
    )


@query(
    "text_scrub_numbers",
    oracle=r"""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_numbers
    FROM events
    WHERE regexp_matches(props, '[0-9]')
    """,
)
def text_scrub_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing: normalize digit runs to a placeholder and count
    them — the regexp_replace scrubbing pass over the events payload (swap the
    pattern for emails/phones/SSNs in production; map-only, no shuffle)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("props").rlike("[0-9]"))
        .select(
            "event_id",
            F.regexp_replace("props", "[0-9]+", "<NUM>").alias("scrubbed"),
            F.size(F.regexp_extract_all("props", F.lit("[0-9]+"), 0)).alias("n_numbers"),
        )
    )


@query(
    "unpivot_order_stats",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               round(sum(o_totalprice), 4) AS total_price,
               round(avg(o_totalprice), 4) AS avg_price,
               round(max(o_totalprice), 4) AS max_price
        FROM orders GROUP BY o_orderpriority
    )
    SELECT * FROM wide UNPIVOT (val FOR metric IN (total_price, avg_price, max_price))
    """,
)
def unpivot_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): per-priority metrics melted to (metric, val)
    rows — the inverse of pivot_events."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["total_price", "avg_price", "max_price"],
        variableColumnName="metric",
        valueColumnName="val",
    )
