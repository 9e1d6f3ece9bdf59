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


@query(
    "dq_expectations",
    oracle="""
    SELECT 'fk_orders_custkey' AS check_name,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
               AS n_violations
    UNION ALL
    SELECT 'fk_lineitem_orderkey',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'pk_customer_unique',
           (SELECT CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) FROM customer)
    UNION ALL
    SELECT 'nonpositive_quantity',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'empty_document_text',
           (SELECT CAST(count(*) AS BIGINT) FROM documents
            WHERE text IS NULL OR length(text) = 0)
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the great-expectations/dbt-test
    primitive): referential integrity via anti-joins, key uniqueness, domain
    and non-null checks — one violations row per expectation, ready to gate a
    pipeline on `max(n_violations) == 0`.

    Plan: each FK check is a LeftAnti join (broadcast when the dim fits);
    scalar checks are partial-aggregated scans; the union is a handful of
    1-row aggregates — nothing here exceeds one shuffle per check at any
    scale."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    documents = load_table(spark, sf_dir, "documents")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.coalesce(F.first("n"), F.lit(0)).cast("bigint").alias("n_violations"),
        )

    fk_orders = check(
        "fk_orders_custkey",
        orders.join(
            customer, orders.o_custkey == customer.c_custkey, "left_anti"
        ).agg(F.count("*").alias("n")),
    )
    fk_lineitem = check(
        "fk_lineitem_orderkey",
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
        ).agg(F.count("*").alias("n")),
    )
    pk_unique = check(
        "pk_customer_unique",
        customer.agg(
            (F.count("*") - F.count_distinct(F.col("c_custkey"))).alias("n")
        ),
    )
    nonpos = check(
        "nonpositive_quantity",
        lineitem.agg(F.sum((F.col("l_quantity") <= 0).cast("long")).alias("n")),
    )
    empty_doc = check(
        "empty_document_text",
        documents.agg(
            F.sum(
                (F.col("text").isNull() | (F.length("text") == 0)).cast("long")
            ).alias("n")
        ),
    )
    return (
        fk_orders.unionByName(fk_lineitem)
        .unionByName(pk_unique)
        .unionByName(nonpos)
        .unionByName(empty_doc)
    )


@query(
    "constraint_suite_orders",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders),
    rep AS (
        SELECT 'not_null' AS check_name, 'o_orderkey' AS target, n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM orders
                WHERE o_orderkey IS NULL) AS violations FROM n
        UNION ALL
        SELECT 'not_null', 'o_custkey', n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM orders
                WHERE o_custkey IS NULL) FROM n
        UNION ALL
        SELECT 'unique', 'o_orderkey', n_rows,
               (SELECT CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
                       AS BIGINT) FROM orders) FROM n
        UNION ALL
        SELECT 'in_set', 'o_orderstatus', n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM orders
                WHERE (o_orderstatus IN ('O','F','P')) IS NOT TRUE) FROM n
        UNION ALL
        SELECT 'positive_total', 'o_totalprice', n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM orders
                WHERE (o_totalprice > 0) IS NOT TRUE) FROM n
        UNION ALL
        SELECT 'matches', 'o_orderpriority', n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM orders
                WHERE regexp_matches(o_orderpriority, '^[1-5]-') IS NOT TRUE)
               FROM n
        UNION ALL
        SELECT 'foreign_key', 'o_custkey->c_custkey', n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
                      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
               FROM n
    )
    SELECT check_name, target, n_rows, violations, violations = 0 AS passed
    FROM rep
    """,
)
def constraint_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite on `orders`, compiled single-pass
    (operators/constraints.py): six row-local/uniqueness checks share ONE
    aggregation over the table — one scan regardless of suite size, the
    Deequ unified-metrics discipline — plus one referential check as a
    left-anti join against `customer` (dimension-sized, AQE-broadcast).
    Contrast dq_expectations above, which prices each check as its own
    aggregate: at 100 TB the compiled suite is the difference between one
    corpus scan per INGEST BATCH and one per CHECK. Report is pure
    integer/string/boolean — hash-exact against the SQL replay."""
    from streamds_spark.operators import constraints as C

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return C.constraint_report(
        orders,
        checks=[
            C.not_null("o_orderkey"),
            C.not_null("o_custkey"),
            C.unique("o_orderkey"),
            C.in_set("o_orderstatus", ["O", "F", "P"]),
            C.satisfies("positive_total", "o_totalprice", F.col("o_totalprice") > 0),
            C.matches("o_orderpriority", "^[1-5]-"),
        ],
        fks=[C.ForeignKey("o_custkey", customer, "c_custkey")],
    )


@query(
    "constraint_suite_documents",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM documents),
    rep AS (
        SELECT 'not_null' AS check_name, 'doc_id' AS target, n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM documents
                WHERE doc_id IS NULL) AS violations FROM n
        UNION ALL
        SELECT 'unique', 'doc_id', n_rows,
               (SELECT CAST(count(doc_id) - count(DISTINCT doc_id) AS BIGINT)
                FROM documents) FROM n
        UNION ALL
        SELECT 'in_set', 'lang', n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM documents
                WHERE (lang IN ('en','de','fr','es','zh')) IS NOT TRUE) FROM n
        UNION ALL
        SELECT 'chars_match_text', 'n_chars', n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM documents
                WHERE (n_chars = length(text)) IS NOT TRUE) FROM n
        UNION ALL
        SELECT 'non_negative', 'n_chars', n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM documents
                WHERE (n_chars >= 0) IS NOT TRUE) FROM n
        UNION ALL
        SELECT 'matches', 'source', n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM documents
                WHERE regexp_matches(source, '^src[0-9]+$') IS NOT TRUE) FROM n
    )
    SELECT check_name, target, n_rows, violations, violations = 0 AS passed
    FROM rep
    """,
)
def constraint_suite_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-ingest quality gate as a compiled suite: key integrity,
    language domain, the cross-column invariant n_chars == length(text)
    (satisfies() takes any Column predicate — row-local checks can span
    columns), and a source-id shape regex. All six checks are one scan of
    `documents` with map-side partial aggregation; the gate's cost at
    100 TB is the scan the ingest batch already pays, not 6×."""
    from streamds_spark.operators import constraints as C

    docs = load_table(spark, sf_dir, "documents")
    return C.constraint_report(
        docs,
        checks=[
            C.not_null("doc_id"),
            C.unique("doc_id"),
            C.in_set("lang", ["en", "de", "fr", "es", "zh"]),
            C.satisfies(
                "chars_match_text",
                "n_chars",
                F.col("n_chars") == F.length("text"),
            ),
            C.non_negative("n_chars"),
            C.matches("source", "^src[0-9]+$"),
        ],
    )
