"""Declarative data-quality constraint suite — Deequ-style checks compiled
into ONE aggregation pass over the table.

A 100 TB ingest runs its quality gate on every batch; the gate's cost model
is therefore the design center:

  * every row-local check (not-null, predicate, set-membership, regex,
    range) compiles to ONE conditional-count expression inside a SINGLE
    `df.agg(...)` — the whole suite costs one scan with map-side partial
    aggregation, no matter how many checks it carries;
  * uniqueness checks ride the same aggregate as `count distinct`
    expressions (Catalyst expands multi-distinct into one Expand + two-level
    aggregate — still one scan of the input);
  * referential-integrity checks are the only ones that touch a second
    table: each compiles to a left-anti join + count, sized by the PARENT
    (dimension) side, which AQE broadcasts when small. They are separate
    jobs by necessity, not a per-row Python path.

The report is pure integers/strings/booleans (check name, target column,
row count, violation count, passed flag) — engine-independent and
hash-exact against a SQL replay, unlike ratio-based quality scores whose
float division order can differ per engine.

Reference parity: the reference engine (StreamDS, Go) has no quality gate;
this is part of the LLM-data-pipeline layer (documents arriving from crawl
need schema/value gates before any dedup/filter stage sees them). Public
design antecedent: Amazon Deequ's "unified metrics computation" — all
metrics in one pass over the data (Schelter et al., VLDB 2018).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One compiled constraint: `name` is the check kind, `target` the
    column(s) it guards, and exactly one of `violations` (a row-local
    condition counted in the shared single-pass aggregate) or
    `agg_violations` (a full aggregate expression, for uniqueness)."""

    name: str
    target: str
    violations: Column | None = None  # row-local: 1 where violated
    agg_violations: Column | None = None  # full aggregate expression


def not_null(col: str) -> Check:
    """Violated by NULL."""
    return Check(
        "not_null", col, violations=F.when(F.col(col).isNull(), 1).otherwise(0)
    )


def satisfies(name: str, target: str, predicate: Column) -> Check:
    """Violated where the predicate does NOT evaluate true — a NULL
    predicate (NULL operand) is a violation, matching CHECK-constraint
    intuition ('every row provably satisfies it')."""
    return Check(
        name,
        target,
        violations=F.when(predicate.isNull() | ~predicate, 1).otherwise(0),
    )


def in_range(col: str, lo, hi) -> Check:
    return satisfies("in_range", col, F.col(col).between(F.lit(lo), F.lit(hi)))


def non_negative(col: str) -> Check:
    return satisfies("non_negative", col, F.col(col) >= 0)


def in_set(col: str, values) -> Check:
    return satisfies("in_set", col, F.col(col).isin(list(values)))


def matches(col: str, regex: str) -> Check:
    return satisfies("matches", col, F.col(col).rlike(regex))


def unique(*cols: str) -> Check:
    """Violated by duplicate tuples: violations = (rows where every key
    column is non-null) − (distinct non-null tuples). NULL-keyed rows are
    not counted here (guard them with not_null) — the same convention as
    SQL's count(col) − count(DISTINCT col)."""
    nonnull = F.lit(True)
    for c in cols:
        nonnull = nonnull & F.col(c).isNotNull()
    return Check(
        "unique",
        ",".join(cols),
        agg_violations=(
            F.sum(F.when(nonnull, 1).otherwise(0)).cast("bigint")
            - F.count_distinct(*[F.col(c) for c in cols]).cast("bigint")
        ),
    )


@dataclass(frozen=True)
class ForeignKey:
    """child[col] must exist in parent[parent_col]; NULL FKs are not
    violations (SQL REFERENCES semantics)."""

    col: str
    parent: DataFrame
    parent_col: str


def constraint_report(
    df: DataFrame, checks: "list[Check]", fks: "list[ForeignKey]" = ()
) -> DataFrame:
    """Run the suite; one row per check:
    (check_name, target, n_rows, violations, passed).

    All row-local + uniqueness checks share ONE aggregation over `df`
    (one scan, map-side combined); each foreign key adds one anti-join
    count against its parent. Output is fully integer/string/boolean."""
    if not checks and not fks:
        raise ValueError("constraint_report: empty suite")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_rows")]
    for i, c in enumerate(checks):
        if c.agg_violations is not None:
            aggs.append(c.agg_violations.cast("bigint").alias(f"_v{i}"))
        else:
            aggs.append(F.sum(c.violations).cast("bigint").alias(f"_v{i}"))
    row = df.agg(*aggs)
    reports = []
    if checks:
        entries = F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("check_name"),
                    F.lit(c.target).alias("target"),
                    F.coalesce(F.col(f"_v{i}"), F.lit(0)).alias("violations"),
                )
                for i, c in enumerate(checks)
            ]
        )
        reports.append(
            row.select(F.col("_rows"), F.explode(entries).alias("c")).select(
                F.col("c.check_name").alias("check_name"),
                F.col("c.target").alias("target"),
                F.col("_rows").alias("n_rows"),
                F.col("c.violations").alias("violations"),
            )
        )
    base_rows = row.select("_rows")
    for fk in fks:
        viol = (
            df.select(F.col(fk.col))
            .filter(F.col(fk.col).isNotNull())
            .join(
                fk.parent.select(F.col(fk.parent_col).alias(fk.col)).distinct(),
                on=fk.col,
                how="left_anti",
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        )
        reports.append(
            base_rows.crossJoin(viol).select(
                F.lit("foreign_key").alias("check_name"),
                F.lit(f"{fk.col}->{fk.parent_col}").alias("target"),
                F.col("_rows").alias("n_rows"),
                F.col("violations"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("violations") == F.lit(0))
