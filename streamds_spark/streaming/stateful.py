"""Custom stateful streaming operators via applyInPandasWithState — the escape
hatch for semantics the built-in streaming aggregates can't express (the
reference's stage-2 stateful contract generalized beyond counting).

running_keyed_count reproduces the reference's count_operator state machine
(load state → fold batch → emit updated map; operators/count_operator.go:17-112)
with state in Spark's per-key state store instead of a per-task text file.

Scale: state is partitioned by the group key across executors (the same hash
exchange as any stateful agg); GroupState is per-key, so memory scales with
live-key cardinality, and timeouts (GroupStateTimeout) bound it for expiring
domains (sessionization).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

COUNT_OUTPUT_SCHEMA = StructType(
    [StructField("word", StringType()), StructField("count", LongType())]
)
COUNT_STATE_SCHEMA = StructType([StructField("count", LongType())])


def _update_count(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (count,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        count += len(pdf)
    state.update((count,))
    yield pd.DataFrame({"word": [key[0]], "count": [count]})


def running_keyed_count(grouped_df: DataFrame) -> DataFrame:
    """Streaming DataFrame[(word, ...)] grouped by `word` → running counts with
    explicit managed state (A1 semantics, update mode)."""
    return grouped_df.groupBy("word").applyInPandasWithState(
        _update_count,
        outputStructType=COUNT_OUTPUT_SCHEMA,
        stateStructType=COUNT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
