"""MP1 distributed-grep parity: translate a grep command line into DataFrame ops.

Reference behavior (core_process/core_process.go):
  - `grep [flags] 'pattern'` fans out to every node, each runs grep on its local
    log, results are gathered: with -c the per-node ints are summed; without,
    returned lines are counted and concatenated (grepMain :91-124, gather
    :259-349). Supported flag surface: -c, -i, -E, -v, plus piped
    `grep A | grep -v B` chains (reference README).

Spark-first translation: the "cluster of per-node logs" is a DataFrame of
(file, line) — `spark.read.text` with input_file_name(), one partition per
split. A grep query becomes rlike/~rlike filters; -c becomes groupBy(file).count()
plus a grand total. The scatter/gather protocol disappears: Catalyst's partial
aggregation IS the per-node count + leader sum.

Scale: regex evaluation is codegen'd JVM; counts are map-side partial.
A 100 TB log corpus greps with zero shuffle except the per-file count exchange.
"""

from __future__ import annotations

import re
import shlex
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class GrepCommand:
    """One stage of a (possibly piped) grep pipeline."""

    pattern: str
    count: bool = False  # -c
    ignore_case: bool = False  # -i
    extended: bool = False  # -E (regex; without it, pattern treated literally)
    invert: bool = False  # -v


@dataclass
class GrepPipeline:
    stages: list[GrepCommand] = field(default_factory=list)

    @property
    def count(self) -> bool:
        return any(s.count for s in self.stages)


def parse_grep(command: str) -> GrepPipeline:
    """Parse `grep -c 'ERROR' | grep -v 'DEBUG'`-style command strings."""
    pipeline = GrepPipeline()
    for part in command.split("|"):
        toks = shlex.split(part.strip())
        if not toks:
            continue
        if toks[0] == "grep":
            toks = toks[1:]
        cmd = GrepCommand(pattern="")
        pats = []
        for t in toks:
            if t.startswith("-") and len(t) > 1 and not t.startswith("--"):
                for ch in t[1:]:
                    if ch == "c":
                        cmd.count = True
                    elif ch == "i":
                        cmd.ignore_case = True
                    elif ch == "E":
                        cmd.extended = True
                    elif ch == "v":
                        cmd.invert = True
                    else:
                        raise ValueError(f"unsupported grep flag -{ch}")
            else:
                pats.append(t)
        if not pats:
            raise ValueError(f"no pattern in grep stage: {part!r}")
        cmd.pattern = pats[0]
        pipeline.stages.append(cmd)
    if not pipeline.stages:
        raise ValueError(f"empty grep command: {command!r}")
    return pipeline


def _stage_predicate(line: Column, cmd: GrepCommand) -> Column:
    pat = cmd.pattern if cmd.extended else re.escape(cmd.pattern)
    if cmd.ignore_case:
        pat = "(?i)" + pat
    pred = line.rlike(pat)
    return ~pred if cmd.invert else pred


def read_logs(spark: SparkSession, path: str) -> DataFrame:
    """Load a log directory/glob as (file, line) — the MP1 'cluster'."""
    return spark.read.text(path).select(
        F.input_file_name().alias("file"), F.col("value").alias("line")
    )


def grep(df: DataFrame, command: str) -> DataFrame:
    """Run a grep command over a (file, line) DataFrame.

    Returns: with -c → one row per file (file, match_count) — the reference's
    per-node counts; the grand total is `.agg(sum)` away, mirrored in grep_total.
    Without -c → the matching (file, line) rows themselves.
    """
    pipe = parse_grep(command)
    out = df
    for stage in pipe.stages:
        out = out.filter(_stage_predicate(F.col("line"), stage))
    if pipe.count:
        return out.groupBy("file").agg(F.count("*").alias("match_count"))
    return out


def grep_total(df: DataFrame, command: str) -> int:
    """The reference's leader-side grand total (sum of per-node counts)."""
    pipe = parse_grep(command)
    out = df
    for stage in pipe.stages:
        out = out.filter(_stage_predicate(F.col("line"), stage))
    return out.count()
