"""MP1 distributed-grep parity: translate a grep command line into DataFrame ops.

Reference behavior (core_process/core_process.go):
  - `grep [flags] 'pattern'` fans out to every node, each runs grep on its local
    log, results are gathered: with -c the per-node ints are summed; without,
    returned lines are counted and concatenated (grepMain :91-124, gather
    :259-349). Supported flag surface: -c, -i, -E, -v, plus piped
    `grep A | grep -v B` chains (reference README).
  - The command runs through `bash -c` (core_process.go:117), so a non-`-E`
    pattern is a POSIX BRE (`.` `*` `[...]` `^` `$` special; `+ ? ( ) { } |`
    literal unless backslashed) — translated here to Java regex semantics.
  - Filename placement (core_process.go:104-110): the node's log file is
    substituted at `<filename>` tags, else appended to the END of the whole
    command. In a pipe that means the file attaches to the LAST stage, whose
    grep then ignores stdin — bash gives earlier stages EOF, so their filters
    are dead. We reproduce that faithfully (with a warning) and support
    `<filename>` to pick the reading stage, plus `<fnactual custom.log>`
    (core_process.go:22-34) to restrict which file is read.

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
    extended: bool = False  # -E (ERE; without it, pattern is a POSIX BRE)
    invert: bool = False  # -v
    has_file: bool = False  # a <filename> tag sat in this stage


@dataclass
class GrepPipeline:
    stages: list[GrepCommand] = field(default_factory=list)
    custom_file: str | None = None  # <fnactual name> restriction

    @property
    def count(self) -> bool:
        return any(s.count for s in self.stages)

    @property
    def effective_stages(self) -> list[GrepCommand]:
        """The stages whose filters actually apply, mirroring bash: the file
        attaches to the last stage bearing a <filename> tag (else the last
        stage, where the reference appends it); that grep reads the FILE and
        ignores stdin, so every earlier stage's output is discarded."""
        k = 0
        for i, s in enumerate(self.stages):
            if s.has_file:
                k = i
        if not any(s.has_file for s in self.stages):
            k = len(self.stages) - 1
        if k > 0:
            import warnings

            warnings.warn(
                f"grep pipe: {k} stage(s) before the file-reading stage are dead "
                "(reference appends the filename to the last stage; put <filename> "
                "in the first stage to filter through the whole pipe)"
            )
        return self.stages[k:]


_FNACTUAL_RE = re.compile(r"<fnactual\s+([^>]+)>")


def _split_pipes(command: str) -> list[str]:
    """Split on `|` only outside quotes (bash would; a quoted `\\|` is pattern
    text, not a pipeline operator)."""
    parts, buf, quote = [], [], None
    for ch in command:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            buf.append(ch)
            quote = ch
        elif ch == "|":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def parse_grep(command: str) -> GrepPipeline:
    """Parse `grep -c 'ERROR' <filename> | grep -v 'DEBUG'`-style commands."""
    pipeline = GrepPipeline()
    m = _FNACTUAL_RE.search(command)
    if m:  # reference extractFilename (core_process.go:22-34)
        pipeline.custom_file = m.group(1).strip()
        command = _FNACTUAL_RE.sub("", command)
    for part in _split_pipes(command):
        toks = shlex.split(part.strip())
        if not toks:
            continue
        if toks[0] == "grep":
            toks = toks[1:]
        cmd = GrepCommand(pattern="")
        pats = []
        for t in toks:
            if t == "<filename>":
                cmd.has_file = True
            elif t.startswith("-") and len(t) > 1 and not t.startswith("--"):
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
        if not pats and not cmd.has_file:
            raise ValueError(f"no pattern in grep stage: {part!r}")
        cmd.pattern = pats[0] if pats else ""
        pipeline.stages.append(cmd)
    if not pipeline.stages:
        raise ValueError(f"empty grep command: {command!r}")
    return pipeline


_POSIX_CLASS_TO_JAVA = {
    "alpha": r"\p{Alpha}",
    "digit": r"\p{Digit}",
    "alnum": r"\p{Alnum}",
    "upper": r"\p{Upper}",
    "lower": r"\p{Lower}",
    "space": r"\s",
    "blank": r"\p{Blank}",
    "punct": r"\p{Punct}",
    "xdigit": r"\p{XDigit}",
    "cntrl": r"\p{Cntrl}",
    "print": r"\p{Print}",
    "graph": r"\p{Graph}",
}


def _copy_bracket(pat: str, i: int, out: list[str]) -> int:
    """Copy a [...] bracket expression starting at pat[i]=='[', translating
    POSIX [:class:] names to Java \\p{...}; returns index past the closing ]."""
    j = i + 1
    buf = ["["]
    if j < len(pat) and pat[j] == "^":
        buf.append("^")
        j += 1
    if j < len(pat) and pat[j] == "]":  # first ] is literal
        buf.append("\\]")
        j += 1
    while j < len(pat) and pat[j] != "]":
        if pat[j] == "[" and j + 1 < len(pat) and pat[j + 1] == ":":
            close = pat.find(":]", j + 2)
            if close != -1:
                name = pat[j + 2 : close]
                buf.append(_POSIX_CLASS_TO_JAVA.get(name, re.escape(f"[:{name}:]")))
                j = close + 2
                continue
        if pat[j] == "\\":  # in POSIX brackets backslash is literal
            buf.append("\\\\")
        elif pat[j] == "[":
            buf.append("\\[")
        else:
            buf.append(pat[j])
        j += 1
    buf.append("]")
    out.append("".join(buf))
    return j + 1  # past the closing ]


def bre_to_java(pat: str) -> str:
    r"""Translate a POSIX Basic Regular Expression (grep's default grammar) to
    a Java regex for Column.rlike.

    BRE rules honored: `. * [...] ^ $` are special (`^` only at the start, `$`
    only at the end, `*` literal at the start); `+ ? ( ) { } |` are LITERAL
    unless backslash-escaped (GNU operators `\( \) \{m,n\} \| \+ \?`);
    `\<`/`\>` word boundaries → `\b`; POSIX classes `[:digit:]` → `\p{...}`.
    """
    out: list[str] = []
    i, n = 0, len(pat)
    while i < n:
        c = pat[i]
        if c == "\\" and i + 1 < n:
            nxt = pat[i + 1]
            if nxt in "(){}|+?":
                out.append(nxt)  # GNU BRE operator → Java metachar
            elif nxt in "<>":
                out.append(r"\b")
            else:
                out.append("\\" + nxt)  # \. \* \[ \\ \1 … keep escaped
            i += 2
        elif c == "[":
            i = _copy_bracket(pat, i, out)
        elif c in "(){}|+?":
            out.append("\\" + c)  # literal in BRE
            i += 1
        elif c == "*" and (i == 0 or (i == 1 and pat[0] == "^")):
            out.append("\\*")  # leading * is literal in BRE
            i += 1
        elif c == "^" and i != 0:
            out.append("\\^")  # mid-pattern anchor chars are literal in BRE
            i += 1
        elif c == "$" and i != n - 1:
            out.append("\\$")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _stage_predicate(line: Column, cmd: GrepCommand) -> Column:
    pat = cmd.pattern if cmd.extended else bre_to_java(cmd.pattern)
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
    out = _apply(df, pipe)
    if pipe.count:
        return out.groupBy("file").agg(F.count("*").alias("match_count"))
    return out


def _apply(df: DataFrame, pipe: GrepPipeline) -> DataFrame:
    out = df
    if pipe.custom_file:
        out = out.filter(
            F.element_at(F.split(F.col("file"), "/"), -1) == pipe.custom_file
        )
    for stage in pipe.effective_stages:
        out = out.filter(_stage_predicate(F.col("line"), stage))
    return out


def grep_total(df: DataFrame, command: str) -> int:
    """The reference's leader-side grand total (sum of per-node counts)."""
    return _apply(df, parse_grep(command)).count()
