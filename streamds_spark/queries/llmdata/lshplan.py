"""MinHash-LSH parameter planner: the S-curve table that picks (bands, rows)
before a corpus-wide dedup run.

For a signature of N_HASHES minhashes split into b bands of r rows, the
probability two docs with Jaccard similarity s share at least one band bucket
is p(s) = 1 - (1 - s^r)^b, and the S-curve's inflection threshold is
approximately (1/b)^(1/r) (Leskovec/Rajaraman/Ullman, "Mining of Massive
Datasets", ch. 3 — public textbook material, re-derived).

At 100 TB this table is what turns "dedup at 0.8 similarity" into a concrete
(b, r) choice: pick the row whose threshold brackets the target and whose
p(s) at below-target similarities (the false-positive mass that becomes
candidate-pair shuffle volume) is acceptable. Pure computation on a 16-row
range — the cost model runs on the driver-side plan, not the corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.registry import query

N_HASHES = 128
_S_GRID = (0.3, 0.5, 0.6, 0.7, 0.8, 0.9)


def _pcol(s: float):
    return f"p{int(round(s * 100)):03d}"


@query(
    "lsh_param_planner",
    oracle=rf"""
    WITH params AS (
        SELECT CAST(r AS INT) AS rows_per_band,
               CAST({N_HASHES} // r AS INT) AS bands
        FROM range(1, 17) t(r)
    )
    SELECT rows_per_band, bands,
           CAST(rows_per_band * bands AS INT) AS hashes_used,
           round(pow(1.0 / bands, 1.0 / rows_per_band), 4) AS threshold,
           {', '.join(
               f"round(1 - pow(1 - pow({s}, rows_per_band), bands), 4) AS {_pcol(s)}"
               for s in _S_GRID
           )}
    FROM params
    """,
)
def lsh_param_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collision-probability table for every rows-per-band r in 1..16 with
    b = floor(128/r) bands: detection threshold plus p(candidate) at Jaccard
    s in {0.3 .. 0.9}. sf_dir is unused — the planner is corpus-independent."""
    r = F.col("rows_per_band").cast("double")
    b = F.col("bands").cast("double")
    df = (
        spark.range(1, 17)
        .select(
            F.col("id").cast("int").alias("rows_per_band"),
            F.floor(N_HASHES / F.col("id")).cast("int").alias("bands"),
        )
    )
    return df.select(
        "rows_per_band",
        "bands",
        (F.col("rows_per_band") * F.col("bands")).cast("int").alias("hashes_used"),
        F.round(F.pow(1.0 / b, 1.0 / r), 4).alias("threshold"),
        *[
            F.round(1 - F.pow(1 - F.pow(F.lit(s), r), b), 4).alias(_pcol(s))
            for s in _S_GRID
        ],
    )
