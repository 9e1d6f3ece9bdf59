"""streamds_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the StreamDS reference (Ingenious-c0der/StreamDS),
re-expressed Spark-first.

The reference is a Go 3-stage streaming dataflow (RainStorm) plus a distributed
grep (MP1) over a chord-ring DFS (HyDFS). This engine maps that surface onto
DataFrame/SQL + Structured Streaming and extends it with the operators a
large-scale (100 TB) training-data pipeline needs: dedup (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding-cosine), similarity search, text analysis,
and multimodal column plumbing.

Public surface:
    from streamds_spark import get_spark, load_table
    from streamds_spark.registry import QUERIES          # name -> QuerySpec
    from streamds_spark.operators.grep import grep       # MP1 parity
    from streamds_spark.operators.rainstorm import run_rainstorm  # MP4 parity
"""

from streamds_spark.session import get_spark
from streamds_spark.catalog import load_table, TABLES

__all__ = ["get_spark", "load_table", "TABLES"]
__version__ = "0.1.0"
