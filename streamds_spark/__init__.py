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


def __getattr__(name):
    # Lazy re-exports of the main user-facing operators: keeps `import
    # streamds_spark` light while making the public surface discoverable.
    lazy = {
        "run_rainstorm": ("streamds_spark.operators.rainstorm", "run_rainstorm"),
        "grep": ("streamds_spark.operators.grep", "grep"),
        "read_logs": ("streamds_spark.operators.grep", "read_logs"),
        "dedup_corpus": ("streamds_spark.operators.dedup_pipeline", "dedup_corpus"),
        "kmeans": ("streamds_spark.operators.kmeans", "kmeans"),
        "pagerank": ("streamds_spark.operators.pagerank", "pagerank"),
        "profile_table": ("streamds_spark.operators.profile", "profile_table"),
        "sql": ("streamds_spark.sql", "sql"),
        "register_udfs": ("streamds_spark.sql", "register_udfs"),
        "QUERIES": ("streamds_spark.registry", "QUERIES"),
        "load_all": ("streamds_spark.registry", "load_all"),
        "build_ann_index": ("streamds_spark.operators.ann", "build_ann_index"),
        "ann_probe_topk": ("streamds_spark.operators.ann", "ann_probe_topk"),
        "build_ivf_index": ("streamds_spark.operators.ivf", "build_ivf_index"),
        "ivf_probe_topk": ("streamds_spark.operators.ivf", "ivf_probe_topk"),
        "evaluate_pairs": ("streamds_spark.operators.dedup_pipeline", "evaluate_pairs"),
        "write_bucket_store": ("streamds_spark.operators.dedup_incremental", "write_bucket_store"),
        "incremental_candidates": ("streamds_spark.operators.dedup_incremental", "incremental_candidates"),
        "asof_join": ("streamds_spark.operators.asof", "asof_join"),
        "compact_small_files": ("streamds_spark.io.layout", "compact_small_files"),
        "write_corpus": ("streamds_spark.io.layout", "write_corpus"),
        "write_zordered": ("streamds_spark.io.layout", "write_zordered"),
        "read_jsonl": ("streamds_spark.io.sources", "read_jsonl"),
        "split_valid_rows": ("streamds_spark.io.sources", "split_valid_rows"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'streamds_spark' has no attribute {name!r}")


__all__ = [
    "get_spark", "load_table", "TABLES", "run_rainstorm", "grep", "read_logs",
    "dedup_corpus", "kmeans", "pagerank", "profile_table", "sql",
    "register_udfs", "QUERIES", "load_all", "build_ann_index", "ann_probe_topk",
    "build_ivf_index", "ivf_probe_topk", "evaluate_pairs", "compact_small_files",
    "write_corpus", "write_zordered", "read_jsonl", "split_valid_rows",
    "write_bucket_store", "incremental_candidates", "asof_join",
]
__version__ = "0.1.0"
