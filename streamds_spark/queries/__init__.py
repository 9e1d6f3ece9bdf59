"""Importing this package registers every query into streamds_spark.registry.QUERIES."""

from streamds_spark.queries import advanced  # noqa: F401
from streamds_spark.queries import analytics  # noqa: F401
from streamds_spark.queries import collections  # noqa: F401
from streamds_spark.queries import integrity  # noqa: F401
from streamds_spark.queries import parity  # noqa: F401
from streamds_spark.queries import tpch  # noqa: F401
from streamds_spark.queries import tpch2  # noqa: F401
from streamds_spark.queries.llmdata import contamination  # noqa: F401
from streamds_spark.queries.llmdata import corpus  # noqa: F401
from streamds_spark.queries.llmdata import dedup  # noqa: F401
from streamds_spark.queries.llmdata import multimodal  # noqa: F401
from streamds_spark.queries.llmdata import quality  # noqa: F401
from streamds_spark.queries.llmdata import sampling  # noqa: F401
from streamds_spark.queries.llmdata import similarity  # noqa: F401
from streamds_spark.queries.llmdata import textstats  # noqa: F401
