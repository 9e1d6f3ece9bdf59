"""Registry-wide output-form contract.

The external driver canonicalizes each query result by sorting raw cells
before hashing; list/dict cells (from array/map/struct columns) raise
`TypeError: unhashable type` inside its sort and turn the row red regardless
of whether the values are correct (CORRECTNESS_r03.json: feature_hash_vectors).
Rule: every oracle-checked registry query must emit only scalar top-level
columns — serialize vectors with array_join/concat_ws (Spark) and
array_to_string/list_aggregate (DuckDB), or emit a long form.
Rows-only queries (oracle=None) are exempt: the driver only counts their rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from streamds_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.001"

SPECS = load_all()

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(SPECS))
@pytest.mark.slow
def test_no_complex_toplevel_output_columns(spark, name):
    spec = SPECS[name]
    if spec.oracle is None:
        pytest.skip("rows-only query: driver never canonicalizes its cells")
    df = spec.fn(spark, SF_DIR)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)]
    assert not bad, (
        f"{name} emits complex top-level column(s) {bad}; the driver "
        "canonicalizer cannot sort list/dict cells — array_join them"
    )
