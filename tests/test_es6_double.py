"""ES6 double canonicalization (pcommon.Value.AsString for doubles,
pdata/pcommon/value.go:397-426): known-vector parity + the vectorized UDF
path."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.functions.values import (
    _es6_number_str,
    es6_double_string,
)

# (input, ES6 Number::toString output) — thresholds and shapes per the spec
VECTORS = [
    (0.0, "0"),
    (-0.0, "0"),
    (5.0, "5"),
    (-5.0, "-5"),
    (1.5, "1.5"),
    (0.1, "0.1"),
    (1e7, "10000000"),
    (1e20, "100000000000000000000"),
    (1e21, "1e+21"),
    (1.5e21, "1.5e+21"),
    (-2e22, "-2e+22"),
    (1e-6, "0.000001"),
    (0.0000015, "0.0000015"),
    (1e-7, "1e-7"),
    (2.5e-8, "2.5e-8"),
    (float("nan"), "NaN"),
    (float("inf"), "Infinity"),
    (float("-inf"), "-Infinity"),
    (123.456, "123.456"),
    (1 / 3, "0.3333333333333333"),
    (9007199254740993.0, "9007199254740992"),
]


@pytest.mark.parametrize("value,want", VECTORS)
def test_known_vectors(value, want):
    assert _es6_number_str(value) == want


def test_udf_path_matches_scalar(spark):
    import math

    from pyspark.sql import functions as F

    finite = [(v,) for v, _ in VECTORS if not math.isnan(v)]
    df = spark.createDataFrame(finite, "v double")
    rows = df.select(
        "v", es6_double_string(F.col("v")).alias("s")
    ).collect()
    for r in rows:
        assert r.s == _es6_number_str(r.v)
    # null passthrough
    one = spark.sql("SELECT cast(NULL AS double) AS v").select(
        es6_double_string(F.col("v")).alias("s")
    ).collect()
    assert one[0].s is None
