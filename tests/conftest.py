from __future__ import annotations

import duckdb
import pytest

from opentelemetry_collector_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("otelcol-spark-tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same views the driver pre-registers."""

    def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con

    return connect


def assert_df_equal(spark_df, duck_df, sort_cols=None):
    """Exact frame equality after canonical sort (FIXTURES.md §4)."""
    import pandas as pd

    s = spark_df.toPandas()
    d = duck_df if isinstance(duck_df, pd.DataFrame) else duck_df.df()
    assert sorted(s.columns) == sorted(d.columns), (
        f"columns differ: {sorted(s.columns)} vs {sorted(d.columns)}"
    )
    cols = sorted(s.columns)
    s, d = s[cols], d[cols]
    sort_cols = sort_cols or cols
    s = s.sort_values(sort_cols).reset_index(drop=True)
    d = d.sort_values(sort_cols).reset_index(drop=True)

    # Normalize missing-value representations in object columns (Spark
    # surfaces None where DuckDB surfaces NaN/NaT): pandas currently treats
    # them as equal in assert_frame_equal but warns (FutureWarning) that a
    # future major will not — canonicalize to None so the comparison stays
    # exact across pandas versions. Scalar-safe (list/array cells pass
    # through untouched; pd.isna on those returns an array).
    def _null_to_none(v):
        if v is None or v is pd.NaT:
            return None
        if isinstance(v, float) and v != v:
            return None
        return v

    for c in cols:
        if s[c].dtype == object:
            s[c] = s[c].map(_null_to_none)
        if d[c].dtype == object:
            d[c] = d[c].map(_null_to_none)
    pd.testing.assert_frame_equal(s, d, check_dtype=False)
    # The driver's value-hash is dtype-sensitive: DuckDB HUGEINT sums surface as
    # float64 (3.0) while Spark yields int64 (3) — frame_equal(check_dtype=False)
    # hides that, the driver's hash does not. Require matching dtype *kinds*
    # (int vs float vs object ...), allowing width differences (int32 vs int64).
    for c in cols:
        sk, dk = s[c].dtype.kind, d[c].dtype.kind
        if {sk, dk} <= {"i", "u"} or sk == dk:
            continue
        # empty object columns from DuckDB for typed-but-empty results are fine
        if s[c].empty:
            continue
        raise AssertionError(
            f"dtype kind mismatch on '{c}': spark={s[c].dtype} oracle={d[c].dtype}"
            " (driver value-hash would differ)"
        )
