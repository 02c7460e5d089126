"""Enrich stage — the attributes/resource-processor analog.

The reference core documents "telemetry enrichment" as a processor category
(docs/processing.md:82-91); here it is a broadcast hash-join against small
role/tool lookup tables (FIXTURES.md §2). Left-join with default fills:
unmatched tool -> tool_family='unknown' (attributes-processor upsert
semantics, pdata/pcommon/map.go:109-127).

The lookup rows are module constants — the single source of truth consumed by
BOTH the Spark side (createDataFrame + broadcast) and the DuckDB oracle
(generated VALUES clause), so engine-vs-oracle equality is structural.

Scale note: broadcast() keeps these joins shuffle-free at any fact-table size
— the 100 TB plan is scan -> parse -> BroadcastHashJoin x2 with zero exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (role, role_kind, is_human, priority)
ROLES: list[tuple[str, str, bool, int]] = [
    ("user", "human", True, 1),
    ("assistant", "agent", False, 2),
    ("tool", "machine", False, 3),
    ("system", "control", False, 4),
]

# (tool, tool_family, timeout_ms, deprecated)
TOOLS: list[tuple[str, str, int, bool]] = [
    ("search", "search", 5000, False),
    ("browser", "search", 30000, False),
    ("python", "code", 60000, False),
    ("bash", "code", 60000, False),
    ("calculator", "compute", 1000, True),
    ("none", "none", 0, False),
]

ROLES_COLUMNS = ["role", "role_kind", "is_human", "priority"]
TOOLS_COLUMNS = ["tool", "tool_family", "timeout_ms", "deprecated"]


def roles_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROLES, ROLES_COLUMNS)


def tools_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TOOLS, TOOLS_COLUMNS)


def enrich_roles(parsed: DataFrame, spark: SparkSession) -> DataFrame:
    """Broadcast left-join role metadata; unmatched role -> role_kind='unknown'."""
    out = parsed.join(F.broadcast(roles_df(spark)), on="role", how="left")
    return out.withColumn("role_kind", F.coalesce("role_kind", F.lit("unknown")))


def enrich_tools(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Broadcast left-join tool metadata on the *parsed* tool; default fills."""
    lookup = tools_df(spark)
    out = df.join(
        F.broadcast(lookup),
        on=df["parsed_tool"] == lookup["tool"],
        how="left",
    ).drop(lookup["tool"])
    return out.withColumn(
        "tool_family",
        F.when(F.col("parsed_tool").isNull(), F.lit("none")).otherwise(
            F.coalesce("tool_family", F.lit("unknown"))
        ),
    )


def enrich(parsed: DataFrame, spark: SparkSession) -> DataFrame:
    return enrich_tools(enrich_roles(parsed, spark), spark)


def _values_sql(rows: list[tuple], columns: list[str], name: str) -> str:
    def lit(v: object) -> str:
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return f"'{v}'"
        return str(v)

    values = ",\n    ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    cols = ", ".join(columns)
    return f"{name}({cols}) AS (VALUES\n    {values})"


def roles_values_sql() -> str:
    """`roles(...) AS (VALUES ...)` CTE body for oracle SQL."""
    return _values_sql(ROLES, ROLES_COLUMNS, "roles")


def tools_values_sql() -> str:
    return _values_sql(TOOLS, TOOLS_COLUMNS, "tools")
