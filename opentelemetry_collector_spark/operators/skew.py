"""Adaptive hot-key skew handling (SURVEY §4 "ours to design", §7 "what's
hard": the salting factor must be computed from observed key histograms, not
hardcoded).

The reference is single-process and scales horizontally behind a
traceID-affinity load balancer (docs/performance.md:69-72) — skew is the
operator's problem. At 10^12 turns a viral conversation can hold millions of
rows; a static salt either under-splits the hot key or needlessly shuffles
the cold ones. This module implements the classic two-pass scheme:

1. ``key_histogram`` — one cheap partial-agg pass finds heavy hitters
   (groupBy(key).count() collapses map-side to |distinct keys| rows; only
   keys above a share threshold are collected to the driver, so the
   driver-side state is tiny by construction).
2. ``plan_salts`` — per-key salt factor = ceil(key_rows / target_rows), so
   each (key, salt) cell lands near the target partition payload. Cold keys
   get factor 1 (no salt, no extra shuffle work).
3. ``with_salt`` / ``skew_aware_repartition`` — a broadcast map-literal
   lookup assigns each row its salt; repartition on (key, salt) spreads hot
   keys over exactly as many reducers as their volume requires.

AQE's skew-join split covers joins; this covers scan/window/write-side
clustering where AQE does not apply. The deterministic salt (crc32 of a
stable secondary column, not rand()) keeps re-runs reproducible —
checkpoint replay (plans/checkpoint.py) depends on that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def key_histogram(
    df: DataFrame, key: str, min_share: float = 0.01, max_keys: int = 1000
) -> tuple[int, dict[str, int]]:
    """(total_rows, {heavy_key: row_count}) for keys holding at least
    ``min_share`` of rows. One partial-agg pass; the driver only ever sees
    keys above the threshold (bounded by 1/min_share keys, capped again at
    ``max_keys``)."""
    # persist the per-key counts: the total and the heavy-hitter filter are
    # two actions over the same aggregate — without the persist each one
    # re-scans the full input (two passes at 10^12 rows instead of one scan
    # + two passes over the tiny aggregate)
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).persist()
    try:
        totals = counts.agg(
            F.sum("n").alias("total"), F.max("n").alias("biggest")
        ).collect()[0]
        total = totals["total"] or 0
        if total == 0:
            return 0, {}
        threshold = max(1, int(total * min_share))
        heavy = (
            counts.filter(F.col("n") >= threshold)
            .orderBy(F.desc("n"))
            .limit(max_keys)
            .collect()
        )
        return total, {r[key]: r["n"] for r in heavy}
    finally:
        counts.unpersist()


def plan_salts(
    total_rows: int,
    heavy: dict[str, int],
    num_partitions: int,
    target_rows: int | None = None,
    overprovision: int = 4,
) -> dict[str, int]:
    """Per-key salt factors. ``target_rows`` defaults to the balanced
    per-partition payload (total/partitions): a key holding k targets' worth
    of rows needs k cells (cold keys are implicitly factor 1).

    The factor is then multiplied by ``overprovision``: k cells hash into p
    partitions with birthday collisions, so k ~ p still stacks 2-4 cells on
    one reducer; ~4x as many, each proportionally smaller, flattens the
    placement (measured: 7 cells into 8 partitions put 4 cells on one
    reducer; 28 cells spread within ~1.5x of even)."""
    if total_rows == 0 or num_partitions <= 0:
        return {}
    target = target_rows or max(1, total_rows // num_partitions)
    return {
        k: min(overprovision * num_partitions, overprovision * -(-n // target))
        for k, n in heavy.items()
        if n > target
    }


def with_salt(
    df: DataFrame, key: str, salt_map: dict[str, int], order_col: str
) -> DataFrame:
    """Add SALT_COL: crc32(order_col) % factor for heavy keys, 0 for cold
    ones. Deterministic (replay-safe) — no rand().

    A NULL key can itself be a heavy hitter (e.g. dead-letter rows with no
    conv_id); map literals cannot hold a null key, so its factor is applied
    through a dedicated isNull branch instead of crashing with
    NULL_MAP_KEY."""
    null_factor = None
    non_null = {}
    for k, factor in salt_map.items():
        if k is None:
            null_factor = int(factor)
        else:
            non_null[k] = int(factor)
    if not non_null and null_factor is None:
        return df.withColumn(SALT_COL, F.lit(0))
    if non_null:
        pairs: list[Column] = []
        for k, factor in non_null.items():
            pairs.extend([F.lit(k), F.lit(factor)])
        factor = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(key)), F.lit(1)
        )
    else:
        factor = F.lit(1)
    if null_factor is not None:
        factor = F.when(F.col(key).isNull(), F.lit(null_factor)).otherwise(
            factor
        )
    return df.withColumn(
        SALT_COL,
        (F.crc32(F.col(order_col).cast("string")) % factor).cast("int"),
    )


def skew_aware_repartition(
    df: DataFrame,
    key: str,
    order_col: str,
    num_partitions: int,
    min_share: float = 0.01,
) -> DataFrame:
    """Two-pass adaptive repartition: histogram -> salt plan -> repartition
    on (key, salt). Returns the repartitioned frame (SALT_COL retained so
    callers can verify the spread; drop it before writing)."""
    total, heavy = key_histogram(df, key, min_share=min_share)
    salts = plan_salts(total, heavy, num_partitions)
    return with_salt(df, key, salts, order_col).repartition(
        num_partitions, F.col(key), F.col(SALT_COL)
    )
