"""Metrics-signal operators — the pmetric data-model analog (SURVEY §1.1).

The reference's metrics signal (pdata/pmetric/metrics.go:45-65) carries five
metric types (pdata/pmetric/metric_type.go:21-27): Gauge, Sum, Histogram,
ExponentialHistogram, Summary — each a stream of data points keyed by a
series identity, with Sum/Histogram carrying an AggregationTemporality
(delta vs cumulative, pdata/pmetric/aggregation_temporality.go). Here the
data points are the tool-call spans extracted by the parse stage (one
NumberDataPoint per span, value = dur_ms), and each metric type becomes a
DataFrame aggregation:

- Gauge          -> last-sampled value per series (arg-max over ts)
- Sum            -> delta->cumulative temporality conversion: running sum per
                    series stream (the delta-to-cumulative processor pattern)
- Histogram      -> explicit-bounds bucket counts + count/sum/min/max per
                    (series, time bucket) (pdata/pmetric/generated_histogramdatapoint.go)
- ExponentialHistogram -> base-2 scale-0 buckets: index = floor(log2(v)),
                    computed exactly as length(bin(v))-1 in BOTH engines so
                    no float rounding can diverge; zero values land in the
                    reference's dedicated zero bucket (index -1 here)
                    (pdata/pmetric/generated_exponentialhistogramdatapoint.go)

Scale notes: gauge/histogram aggs are partial-agg-friendly groupBys with tiny
output cardinality. The cumulative conversion windows by (conv_id, tool) — a
per-stream running sum whose partitions align with the table's bucket(conv_id)
layout, so at 10^12 rows it shuffles once into bucket-aligned partitions and
never builds a global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.aggregate import BUCKET_SECONDS, time_bucket

# Explicit histogram bounds (ms): value v falls in the first bucket with
# v <= bound, else the overflow bucket — mirroring the <= upper-bound
# semantics of pmetric explicit_bounds.
HISTOGRAM_BOUNDS = (100, 250, 500, 750)


def _spans(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("trace_id").isNotNull())


def gauge_last(parsed: DataFrame) -> DataFrame:
    """Gauge semantics: the most recent data point per series (tool).

    Deterministic arg-max: max over (ts, conv_id, turn_idx) — expressed as
    ``max(struct(...))`` so Spark plans a PARTIAL-aggregatable HashAggregate
    (map-side combine) instead of a ``row_number`` window partitioned by the
    ~5-value ``parsed_tool`` key. The window shape funnels every span into
    <=5 reducer tasks — at 100 TB five tasks own the whole dataset; the
    struct arg-max reduces each input partition to <=5 rows before the
    (tiny) exchange. Struct comparison is lexicographic on the fields in
    order, which is exactly the old (ts desc, conv_id desc, turn_idx desc)
    row_number ordering.
    """
    m = F.max(F.struct("ts", "conv_id", "turn_idx", "dur_ms")).alias("m")
    return (
        _spans(parsed)
        .groupBy("parsed_tool")
        .agg(m)
        .select(
            F.col("parsed_tool").alias("tool"),
            F.unix_timestamp("m.ts").cast("long").alias("last_ts_epoch"),
            F.col("m.dur_ms").alias("last_value"),
        )
    )


def sum_delta_to_cumulative(parsed: DataFrame) -> DataFrame:
    """AggregationTemporality conversion (delta -> cumulative) per stream.

    Each (conv_id, tool) pair is one metric stream; every span is a delta
    data point (value = dur_ms); the cumulative value at turn T is the
    running sum over the stream's turn order — the delta-to-cumulative
    processor pattern over pmetric Sum points.
    """
    w = (
        Window.partitionBy("conv_id", "parsed_tool")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _spans(parsed).select(
        "conv_id",
        F.col("parsed_tool").alias("tool"),
        "turn_idx",
        F.col("dur_ms").alias("delta_value"),
        F.sum("dur_ms").over(w).alias("cumulative_value"),
    )


def sum_cumulative_to_delta(parsed: DataFrame) -> DataFrame:
    """AggregationTemporality conversion (cumulative -> delta) — the
    inverse of sum_delta_to_cumulative, i.e. the cumulative-to-delta
    processor pattern over pmetric Sum points
    (pdata/pmetric/aggregation_temporality.go:12-38 defines the two
    temporalities; the conversion rules follow the OTel metrics data-model
    reset spec):

    * delta = cumulative - previous cumulative within the (conv_id, tool)
      stream in turn order;
    * a reset (cumulative < previous) restarts the baseline — the point's
      delta is its full cumulative value;
    * the first point of a stream has no baseline -> NULL delta (the
      processor drops it; kept as NULL here so row counts are auditable).

    Both windows (the running sum and the lag) keep the SAME partition
    attributes — ``(conv_id, parsed_tool)`` — and only rename to ``tool``
    in the final projection: renaming between the windows makes Catalyst
    plan a second hashpartitioning exchange on the aliased attribute, a
    full extra shuffle of every stream (observed in .explain; guarded by
    test_temporality_conversions_share_one_stream_shuffle).
    """
    w_base = Window.partitionBy("conv_id", "parsed_tool").orderBy("turn_idx")
    w_cum = w_base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = _spans(parsed).select(
        "conv_id",
        "parsed_tool",
        "turn_idx",
        F.sum("dur_ms").over(w_cum).alias("cumulative_value"),
    )
    prev = F.lag("cumulative_value").over(w_base)
    return cum.select(
        "conv_id",
        F.col("parsed_tool").alias("tool"),
        "turn_idx",
        "cumulative_value",
        F.when(prev.isNull(), F.lit(None).cast("long"))
        .when(F.col("cumulative_value") < prev, F.col("cumulative_value"))
        .otherwise(F.col("cumulative_value") - prev)
        .alias("delta_value"),
    )


def histogram_explicit(
    parsed: DataFrame, bucket_seconds: int = BUCKET_SECONDS
) -> DataFrame:
    """Explicit-bounds HistogramDataPoint per (tool, time bucket):
    count/sum/min/max plus one count per bound (le_N) and overflow (gt_last).
    """
    spans = _spans(parsed)
    aggs = [
        F.count(F.lit(1)).alias("n_points"),
        F.sum("dur_ms").alias("sum_value"),
        F.min("dur_ms").alias("min_value"),
        F.max("dur_ms").alias("max_value"),
    ]
    lower = None
    for bound in HISTOGRAM_BOUNDS:
        cond = F.col("dur_ms") <= bound
        if lower is not None:
            cond = cond & (F.col("dur_ms") > lower)
        aggs.append(F.count(F.when(cond, 1)).alias(f"bucket_le_{bound}"))
        lower = bound
    aggs.append(
        F.count(F.when(F.col("dur_ms") > HISTOGRAM_BOUNDS[-1], 1)).alias(
            f"bucket_gt_{HISTOGRAM_BOUNDS[-1]}"
        )
    )
    return spans.groupBy(
        time_bucket(F.col("ts"), bucket_seconds).alias("bucket_start_epoch"),
        F.col("parsed_tool").alias("tool"),
    ).agg(*aggs)


def _exp_index_exprs(scale: int, v: str = "abs(dur_ms)") -> str:
    """Shared Spark/DuckDB SQL for the OTel exponential bucket index of a
    positive integer magnitude at ``scale``.

    The spec mapping (generated_exponentialhistogramdatapoint.go; base =
    2^(2^-scale), buckets LOWER-exclusive/UPPER-inclusive) is
    index = ceil(base_log(v)) - 1, so an exact power base^k belongs to
    bucket k-1.

    * scale <= 0 is computed EXACTLY in integer arithmetic: the scale-0
      ceil-log2 is length(bin(v-1))-1 for v>1 (-1 for v=1) and coarser
      scales floor-divide by 2^-scale via arithmetic shift.
    * scale > 0 uses the documented float path: ceil(2^scale * log2(v))-1,
      with exact powers of two (v & (v-1) = 0) routed through integer
      math — boundary values are the only rationals of the base grid, so
      the float path never decides a boundary; both engines evaluate the
      identical expression (parity property-tested over a value sweep).
    """
    if scale <= 0:
        idx0 = f"CASE WHEN {v} = 1 THEN -1 ELSE length(bin({v} - 1)) - 1 END"
        if scale == 0:
            return f"cast({idx0} AS int)"
        # index >> -scale must floor toward -inf; DuckDB's >> is a LOGICAL
        # shift, so the one possible negative input (idx0 = -1, i.e. v = 1)
        # is routed explicitly — for idx0 >= 0 logical and arithmetic shifts
        # agree across both engines
        return (
            f"cast(CASE WHEN ({idx0}) = -1 THEN -1 "
            f"ELSE ({idx0}) >> {-scale} END AS int)"
        )
    m = 1 << scale
    return (
        f"cast(CASE WHEN ({v} & ({v} - 1)) = 0 "
        f"THEN (length(bin({v})) - 1) * {m} - 1 "
        f"ELSE ceil({m} * log2({v})) - 1 END AS int)"
    )


def exp_histogram(parsed: DataFrame, scale: int = 0) -> DataFrame:
    """ExponentialHistogram buckets per tool at an arbitrary ``scale``
    (pdata/pmetric/generated_exponentialhistogramdatapoint.go: Scale,
    Positive/Negative bucket ranges, ZeroCount).

    Output: (tool, sign, bucket_idx, n_points) — sign 'pos'/'neg' selects
    the Positive/Negative bucket list (index over \\|v\\|), 'zero' carries the
    ZeroCount (bucket_idx NULL). Boundary convention is the reference's
    lower-exclusive/upper-inclusive mapping: v = base^k lands in bucket
    k-1; see _exp_index_exprs for the exact-vs-float split by scale.
    """
    idx = F.expr(_exp_index_exprs(scale))
    sign = (
        F.when(F.col("dur_ms") > 0, F.lit("pos"))
        .when(F.col("dur_ms") < 0, F.lit("neg"))
        .otherwise(F.lit("zero"))
    )
    return (
        _spans(parsed)
        .groupBy(
            F.col("parsed_tool").alias("tool"),
            sign.alias("sign"),
            F.when(F.col("dur_ms") != 0, idx).alias("bucket_idx"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def span_red_metrics(
    parsed: DataFrame, bucket_seconds: int = BUCKET_SECONDS
) -> DataFrame:
    """RED metrics generated from spans (the spanmetrics-connector pattern:
    a connector that derives a metrics signal from the traces signal): per
    (tool, time bucket) call count, error count, error rate, total and max
    duration.
    """
    return (
        _spans(parsed)
        .groupBy(
            time_bucket(F.col("ts"), bucket_seconds).alias("bucket_start_epoch"),
            F.col("parsed_tool").alias("tool"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.count(F.when(F.col("status") == "ERROR", 1)).alias("n_errors"),
            F.round(
                F.count(F.when(F.col("status") == "ERROR", 1))
                / F.count(F.lit(1)),
                6,
            ).alias("error_rate"),
            F.sum("dur_ms").alias("total_dur_ms"),
            F.max("dur_ms").alias("max_dur_ms"),
        )
    )


def summary_quantiles(parsed: DataFrame, approx: bool | None = None) -> DataFrame:
    """Summary data points (pdata/pmetric/generated_summarydatapoint.go):
    count, sum, and quantile values per series (tool).

    Exact path (default): Spark's ``percentile`` computes the same linear
    interpolation as DuckDB's ``quantile_cont`` — (1-g)*a + g*b over the
    sorted values with IEEE doubles, so oracle parity is exact. The cost is
    a per-series sort: fine while series cardinality is tiny (|tools|), a
    single-reducer scale-killer for high-cardinality series.

    Approx path (``engine.approxQuantiles`` feature gate, or approx=True):
    ``percentile_approx`` — a mergeable sketch whose partial aggregates
    combine map-side, so no series ever needs a full sort; accuracy is
    bounded by the sketch size (10000 -> ~0.01% rank error). This is the
    10^12-row path; its oracle check is rows-only (the sketch is not
    bit-reproducible in DuckDB), with closeness to the exact path asserted
    in pytest instead.
    """
    if approx is None:
        from opentelemetry_collector_spark.plans.featuregate import GLOBAL

        approx = GLOBAL.is_enabled("engine.approxQuantiles")
    pct = "percentile_approx(dur_ms, {q}, 10000)" if approx else "percentile(dur_ms, {q})"
    spans = _spans(parsed)
    return spans.groupBy(F.col("parsed_tool").alias("tool")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("dur_ms").alias("sum_value"),
        F.expr(pct.format(q=0.5)).cast("double").alias("p50"),
        F.expr(pct.format(q=0.9)).cast("double").alias("p90"),
        F.expr(pct.format(q=0.99)).cast("double").alias("p99"),
    )


def histogram_exemplars(parsed: DataFrame) -> DataFrame:
    """Exemplars (pdata/pmetric/generated_exemplar.go): one representative
    measurement per (tool, explicit bucket), carrying its trace/span identity
    so a metric point links back to the trace that produced it. The exemplar
    is the bucket's max-duration span (ties broken by trace_id for
    determinism).
    """
    spans = _spans(parsed)
    bucket = F.when(
        F.col("dur_ms") <= HISTOGRAM_BOUNDS[0], F.lit(f"le_{HISTOGRAM_BOUNDS[0]}")
    )
    for lo, hi in zip(HISTOGRAM_BOUNDS, HISTOGRAM_BOUNDS[1:]):
        bucket = bucket.when(
            (F.col("dur_ms") > lo) & (F.col("dur_ms") <= hi), F.lit(f"le_{hi}")
        )
    bucket = bucket.otherwise(F.lit(f"gt_{HISTOGRAM_BOUNDS[-1]}"))
    w = Window.partitionBy("parsed_tool", "bucket").orderBy(
        F.col("dur_ms").desc(), F.col("trace_id").desc()
    )
    return (
        spans.withColumn("bucket", bucket)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("parsed_tool").alias("tool"),
            "bucket",
            F.col("trace_id").alias("exemplar_trace_id"),
            F.col("span_id").alias("exemplar_span_id"),
            F.col("dur_ms").alias("exemplar_dur_ms"),
        )
    )


# --- DuckDB oracle SQL builders (run over a `parsed` CTE) -------------------

GAUGE_LAST_ORACLE_BODY = """
SELECT tool, last_ts_epoch, last_value FROM (
    SELECT parsed_tool AS tool,
        cast(floor(epoch(ts)) AS bigint) AS last_ts_epoch,
        dur_ms AS last_value,
        row_number() OVER (PARTITION BY parsed_tool
            ORDER BY ts DESC, conv_id DESC, turn_idx DESC) AS rk
    FROM parsed WHERE trace_id IS NOT NULL
) q WHERE rk = 1
"""

SUM_CUMULATIVE_ORACLE_BODY = """
SELECT conv_id, parsed_tool AS tool, turn_idx,
    dur_ms AS delta_value,
    cast(sum(dur_ms) OVER (PARTITION BY conv_id, parsed_tool ORDER BY turn_idx
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_value
FROM parsed WHERE trace_id IS NOT NULL
"""

SUM_DELTA_ORACLE_BODY = """
, cum AS (
    SELECT conv_id, parsed_tool AS tool, turn_idx,
        cast(sum(dur_ms) OVER (PARTITION BY conv_id, parsed_tool
            ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cumulative_value
    FROM parsed WHERE trace_id IS NOT NULL
)
SELECT conv_id, tool, turn_idx, cumulative_value,
    CASE WHEN prev IS NULL THEN NULL
         WHEN cumulative_value < prev THEN cumulative_value
         ELSE cumulative_value - prev END AS delta_value
FROM (
    SELECT *, lag(cumulative_value) OVER (
        PARTITION BY conv_id, tool ORDER BY turn_idx) AS prev
    FROM cum
) q
"""


def histogram_oracle_body(bucket_seconds: int = BUCKET_SECONDS) -> str:
    bucket_cols = []
    lower = None
    for bound in HISTOGRAM_BOUNDS:
        cond = f"dur_ms <= {bound}"
        if lower is not None:
            cond += f" AND dur_ms > {lower}"
        bucket_cols.append(
            f"count(*) FILTER (WHERE {cond}) AS bucket_le_{bound}"
        )
        lower = bound
    bucket_cols.append(
        f"count(*) FILTER (WHERE dur_ms > {HISTOGRAM_BOUNDS[-1]}) "
        f"AS bucket_gt_{HISTOGRAM_BOUNDS[-1]}"
    )
    return f"""
SELECT
    cast(floor(epoch(ts)/{bucket_seconds})*{bucket_seconds} AS bigint) AS bucket_start_epoch,
    parsed_tool AS tool,
    count(*) AS n_points,
    cast(sum(dur_ms) AS BIGINT) AS sum_value,
    min(dur_ms) AS min_value,
    max(dur_ms) AS max_value,
    {', '.join(bucket_cols)}
FROM parsed WHERE trace_id IS NOT NULL
GROUP BY 1, 2
"""


def exp_histogram_oracle_body(scale: int = 0) -> str:
    """DuckDB twin of exp_histogram at ``scale`` — same index expression
    (dialect-shared), same sign/zero routing."""
    idx = _exp_index_exprs(scale)
    return f"""
SELECT tool, sign, bucket_idx, count(*) AS n_points FROM (
    SELECT parsed_tool AS tool,
        CASE WHEN dur_ms > 0 THEN 'pos'
             WHEN dur_ms < 0 THEN 'neg' ELSE 'zero' END AS sign,
        CASE WHEN dur_ms <> 0 THEN {idx} END AS bucket_idx
    FROM parsed WHERE trace_id IS NOT NULL
) q GROUP BY 1, 2, 3
"""


EXP_HISTOGRAM_ORACLE_BODY = exp_histogram_oracle_body(0)


SUMMARY_ORACLE_BODY = """
SELECT parsed_tool AS tool,
    count(*) AS n_points,
    cast(sum(dur_ms) AS BIGINT) AS sum_value,
    quantile_cont(dur_ms, 0.5) AS p50,
    quantile_cont(dur_ms, 0.9) AS p90,
    quantile_cont(dur_ms, 0.99) AS p99
FROM parsed WHERE trace_id IS NOT NULL
GROUP BY 1
"""


def exemplars_oracle_body() -> str:
    cases = [f"WHEN dur_ms <= {HISTOGRAM_BOUNDS[0]} THEN 'le_{HISTOGRAM_BOUNDS[0]}'"]
    for lo, hi in zip(HISTOGRAM_BOUNDS, HISTOGRAM_BOUNDS[1:]):
        cases.append(f"WHEN dur_ms > {lo} AND dur_ms <= {hi} THEN 'le_{hi}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE 'gt_{HISTOGRAM_BOUNDS[-1]}' END"
    return f"""
SELECT tool, bucket, exemplar_trace_id, exemplar_span_id, exemplar_dur_ms
FROM (
    SELECT parsed_tool AS tool,
        {case_sql} AS bucket,
        trace_id AS exemplar_trace_id,
        span_id AS exemplar_span_id,
        dur_ms AS exemplar_dur_ms,
        row_number() OVER (PARTITION BY parsed_tool, {case_sql}
            ORDER BY dur_ms DESC, trace_id DESC) AS rk
    FROM parsed WHERE trace_id IS NOT NULL
) q WHERE rk = 1
"""


def span_red_oracle_body(bucket_seconds: int = BUCKET_SECONDS) -> str:
    return f"""
SELECT
    cast(floor(epoch(ts)/{bucket_seconds})*{bucket_seconds} AS bigint) AS bucket_start_epoch,
    parsed_tool AS tool,
    count(*) AS n_calls,
    count(*) FILTER (WHERE status = 'ERROR') AS n_errors,
    round(cast(count(*) FILTER (WHERE status = 'ERROR') AS double) / count(*), 6) AS error_rate,
    cast(sum(dur_ms) AS BIGINT) AS total_dur_ms,
    max(dur_ms) AS max_dur_ms
FROM parsed WHERE trace_id IS NOT NULL
GROUP BY 1, 2
"""


def sum_delta_to_rate(parsed: DataFrame) -> DataFrame:
    """Delta Sum points -> per-second rate (the deltatorate processor
    pattern over pmetric Sum points; temporality semantics per
    pdata/pmetric/aggregation_temporality.go:12-38).

    Each span is a delta point (value = dur_ms) in its (conv_id, tool)
    stream; the conversion divides the delta by the wall-clock interval to
    the previous point of the same stream. First points (no interval) and
    zero-length intervals yield NULL — the processor drops those; kept as
    NULL so row counts stay auditable.

    One lag window over the stream key — same single shuffle as the other
    temporality conversions, aligned with the conv_id bucket layout.
    """
    w = Window.partitionBy("conv_id", "parsed_tool").orderBy("turn_idx")
    gap = (
        F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ).cast("long")
    return _spans(parsed).select(
        "conv_id",
        F.col("parsed_tool").alias("tool"),
        "turn_idx",
        F.col("dur_ms").alias("delta_value"),
        gap.alias("gap_s"),
        F.when(gap > 0, F.col("dur_ms") / gap).alias("rate_per_s"),
    )


SUM_RATE_ORACLE_BODY = """
SELECT conv_id, tool, turn_idx, delta_value, gap_s,
    CASE WHEN gap_s > 0 THEN delta_value / gap_s END AS rate_per_s
FROM (
    SELECT conv_id, parsed_tool AS tool, turn_idx,
        dur_ms AS delta_value,
        cast(floor(epoch(ts)) - floor(epoch(lag(ts) OVER (
            PARTITION BY conv_id, parsed_tool ORDER BY turn_idx)))
            AS bigint) AS gap_s
    FROM parsed WHERE trace_id IS NOT NULL
) q
"""


# --- staleness markers (DataPointFlags NoRecordedValue) ----------------------

# A stream silent longer than this (seconds) gets a marker. The value is
# deliberately fixture-scaled: the synthetic (conv_id, tool) streams tick
# days apart (median inter-point gap ~5 days at sf0.01), so ~7 days marks
# the sparse tail without flagging every point. A production deployment
# with seconds-cadence scrapes would configure this to minutes (the
# Prometheus default staleness window is 300 s) via the gap_s parameter.
STALE_GAP_S = 600_000


def staleness_markers(
    parsed: DataFrame, gap_s: int = STALE_GAP_S
) -> DataFrame:
    """Emit a synthetic staleness marker per stream gap — the
    NoRecordedValue DataPointFlags concept (functions/flags.py
    FLAG_NO_RECORDED_VALUE; reference pmetric number-data-point Flags
    accessors): when a (conv_id, tool) metric stream goes silent for more
    than ``gap_s`` seconds, downstream consumers need an explicit "series
    went stale" point at prev_ts + gap_s rather than silently
    interpolating across the hole (the Prometheus staleness-marker
    semantics the OTel flag exists to carry).

    One lag window on the standing (conv_id, tool) stream key — same
    single shuffle as the temporality conversions, exchange-free on the
    bucket(conv_id) layout.
    """
    from opentelemetry_collector_spark.functions.flags import (
        FLAG_NO_RECORDED_VALUE,
    )

    w = Window.partitionBy("conv_id", "parsed_tool").orderBy("turn_idx")
    cur = F.unix_timestamp("ts").cast("long")
    prev = F.lag(cur).over(w)
    df = _spans(parsed).select(
        "conv_id",
        F.col("parsed_tool").alias("tool"),
        "turn_idx",
        cur.alias("ts_epoch"),
        prev.alias("prev_ts_epoch"),
    )
    return df.filter(
        F.col("prev_ts_epoch").isNotNull()
        & ((F.col("ts_epoch") - F.col("prev_ts_epoch")) > gap_s)
    ).select(
        "conv_id",
        "tool",
        "turn_idx",
        (F.col("prev_ts_epoch") + gap_s).cast("long").alias(
            "marker_ts_epoch"
        ),
        (F.col("ts_epoch") - F.col("prev_ts_epoch")).cast("long").alias(
            "gap_s"
        ),
        F.lit(FLAG_NO_RECORDED_VALUE).alias("flags"),
    )


def staleness_oracle_body(gap_s: int = STALE_GAP_S) -> str:
    return f"""
SELECT conv_id, tool, turn_idx, marker_ts_epoch, gap_s, flags FROM (
    SELECT conv_id, parsed_tool AS tool, turn_idx,
        cast(lag(floor(epoch(ts))) OVER w + {gap_s} AS bigint)
            AS marker_ts_epoch,
        cast(floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w AS bigint)
            AS gap_s,
        1 AS flags
    FROM parsed WHERE trace_id IS NOT NULL
    WINDOW w AS (PARTITION BY conv_id, parsed_tool ORDER BY turn_idx)
) q WHERE gap_s > {gap_s}
"""
