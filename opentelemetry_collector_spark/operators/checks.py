"""Declarative data-quality checks — the admission-control stage a
100 TB ingest pipeline runs before letting a batch reach training
(public analogs: AWS Deequ's Check/AnalysisRunner, Great Expectations;
the collector-side cousin is config validation + the memory_limiter's
refuse-don't-corrupt stance, service/config.go:42-98).

Two layers:

* ``data_quality_metrics`` — ONE aggregate pass over the frame
  computing, per requested column: row count, non-null count, exact
  distinct count, and min/max (for integer/string columns). Everything
  lands in a single wide ``agg`` row that unpivots driver-side to one
  row per column — the scan is single-pass with map-side partial
  aggregation; the only cost knob is that multiple exact
  ``count_distinct`` columns expand the aggregate input by the number
  of audited columns (bounded by schema width, never by data scale).
  Exact distinct (not approx_count_distinct) keeps the numbers
  engine-portable — HLL sketches are implementation-defined, exact
  counts are not.
* ``quality_verdicts`` / ``quality_gate`` — evaluate declarative rules
  against those metrics: ``max_null_frac`` (null fraction ceiling,
  compared in exact integer cross-multiplication), ``min_distinct``
  (cardinality floor), ``min_value``/``max_value`` (string-compared
  bounds on the stringified min/max), ``not_empty`` (row-count floor
  via n >= 1). ``quality_gate`` is the processor position: it raises
  ``QualityGateError`` listing every failed (column, rule) instead of
  letting a malformed batch flow downstream — refuse, don't corrupt.

Min/max are emitted as STRINGS (exact for integer and string columns,
the only types the rules accept) so the unpivoted metric rows have one
uniform schema; float columns are rejected at rule-validation time
(their formatting is engine-specific — use integer-quantized columns,
the engine-wide discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RULE_KEYS = {"max_null_frac", "min_distinct", "min_value", "max_value",
             "not_empty"}
_MINMAX_TYPES = ("tinyint", "smallint", "int", "bigint", "string")


class QualityGateError(RuntimeError):
    """A quality rule failed; carries the per-(column, rule) failures."""

    def __init__(self, failures: list[dict]):
        self.failures = failures
        detail = "; ".join(
            f"{f['column']}.{f['rule']}: value={f['value']}"
            f" threshold={f['threshold']}" for f in failures
        )
        super().__init__(f"quality gate failed ({len(failures)}): {detail}")


def data_quality_metrics(
    df: DataFrame, columns: list[str] | None = None
) -> list[dict]:
    """One aggregate pass -> one metrics dict per audited column:
    {column, n, n_nonnull, n_distinct, min_value, max_value} with
    min/max stringified (None for unsupported types)."""
    cols = columns or df.columns
    types = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"__nd_{c}"))
        if types.get(c) in _MINMAX_TYPES:
            aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    out = []
    for c in cols:
        out.append({
            "column": c,
            "n": row["__n"],
            "n_nonnull": row[f"__nn_{c}"],
            "n_distinct": row[f"__nd_{c}"],
            "min_value": row.get(f"__min_{c}"),
            "max_value": row.get(f"__max_{c}"),
        })
    return out


def validate_rules(df: DataFrame, rules: dict[str, dict]) -> None:
    types = dict(df.dtypes)
    for col, spec in rules.items():
        if col not in types:
            raise ValueError(f"quality rule on unknown column {col!r}")
        unknown = set(spec) - RULE_KEYS
        if unknown:
            raise ValueError(
                f"unknown quality rule(s) {sorted(unknown)} on {col!r}; "
                f"supported: {sorted(RULE_KEYS)}"
            )
        if (("min_value" in spec or "max_value" in spec)
                and types[col] not in _MINMAX_TYPES):
            raise ValueError(
                f"min_value/max_value need an integer or string column; "
                f"{col!r} is {types[col]} (quantize floats to integers "
                "first — engine-exactness discipline)"
            )


def quality_verdicts(
    df: DataFrame, rules: dict[str, dict]
) -> list[dict]:
    """Evaluate rules -> one verdict dict per (column, rule):
    {column, rule, threshold, value, ok}. Null fractions compare by
    integer cross-multiplication (null_count * 1000 <= n * max_milli) —
    no float division anywhere."""
    validate_rules(df, rules)
    metrics = {m["column"]: m
               for m in data_quality_metrics(df, list(rules))}
    verdicts = []
    for col, spec in rules.items():
        m = metrics[col]
        n, nn = m["n"], m["n_nonnull"]
        for rule, threshold in spec.items():
            if rule == "max_null_frac":
                # threshold is a fraction; compare in exact integers at
                # milli precision: nulls*1000 <= n*milli
                milli = int(round(float(threshold) * 1000))
                value = n - nn
                ok = value * 1000 <= n * milli
            elif rule == "min_distinct":
                value = m["n_distinct"]
                ok = value >= int(threshold)
            elif rule == "not_empty":
                # truthy threshold demands >=1 row; falsy disables the rule
                value = n
                ok = (n >= 1) if bool(threshold) else True
            elif rule == "min_value":
                value = m["min_value"]
                ok = value is not None and _cmp_ge(
                    value, threshold, dict(df.dtypes)[col])
            elif rule == "max_value":
                value = m["max_value"]
                ok = value is not None and _cmp_ge(
                    threshold, value, dict(df.dtypes)[col])
            verdicts.append({
                "column": col, "rule": rule,
                "threshold": str(threshold), "value": str(value),
                "ok": bool(ok),
            })
    return verdicts


def _cmp_ge(a, b, dtype: str) -> bool:
    """a >= b under the COLUMN's type (int compare for integer columns,
    lexical for strings) — stringified metric values compare exactly."""
    if dtype != "string":
        return int(a) >= int(b)
    return str(a) >= str(b)


def quality_gate(
    spark: SparkSession,
    df: DataFrame,
    rules: dict[str, dict],
) -> DataFrame:
    """Processor position: pass the frame through untouched iff every
    rule holds; raise QualityGateError (refuse, don't corrupt) with the
    full failure list otherwise."""
    failures = [v for v in quality_verdicts(df, rules) if not v["ok"]]
    if failures:
        raise QualityGateError(failures)
    return df
