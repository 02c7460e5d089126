"""Transform/filter processor — the telemetry-mutation category
(docs/processing.md:33-60) as declarative statements compiled to Catalyst.

The reference's processing model defines "telemetry mutation" processors that
set/delete/hash fields and attributes, and filtering processors that drop
records, all driven by YAML config (the attributes/filter/transform processor
family whose semantic categories core documents in docs/processing.md; the
core scaffold they plug into is processorhelper, processor/processorhelper/
logs.go:40-82). Here each statement is a dict compiled into native Column
expressions — the whole statement list fuses into the surrounding
WholeStageCodegen projection, so a 20-statement transform costs one pass and
no Python.

Statement forms (list order = execution order, like OTTL statement lists):

  {"op": "set",    "field": F, "expr": SQL, "where": SQL?}   # set field
  {"op": "hash",   "field": F, "where": SQL?}                # sha256 mask
  {"op": "set_attribute",    "key": K, "expr": SQL, "where": SQL?}
  {"op": "delete_attribute", "key": K, "where": SQL?}
  {"op": "set_flag",   "field": F, "mask": int, "where": SQL?}  # flags |= m
  {"op": "clear_flag", "field": F, "mask": int, "where": SQL?}  # flags &= ~m
  {"op": "drop", "where": SQL}                               # filter out
  {"op": "keep", "where": SQL}                               # filter in

Flag statements wrap functions/flags.py (LogRecordFlags bit ops,
pdata/plog/log_record_flags.go): set_flag ORs the mask in, clear_flag ANDs
it out, both guarded like every other statement.

`expr`/`where` are Spark-SQL expressions (the engine's expression language —
the OTTL analog), evaluated JVM-side via F.expr. Attribute statements rewrite
the canonical sorted-key ``attributes_json`` column (pcommon.Map upsert
semantics, pdata/pcommon/map.go:109-127): upsert keeps key order sorted,
delete removes the key. Values that are canonical JSON numbers
(functions/values.JSON_NUMBER_RE — integers, negatives, decimals, no
leading zeros) serialize unquoted, everything else is quoted — the same
rule as the parse stage's serializer.

Scale note: every op is a narrow projection/filter — no shuffle, no UDF.
Consecutive attribute statements fuse into one parse -> map-ops -> serialize
pipeline (the compiler flushes the running map only when a statement could
read the serialized column), so an N-statement attribute rewrite costs one
from_json and one serialize, not N. The attributes rebuild uses
map_entries/array_sort/transform higher-order
functions, which are interpreted per row (not codegen'd) — fine off the hot
path; hot-path pipelines should set attributes at parse time instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ATTR_MAP_TYPE = "map<string,string>"


def _attrs_map() -> Column:
    """attributes_json -> map<string,string> (values lose their number/quote
    distinction here; _serialize restores it by the digits convention)."""
    return F.from_json(F.col("attributes_json"), _ATTR_MAP_TYPE)


def _serialize(map_col_name: str) -> Column:
    """named map column -> canonical sorted-key JSON via the SAME scalar
    rule as the parse stage (functions/values._json_scalar) — sharing the
    Column-side implementation (not an embedded SQL regex literal, whose
    backslash handling flips with spark.sql.parser.escapedStringLiterals)
    guarantees one attribute statement can never change the canonical form
    of values it didn't touch."""
    from opentelemetry_collector_spark.functions.values import _json_scalar

    parts = F.transform(
        F.array_sort(F.map_entries(F.col(map_col_name))),
        lambda x: F.concat(
            F.lit('"'), x.key, F.lit('": '), _json_scalar(x.value)
        ),
    )
    return F.concat(F.lit("{"), F.array_join(parts, ", "), F.lit("}"))


def _guard(new: Column, old: Column, where: "str | Column | None") -> Column:
    if where is None:
        return new
    cond = F.expr(where) if isinstance(where, str) else where
    return F.when(cond, new).otherwise(old)




def compile_statements(
    statements: list[dict],
) -> Callable[[DataFrame], DataFrame]:
    """Validate a statement list and return a DataFrame transform applying
    the statements in order. Raises ValueError on malformed statements
    (config-validation parity, service/config.go:42-98)."""
    for i, st in enumerate(statements):
        op = st.get("op")
        if op in ("set",):
            missing = {"field", "expr"} - st.keys()
        elif op == "hash":
            missing = {"field"} - st.keys()
        elif op == "set_attribute":
            missing = {"key", "expr"} - st.keys()
        elif op == "delete_attribute":
            missing = {"key"} - st.keys()
        elif op in ("set_flag", "clear_flag"):
            missing = {"field", "mask"} - st.keys()
            if not missing and not isinstance(st["mask"], int):
                raise ValueError(f"statement {i} ({op}): mask must be int")
        elif op == "redact":
            missing = {"field", "pattern", "replacement"} - st.keys()
        elif op in ("drop", "keep"):
            missing = {"where"} - st.keys()
        else:
            raise ValueError(f"statement {i}: unknown op {op!r}")
        if missing:
            raise ValueError(f"statement {i} ({op}): missing {sorted(missing)}")

    # --- where-predicate hoisting (plan-shape, not semantics) -------------
    # Catalyst's CollapseProject merges the per-statement projections one
    # pair at a time; each merge references upstream attributes only once,
    # so it inlines them — and a guard like "severity_number >= 17" ends
    # up re-evaluating the parse stage's regexp_extract at every reference
    # (measured: 83 regex copies / 5.6s for the 9-statement demo at sf0.1,
    # vs 8 copies / 0.7s hoisted). Multi-references from a SINGLE
    # projection are NOT inlined (the rule's non-cheap multi-use check),
    # so computing each distinct predicate once as a temp boolean column
    # up front collapses the cascade. Ordering semantics are preserved: a
    # predicate is hoisted only when no EARLIER statement modified any
    # field it mentions (conservative word-match; a predicate reading a
    # modified field keeps evaluating inline against the current state).
    import re as _re

    hoist: dict[str, str] = {}  # where-string -> temp column name
    use_hoisted: list[str | None] = []
    modified: set[str] = set()
    for st in statements:
        w = st.get("where")
        if w is None or any(
            _re.search(rf"\b{_re.escape(f)}\b", w) for f in modified
        ):
            use_hoisted.append(None)
        else:
            use_hoisted.append(hoist.setdefault(w, f"__w{len(hoist)}"))
        op = st["op"]
        if op in ("set", "hash", "set_flag", "clear_flag", "redact"):
            modified.add(st["field"])
        elif op in ("set_attribute", "delete_attribute"):
            modified.add("attributes_json")

    def apply(df: DataFrame) -> DataFrame:
        # Consecutive attribute statements fuse into ONE
        # parse -> map-ops -> serialize pipeline: `pending` holds the
        # running map Column; it is flushed back to attributes_json before
        # any statement that could read the serialized form (every
        # non-attribute statement, and attribute guards that mention
        # attributes_json). parse(serialize(m)) == m for map<string,string>
        # (the digits convention only drops quotes, from_json restores the
        # same string), so fusing is semantics-preserving.
        if hoist:
            df = df.select(
                "*", *[F.expr(w).alias(n) for w, n in hoist.items()]
            )
        pending: Column | None = None

        def cur_map() -> Column:
            return pending if pending is not None else _attrs_map()

        def flush(d: DataFrame) -> DataFrame:
            nonlocal pending
            if pending is None:
                return d
            d = d.withColumn("__attrs_m", pending).withColumn(
                "attributes_json", _serialize("__attrs_m")
            ).drop("__attrs_m")
            pending = None
            return d

        for i, st in enumerate(statements):
            op = st["op"]
            where: str | Column | None = st.get("where")
            if use_hoisted[i] is not None:
                where = F.col(use_hoisted[i])
            if op in ("set_attribute", "delete_attribute"):
                # flush if this statement can READ the serialized column —
                # through its guard or its value expression (an expr like
                # "attributes_json" must see every earlier fused statement)
                reads_serialized = any(
                    "attributes_json" in (st.get(k) or "")
                    for k in ("where", "expr")
                )
                if reads_serialized:
                    df = flush(df)
                base = cur_map()
                if op == "set_attribute":
                    new = F.map_concat(
                        F.map_filter(
                            base, lambda k, _v: k != F.lit(st["key"])
                        ),
                        F.create_map(
                            F.lit(st["key"]),
                            F.expr(st["expr"]).cast("string"),
                        ),
                    )
                else:
                    new = F.map_filter(
                        base, lambda k, _v: k != F.lit(st["key"])
                    )
                pending = _guard(new, base, where)
                continue
            df = flush(df)
            if op == "set":
                df = df.withColumn(
                    st["field"],
                    _guard(F.expr(st["expr"]), F.col(st["field"]), where),
                )
            elif op == "hash":
                df = df.withColumn(
                    st["field"],
                    _guard(
                        F.sha2(F.col(st["field"]).cast("string"), 256),
                        F.col(st["field"]),
                        where,
                    ),
                )
            elif op in ("set_flag", "clear_flag"):
                from opentelemetry_collector_spark.functions.flags import (
                    with_flag,
                    without_flag,
                )

                old = F.col(st["field"])
                if where is None:
                    fn = with_flag if op == "set_flag" else without_flag
                    new = fn(old, st["mask"])
                elif op == "set_flag":
                    # single-reference form of CASE WHEN cond THEN f|m
                    # ELSE f END: guarded flag CHAINS otherwise duplicate
                    # `old` 2x per level, and CollapseProject inlines the
                    # single-use copies — exponential expression growth
                    # (same cascade as the hoisting note above)
                    cond = F.expr(where) if isinstance(where, str) else where
                    new = old.bitwiseOR(
                        F.when(cond, F.lit(st["mask"])).otherwise(F.lit(0))
                    )
                else:
                    cond = F.expr(where) if isinstance(where, str) else where
                    new = old.bitwiseAND(
                        F.when(cond, F.lit(~st["mask"])).otherwise(F.lit(-1))
                    )
                df = df.withColumn(st["field"], new)
            elif op == "redact":
                # PII-masking pattern (redaction-processor analog): replace
                # every regex match in the field — regexp_replace is global
                # in Spark; oracles must pass the 'g' flag in DuckDB.
                df = df.withColumn(
                    st["field"],
                    _guard(
                        F.regexp_replace(
                            F.col(st["field"]),
                            st["pattern"],
                            st["replacement"],
                        ),
                        F.col(st["field"]),
                        where,
                    ),
                )
            elif op == "drop":
                cond = F.expr(where) if isinstance(where, str) else where
                df = df.filter(~F.coalesce(cond, F.lit(False)))
            elif op == "keep":
                cond = F.expr(where) if isinstance(where, str) else where
                df = df.filter(F.coalesce(cond, F.lit(False)))
        df = flush(df)
        return df.drop(*hoist.values()) if hoist else df

    return apply


def transform_processor_factory(spark, df: DataFrame, cfg: dict) -> DataFrame:
    """Service-builder factory: cfg = {"statements": [...]}."""
    return compile_statements(cfg.get("statements", []))(df)
