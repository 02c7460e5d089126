"""Property-based tests (hypothesis) for the pure-Python control-plane
pieces — fast, Spark-free invariants."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_spark.plans.config import deep_merge, expand_vars
from opentelemetry_collector_spark.plans.retry import RetryConfig, with_retry
from opentelemetry_collector_spark.severity import (
    SEVERITY_NUMBER,
    SEVERITY_TEXT,
    severity_case_sql,
)

ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_",
    min_size=1, max_size=8,
)


def test_severity_ladder_is_bijective_25_levels():
    assert len(SEVERITY_NUMBER) == 24  # + Unspecified=0 => 25 levels
    assert sorted(SEVERITY_NUMBER.values()) == list(range(1, 25))
    for name, num in SEVERITY_NUMBER.items():
        assert SEVERITY_TEXT[num] == name
    # generated CASE mentions every token exactly once
    sql = severity_case_sql("x")
    for name in SEVERITY_NUMBER:
        assert f"WHEN '{name}'" in sql


@given(st.dictionaries(ident, st.integers(), max_size=5),
       st.dictionaries(ident, st.integers(), max_size=5))
def test_deep_merge_right_biased(a, b):
    m = deep_merge(a, b)
    for k, v in b.items():
        assert m[k] == v
    for k in a:
        if k not in b:
            assert m[k] == a[k]


@given(st.recursive(
    st.one_of(st.integers(), st.booleans(), ident),
    lambda c: st.one_of(st.lists(c, max_size=3),
                        st.dictionaries(ident, c, max_size=3)),
    max_leaves=10,
))
def test_expand_vars_no_refs_is_identity(value):
    # values containing no ${...} refs pass through unchanged
    assert expand_vars(value, env={}) == value


@given(ident, ident)
def test_expand_vars_substitutes(name, val):
    assert expand_vars(f"a ${{{name}}} b", env={name: val}) == f"a {val} b"
    assert expand_vars(f"${{env:{name}}}", env={name: val}) == val


@given(st.floats(0.01, 2.0), st.floats(1.0, 3.0), st.integers(1, 10))
@settings(max_examples=25, deadline=None)
def test_retry_sleep_sequence_is_capped_and_monotone(initial, mult, n_fail):
    sleeps = []
    cfg = RetryConfig(initial_interval_s=initial, multiplier=mult,
                      max_interval_s=initial * 4, max_elapsed_s=1e9)
    clock = {"t": 0.0}

    def fake_sleep(s):
        sleeps.append(s)
        clock["t"] += s

    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] <= n_fail:
            raise OSError("x")
        return "ok"

    assert with_retry(fn, cfg, sleep=fake_sleep, clock=lambda: clock["t"]) == "ok"
    assert len(sleeps) == n_fail
    for i, s in enumerate(sleeps):
        assert s <= cfg.max_interval_s + 1e-9
        if i > 0:
            assert s >= sleeps[i - 1] - 1e-9  # non-decreasing backoff


_attr_key = st.text(alphabet="abcdefghijklmnop_", min_size=1, max_size=6)
_sql_str = st.text(alphabet="abcdefghijklmnop 0123456789", max_size=8)


@st.composite
def _statements(draw):
    ops = []
    for _ in range(draw(st.integers(0, 4))):
        kind = draw(st.sampled_from(
            ["set_attribute", "delete_attribute", "hash", "set"]
        ))
        if kind == "set_attribute":
            ops.append({"op": kind, "key": draw(_attr_key),
                        "expr": f"'{draw(_sql_str)}'"})
        elif kind == "delete_attribute":
            ops.append({"op": kind, "key": draw(_attr_key)})
        elif kind == "hash":
            ops.append({"op": kind, "field": "role"})
        else:
            ops.append({"op": kind, "field": "body", "expr": "upper(body)"})
    return ops


@given(_statements())
def test_transform_statements_always_compile(statements):
    """Any well-formed statement list compiles (validation is total on the
    grammar); compile is pure — no DataFrame needed."""
    from opentelemetry_collector_spark.operators.transform import (
        compile_statements,
    )

    fn = compile_statements(statements)
    assert callable(fn)


def test_transform_mutations_preserve_rows_and_canonical_json(spark):
    """Non-filter statements never change row count, and the rewritten
    attributes_json stays valid sorted-key JSON (pcommon.Map canonical
    form survives arbitrary upsert/delete sequences)."""
    from opentelemetry_collector_spark.operators.parse import parse_turns
    from opentelemetry_collector_spark.operators.transform import (
        compile_statements,
    )
    from opentelemetry_collector_spark.sources.transcripts import (
        events_to_transcripts,
    )
    from tests.conftest import SF_SMOKE

    df = parse_turns(events_to_transcripts(spark, SF_SMOKE))
    out = compile_statements(
        [
            {"op": "set_attribute", "key": "zz", "expr": "'9'"},
            {"op": "set_attribute", "key": "aa", "expr": "'first'"},
            {"op": "delete_attribute", "key": "tool"},
            {"op": "set_attribute", "key": "mm", "expr": "'42'"},
            {"op": "hash", "field": "conv_id"},
        ]
    )(df)
    assert out.count() == df.count()
    for r in out.select("attributes_json").distinct().collect():
        obj = json.loads(r.attributes_json)
        assert list(obj) == sorted(obj)
        assert "tool" not in obj
        assert obj["aa"] == "first" and obj["zz"] == 9 and obj["mm"] == 42


@given(
    st.integers(1, 10**9),
    st.dictionaries(ident, st.integers(1, 10**8), max_size=8),
    st.integers(1, 256),
)
@settings(max_examples=100, deadline=None)
def test_plan_salts_invariants(total, heavy, partitions):
    """Salt factors: only above-target keys get one; every factor is in
    (1, overprovision*partitions]; larger keys never get smaller factors."""
    from opentelemetry_collector_spark.operators.skew import plan_salts

    salts = plan_salts(total, heavy, partitions)
    target = max(1, total // partitions)
    for k, f in salts.items():
        assert heavy[k] > target
        assert 1 < f <= 4 * partitions
    for k, n in heavy.items():
        if n <= target:
            assert k not in salts
    ranked = sorted(salts, key=lambda k: heavy[k])
    for a, b in zip(ranked, ranked[1:]):
        assert salts[a] <= salts[b]


def test_attributes_json_is_valid_sorted_json(spark):
    """Every attributes_json produced by the parse stage parses as JSON with
    keys in sorted order (canonical Map serialization)."""
    from opentelemetry_collector_spark.operators.parse import parse_turns
    from opentelemetry_collector_spark.sources.transcripts import (
        events_to_transcripts,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        parse_turns(events_to_transcripts(spark, SF_SMOKE))
        .select("attributes_json").distinct().collect()
    )
    assert rows
    for r in rows:
        obj = json.loads(r.attributes_json)
        assert list(obj) == sorted(obj)


def test_milli_nat_quantization_cross_engine_grid(spark):
    """doc_unigram_ll's one float step — round(ln(c/N)*1000) -> bigint —
    must be bit-identical in Spark and DuckDB for every (count, total)
    pair, or its order-independent-integer-sum parity argument collapses.
    Exhaustive small grid + a spread of larger magnitudes."""
    import duckdb

    pairs = [(c, n) for n in range(1, 60) for c in range(1, n + 1)]
    pairs += [(c, n) for n in (10**3, 10**6, 10**9)
              for c in (1, 2, 3, 7, n // 3, n // 2, n - 1, n)]
    df = spark.createDataFrame(pairs, "c long, n long")
    got = {
        (r.c, r.n): r.q
        for r in df.selectExpr(
            "c", "n",
            "cast(round(ln(cast(c AS double) / cast(n AS double)) * 1000)"
            " AS bigint) AS q",
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE p (c BIGINT, n BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    want = {
        (c, n): q
        for c, n, q in con.sql(
            "SELECT c, n, cast(round(ln(cast(c AS double) / cast(n AS double))"
            " * 1000) AS bigint) FROM p"
        ).fetchall()
    }
    assert got == want
