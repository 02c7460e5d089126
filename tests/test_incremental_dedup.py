"""Cross-tick fingerprint-ledger dedup: in-batch collapse, cross-tick
anti-join, crash-retry determinism, double-commit idempotence, and global
first-seen-wins conservation."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.operators.incremental_dedup import (
    IncrementalDeduper,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def deduper(spark, tmp_path):
    return IncrementalDeduper(spark, str(tmp_path / "fp_ledger"))


def test_in_batch_dups_collapse_to_min_doc_id(spark, deduper):
    out = deduper.dedup(
        _docs(spark, [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa")])
    )
    assert {r.doc_id for r in out.collect()} == {1, 2}


def test_cross_tick_dedup_and_conservation(spark, deduper):
    t1 = _docs(spark, [(1, "aa"), (2, "bb")])
    a1 = deduper.dedup(t1)
    deduper.commit(a1, "t1")
    # tick 2 repeats "aa" (different doc_id) and adds "cc"
    t2 = _docs(spark, [(10, "aa"), (11, "cc"), (12, "cc")])
    a2 = deduper.dedup(t2)
    assert {r.doc_id for r in a2.collect()} == {11}
    deduper.commit(a2, "t2")
    # accepted across ticks == distinct texts, first-seen wins, no fp dups
    led = deduper.seen().collect()
    assert len({r.fp for r in led}) == len(led)
    assert sorted(r.doc_id for r in led) == [1, 2, 11]
    assert deduper.metrics() == {"accepted_docs": 3, "ticks": 2}


def test_crash_retry_is_deterministic(spark, deduper):
    t1 = _docs(spark, [(1, "aa"), (2, "bb")])
    deduper.commit(deduper.dedup(t1), "t1")
    t2 = _docs(spark, [(10, "aa"), (11, "cc")])
    # "crash" after dedup, before commit: recompute gives the same set
    first = {r.doc_id for r in deduper.dedup(t2).collect()}
    retry = {r.doc_id for r in deduper.dedup(t2).collect()}
    assert first == retry == {11}


def test_double_commit_does_not_duplicate(spark, deduper):
    t1 = _docs(spark, [(1, "aa"), (2, "bb")])
    a1 = deduper.dedup(t1)
    deduper.commit(a1, "t1")
    deduper.commit(a1, "t1")  # retried tick: same partition overwritten
    led = deduper.seen().collect()
    assert len(led) == 2
    assert deduper.metrics() == {"accepted_docs": 2, "ticks": 1}
