"""Incremental file-ingest source (sources/incremental.py): new-files-only
ticks, write-then-commit crash recovery, ledger durability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.incremental import IncrementalSource


def _write_batch(spark, path, start, n):
    (
        spark.range(start, start + n)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


@pytest.fixture
def dirs(tmp_path):
    return str(tmp_path / "data"), str(tmp_path / "ledger"), str(tmp_path / "out")


def test_ticks_see_only_new_files(spark, dirs):
    data, ledger, out = dirs
    src = IncrementalSource(spark, data, ledger)

    _write_batch(spark, data, 0, 100)
    seen = []
    r1 = src.process_new(lambda df: seen.append(df.count()))
    assert r1["n_rows"] == 100 and r1["n_files"] >= 1

    # no new data -> empty tick, action not invoked
    r2 = src.process_new(lambda df: seen.append(df.count()))
    assert r2["n_files"] == 0 and len(seen) == 1

    _write_batch(spark, data, 100, 50)
    r3 = src.process_new(lambda df: seen.append(df.count()))
    assert r3["n_rows"] == 50, "second tick must read only the new files"
    assert seen == [100, 50]


def test_crash_before_commit_reprocesses(spark, dirs):
    data, ledger, _ = dirs
    src = IncrementalSource(spark, data, ledger)
    _write_batch(spark, data, 0, 10)

    def boom(df):
        raise RuntimeError("injected crash between read and commit")

    with pytest.raises(RuntimeError):
        src.process_new(boom)
    # nothing committed -> the same files arrive again (at-least-once input;
    # idempotent writes make it exactly-once output)
    r = src.process_new(lambda df: None)
    assert r["n_rows"] == 10


def test_ledger_records_lineage(spark, dirs):
    data, ledger, _ = dirs
    src = IncrementalSource(spark, data, ledger)
    _write_batch(spark, data, 0, 5)
    src.process_new(lambda df: None, run_id="tick-1")
    _write_batch(spark, data, 5, 5)
    src.process_new(lambda df: None, run_id="tick-2")

    led = spark.read.parquet(ledger)
    assert set(r.run_id for r in led.select("run_id").distinct().collect()) == {
        "tick-1",
        "tick-2",
    }
    assert led.filter(F.col("file_size") <= 0).count() == 0
    # every data file is committed exactly once
    assert led.groupBy("file_path").count().filter("count > 1").count() == 0


def test_end_to_end_with_pipeline_write(spark, dirs, tmp_path):
    """Tick -> parse -> idempotent sink write: re-running a crashed tick
    does not duplicate output rows."""
    from opentelemetry_collector_spark.sources.transcripts import (
        events_to_transcripts,
    )
    from tests.conftest import SF_SMOKE

    data, ledger, out = dirs
    # seed: materialize sf0.001 transcripts as the incoming file batch
    events_to_transcripts(spark, SF_SMOKE).coalesce(1).write.mode(
        "append"
    ).parquet(data)
    src = IncrementalSource(spark, data, ledger)

    def write_out(df):
        df.write.mode("overwrite").parquet(out)  # idempotent overwrite

    r = src.process_new(write_out)
    n = spark.read.parquet(out).count()
    assert n == r["n_rows"] > 0
    # replayed tick (simulating crash-before-commit re-run) leaves output stable
    write_out(spark.read.parquet(data))
    assert spark.read.parquet(out).count() == n
