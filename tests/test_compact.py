"""Sink compaction: file count drops, rows and partition values conserved."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.compact import compact_sinks
from opentelemetry_collector_spark.operators.enrich import enrich
from opentelemetry_collector_spark.operators.parse import parse_turns
from opentelemetry_collector_spark.operators.route import route, write_sinks
from opentelemetry_collector_spark.sources.transcripts import events_to_transcripts
from tests.conftest import SF_SMOKE


def test_compaction_conserves_and_shrinks(spark, tmp_path):
    routed = route(enrich(parse_turns(
        events_to_transcripts(spark, SF_SMOKE)), spark))
    base = str(tmp_path / "sinks")
    # fragment deliberately: 8 tasks x sinks => many small files
    write_sinks(routed.repartition(8), base, max_records_per_file=8192)

    before = spark.read.parquet(base)
    n = before.count()
    sink_counts_before = {
        (r.sink): r["count"] for r in before.groupBy("sink").count().collect()
    }

    stats = compact_sinks(spark, base)
    assert stats["rows"] == n
    assert stats["files_after"] < stats["files_before"]

    after = spark.read.parquet(base)
    assert after.count() == n
    sink_counts_after = {
        (r.sink): r["count"] for r in after.groupBy("sink").count().collect()
    }
    assert sink_counts_after == sink_counts_before
    # bin-packed: at most ceil(rows/cap) files per sink partition (+1 slack
    # for the empty-split edge)
    import collections
    from urllib.parse import unquote

    # sink values contain '/', which partition dirs URL-encode (and file
    # URIs encode the '%' again) — unquote twice to recover the value
    per_sink_files = collections.Counter(
        unquote(unquote(f.split("/sink=")[1].split("/")[0]))
        for f in after.inputFiles()
    )
    for sink, nfiles in per_sink_files.items():
        cap_files = -(-sink_counts_after[sink] // 8192)
        assert nfiles <= cap_files + 1
