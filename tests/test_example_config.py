"""The shipped example config resolves, validates, and runs end-to-end
(reference examples/ parity: a user can start from the YAML alone)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.config import ServiceConfig
from opentelemetry_collector_spark.plans.service import run_service
from tests.conftest import SF_SMOKE

EXAMPLE = str(
    Path(__file__).resolve().parent.parent / "examples" / "transcripts_pipeline.yaml"
)


def test_example_config_runs_end_to_end(spark, tmp_path):
    cfg = ServiceConfig.from_sources(
        EXAMPLE, env={"DATA_DIR": SF_SMOKE, "OUT_DIR": str(tmp_path)}
    )
    out = run_service(spark, cfg)["logs"]

    # the transform dropped system turns and masked conv_id
    assert out.filter("role = 'system'").count() == 0
    assert out.filter(F.length("conv_id") != 64).count() == 0  # sha256 hex
    # all three exporters wrote
    assert (tmp_path / "sinks").exists()
    assert (tmp_path / "metrics" / "sink_counts").exists()
    assert (tmp_path / "dead_letter").exists()
    counts = spark.read.parquet(str(tmp_path / "metrics" / "sink_counts"))
    ok_rows = out.filter("error_reason IS NULL").count()
    assert counts.agg(F.sum("n_rows")).collect()[0][0] == ok_rows > 0


EXAMPLE_SAMPLED = str(
    Path(__file__).resolve().parent.parent / "examples" / "sampled_pipeline.yaml"
)


def test_sampled_example_via_cli_config_mode(tmp_path):
    """`python -m opentelemetry_collector_spark --config <yaml>` is the
    collector.Run parity path: resolve config from the env, build the
    graph, run it (subprocess because config mode owns its session)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, DATA_DIR=SF_SMOKE, OUT_DIR=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-m", "opentelemetry_collector_spark",
         "--config", EXAMPLE_SAMPLED,
         "--master", "local[4]", "--shuffle-partitions", "4"],
        capture_output=True, text=True, timeout=240, env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["mode"] == "config"
    assert report["pipelines"]["sampled"] > 0
    assert (tmp_path / "log_dedup").exists()


EXAMPLE_CURATION = str(
    Path(__file__).resolve().parent.parent / "examples" / "curation_pipeline.yaml"
)


def test_curation_example_via_cli_config_mode(tmp_path):
    """The corpus-curation pass runs end-to-end from a collector-style
    --config YAML (VERDICT r02 task 8): documents receiver -> dedup_exact ->
    dedup_minhash -> quality_filter -> parquet exporter."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, DATA_DIR=SF_SMOKE, OUT_DIR=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-m", "opentelemetry_collector_spark",
         "--config", EXAMPLE_CURATION,
         "--master", "local[4]", "--shuffle-partitions", "4"],
        capture_output=True, text=True, timeout=240, env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["mode"] == "config"
    n_curated = report["pipelines"]["curation"]
    assert n_curated > 0
    # the pass actually filtered something, and wrote what it kept
    import pyarrow.parquet as pq

    n_in = pq.read_table(f"{SF_SMOKE}/documents.parquet").num_rows
    curated_files = list((tmp_path / "curated").rglob("*.parquet"))
    assert curated_files
    n_out = sum(pq.read_table(str(f)).num_rows for f in curated_files)
    assert 0 < n_out == n_curated < n_in
    # second pipeline: normalize -> gopher_filter -> mix over the same
    # receiver (training-mix construction)
    n_mixed = report["pipelines"]["mixing"]
    mixed_files = list((tmp_path / "mixed").rglob("*.parquet"))
    assert mixed_files
    n_mixed_out = sum(pq.read_table(str(f)).num_rows for f in mixed_files)
    assert 0 < n_mixed_out == n_mixed < n_in
    # third pipeline: gopher_filter -> priority_sample (fixed-size
    # weighted selection) — exactly k docs survive
    n_selected = report["pipelines"]["selection"]
    selected_files = list((tmp_path / "selected").rglob("*.parquet"))
    assert selected_files
    n_sel_out = sum(pq.read_table(str(f)).num_rows for f in selected_files)
    assert n_sel_out == n_selected == 50


def test_cli_requires_source_output_without_config():
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "opentelemetry_collector_spark"],
        capture_output=True, text=True, timeout=60,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode != 0
    assert "--source and --output are required" in proc.stderr
