#!/usr/bin/env bash
# Deployment-shape demo (north rule: "run via spark-submit --py-files on a
# multi-executor cluster"): package the engine as a zip, submit the
# checkpointed pipeline to a multi-executor master. Verified working in this
# environment with master local-cluster[2,4,2048] (2 executor JVMs x 4 cores).
#
#   ./scripts/spark_submit_demo.sh [master] [source_sf_dir] [output_dir]
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${1:-local-cluster[2,4,2048]}"
SOURCE="${2:-/root/testdata/sf0.001}"
OUTPUT="${3:-/tmp/otelcol_submit_out}"
ZIP=/tmp/otelcol_spark.zip

python - <<PY
import zipfile, os
with zipfile.ZipFile("$ZIP", "w") as z:
    for root, dirs, files in os.walk("opentelemetry_collector_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
PY

cat > /tmp/otelcol_submit_job.py <<PY
import sys
from opentelemetry_collector_spark.__main__ import main
sys.exit(main(sys.argv[1:]))
PY

rm -rf "$OUTPUT"
exec spark-submit --master "$MASTER" --py-files "$ZIP" \
    /tmp/otelcol_submit_job.py \
    --source "$SOURCE" --output "$OUTPUT" --n-buckets 8 --shuffle-partitions 8
