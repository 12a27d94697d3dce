#!/usr/bin/env bash
# Package the engine and run it through spark-submit --py-files — the
# deployment shape the pipeline targets on a real cluster. Verified locally:
#
#   $ tools/package_and_submit.sh
#   ... processes 4 buckets, commits per-bucket lineage manifests ...
#
# On a cluster, replace --master with your cluster master / YARN / k8s.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/engine.zip
rm -f "$ZIP"
zip -qr "$ZIP" intelligent_log_analysis_anomaly_detection_tool_spark oracle

SPARK_SUBMIT=${SPARK_SUBMIT:-spark-submit}
command -v "$SPARK_SUBMIT" >/dev/null || SPARK_SUBMIT=/opt/spark/bin/spark-submit

exec "$SPARK_SUBMIT" \
  --master "${MASTER:-local[8]}" \
  --py-files "$ZIP" \
  jobs/run_pipeline.py \
  --synth "${SYNTH_CONVS:-24}" \
  --output "${OUT:-/tmp/submit_out}" \
  --buckets "${BUCKETS:-4}"
