#!/usr/bin/env bash
# Cluster launch path (north_rule: "run via spark-submit --py-files on a
# multi-executor cluster"). The programmatic sessions in this repo
# (session.get_spark) zip the package and addPyFile it themselves; this
# script is the equivalent explicit spark-submit invocation for a real
# cluster. Usage:
#   tools/submit_example.sh <master-url> <driver-script> [args...]
# e.g.
#   tools/submit_example.sh spark://head:7077 bench.py
#   tools/submit_example.sh yarn __spark_entry__.py
set -euo pipefail

MASTER="${1:?master url (spark://..., yarn, local[32])}"
SCRIPT="${2:?driver script}"
shift 2

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/judyst_web_crawler_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" judyst_web_crawler_spark -x '*__pycache__*')

exec spark-submit \
    --master "$MASTER" \
    --py-files "$ZIP" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.skewJoin.enabled=true \
    --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTITIONS:-512}" \
    --conf spark.sql.files.maxPartitionBytes="${SPARK_MAX_PARTITION_BYTES:-134217728}" \
    --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048 \
    "$REPO/$SCRIPT" "$@"
