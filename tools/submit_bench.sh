#!/usr/bin/env bash
# Run the benchmark job via spark-submit --py-files (north_rule contract).
# Usage: tools/submit_bench.sh [cpus] [n_files]
# On a real cluster, replace --master local[N] with the cluster master and
# the same --py-files zip ships the engine to executors.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${1:-${SPARK_GRAFT_CPUS:-32}}"
NFILES="${2:-100000}"
ZIP="$REPO/.cache/engine_pyfiles.zip"
mkdir -p "$REPO/.cache" /dev/shm/spark-local
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" gitlab_elasticsearch_indexer_spark)
export SPARK_LOCAL_DIRS=/dev/shm/spark-local
spark-submit \
  --master "local[$CPUS]" \
  --conf spark.driver.memory="${SPARK_DRIVER_MEM:-48g}" \
  --py-files "$ZIP" \
  "$REPO/tools/bench_job.py" \
  --mode index --cpus "$CPUS" --n-files "$NFILES" \
  --fixtures "$REPO/.cache/fixtures_$NFILES" \
  --index-dir "$REPO/.cache/submit_index_$NFILES"
