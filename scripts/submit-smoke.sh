#!/usr/bin/env bash
# Packaging smoke: prove the library deploys the way a Spark library
# should — a THIN jar (sbt package) submitted to a cluster-provided
# Spark runtime. No fat-jar/assembly is needed: the library's only
# runtime dependency IS Spark (scalatest/scalacheck are Test-scope),
# so `sbt package` already produces the complete deployment artifact
# for `spark-submit --class ... graft*.jar` on any Spark 4.x cluster.
#
# Usage: scripts/submit-smoke.sh [sfDir] [outDir]
#   sfDir  defaults to /root/testdata/sf0.001
#   outDir defaults to /tmp/submit_smoke
#
# Exit 0 = jar built, spark-submit ran graft.Verify, and every selected
# query wrote a parquet result. Run tools/selfcheck.py afterwards for
# the DuckDB oracle comparison.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_DIR="${2:-/tmp/submit_smoke}"
QUERIES="${SPARK_GRAFT_ONLY:-s1_p1_csv_scan,w2_sessionize,ext_dedup_exact}"

sbt -batch package
JAR=$(ls target/scala-2.13/projektdata_engineering_iubhspark_*.jar)

rm -rf "$OUT_DIR"
SPARK_GRAFT_ONLY="$QUERIES" /opt/spark/bin/spark-submit \
  --master 'local[4]' \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  --class graft.Verify \
  "$JAR" "$SF_DIR" "$OUT_DIR"

missing=0
IFS=',' read -ra QS <<< "$QUERIES"
for q in "${QS[@]}"; do
  if [ ! -d "$OUT_DIR/$q" ]; then
    echo "MISSING: $OUT_DIR/$q" >&2
    missing=1
  fi
done
[ "$missing" -eq 0 ] && echo "submit-smoke OK: ${#QS[@]} queries via spark-submit ($JAR)"
exit "$missing"
