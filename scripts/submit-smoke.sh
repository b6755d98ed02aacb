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
# Exit 0 = jar built, spark-submit ran graft.Verify, every selected
# query wrote a parquet result, AND tools/selfcheck.py oracle-matched
# the submitted output (skipped with a warning if duckdb/pandas are
# unavailable).
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_DIR="${2:-/tmp/submit_smoke}"
QUERIES="${SPARK_GRAFT_ONLY:-s1_p1_csv_scan,w2_sessionize,ext_dedup_exact}"

sbt -batch package
# newest jar wins if a version bump left a stale artifact behind
JAR=$(ls -t target/scala-2.13/projektdata_engineering_iubhspark_*.jar | head -1)

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
[ "$missing" -eq 0 ] || exit "$missing"

# Oracle-compare the submitted output (same subset selector).
if python3 -c 'import duckdb, pandas' 2>/dev/null; then
  SPARK_GRAFT_ONLY="$QUERIES" python3 tools/selfcheck.py "$SF_DIR" "$OUT_DIR"
else
  echo "WARN: duckdb/pandas unavailable — skipping oracle compare" >&2
fi
echo "submit-smoke OK: ${#QS[@]} queries via spark-submit ($JAR)"
