#!/usr/bin/env bash
# Live-PostgreSQL integration run for PostgresIntegrationSpec.
#
# Brings up a disposable local PostgreSQL cluster (postgres refuses to run
# as root, so a throwaway `pguser` account owns the data dir), runs the
# guarded spec against it with the public PostgreSQL JDBC driver on the
# test classpath, and tears the cluster down. The spec itself is unchanged
# by this script — it is the same guarded suite that cancels cleanly when
# PG_URL is unset.
#
# Usage: scripts/run_pg_integration.sh [path-to-postgresql-jdbc-jar]
set -euo pipefail
cd "$(dirname "$0")/.."

JAR="${1:-/root/reference/drivers/postgresql-42.7.5.jar}"
[ -f "$JAR" ] || { echo "PostgreSQL JDBC driver jar not found: $JAR" >&2; exit 1; }

PORT=54329
PGROOT=/tmp/pg
DATA="$PGROOT/data"

id pguser >/dev/null 2>&1 || useradd -m pguser
mkdir -p "$PGROOT" && chown pguser "$PGROOT"

# Teardown must survive a failing test run (set -e would otherwise skip
# a trailing stop line and leave a root-spawned postmaster running).
# Registered BEFORE the start block so a failure inside initdb/pg_ctl/psql
# still triggers it, and gated on STARTED so a cluster this invocation did
# NOT start (already running from a previous run) is left alone.
STARTED=0
trap '[ "$STARTED" = 1 ] && su pguser -c "pg_ctl -D '\''$DATA'\'' stop" >/dev/null 2>&1 || true' EXIT

if ! su pguser -c "pg_ctl -D '$DATA' status" >/dev/null 2>&1; then
  [ -d "$DATA" ] || su pguser -c "initdb -D '$DATA' -A trust -U graft" >/dev/null
  STARTED=1
  su pguser -c "pg_ctl -D '$DATA' -l '$PGROOT/log' \
    -o '-p $PORT -k $PGROOT -c listen_addresses=localhost' start"
  sleep 1
fi
psql -h localhost -p "$PORT" -U graft -d graft -c "SELECT 1" >/dev/null 2>&1 \
  || psql -h localhost -p "$PORT" -U graft -d postgres -c "CREATE DATABASE graft"

# Self-recording (round-9 verdict #4): every run appends a machine-readable
# result block to the committed PG_EVIDENCE.json, so the round's standing
# evidence shows executed-latest live-Postgres status without a re-run.
SBT_OUT="$(mktemp)"
SBT_RC=0
PG_URL="jdbc:postgresql://localhost:$PORT/graft?user=graft" \
PG_DRIVER_JAR="$JAR" \
  sbt -batch "testOnly graft.PostgresIntegrationSpec graft.DashboardSpec" 2>&1 | tee "$SBT_OUT" \
  || SBT_RC=$?

SERVER_VERSION="$(psql -h localhost -p "$PORT" -U graft -d graft -tAc 'SELECT version()' 2>/dev/null || echo unknown)"
python3 - "$SBT_OUT" "$SBT_RC" "$SERVER_VERSION" <<'PYEOF'
import json, re, sys, datetime, os
out_path = "PG_EVIDENCE.json"
text = open(sys.argv[1], encoding="utf-8", errors="replace").read()
m = re.search(r"Tests: succeeded (\d+), failed (\d+), canceled (\d+)", text)
entry = {
    "timestamp_utc": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "commit": os.environ.get("GRAFT_HEAD_SHA")
        or os.popen("git rev-parse HEAD 2>/dev/null").read().strip() or None,
    "server_version": sys.argv[3].strip(),
    "suite": "graft.PostgresIntegrationSpec",
    "succeeded": int(m.group(1)) if m else None,
    "failed": int(m.group(2)) if m else None,
    "canceled": int(m.group(3)) if m else None,
    "sbt_rc": int(sys.argv[2]),
}
runs = []
if os.path.exists(out_path):
    try:
        runs = json.load(open(out_path)).get("runs", [])
    except Exception:
        runs = []
runs.append(entry)
json.dump({"runs": runs}, open(out_path, "w"), indent=1)
print(f"[pg-evidence] recorded run -> {out_path}: {entry}")
PYEOF
exit "$SBT_RC"
