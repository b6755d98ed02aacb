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

PG_URL="jdbc:postgresql://localhost:$PORT/graft?user=graft" \
PG_DRIVER_JAR="$JAR" \
  sbt -batch "testOnly graft.PostgresIntegrationSpec"
