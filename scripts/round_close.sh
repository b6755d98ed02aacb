#!/usr/bin/env bash
# Round-close evidence refresh (round-15 verdict task 6): the three
# artifacts that used to be refreshed by hand — live-Postgres evidence
# (PG_EVIDENCE.json), the reference-shape comparison (ReferenceShapeBench),
# and the Verify selfcheck — produced by ONE script at final HEAD, each
# stamped with the commit hash, summarized into ROUND_CLOSE.json.
#
# Usage: scripts/round_close.sh [refshape-trials]
#   - skips the live-PG stage when the public JDBC driver jar is absent
#   - exits nonzero only when the compile gate or selfcheck fails (the
#     evidence file records per-stage status either way)
set -uo pipefail
cd "$(dirname "$0")/.."

TRIALS="${1:-3}"
HEAD_SHA="$(git rev-parse HEAD)"
DIRTY="$(git status --porcelain | head -1)"
[ -n "$DIRTY" ] && echo "[round-close] WARNING: tree is dirty; evidence is for HEAD $HEAD_SHA + local changes" >&2

# 1. compile gate — a snapshot that doesn't compile kills every signal
sbt -batch "compile; Test/compile" || { echo "[round-close] compile FAILED" >&2; exit 1; }

# 2. live-PostgreSQL integration (self-records into PG_EVIDENCE.json)
PG_STATUS="skipped (driver jar absent)"
PG_JAR="${PG_DRIVER_JAR:-/root/reference/drivers/postgresql-42.7.5.jar}"
if [ -f "$PG_JAR" ]; then
  if GRAFT_HEAD_SHA="$HEAD_SHA" scripts/run_pg_integration.sh "$PG_JAR"; then
    PG_STATUS="ok"
  else
    PG_STATUS="FAILED (see PG_EVIDENCE.json)"
  fi
fi

# 3. reference-shape comparison at round-end conditions
REF_LINE="$(sbt -batch "runMain graft.tools.ReferenceShapeBench $TRIALS" 2>/dev/null \
  | grep -E '^\{"metric":"reference_shape_vs_engine"' | tail -1)"
[ -z "$REF_LINE" ] && REF_LINE='{"metric":"reference_shape_vs_engine","error":"no output captured"}'

# 4. Verify + DuckDB selfcheck at sf0.01 (the driver's correctness gate)
VERIFY_OUT=/tmp/round_close_verify
rm -rf "$VERIFY_OUT"
SC_LINE="verify FAILED"
SC_RC=1
if sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $VERIFY_OUT" >/dev/null 2>&1; then
  # capture selfcheck's OWN exit status — `$(... | tail -1)` would report
  # tail's (always 0) and a failing oracle compare would read as green
  SC_TMP="$(mktemp)"
  if python3 tools/selfcheck.py /root/testdata/sf0.01 "$VERIFY_OUT" >"$SC_TMP" 2>&1; then
    SC_RC=0
  else
    SC_RC=$?
  fi
  SC_LINE="$(tail -1 "$SC_TMP")"
fi

python3 - "$HEAD_SHA" "$PG_STATUS" "$REF_LINE" "$SC_LINE" "$SC_RC" <<'PYEOF'
import json, sys, datetime
head, pg, ref_line, sc_line, sc_rc = sys.argv[1:6]
try:
    ref = json.loads(ref_line)
except Exception:
    ref = {"raw": ref_line}
out = {
    "commit": head,
    "timestamp_utc": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "pg_integration": pg,
    "reference_shape": ref,
    "selfcheck": {"summary": sc_line.strip(), "rc": int(sc_rc)},
}
json.dump(out, open("ROUND_CLOSE.json", "w"), indent=1)
print(f"[round-close] wrote ROUND_CLOSE.json at {head[:9]}: pg={pg}; "
      f"selfcheck={sc_line.strip()}")
PYEOF
exit "$SC_RC"
