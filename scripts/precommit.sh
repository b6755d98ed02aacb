#!/usr/bin/env bash
# Round-closing gate: the tree at HEAD must compile (main + test) before any
# snapshot commit. A snapshot that ships rc=1 kills every driver signal for
# the round (Verify, Bench, the whole oracle pass) — run this before the
# closing commit, every round.
set -euo pipefail
cd "$(dirname "$0")/.."
exec sbt -batch "compile; Test/compile"
