#!/usr/bin/env bash
# One-command cross-JVM co-location smoke (VERDICT r15 #4): start the
# 2-executor standalone harness, replay x21 (band MapGroups automaton) and
# w7 (everyKthPacked manual exchange) over the 100x replica, compare exact
# counts to the DuckDB-arbitrated references, stop the harness. Exits
# nonzero on any count mismatch. Run before final artifacts in any round
# that touches the automaton code (TextDedup band pass, Ordered.everyKth*,
# Dedup, or the MapGroups plumbing).
#
# Usage: tools/cluster_smoke.sh [sfDir] [expectedX21] [expectedW7]
#   defaults: /tmp/sf100 22574543 600000
set -euo pipefail
cd "$(dirname "$0")/.."

SFDIR="${1:-/tmp/sf100}"
EXP_X21="${2:-22574543}"
EXP_W7="${3:-600000}"

if [ ! -d "$SFDIR" ]; then
  echo "[smoke] $SFDIR missing — build it first:" >&2
  echo "  python3 tools/make_replica.py /root/testdata/sf0.01 $SFDIR 100" >&2
  exit 2
fi

# the smoke drives the CURRENT build: compile before bringing up daemons
sbt -batch compile

tools/cluster_harness.sh start
trap 'tools/cluster_harness.sh stop' EXIT

# x21 ensure-builds the at-rest signature table on a cold store — that
# extra ingest work is fine here because the smoke checks COUNTS, never
# walls; GRAFT_ATREST_DIR stays whatever the caller exported
rc=0
sbt -batch "runMain ClusterSmoke $SFDIR $EXP_X21 $EXP_W7" || rc=$?
exit $rc
