#!/usr/bin/env bash
# Two-executor Spark standalone harness (VERDICT r13/r14 #8): local[32]
# shuffles are in-process memory copies and broadcasts are a pointer hand-
# off, so shuffle-fan-out levers (x15's bloom-vs-exact-broadcast) measure
# NEUTRAL there. This brings up a real master + 2 worker JVMs on localhost
# so executors pay genuine serialization + socket shuffle + cross-JVM
# broadcast costs. Usage:
#   tools/cluster_harness.sh start   # master :7077 + 2 workers (16 cores, 24g each)
#   tools/cluster_harness.sh stop
set -euo pipefail
export SPARK_HOME=/opt/spark        # workers build executor commands from it
export SPARK_SCALA_VERSION=2.13
JARS="/opt/spark/jars/*"
LOGDIR=/tmp/graft_cluster
MASTER_URL="spark://localhost:7077"

start() {
  mkdir -p "$LOGDIR"
  nohup java -Xmx1g -cp "$JARS" org.apache.spark.deploy.master.Master \
    --host localhost --port 7077 --webui-port 8089 \
    > "$LOGDIR/master.log" 2>&1 &
  echo $! > "$LOGDIR/master.pid"
  sleep 4
  for i in 1 2; do
    nohup java -Xmx1g -cp "$JARS" org.apache.spark.deploy.worker.Worker \
      --cores 16 --memory 24g --webui-port 0 --work-dir "$LOGDIR/worker$i" \
      "$MASTER_URL" > "$LOGDIR/worker$i.log" 2>&1 &
    echo $! > "$LOGDIR/worker$i.pid"
  done
  sleep 4
  # informational only — a slow master may not have logged these lines yet,
  # and under set -e an empty grep would fail the harness AFTER the daemons
  # launched (advisor r15)
  grep -h "Starting Spark master\|Registering worker\|registered" \
    "$LOGDIR"/master.log | tail -3 || true
}

stop() {
  # nullglob: with no .pid files the loop body must not see a literal
  # '*.pid' (cat of it would fail under set -e; advisor r15)
  shopt -s nullglob
  for f in "$LOGDIR"/*.pid; do
    kill "$(cat "$f")" 2>/dev/null || true
    rm -f "$f"
  done
  echo stopped
}

case "${1:-}" in
  start) start ;;
  stop) stop ;;
  *) echo "usage: $0 start|stop" >&2; exit 2 ;;
esac
